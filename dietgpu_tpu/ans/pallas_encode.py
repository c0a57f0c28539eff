"""Pallas TPU rANS encoder — hot encode loop + archive assembly as kernels.

TPU-native redesign of the reference encode pipeline
(GpuANSEncode.cuh:49-211, 595-672): one block per sublane row, 32 interleaved
rANS states in lanes 0..31.

Encode kernel, per step: symbol table lookups ((pdf|cdf<<12|shift<<24) and
magic, 256 entries each = two lane-wise `tpu.dynamic_gather`s + select), the
renormalization ballot/popc stream compaction (GpuANSEncode.cuh:68-74) as an
inclusive lane-prefix-sum via one MXU matmul against a constant triangular
matrix, and magic-number division (__umulhi, GpuANSEncode.cuh:79-86) via
16-bit limb products with logical shifts (bit-correct in i32
two's-complement). Emitted u16 words append into a 128-lane register window
(plus a spill window for straddles) — the inverse write permutation is a
5-step binary search over the prefix sums — and full windows flush to a
paged VMEM staging buffer through a dynamically-bounded page loop.

Assembly kernel (the analogue of ansEncodeCoalesceBatch,
GpuANSEncode.cuh:595-672): packs each block's zero-extended staged words
into u16-pair u32s, rotates them to the block's 16-byte-aligned archive
offset, OR-merges into a tile row buffer, and DMAs the tile's contiguous
payload row range into the section-prefilled archive (aliased in/out).
Grid steps run in order; the shared boundary row between consecutive tiles
rides a persistent spill scratch. XLA gathers never touch the payload (they
run ~1000x too slow on TPU for this).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from . import layout
from . import stats
from .checksum import checksum_u32
from ..profiling import annotate

_I32 = jnp.int32
_U32 = jnp.uint32

# perf-debug knob: skip kernel phases to attribute time (output garbage!).
# comma-set of {flush,search,data,lut,div}; e.g. DIETGPU_ENCODE_ABLATE=flush
import os as _os

_ABLATE = frozenset(
    filter(None, _os.environ.get("DIETGPU_ENCODE_ABLATE", "").split(","))
)


def _flush_group() -> int:
    """Steps between window flushes (hardware A/B knob).

    G=1 reproduces the flush-every-step structure; larger G amortizes the
    flush machinery's fixed scalar-core cost (page-range reductions + a
    dynamically-bounded fori launch per flush) over G steps at the price
    of G-1 extra 32-slot window registers and their per-step append
    selects. Must divide CHUNK (16)."""
    g = int(_os.environ.get("DIETGPU_ENCODE_FLUSH_GROUP", "4"))
    if not (1 <= g <= CHUNK and CHUNK % g == 0):
        raise ValueError(
            f"DIETGPU_ENCODE_FLUSH_GROUP={g} must be a divisor of {CHUNK} "
            f"in [1, {CHUNK}]"
        )
    return g


def _divmode() -> str:
    """Division strategy in the encode hot loop (hardware A/B knob).

    "magic": the reference's magic-number division (__umulhi analogue via
    16-bit limb products, GpuANSEncode.cuh:79-86) — ~19 vector ops/step.
    "f32": round-nearest f32 reciprocal + one two-sided +-1 correction
    (exactness proof in stats.div_rcp_f32_bits) — ~13 ops/step. Both are
    bit-exact; archives are identical."""
    m = _os.environ.get("DIETGPU_ENCODE_DIVMODE", "magic")
    if m not in ("magic", "f32"):
        raise ValueError(
            f"DIETGPU_ENCODE_DIVMODE={m!r} must be 'magic' or 'f32'"
        )
    return m


def _datamode() -> str:
    """Input-byte fetch strategy in the encode hot loop (A/B knob).

    "quartet" (default): once per 16-step chunk, rotate the four groups'
    chunk rows into four quartet rows (lanes 32g.. of quartet q hold words
    32q..32q+31 of group g) — the per-step fetch is then ONE static-index
    gather instead of four gathers + three selects. Measured on the v5e
    (r4 session A): 12.95 vs 13.92 ms full bf16 compress at 64Mi (+7.5%).
    "perstep": the round-2 per-step 4-gather path."""
    m = _os.environ.get("DIETGPU_ENCODE_DATAMODE", "quartet")
    if m not in ("perstep", "quartet"):
        raise ValueError(
            f"DIETGPU_ENCODE_DATAMODE={m!r} must be 'perstep' or 'quartet'"
        )
    return m


def _flushstack() -> bool:
    """Flush broadcast-gather layout (A/B knob): stacked = the R register
    composites concatenate into one (R*T,128) so each group's broadcast is
    ONE static-index gather (4 total) instead of R*4. Measured SLOWER on
    the v5e (13.25 vs 12.95 ms encode at 64Mi bf16, r4 session A — Mosaic
    lowers small static-index broadcast-gathers better than the concat +
    wide-gather pair), so the default is off; knob kept as evidence."""
    return _os.environ.get("DIETGPU_ENCODE_FLUSHSTACK", "off") == "on"


def _slimcarry_enc() -> bool:
    """Encode chunk-loop carry layout (A/B knob). "on" (default) carries
    only (state, register 0, fill, base) across chunk iterations — the
    chunk's final flush zeroes registers 1..G, so they cross the boundary
    as known-zeros. Real-kernel A/B: WASH (r5 session B, 128Mi bf16
    compress: 23.52/23.57/23.50 ms on/off/on) — Mosaic already eliminates
    the known-zero carry. Kept as the simpler default."""
    return _os.environ.get("DIETGPU_ENCODE_SLIMCARRY", "on") != "off"


def _scattermode() -> str:
    """Window-append scatter strategy in the encode hot loop (A/B knob).

    "search": the round-2 inverse-permutation path — a 5-round binary
    search over the group's rank prefix (5 lane-gathers) followed by one
    value gather per step: 6 of the step's ~9 gathers.
    "bfly": gather-free LSB-first butterfly compaction — writers carry
    their left-shift (lane - rank + 1, non-decreasing within the group,
    so the 1/2/4/8/16 rotate rounds are provably collision-free and never
    cross the 32-lane group boundary) packed in bits 16..20 of the value;
    5 static lane-rolls + selects route every writer to its group-local
    rank slot, then ONE gather rotates the compacted row by the window
    fill. Replaces 6 data-dependent gathers with 5 static rolls + 1
    gather (the reference's ballot/popc + shfl write, GpuANSEncode.cuh:
    68-74, re-derived as a routing network instead of a search).
    Hardware A/B (v5e, 2026-08-21, A/B/A): full bf16 compress 128Mi
    23.59/23.08/23.54 ms, raw ANS encode 64Mi 11.76/11.51/12.55 ms —
    bfly wins ~2-4% and is the default; archives bit-identical."""
    m = _os.environ.get("DIETGPU_ENCODE_SCATTER", "bfly")
    if m not in ("search", "bfly"):
        raise ValueError(
            f"DIETGPU_ENCODE_SCATTER={m!r} must be 'search' or 'bfly'"
        )
    return m


def _flushpipe() -> bool:
    """Pipelined flush page bounds (A/B knob, decode's pipelined-refill
    twin): each flush's page-loop bounds were computed ONE FLUSH AHEAD
    (carried scalars; flush 0 statically spans pages [0, 1]), so the
    vector->scalar readback feeding the dynamic fori bound has G steps of
    encode compute to hide behind. Conservative by at most one page: a
    block's staging base is monotone non-decreasing and advances <= 128
    words (one page) per flush, and the LO bound takes min over ALL live
    blocks (a not-yet-ready block can turn ready at a lower page than any
    currently-ready one). Measured a LOSS on the v5e (r5 session A,
    A/B/A at 128Mi bf16 full compress: 23.58 / 26.24 / 23.51 ms): the
    conservative bounds widen the page loop by up to two pages per
    flush, which costs more than the scalar readbacks Mosaic was already
    hiding. Knob kept as evidence; default stays off."""
    return _os.environ.get("DIETGPU_ENCODE_FLUSHPIPE", "off") == "on"


S = C.STEPS_PER_BLOCK  # 128
W = C.NUM_INTERLEAVED  # 32
MW = C.MAX_COMP_WORDS_PER_BLOCK  # 2560
PAGES = MW // 128  # 20 pages of 128 u16 words (zero-extended in i32)
CHUNK = 16  # steps per input chunk (512 bytes = 128 packed i32)
BPR = 4  # blocks per sublane row (dense layout)


def _taa(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=1)


def _srl(x, s):
    return jax.lax.shift_right_logical(x, s)


def _umulhi_i32(a, b):
    """High 32 bits of the unsigned 32x32 product, on i32 bit patterns."""
    m16 = 0xFFFF
    al = a & m16
    ah = _srl(a, 16)
    bl = b & m16
    bh = _srl(b, 16)
    lo = al * bl
    m1 = ah * bl
    m2 = al * bh
    t = _srl(lo, 16) + (m1 & m16) + (m2 & m16)
    return ah * bh + _srl(m1, 16) + _srl(m2, 16) + _srl(t, 16)


@functools.lru_cache(maxsize=None)
def _prefix_matrix():
    """(2,128,128) bf16 block-diag constants applied to the write mask on
    the MXU. [0] packs BOTH reductions into one matmul: entry = prefix
    (incl_prefix[32g+l] = sum_{j <= l} write[32g+j]) + 64 * group-ones,
    so the product is prefix + 64*cnt (prefix <= 32 < 64; the entries —
    65, 64, 1 — and the result <= 32 + 64*32 are exact in bf16/f32). One
    matmul + one convert replaces the former two-matmul pair. [1] keeps
    plain group-ones for callers needing cnt alone."""
    m = np.zeros((2, 128, 128), np.float32)
    for g in range(4):
        for j in range(32):
            for l in range(j, 32):
                m[0, 32 * g + j, 32 * g + l] = 1.0
        m[1, 32 * g : 32 * g + 32, 32 * g : 32 * g + 32] = 1.0
    m[0] += 64.0 * m[1]
    return m


def _encode_kernel(
    prob_bits: int,
    T: int,
    per_row_tables: bool,
    G: int,  # steps between window flushes (window = G+1 registers)
    divmode: str,  # "magic" umulhi division | "f32" reciprocal+correction
    datamode: str,  # "perstep" 4-gather fetch | "quartet" chunk-rotated
    scatter_mode: str,  # "search" rank binary-search | "bfly" butterfly
    flush_stack: bool,  # stacked flush broadcast-gathers
    flush_pipe: bool,  # page bounds computed one flush ahead (see _flushpipe)
    slim_carry: bool,  # carry only (state, w0, fill, base) across chunks
    # statically guaranteed: every block in the grid is full (length ==
    # NBp * 4096) — the per-step activity compare and its two act-selects
    # vanish for the whole grid (same trick as the decode kernel)
    full_tiles: bool,
    meta_ref,  # VMEM (T,128): lane 32g+0 = symbol count of block 4*row+g
    data_ref,  # VMEM (T,32,128): [r, 8g+c, :] = block 4r+g input chunk c
    pcs_ref,
    magic_ref,
    pre_ref,  # VMEM (128,128) bf16 block-diagonal inclusive-prefix matrix
    words_ref,  # VMEM (T, 4*PAGES, 128): [r, g*PAGES+p, :] = block page p
    counts_ref,  # VMEM (T,128) per-lane word counts (uniform in group)
    states_ref,  # VMEM (T,128) lanes 32g.. = final states of block 4r+g
):
    """Dense layout: 4 blocks per sublane row, 32 interleaved rANS lanes per
    group — every ALU phase runs all 128 VPU lanes (GpuANSEncode.cuh:49-90
    warp analogue x4). Each group keeps a (G+1)-register (32 slots each)
    append window; the ballot/popc stream compaction is one block-diagonal
    MXU prefix matmul and a single cross-group binary search (rank mod 32
    is register-invariant, so one search serves every register); full
    32-slot quarters drain into the staging pages once per G steps — the
    flush machinery's fixed cost (composite packing, page-range
    reductions, a dynamically-bounded fori launch) was ~40% of the kernel
    when it ran every step.

    With per_row_tables, the (pdf|cdf|shift) and magic tables are
    per-sublane-row inputs instead of grid-wide broadcasts — each row
    encodes against a DIFFERENT probability table, so one grid encodes a
    whole batch of independent archives (the batched-decode trick applied
    to encode; zero in-kernel cost since the lane gathers need (T,128)
    operands either way)."""
    lane = jax.lax.broadcasted_iota(_I32, (T, 128), 1)
    lane31 = lane & 31
    gid = _srl(lane, 5)
    gbase = lane & ~31
    lidx = _srl(lane31, 2)  # u32 index of this lane's byte within 8-u32 step
    qsh = (lane & 3) << 3
    zeros = jnp.zeros((T, 128), _I32)

    meta = meta_ref[:]
    uncomp = _taa(meta, gbase)  # block symbol count (drives the act mask)
    # loop-invariant hoists: activity threshold, lane-group select masks,
    # and the binary search's per-round gather offsets
    negu = lane31 - uncomp
    gmask = [gid == g for g in range(1, BPR)]
    sbase = {b: gbase + (b - 1) for b in (16, 8, 4, 2, 1)}
    if datamode == "quartet":
        gall = [gid == g for g in range(BPR)]
        # static per-substep fetch indices: lane 32g+j of substep m reads
        # quartet-row word 32g + 8m + j//4
        qidx = [gbase + 8 * m + lidx for m in range(4)]

    if per_row_tables:
        pcs = [pcs_ref[:, r, :] for r in range(2)]
        magic = [magic_ref[:, r, :] for r in range(2)]
    else:
        pcs = [
            jnp.broadcast_to(pcs_ref[r : r + 1, :], (T, 128)) for r in range(2)
        ]
        magic = [
            jnp.broadcast_to(magic_ref[r : r + 1, :], (T, 128))
            for r in range(2)
        ]
    pre = pre_ref[0]
    NWIN = G + 1
    slots = [lane31 + 32 * r for r in range(NWIN)]
    quarter = _srl(lane, 5)
    if flush_stack:
        # hoisted static broadcast indices for the stacked flush gathers,
        # one (R*T,128) constant set per register count (G in-loop, NWIN
        # for the final partial flush)
        _stackidx = {}
        for R_ in {G, NWIN}:
            laneR = jax.lax.broadcasted_iota(_I32, (R_ * T, 128), 1)
            _stackidx[R_] = [(laneR & 31) + 32 * g for g in range(BPR)]

    # zero-init the staging pages (flushes do read-modify-write ORs)
    for p in range(4 * PAGES):
        words_ref[:, p, :] = zeros

    if flush_pipe:
        # dead blocks never stage words; exclude them from the LO bound so
        # tail tiles don't pin every flush's loop start at page 0
        deadbig = jnp.where(uncomp > 0, 0, PAGES)

    def flush_windows(wins, fill2, base, partial, bnd=None):
        """Drain each group's full 32-slot quarters into the staging pages,
        once per G steps. Register r holds stream words base+32r.. of its
        group; fill2>>5 of them are full. One branchless union page loop
        serves all four groups AND all registers (separate pl.when'd loops
        per group drown the scalar core in control overhead); quarters are
        OR-merged into the zero-initialized pages, so a quarter drained
        across two flushes (full part now, tail at the final partial
        flush) lands correctly.

        Each (group, register) (value, page, quarter, ready) tuple travels
        as ONE packed composite word — one lane gather instead of three:
        bits 0..15 window value, 16..20 page+1 (0 = not ready), 21..22
        quarter. fill/base are group-uniform, so each lane packs its own
        group's fields natively before the broadcast-gather.

        Returns (shifted window registers, new fill, new base)."""
        k = _srl(fill2, 5)  # full quarters to drain (group-uniform)
        if "flush" not in _ABLATE:
            # the final partial flush also drains the trailing partial
            # register (lane-masked); in-loop flushes drain full ones only
            R = NWIN if partial else G
            comps, pfs = [], []
            for r in range(R):
                base_r = base + 32 * r
                ready = (fill2 > 32 * r) if partial else (fill2 >= 32 * (r + 1))
                pf = jnp.where(
                    ready, jnp.minimum(_srl(base_r, 7), PAGES - 1) + 1, 0
                )
                comps.append(
                    (wins[r] & 0xFFFF)
                    | (pf << 16)
                    | ((_srl(base_r, 5) & 3) << 21)
                )
                pfs.append(pf)
            pmax = pfs[0]
            for pf in pfs[1:]:
                pmax = jnp.maximum(pmax, pf)
            if flush_pipe:
                # bounds computed at the PREVIOUS flush; this flush
                # computes the next pair — the scalar readback hides
                # behind the next G steps. Both bounds derive from `base`
                # (monotone non-decreasing per block) over ALL live
                # blocks, NOT from readiness (which flickers): next flush
                # register r contributes page (base' + 32r) >> 7 with
                # base' <= base + 128 and 32r <= 128, so +2 covers it
                lop, mx = bnd
                bp = _srl(base, 7)
                nbnd = (
                    jnp.min(bp + deadbig),
                    jnp.minimum(jnp.max(bp - deadbig) + 2, PAGES - 1),
                )
            else:
                # register pages are monotone in r, so register 0 (ready
                # whenever any is) bounds the range from below
                mx = jnp.max(pmax) - 1
                lop = jnp.min(jnp.where(pfs[0] > 0, pfs[0] - 1, PAGES))
                nbnd = bnd
            if flush_stack and R > 1:
                # ONE (R*T,128) static-index gather per group broadcasts
                # all R register composites at once (was R gathers each)
                cs = jnp.concatenate(comps, axis=0)
                compg = []
                for g in range(BPR):
                    csg = _taa(cs, _stackidx[R][g])
                    compg.append([csg[r * T : (r + 1) * T] for r in range(R)])
            else:
                compg = [
                    [_taa(comps[r], lane31 + 32 * g) for r in range(R)]
                    for g in range(BPR)
                ]
            if partial:
                flvs = [_taa(fill2, zeros + 32 * g) for g in range(BPR)]

            def body(p, _):
                for g in range(BPR):
                    contrib = None
                    for r in range(R):
                        cg = compg[g][r]
                        sel = ((_srl(cg, 16) & 31) - 1 == p) & (
                            quarter == _srl(cg, 21)
                        )
                        if partial:
                            sel = sel & (lane31 < flvs[g] - 32 * r)
                        c = jnp.where(sel, cg & 0xFFFF, 0)
                        contrib = c if contrib is None else contrib | c
                    slab = words_ref[:, g * PAGES + p, :]
                    words_ref[:, g * PAGES + p, :] = slab | contrib
                return 0

            jax.lax.fori_loop(lop, mx + 1, body, 0)
        else:
            nbnd = bnd

        # after draining k full quarters the live tail sits in register k
        w0 = wins[0]
        for r in range(1, NWIN):
            w0 = jnp.where(k == r, wins[r], w0)
        return (
            (w0,) + (zeros,) * G, fill2 - (k << 5), base + (k << 5), nbnd
        )

    def one_step(kk, loads, l, sd, carry):
        state, *rest = carry
        wins = list(rest[:NWIN])
        fill, base = rest[NWIN], rest[NWIN + 1]
        # single hoisted-subtract compare covers full steps, the partial
        # tail step, and dead blocks at once (kk = step index, 32
        # symbols/step); statically-full grids skip it entirely
        act = None if full_tiles else (negu < -(kk << 5))

        if "data" not in _ABLATE:
            if datamode == "quartet":
                # loads holds quartet rows: ONE static-index gather
                d = _taa(loads[l >> 2], qidx[l & 3])
            else:
                idx = lidx + 8 * l
                d = _taa(loads[0], idx)
                for g in range(1, BPR):
                    d = jnp.where(gmask[g - 1], _taa(loads[g], idx), d)
            sym = _srl(d, qsh) & 0xFF
        else:
            sym = lane31 + kk
        if "lut" not in _ABLATE:
            pv = jnp.where(
                sym < 128, _taa(pcs[0], sym & 127), _taa(pcs[1], sym & 127)
            )
            mg = jnp.where(
                sym < 128, _taa(magic[0], sym & 127), _taa(magic[1], sym & 127)
            )
        else:
            pv = sym | (sym << 12)
            mg = sym
        pdf = pv & 0xFFF
        cdf = _srl(pv, 12) & 0xFFF
        if divmode != "f32":
            # pcs packs pdf|cdf<<12|shift<<24 with shift < 32: bits above
            # 28 are zero, so the shift alone suffices — no mask op
            shift = _srl(pv, 24)

        write = _srl(state, 31 - prob_bits) >= pdf
        if not full_tiles:
            write = act & write
        outv = state & 0xFFFF
        state1 = jnp.where(write, _srl(state, 16), state)

        if "div" not in _ABLATE:
            if divmode == "f32":
                # exact reciprocal division: q0 is within 0.75 of the true
                # quotient (proof: stats.div_rcp_f32_bits), so one
                # two-sided correction against the residual is exact
                rcp = jax.lax.bitcast_convert_type(mg, jnp.float32)
                q0 = (state1.astype(jnp.float32) * rcp).astype(_I32)
                mod0 = state1 - q0 * pdf
                neg = (mod0 < 0).astype(_I32)
                ge = (mod0 >= pdf).astype(_I32)
                div = q0 + ge - neg
                mod = mod0 + (neg - ge) * pdf
            else:
                t = _umulhi_i32(state1, mg)
                div = _srl(t + state1, shift)
                mod = state1 - div * pdf
        else:
            div = _srl(state1, prob_bits)
            mod = state1 & ((1 << prob_bits) - 1)
        ns = (div << prob_bits) + mod + cdf
        state2 = ns if full_tiles else jnp.where(act, ns, state1)

        # per-group inclusive prefix (ballot/popc) AND group totals via ONE
        # block-diag matmul: product = prefix + 64*cnt (see _prefix_matrix)
        wb = write.astype(jnp.bfloat16)
        rc = jax.lax.dot_general(
            wb, pre, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(_I32)
        r = rc & 63
        cnt = _srl(rc, 6)

        # append into the group's window; one binary search serves all
        # four groups (rank gathers are group-offset) and every window
        # register (the needed rank mod 32 is (lane31 - fill) & 31 for
        # each of them). The gather offsets gbase + b - 1 are hoisted
        # kernel constants (sbase[b]), so each search round is
        # add/gather/compare/select — four ops, not five.
        if "search" in _ABLATE:
            val = outv
        elif scatter_mode == "bfly":
            # gather-free butterfly compaction: writer lane 32g+j routes
            # LEFT by s = j - (rank-1) to group-local slot rank-1. s is
            # non-decreasing over writers within a group, so LSB-first
            # rotate rounds (1,2,4,8,16) are collision-free (verified
            # exhaustively for n=16 masks + 2e5 random n=32), and a value
            # still owing >= b of shift always sits >= b lanes above its
            # group base — candidates crossing a group boundary never
            # have bit b set, so plain full-row rolls need no wrap fix.
            # Shift travels in bits 16..20 of the packed value; after the
            # 5 rounds writers sit compacted at slots 0..cnt-1 and one
            # gather rotates the compacted row by the window fill.
            v = jnp.where(write, outv | ((lane31 - r + 1) << 16), 0)
            for b in (1, 2, 4, 8, 16):
                cand = pltpu.roll(v, 128 - b, 1)  # cand[l] = v[l + b]
                cbit = (cand & (b << 16)) != 0
                keep = jnp.where((v & (b << 16)) != 0, 0, v)
                v = jnp.where(cbit, cand - (b << 16), keep)
            val = _taa(v, gbase | ((lane31 - fill) & 31)) & 0xFFFF
        else:
            jj1 = ((lane31 - fill) & 31) + 1
            wsel = zeros
            for b in (16, 8, 4, 2, 1):
                v = _taa(r, sbase[b] + wsel)
                wsel = jnp.where(v < jj1, wsel + b, wsel)
            val = _taa(outv, gbase | (wsel & 31))
        fillc = fill + cnt
        # step sd (since the last flush) can only reach registers
        # 0..sd+1: fill < 32 + 32*sd and at most 32 more words land now.
        # hit test per register: one subtract rebase + one UNSIGNED
        # compare (slot - fill < cnt as u32 folds the >=0 and < bounds)
        d0 = lane31 - fill
        cnt_u = jax.lax.bitcast_convert_type(cnt, _U32)
        for reg in range(min(sd + 2, NWIN)):
            d = jax.lax.bitcast_convert_type(d0 + 32 * reg, _U32)
            wins[reg] = jnp.where(d < cnt_u, val, wins[reg])
        # trailing carry entries (pipelined flush bounds) pass through
        return (state2, *wins, fillc, base, *rest[NWIN + 2 :])

    def chunk_body(c, carry):
        if slim_carry:
            # only window register 0 crosses the chunk boundary live: the
            # chunk's final flush zeroes registers 1..G (flush_windows
            # returns (w0,) + (zeros,)*G), and loop-carried (T,128)
            # tensors are expensive (r5 bridge kernel: 4 extra carried
            # tensors cost -34%). Rebuild the known-zero registers here.
            state_c, w0c, fill_c, base_c, *extra = carry
            carry = (state_c, w0c) + (zeros,) * G + (fill_c, base_c,
                                                     *extra)
        loads = [data_ref[:, 8 * g + c, :] for g in range(BPR)]
        if datamode == "quartet" and "data" not in _ABLATE:
            # rotate the group rows into quartet rows once per chunk:
            # quartet q lanes 32g.. = words 32q..32q+31 of group g (12
            # rolls + masked ORs replace 3 gathers + 3 selects PER STEP)
            dq = []
            for q in range(4):
                acc = None
                for g in range(BPR):
                    piece = loads[g]
                    if (32 * g - 32 * q) % 128:
                        piece = pltpu.roll(piece, (32 * g - 32 * q) % 128, 1)
                    piece = jnp.where(gall[g], piece, 0)
                    acc = piece if acc is None else acc | piece
                dq.append(acc)
            loads = dq
        for m in range(CHUNK // G):
            for d in range(G):
                l = m * G + d
                carry = one_step(c * CHUNK + l, loads, l, d, carry)
            # full window quarters -> staging pages (pages clamped on
            # block overflow, which is flagged in the returned size;
            # GpuANSEncode.cuh:355-360)
            bnd = (carry[3 + NWIN], carry[4 + NWIN]) if flush_pipe else None
            wins, fill, base, nbnd = flush_windows(
                carry[1 : 1 + NWIN], carry[1 + NWIN], carry[2 + NWIN],
                partial=False, bnd=bnd,
            )
            carry = (carry[0], *wins, fill, base) + (
                nbnd if flush_pipe else ()
            )
        if slim_carry:
            # registers 1..G are zeros after the final flush above
            return (carry[0], carry[1], carry[1 + NWIN],
                    carry[2 + NWIN], *carry[3 + NWIN :])
        return carry

    if slim_carry:
        init = (
            jnp.full((T, 128), C.ANS_START_STATE, _I32),
            zeros,
            zeros,
            zeros,
        )
    else:
        init = (
            jnp.full((T, 128), C.ANS_START_STATE, _I32),
            *((zeros,) * NWIN),
            zeros,
            zeros,
        )
    if flush_pipe:
        # flush 0 drains registers whose pages span at most [0, 1]
        init = init + (jnp.int32(0), jnp.int32(1))
    final = jax.lax.fori_loop(0, S // CHUNK, chunk_body, init)
    state = final[0]

    if slim_carry:
        # re-expand: (state, w0, fill, base, *bnds) -> full register tuple
        final = (final[0], final[1]) + (zeros,) * G + tuple(final[2:])

    # final partial-window flush (full quarters + the lane-masked tail;
    # one more register than in-loop flushes — the +2 page bound covers it)
    _, fill, base, _ = flush_windows(
        final[1 : 1 + NWIN], final[1 + NWIN], final[2 + NWIN], partial=True,
        bnd=(final[3 + NWIN], final[4 + NWIN]) if flush_pipe else None,
    )

    counts_ref[:] = base + fill
    states_ref[:] = state


@functools.lru_cache(maxsize=None)
def _build_encode_call(NBp: int, prob_bits: int, T: int,
                       per_row_tables: bool = False, G: int = 4,
                       divmode: str = "magic", full_tiles: bool = False,
                       datamode: str = "perstep", flush_stack: bool = False,
                       flush_pipe: bool = False, slim_carry: bool = True,
                       scatter_mode: str = "search"):
    assert CHUNK % G == 0, f"flush group {G} must divide CHUNK"
    grid = NBp // (BPR * T)
    kernel = functools.partial(
        _encode_kernel, prob_bits, T, per_row_tables, G, divmode,
        datamode, scatter_mode, flush_stack, flush_pipe, slim_carry,
        full_tiles
    )
    NR = NBp // BPR
    if per_row_tables:
        table_specs = [
            pl.BlockSpec(
                (T, 2, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (T, 2, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
    else:
        table_specs = [
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NR, BPR * PAGES, 128), _I32),
            jax.ShapeDtypeStruct((NR, 128), _I32),
            jax.ShapeDtypeStruct((NR, 128), _I32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (T, BPR * (S // CHUNK), 128), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *table_specs,
            pl.BlockSpec(
                (2, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (T, BPR * PAGES, 128), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        # the per-row-tables (batched) variant's extra table windows push
        # the scoped allocation just past the default 16 MB limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def _assembly_kernel(
    T: int,
    per_tile_seed: bool,  # batched: each member's FIRST tile reseeds
    *refs,
):
    if per_tile_seed:
        (
            trow_ref,  # SMEM (ntiles,) tile's first payload row (absolute)
            srow_ref,  # SMEM (ntiles,) local index of rows shared w/ next
            dloc_ref,  # SMEM (NBp,) block's dst row local to its tile
            drot_ref,  # SMEM (NBp,) block's u32-lane rotation (x4)
            mfirst_ref,  # SMEM (ntiles,) 1 if first tile of its member
            staged_ref,  # VMEM (T, PAGES, 128) zero-extended words
            seed_ref,  # VMEM (8,128) THIS tile's seed rows (member-first
            #            tiles only; the rest carry the running spill)
            arc_in_ref,
            arc_ref,
            tilebuf,
            spill,
            dma_sem,
        ) = refs
    else:
        (
            trow_ref,
            srow_ref,
            dloc_ref,
            drot_ref,
            staged_ref,
            seed_ref,  # VMEM (8,128): payload-region head (section bytes)
            arc_in_ref,  # ANY (XR,128): section-prefilled archive, ALIASED
            #              to the output — payload DMAs land in place, the
            #              section and tail rows pass through untouched
            arc_ref,  # ANY (XR,128) whole-archive output (aliases arc_in)
            tilebuf,  # scratch (RTE,128)
            spill,  # scratch (8,128) persistent across grid steps
            dma_sem,
        ) = refs
        mfirst_ref = None
    RTE = T * (PAGES // 2) + 24
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(_I32, (10, 128), 1)

    tilebuf[:] = jnp.zeros((RTE, 128), _I32)

    reseed = (mfirst_ref[i] == 1) if per_tile_seed else (i == 0)

    @pl.when(reseed)
    def _():
        spill[:] = seed_ref[:]

    tilebuf[0:8, :] = spill[:]  # rows shared with the previous tile

    lane40 = jax.lax.broadcasted_iota(_I32, (BPR * PAGES // 2, 128), 1)

    def row_body(rr, _):
        # pack ALL FOUR blocks' staged pages into u16-pair u32s with ONE
        # (40,128) static-index gather set — the per-block (10,128) ops
        # this replaces were issue-bound (tiny shapes, 4x the dispatches)
        slab = staged_ref[rr]  # (4*PAGES, 128): block g at [g*PAGES, ..)
        pairs = slab.reshape(BPR * PAGES // 2, 2, 128)
        even = pairs[:, 0, :]  # (40,128) pages 0,2,.. of each block
        odd = pairs[:, 1, :]
        il = (2 * lane40) & 127
        lo_sel = lane40 < 64
        w0 = jnp.where(lo_sel, _taa(even, il), _taa(odd, il))
        w1 = jnp.where(lo_sel, _taa(even, il + 1), _taa(odd, il + 1))
        packed_all = w0 | (w1 << 16)  # (40,128)

        for g in range(BPR):
            b = BPR * rr + g
            packed = packed_all[
                g * (PAGES // 2) : (g + 1) * (PAGES // 2)
            ]  # (10,128)
            rot = drot_ref[i * T + b]
            rolled = pltpu.roll(packed, rot, 1)
            mge = lane >= rot
            dloc = dloc_ref[i * T + b]
            cur = tilebuf[pl.ds(dloc, 10), :]
            tilebuf[pl.ds(dloc, 10), :] = cur | jnp.where(mge, rolled, 0)
            cur2 = tilebuf[pl.ds(dloc + 1, 10), :]
            tilebuf[pl.ds(dloc + 1, 10), :] = cur2 | jnp.where(mge, 0, rolled)
        return 0

    jax.lax.fori_loop(0, T // BPR, row_body, 0, unroll=False)

    spill[:] = tilebuf[pl.ds(srow_ref[i], 8), :]

    dma = pltpu.make_async_copy(
        tilebuf, arc_ref.at[pl.ds(trow_ref[i], RTE), :], dma_sem
    )
    dma.start()
    dma.wait()  # ordered: next tile's DMA must not race this one


@functools.lru_cache(maxsize=None)
def _build_assembly_call(NBp: int, T: int, XR: int,
                         per_tile_seed: bool = False):
    grid = NBp // T
    RTE = T * (PAGES // 2) + 24
    kernel = functools.partial(_assembly_kernel, T, per_tile_seed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5 if per_tile_seed else 4,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (T // BPR, BPR * PAGES, 128), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # per_tile_seed: seed block i of an (ntiles*8,128) array;
            # else one shared (8,128) seed
            pl.BlockSpec(
                (8, 128),
                (lambda i, *_: (i, 0)) if per_tile_seed
                else (lambda i, *_: (0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((RTE, 128), _I32),
            pltpu.VMEM((8, 128), _I32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((XR, 128), _I32),
        grid_spec=grid_spec,
        # alias index counts the 4 scalar-prefetch operands: 4+2 = the
        # section-prefilled archive input -> output 0 (in-place DMAs)
        input_output_aliases={7 if per_tile_seed else 6: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # big stage-1 tiles (DIETGPU_ENCODE_TILE >= 1024 blocks) push
            # the double-buffered staged window past the 16 MB default
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def build_encode_tables(pdf: jnp.ndarray, divmode: str = "magic"):
    """XLA prologue: (pdf | cdf<<12 | shift<<24) and the division table
    (magic constants, or round-nearest f32 reciprocal bits in "f32" mode),
    256 entries each."""
    pdf = pdf.astype(_U32)
    cdf = jnp.concatenate([jnp.zeros(1, _U32), jnp.cumsum(pdf)[:-1]])
    if divmode == "f32":
        magic = stats.div_rcp_f32_bits(pdf)
        pcs = pdf | (cdf << 12)
    else:
        magic, shift = stats.div_magic_u32(pdf)
        pcs = pdf | (cdf << 12) | (shift << 24)
    return pcs.astype(_I32).reshape(2, 128), magic.astype(_I32).reshape(2, 128)


def _encode_stage1(
    data32, length, pdf, L: int, NBp: int, T: int, prob_bits: int,
    use_checksum: bool, precomputed_checksum=None,
    full_tiles: bool = False,
):
    """Traced stage 1: tables + the encode kernel. Returns per-block results."""
    NB = L // C.DEFAULT_BLOCK_SIZE
    nb = (length + C.DEFAULT_BLOCK_SIZE - 1) // C.DEFAULT_BLOCK_SIZE
    dm = _divmode()
    pcs, magic = build_encode_tables(pdf, dm)
    pre = jnp.asarray(_prefix_matrix(), jnp.bfloat16)

    bidx = jnp.arange(NBp, dtype=_I32)
    tail = length - (nb - 1) * C.DEFAULT_BLOCK_SIZE
    uncomp = jnp.where(bidx < nb, C.DEFAULT_BLOCK_SIZE, 0)
    uncomp = jnp.where(bidx == nb - 1, tail, uncomp)
    NR = NBp // BPR
    meta3 = jnp.zeros((NR, BPR, W), _I32)
    meta3 = meta3.at[:, :, 0].set(uncomp.reshape(NR, BPR))
    meta = meta3.reshape(NR, 128)

    d32 = data32
    if NBp > NB:
        d32 = jnp.concatenate([d32, jnp.zeros((NBp - NB) * S * W // 4, _I32)])
    # dense input layout: [r, 8g+c, :] = block 4r+g chunk c (pure reshape)
    d32 = d32.reshape(NR, BPR * (S // CHUNK), 128)

    call = _build_encode_call(
        NBp, prob_bits, T // BPR, G=_flush_group(), divmode=dm,
        full_tiles=full_tiles,
        datamode=_datamode(), flush_stack=_flushstack(),
        flush_pipe=_flushpipe(), slim_carry=_slimcarry_enc(),
        scatter_mode=_scattermode(),
    )
    staged, counts, states_out = call(meta, d32, pcs, magic, pre)

    checksum = _U32(0)
    if use_checksum:
        checksum = (
            precomputed_checksum
            if precomputed_checksum is not None
            else checksum_u32(data32, length)
        )
    return staged, counts, states_out, uncomp, checksum


def _encode_stage2(
    staged, counts, states_out, uncomp, checksum, pdf, length,
    L: int, NBp: int, T: int, prob_bits: int, use_checksum: bool,
    block_tile: int, static_n: int | None = None,
    container=None, base32: int = 0,
):
    """Traced stage 2: section prefill + payload assembly kernel.

    With static_n set (length known at trace time), all section offsets are
    Python ints, so the DUS/slice ops take the fast static-start path.

    With `container` (a prefilled (F4,) u32 buffer, e.g. the float
    archive with header + nonComp plane already in place) and `base32`
    (static u32 word offset of the embedded ANS archive), the sections
    are DUS'd INTO the container and the assembly kernel's payload DMAs
    target container rows directly — the float pipeline then never
    materializes a separate ANS buffer nor pays the full-buffer DUS copy
    into the container (~1.6 ms of the 64Mi bf16 encode was exactly that
    glue). The seed/spill rows preserve any container bytes sharing the
    payload head row (same mechanism that protects the section bytes)."""
    if static_n is not None:
        nb = (static_n + C.DEFAULT_BLOCK_SIZE - 1) // C.DEFAULT_BLOCK_SIZE
    else:
        nb = (length + C.DEFAULT_BLOCK_SIZE - 1) // C.DEFAULT_BLOCK_SIZE
    bidx = jnp.arange(NBp, dtype=_I32)
    counts_blk = counts.reshape(NBp // BPR, BPR, W)[:, :, 0].reshape(NBp)
    words = jnp.where(bidx < nb, counts_blk, 0)
    # dead padding blocks carry the initial rANS state (2^15); zero them so
    # the states DUS (static NBp*32 size) writes zeros past the live section
    states = jnp.where(
        (bidx < nb)[:, None], states_out.reshape(NBp, W).astype(_U32), _U32(0)
    )

    words_padded = C.round_up(words, C.WORDS_PER_ALIGN)
    if NBp % 128 == 0:
        # 2D cumsum: row-wise scans + row offsets (fast on TPU)
        wp2 = words_padded.reshape(NBp // 128, 128)
        cs = jnp.cumsum(wp2, axis=1)
        rowtot = cs[:, -1]
        rowoff = jnp.concatenate(
            [jnp.zeros(1, _I32), jnp.cumsum(rowtot)]
        )
        incl = (cs + rowoff[:-1][:, None]).reshape(NBp)
        total_words = rowoff[-1]
        prefix = jnp.concatenate([jnp.zeros(1, _I32), incl])
    else:
        prefix = jnp.concatenate([jnp.zeros(1, _I32), jnp.cumsum(words_padded)])
        total_words = prefix[NBp]
    options = _U32(prob_bits | (int(use_checksum) << 4))

    bw_start = 136 + nb * W
    rnb2 = nb + (nb & 1)
    ds32 = bw_start + rnb2 * 2

    if container is not None:
        assert static_n is not None, "container assembly needs static length"
        assert container.dtype == _U32 and container.shape[0] % 128 == 0
        arc = container
        XR = container.shape[0] // 128
    else:
        assert base32 == 0
        A = archive_buffer_bytes_pallas(L, block_tile)
        XR = A // 512
        arc = jnp.zeros(XR * 128, _U32)
    prow0 = ((base32 + ds32) >> 7) & ~7
    header = jnp.array(
        [(C.ANS_MAGIC << 16) | C.ANS_VERSION, 0, 0, 0, 0, 0, 0, 0], _U32
    )
    header = header.at[1].set(jnp.asarray(nb, _U32))
    header = header.at[2].set(jnp.asarray(length, _I32).astype(_U32))
    header = header.at[3].set(total_words.astype(_U32))
    header = header.at[4].set(options)
    header = header.at[5].set(checksum)
    arc = jax.lax.dynamic_update_slice(arc, header, (base32,))
    probs32 = pdf[0::2] | (pdf[1::2] << _U32(16))
    arc = jax.lax.dynamic_update_slice(arc, probs32, (base32 + 8,))
    arc = jax.lax.dynamic_update_slice(
        arc, states.reshape(-1), (base32 + 136,)
    )
    live = bidx < nb
    bw_x = jnp.where(
        live, (uncomp.astype(_U32) << 16) | words.astype(_U32), _U32(0)
    )
    bw_y = jnp.where(live, prefix[:NBp].astype(_U32), _U32(0))
    bw = jnp.zeros((NBp + 2, 2), _U32)
    bw = bw.at[:NBp, 0].set(bw_x).at[:NBp, 1].set(bw_y)
    arc = jax.lax.dynamic_update_slice(
        arc, bw.reshape(-1), (jnp.asarray(base32 + bw_start, _I32),)
    )

    # ---- payload via the assembly kernel (absolute-row DMA targets:
    # the kernel writes IN PLACE into the section-prefilled archive) ----
    p32 = base32 + ds32 + (prefix[:NBp] >> 1)
    trow = (p32[0::T] >> 7) & ~7
    trow_next = jnp.concatenate(
        [
            trow[1:],
            jnp.full(
                1, ((base32 + ds32 + total_words // 2) >> 7) & ~7, _I32
            ),
        ]
    )
    RTE = T * (PAGES // 2) + 24
    srow = jnp.clip(trow_next - trow, 0, RTE - 8)
    dloc = jnp.clip(p32 // 128 - jnp.repeat(trow, T), 0, RTE - 16)
    drot = p32 & 127
    trow = jnp.clip(trow, 0, XR - RTE)
    arc_i = layout.bitcast_i32(arc.reshape(XR, 128))
    seed = jax.lax.dynamic_slice(
        arc_i, (jnp.asarray(prow0, _I32), 0), (8, 128)
    ) if static_n is None else jax.lax.slice(
        arc_i, (prow0, 0), (prow0 + 8, 128)
    )

    size = ((ds32 + total_words // 2) * 4).astype(_U32)
    overflow = jnp.any(words > C.MAX_COMP_WORDS_PER_BLOCK)
    size = jnp.where(overflow, size | _U32(C.SIZE_OVERFLOW_BIT), size)
    return arc, trow, srow, dloc, drot, seed, prow0, size


def ans_encode_padded_pallas(
    data: jnp.ndarray,
    length,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
    precomputed_histogram=None,
    precomputed_pdf=None,
    block_tile: int | None = None,
    return_u32: bool = False,
    container=None,
    container_base: int = 0,
):
    """Pallas-backed drop-in for ans_encode_padded (same archive contract).

    Fully traced (jit/vmap-safe at the call level; the Pallas kernels carry
    their own grids). `data` may be (L,) u8 or the same bytes packed
    little-endian as (L//4,) u32 (the layout the float split kernel
    produces). With return_u32=True the archive is returned as (A//4,) u32
    whose little-endian byte view is the archive.
    """
    assert prob_bits in C.SUPPORTED_PROB_BITS
    if block_tile is None:
        block_tile = _encode_tile()
    if data.dtype == jnp.uint8:
        L = data.shape[0]
        data32 = layout.bitcast_i32(layout.u8_to_u32le(data))
        data_u8 = data
    else:
        assert data.dtype in (_U32, _I32)
        L = data.shape[0] * 4
        data32 = layout.bitcast_i32(data)
        data_u8 = None
    NB = L // C.DEFAULT_BLOCK_SIZE
    assert L % C.DEFAULT_BLOCK_SIZE == 0 and L > 0

    fused_checksum = None
    if precomputed_pdf is not None:
        pdf = jnp.asarray(precomputed_pdf).astype(_U32)
    else:
        hist = precomputed_histogram
        if hist is None:
            # MXU histogram kernel (GpuANSStatistics.cuh:21-143 analogue);
            # XLA scatter-add runs ~0.1 GB/s on TPU. With use_checksum the
            # XOR checksum rides the same kernel pass (no extra HBM read).
            from . import pallas_hist

            if use_checksum:
                hist, fused_checksum = pallas_hist.histogram_u8_pallas(
                    data32, length, with_checksum=True
                )
            else:
                hist = pallas_hist.histogram_u8_pallas(data32, length)
        pdf = stats.normalize_probs(
            hist, jnp.asarray(length, _I32).astype(_U32), prob_bits
        )

    # T counts BLOCKS per tile; the dense kernel rides 4 per sublane row,
    # so tiles are multiples of 32 blocks (rows multiple of 8)
    T = max(32, min(block_tile, C.round_up(NB, 32)))
    T = C.round_up(T, 32)
    NBp = C.round_up(NB, T)

    static_n = length if isinstance(length, int) else None
    length = jnp.asarray(length, _I32)
    with annotate("ans.encode_kernel"):
        staged, counts, states_out, uncomp, checksum = _encode_stage1(
            data32, length, pdf, L=L, NBp=NBp, T=T, prob_bits=prob_bits,
            use_checksum=use_checksum, precomputed_checksum=fused_checksum,
            # statically full input (every block 4096 symbols, no padding
            # blocks): the hot loop drops the activity machinery
            full_tiles=static_n == L and NBp == NB
            and _os.environ.get("DIETGPU_ENCODE_FULLTILES") != "off",
        )
    arc32, size = _encode_finish(
        staged, counts, states_out, uncomp, checksum, pdf, length,
        L=L, NBp=NBp, T=T, prob_bits=prob_bits, use_checksum=use_checksum,
        block_tile=block_tile, static_n=static_n,
        container=container, base32=container_base,
    )
    if return_u32:
        return arc32, size
    return layout.u32_to_u8le(arc32), size


def _encode_finish(
    staged, counts, states_out, uncomp, checksum, pdf, length,
    L: int, NBp: int, T: int, prob_bits: int, use_checksum: bool,
    block_tile: int, static_n: int | None,
    container=None, base32: int = 0,
):
    """Stage 2 (section prefill) + payload assembly + archive stitch.

    Shared by the single-archive driver and the batched driver (where it is
    vmapped per member over the batched stage-1 kernel's per-member slices;
    with static_n all offsets are python ints, so the vmapped DUS/slices
    stay strided instead of lowering to gathers). With container/base32
    the whole archive assembles in place inside the caller's prefilled
    buffer (see _encode_stage2)."""
    with annotate("ans.sections"):
        arc, trow, srow, dloc, drot, seed, prow0, size = _encode_stage2(
            staged, counts, states_out, uncomp, checksum, pdf, length,
            L=L, NBp=NBp, T=T, prob_bits=prob_bits, use_checksum=use_checksum,
            block_tile=block_tile, static_n=static_n,
            container=container, base32=base32,
        )
    with annotate("ans.assembly"):
        XR = arc.shape[0] // 128
        asm = _build_assembly_call(NBp, T, XR)
        # the archive input is ALIASED to the output: payload tiles DMA
        # in place, section and tail rows pass through — no XLA stitch
        arc_rows = asm(
            trow, srow, dloc, drot, staged, seed,
            layout.bitcast_i32(arc.reshape(XR, 128)),
        )
    return layout.bitcast_u32(arc_rows).reshape(-1), size


def ans_encode_batched_pallas(
    datas: jnp.ndarray,
    length,
    pdfs: jnp.ndarray,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
    block_tile: int = 256,
    tile_rows: int = 128,
    containers=None,
    container_base: int = 0,
):
    """Encode B independent archives with ONE stage-1 kernel grid.

    The encode analogue of `ans_decode_batched_pallas`: every sublane row
    carries its own member's (pdf|cdf|shift)/magic tables (per-row table
    inputs), so the hot encode loop runs one grid whose tiles SPAN members
    — small members no longer force small (per-op-overhead-bound) tiles the
    way vmapping the single-archive kernel does. Stage 2 + assembly run
    vmapped per member with fully static geometry.

    Args:
      datas: (B, L4) u32 — member m's bytes packed little-endian 4-per-u32,
        zero-padded to L = 4*L4 bytes (a multiple of 4096).
      length: per-member byte count — a python int (all members equal; the
        reference benchmark's batched shape) or a (B,) i32 array.
      pdfs: (B, 256) u32 quantized per-member pdfs (sum 2^prob_bits each).

    Returns (archives (B, A4) u32, sizes (B,) u32) with A4 =
    archive_buffer_bytes_pallas(L, block_tile)//4; SIZE_OVERFLOW_BIT flags
    per-block payload overflow per member.
    """
    B, L4 = datas.shape
    L = 4 * L4
    assert L % C.DEFAULT_BLOCK_SIZE == 0 and L > 0
    NB = L // C.DEFAULT_BLOCK_SIZE
    # member block count padded to the (member-level) assembly tile, so the
    # vmapped stage 2 / assembly see the same geometry as the single driver
    T_asm = C.round_up(max(32, min(block_tile, C.round_up(NB, 32))), 32)
    NBm = C.round_up(NB, T_asm)
    NR_m = NBm // BPR
    rows = B * NR_m

    static_n = length if isinstance(length, int) else None
    lengths = (
        jnp.full((B,), length, _I32)
        if static_n is not None
        else jnp.asarray(length, _I32)
    )

    # largest spanning tile (multiple of 8 rows) that divides the row count
    tile = 0
    for t in range(min(tile_rows, rows), 7, -8):
        if rows % t == 0:
            tile = t
            break
    assert tile > 0, f"no 8-multiple tile divides {rows} rows"

    # per-member block symbol counts -> dense meta rows
    bidx = jnp.arange(NBm, dtype=_I32)
    nbs = (lengths + C.DEFAULT_BLOCK_SIZE - 1) // C.DEFAULT_BLOCK_SIZE
    tails = lengths - (nbs - 1) * C.DEFAULT_BLOCK_SIZE
    uncomp = jnp.where(
        bidx[None, :] < nbs[:, None], C.DEFAULT_BLOCK_SIZE, 0
    )
    uncomp = jnp.where(
        bidx[None, :] == (nbs - 1)[:, None], tails[:, None], uncomp
    ).astype(_I32)
    meta3 = jnp.zeros((B, NR_m, BPR, W), _I32)
    meta3 = meta3.at[:, :, :, 0].set(uncomp.reshape(B, NR_m, BPR))
    meta = meta3.reshape(rows, 128)

    # per-row tables: each member's tables broadcast over its NR_m rows
    dm = _divmode()
    pcs_m, magic_m = jax.vmap(lambda p: build_encode_tables(p, dm))(pdfs)
    pcs_rows = jnp.broadcast_to(
        pcs_m[:, None], (B, NR_m, 2, 128)
    ).reshape(rows, 2, 128)
    magic_rows = jnp.broadcast_to(
        magic_m[:, None], (B, NR_m, 2, 128)
    ).reshape(rows, 2, 128)

    d32 = datas.astype(_I32)
    if NBm > NB:
        d32 = jnp.concatenate(
            [d32, jnp.zeros((B, (NBm - NB) * S * W // 4), _I32)], axis=1
        )
    d32 = d32.reshape(rows, BPR * (S // CHUNK), 128)

    pre = jnp.asarray(_prefix_matrix(), jnp.bfloat16)
    with annotate("ans.encode_kernel_batched"):
        call = _build_encode_call(
            rows * BPR, prob_bits, tile, per_row_tables=True,
            G=_flush_group(), divmode=dm,
            full_tiles=static_n == L and NBm == NB
            and _os.environ.get("DIETGPU_ENCODE_FULLTILES") != "off",
            datamode=_datamode(), flush_stack=_flushstack(),
            flush_pipe=_flushpipe(), slim_carry=_slimcarry_enc(),
            scatter_mode=_scattermode(),
        )
        staged, counts, states_out = call(
            meta, d32, pcs_rows, magic_rows, pre
        )

    checksums = (
        jax.vmap(lambda d, n: checksum_u32(d, n))(datas, lengths)
        if use_checksum
        else jnp.zeros(B, _U32)
    )

    # Cross-member single-grid assembly (DIETGPU_ENCODE_BATCHASM=global):
    # per-member SECTION prefill + ONE assembly grid spanning every
    # member, each member-first tile reseeding the boundary-row spill
    # from its own container rows. Hypothesis was that the B vmapped
    # per-member grids paid ~30 us launch overhead each; MEASURED SLOWER
    # on the v5e (16.6 vs 13.6 ms batched 128x512Ki compress, r4) — the
    # serialized global grid's per-step tilebuf zero + ordered DMA waits
    # cost more than the vmapped launches. Kept as evidence; the vmapped
    # path is the default. (containers= still uses the global path: the
    # vmapped finish cannot target per-member container offsets.)
    use_global = (
        _os.environ.get("DIETGPU_ENCODE_BATCHASM") == "global"
        or containers is not None
    )
    if static_n is not None and use_global:
        if containers is None:
            A4 = archive_buffer_bytes_pallas(L, block_tile) // 4
            containers = jnp.zeros((B, A4), _U32)
            base32 = 0
        else:
            assert containers.shape[0] == B and containers.dtype == _U32
            base32 = container_base

        def stage2_m(st, cnt, sts, unc, ck, pdf, ln, cont):
            arc, trow, srow, dloc, drot, seed, _p, size = _encode_stage2(
                st, cnt, sts, unc, ck, pdf, ln,
                L=L, NBp=NBm, T=T_asm, prob_bits=prob_bits,
                use_checksum=use_checksum, block_tile=block_tile,
                static_n=static_n, container=cont, base32=base32,
            )
            return arc, trow, srow, dloc, drot, seed, size

        with annotate("ans.sections_batched"):
            arcs, trow_m, srow_m, dloc_m, drot_m, seed_m, sizes = jax.vmap(
                stage2_m
            )(
                staged.reshape(B, NR_m, BPR * PAGES, 128),
                counts.reshape(B, NR_m, 128),
                states_out.reshape(B, NR_m, 128),
                uncomp,
                checksums,
                pdfs,
                lengths,
                containers,
            )
        F4 = arcs.shape[1]
        F4r = F4 // 128
        tpm = NBm // T_asm
        RTE = T_asm * (PAGES // 2) + 24
        assert F4r >= RTE, "member stride shorter than an assembly tile"
        moff = jnp.arange(B, dtype=_I32) * F4r
        trow_g = (trow_m + moff[:, None]).reshape(-1)
        mfirst = jnp.tile(
            jnp.concatenate(
                [jnp.ones(1, _I32), jnp.zeros(max(tpm - 1, 0), _I32)]
            ),
            B,
        )
        seeds = (
            jnp.zeros((B, tpm, 8, 128), _I32).at[:, 0].set(seed_m)
        ).reshape(B * tpm * 8, 128)
        with annotate("ans.assembly_batched"):
            asm = _build_assembly_call(
                B * NBm, T_asm, B * F4r, per_tile_seed=True
            )
            arc_rows = asm(
                trow_g, srow_m.reshape(-1), dloc_m.reshape(-1),
                drot_m.reshape(-1), mfirst, staged, seeds,
                layout.bitcast_i32(arcs.reshape(B * F4r, 128)),
            )
        return layout.bitcast_u32(arc_rows).reshape(B, F4), sizes

    finish = functools.partial(
        _encode_finish,
        L=L, NBp=NBm, T=T_asm,
        prob_bits=prob_bits, use_checksum=use_checksum,
        block_tile=block_tile, static_n=static_n,
    )
    return jax.vmap(finish)(
        staged.reshape(B, NR_m, BPR * PAGES, 128),
        counts.reshape(B, NR_m, 128),
        states_out.reshape(B, NR_m, 128),
        uncomp,
        checksums,
        pdfs,
        lengths,
    )


def _validated_encode_tile() -> int:
    v = int(_os.environ.get("DIETGPU_ENCODE_TILE", "512"))
    if v % 32 or not (256 <= v <= 4096):
        raise ValueError(
            f"DIETGPU_ENCODE_TILE={v} must be a multiple of 32 in "
            "[256, 4096]: archive-buffer geometry derives from it, and "
            "values below 256 would under-size containers vs the batched "
            "encoder's fixed 256-block assembly tile"
        )
    return v


# pinned at import (like SPLIT_TILE): the buffer geometry every sizing
# caller derives from this value must agree process-wide — one process
# per A/B arm
_ENCODE_TILE = _validated_encode_tile()


def _encode_tile() -> int:
    """Stage-1 blocks per grid step (hardware sweep knob; 4 blocks per
    sublane row, so 256 blocks = 64 rows). The archive-buffer geometry
    derives from the same value, so every sizing caller must agree —
    hence one env-overridable default, validated and pinned at import.
    v5e sweep (r4 session D/E, 64Mi bf16 full compress): 256 -> 12.94 ms,
    512 -> 12.43, 1024 -> 12.44; 512 is the default."""
    return _ENCODE_TILE


def archive_buffer_bytes_pallas(
    padded_len: int, block_tile: int | None = None
) -> int:
    """Static archive buffer size (512-byte rows, with tile-DMA slack).

    Sized to the larger of:
      * the encoder's own needs — the payload-region DUS (NBp * 10 + 24
        rows at the 8-aligned region start) including encode-tile padding;
      * the dense DECODER's in-place fast path — its last tile's DMA window
        ends <= ds32_rows + NBp_dec * 10 + 56 (pallas_decode.dma_end_rows),
        where NBp_dec <= NB + max(NB // 16, 32) by _pick_tile's padding
        guarantee for ANY decode block_tile.
    The slack is therefore derived from the member's actual tile geometry
    (round 2 added a FIXED worst-case ~5.4 MB per buffer; a 1 MiB member
    now gets a ~1.2x buffer instead of 6.8x — reference bound
    GpuANSEncode.cu:13-25 is ~1.3x).
    """
    if block_tile is None:
        block_tile = _encode_tile()
    NB = padded_len // C.DEFAULT_BLOCK_SIZE
    T = max(32, min(block_tile, C.round_up(NB, 32)))
    T = C.round_up(T, 32)
    NBp = C.round_up(NB, T)
    sect_rows = C.div_up(136 + NBp * 34 + 4, 128)
    encode_rows = C.round_up(sect_rows, 8) + NBp * (PAGES // 2) + 24
    nbp_dec = max(NBp, NB + max(NB // 16, 32))
    decode_rows = (
        C.div_up(138 + 34 * nbp_dec, 128) + nbp_dec * (PAGES // 2) + 128
    )
    return 512 * C.round_up(max(encode_rows, decode_rows), 64)
