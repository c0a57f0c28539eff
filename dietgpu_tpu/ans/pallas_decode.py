"""Pallas TPU rANS decoder — dense-layout Mosaic kernel for the hot loop.

TPU-native redesign of the reference decode kernel (GpuANSDecode.cuh:305-403).

Dense layout (round 2): each sublane row carries FOUR blocks — the 32
interleaved rANS states of block ``4*row + g`` live in lanes ``32g..32g+31``
(the "warp" of GpuANSUtils.cuh:62-65 mapped onto VPU lane groups). Every
ALU phase therefore runs with all 128 lanes active, 4x the useful work per
vector op of the round-1 one-block-per-row layout.

Data movement (the part XLA gathers do ~1000x too slowly on TPU) happens
in-kernel:
  * one DMA per tile pulls the tile's contiguous payload row range from the
    archive (HBM) into VMEM — block payloads are prefix-ordered so a tile's
    streams are contiguous (GpuANSUtils.cuh:219-224);
  * a short scalar loop realigns each block's stream to an 11-row window at
    512-byte granularity (one window buffer per lane group); the residual
    sub-row offset is folded into the read-index arithmetic.

Per decode step the kernel does: two-level symbol lookup via lane-wise
`tpu.dynamic_gather` (2^probBits u8 symbols packed 4/i32, then pdf|cdf<<12
by symbol), the rANS state update, and the backwards u16 stream reads
(GpuANSDecode.cuh:91-104) from per-group 256-word register windows refilled
once per 8 steps by dynamically-bounded page loops. The warp ballot/popc
suffix rank is one MXU matmul against a constant block-diagonal suffix-sum
matrix (4 independent 32-lane groups). Output bytes are packed 4-per-i32
with eight MXU matmuls per 4 steps (one lo/hi pair per sub-step, each a
block-diagonal placement matrix), then rotated into block-contiguous rows.

Everything stays int32: rANS states are < 2^31 (GpuANSUtils.cuh:41) so all
arithmetic is sign-safe; shifts that need unsigned semantics use
lax.shift_right_logical.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from . import layout
from .checksum import checksum_u32

_I32 = jnp.int32
_U32 = jnp.uint32

# perf-debug knob: skip kernel phases to attribute time (output garbage!).
# comma-set of {realign,read,rank,pack,lut}; e.g. DIETGPU_DECODE_ABLATE=read
import os as _os

_ABLATE = frozenset(
    filter(None, _os.environ.get("DIETGPU_DECODE_ABLATE", "").split(","))
)

S = C.STEPS_PER_BLOCK  # 128 steps of 32 symbols per block
W = C.NUM_INTERLEAVED  # 32
MW = C.MAX_COMP_WORDS_PER_BLOCK  # 2560 u16 words
ROWS_PER_BLOCK = MW // 256 + 1  # 11 x (128 u32) rows cover a misaligned stream
CHUNK = 16  # steps per output chunk (16*32 = 512 bytes per block)
GROUP = 4  # steps per window refill / output pack group
BPR = 4  # blocks per sublane row (dense layout)


def _taa(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=1)


def _srl(x, s):
    return jax.lax.shift_right_logical(x, s)


@functools.lru_cache(maxsize=None)
def _pack_matrices():
    """(4,128,128) f32 matrix pairs packing one step's symbols into u32 lanes.

    For sub-step d (of a 4-step group), input lane 32g + w (lane group g,
    rANS lane w) maps to output lane 32g + 8d + w//4, byte w%4. lo covers
    bytes 0/1, hi bytes 2/3 (each accumulated value < 2^16, exact in f32).
    """
    plo = np.zeros((4, 128, 128), np.float32)
    phi = np.zeros((4, 128, 128), np.float32)
    for d in range(4):
        for g in range(BPR):
            for w in range(32):
                src = 32 * g + w
                dst = 32 * g + 8 * d + w // 4
                b = w % 4
                if b == 0:
                    plo[d, src, dst] = 1.0
                elif b == 1:
                    plo[d, src, dst] = 256.0
                elif b == 2:
                    phi[d, src, dst] = 1.0
                else:
                    phi[d, src, dst] = 256.0
    return plo, phi


@functools.lru_cache(maxsize=None)
def _suffix_matrix():
    """(2,128,128) block-diag constants applied to the read mask on the
    MXU. [0] packs BOTH reductions into one matmul: entry = suffix
    (rank[32g+l] = sum_{w >= l} read[32g+w]) + 64 * group-ones, so the
    product is rank + 64*cnt (rank <= 32 < 64; all entries — 65, 64, 1 —
    and the result <= 32 + 64*32 are exact in bf16/f32). One matmul + one
    convert replaces the former two-matmul / two-convert pair. [1] keeps
    the plain group-ones for callers that need cnt alone."""
    m = np.zeros((2, 128, 128), np.float32)
    for g in range(BPR):
        for j in range(32):
            for l in range(j + 1):
                m[0, 32 * g + j, 32 * g + l] = 1.0
        m[1, 32 * g : 32 * g + 32, 32 * g : 32 * g + 32] = 1.0
    m[0] += 64.0 * m[1]
    return m


def _decode_kernel(
    prob_bits: int,
    T: int,
    fuse_ft,  # None for raw byte output; FLOAT_TYPE_* for fused join output
    per_row_tables: bool,
    rt_rows: int,  # tile DMA window rows (>= contiguous payload span)
    # symbol lookup strategy:
    #   "two"  — packed 4-syms/u32 slot table + (pdf|cdf<<12) by symbol
    #            (2 + 2 gathers at pb10)
    #   "rank" — 8-slots/u32 delta table over NONZERO-symbol ranks + one
    #            combined (pdf|cdf|sym) entry table by rank (1 + 2 gathers
    #            at pb10; see build_rank_tables)
    lut_mode: str,
    # refill page loop:
    #   "pergroup"  — 4 gathers + 4 selects per page, bounds from two
    #                 global reductions read back as scalars EVERY refill
    #   "stacked"   — the 4 group streams share ONE (4T, ROWS, 128)
    #                 scratch so each page is one (4T,128) gather + select
    #   "pipelined" — pergroup layout, but each refill's page bounds were
    #                 computed ONE REFILL AHEAD (carried scalars; initial
    #                 bounds scalar-prefetched from the XLA prologue), so
    #                 the vector->scalar readback that feeds the dynamic
    #                 fori bound has 8 steps of decode compute to hide
    #                 behind instead of stalling the loop. Conservative by
    #                 at most one page: base moves <= 128 u32 words per 8
    #                 steps (so minpage drops <= 1) and hi is monotone
    #                 non-increasing. Finished blocks (pos == 0) are
    #                 excluded from the bounds — they never read again —
    #                 so tail tiles stop spanning down to page 0.
    refill_mode: str,
    # how the fused join obtains its nonComp rows:
    #   "xla"     — a pipelined (T,32,128) input pre-sliced by an XLA pass
    #   "alias"   — pipelined bitcast ALIASES of the archive rows (zero
    #               XLA copy; single-tensor / non-spanning geometry)
    #   "tilebuf" — copied out of the payload tile DMA window, which in
    #               spanning-batch mode already covers whole member
    #               regions (zero XLA copy AND zero extra HBM read)
    nc_mode: str,
    with_cksum: bool,
    lazy_refill: bool,
    # drop the dead window carry from the eager chunk loop (see
    # chunk_body); "off" keeps the round-4 7-tensor carry for A/B
    slim_carry: bool,
    act_spec: bool,
    # the driver statically guarantees EVERY block in the grid is full
    # (out_max == nb * 4096, no grid-padding blocks): the per-step activity
    # machinery (threshold compare + three act-selects, ~4 of ~60 ops/step)
    # vanishes for the whole grid. Unlike the ACTSPEC dual-loop experiment
    # (29% SLOWER — pl.when copies defeat Mosaic scheduling) this is a
    # trace-time specialization with a single loop body.
    full_tiles: bool,
    *refs,
):
    # fused checksum: a second (8,128) output accumulates the XOR of every
    # out row across the grid, so `use_checksum=True` decode needs no extra
    # full-output HBM pass (encode-side fusion mirrored; the reference's
    # verify is one small kernel + 3 scalar d2h, GpuANSDecode.cuh:556-591).
    # The ref sits between out_ref and the scratch refs; intercept it here
    # so the per-mode unpacking below stays unchanged.
    if with_cksum:
        nscr = 7 if nc_mode == "tilebuf" else 6
        refs = list(refs)
        cks_ref = refs.pop(-nscr - 1)
        refs = tuple(refs)
    else:
        cks_ref = None
    refill_stack = refill_mode == "stacked"
    refill_pipe = refill_mode == "pipelined"
    if refill_pipe:
        # per-tile initial refill page bounds (SMEM (ntiles, 2)), appended
        # after the standard scalar-prefetch args; intercept here so the
        # per-mode unpacking below stays unchanged
        refs = list(refs)
        rb0_ref = refs.pop(3 if nc_mode == "tilebuf" else 2)
        refs = tuple(refs)
    else:
        rb0_ref = None
    """Hot decode loop; with fuse_ft set, the kernel additionally performs
    the float join in place of the raw byte output — the TPU analogue of
    the reference's fused JoinFloatWriter decode
    (GpuFloatDecompress.cuh:391-521): decoded exponent bytes meet the
    nonComp plane rows (a regular pipelined input) and leave as finished
    float words, never round-tripping through HBM.

    With per_row_tables, the symbol/pdfcdf tables are per-sublane-row
    inputs instead of grid-wide broadcasts — each row can decode against a
    DIFFERENT probability table, so one grid decodes a whole batch of
    independent archives (the reference's grid-stride batch loop,
    GpuANSDecode.cuh:362-402). Zero in-kernel cost: the lane gathers need
    (T,128) operands either way."""
    if fuse_ft is None:
        (
            tile_row0_ref,  # SMEM (ntiles,) payload row of each tile's DMA
            lrow_ref,  # SMEM (NBp,) block's row offset inside its tile buffer
            meta_ref,  # VMEM (T,128): per group g lanes 32g+0..5 =
            #            (uncomp, -, cwords, off32, wordbase, nwords)
            #            of block 4*row + g
            states_ref,  # VMEM (T,128): lanes 32g.. = states of block 4r+g
            symtab_ref,
            pdfcdf_ref,
            plo_ref,  # VMEM (4,128,128) bf16
            phi_ref,  # VMEM (4,128,128) bf16
            suf_ref,  # VMEM (2,128,128) bf16 suffix/group-ones matrices
            arc_ref,  # ANY (XR,128) u32 archive rows
            out_ref,  # VMEM (T, 32, 128): rows 8g+c = chunks of block 4r+g
            tilebuf,  # scratch (RT,128) i32
            st0,  # scratch (T, ROWS_PER_BLOCK, 128) i32, group-0 streams
            st1,
            st2,
            st3,
            dma_sem,
        ) = refs
        nc_ref = nc_lo_ref = nc_hi_ref = None
    elif fuse_ft == C.FLOAT_TYPE_FLOAT32:
        (
            tile_row0_ref,
            lrow_ref,
            meta_ref,
            states_ref,
            symtab_ref,
            pdfcdf_ref,
            plo_ref,
            phi_ref,
            suf_ref,
            nc_lo_ref,  # VMEM (T, 64, 128): low-u16 plane rows of blocks
            #             4r.. — with nc_mode "alias" these are bitcast
            #             ALIASES of the archive rows (lo plane starts at
            #             u32 word 4, so reads shift +4 lanes with a
            #             row-straddle select); "xla" pre-slices them
            *rest_f32,
        ) = refs
        if nc_mode == "alias":
            (lonxt_ref, nc_hi_ref, arc_ref, out_ref, tilebuf, st0, st1,
             st2, st3, dma_sem) = rest_f32
        else:
            lonxt_ref = None
            (nc_hi_ref, arc_ref, out_ref, tilebuf, st0, st1, st2, st3,
             dma_sem) = rest_f32
        nc_ref = None
    else:
        # nc inputs by mode (the nonComp plane starts at u32 word 4, after
        # the 16-byte float header, GpuFloatUtils.cuh:20-74, so the alias
        # and tilebuf modes fold a +4-lane offset into the join's gathers
        # with a row-straddle select):
        #   "xla":     nc_ref (T,32,128) pre-sliced nonComp rows
        #   "alias":   nc_ref + ncnxt_ref — (T,32,128) and (1,32,128)
        #              pipelined bitcast aliases of the archive rows; the
        #              second is the straddle row past the tile
        #   "tilebuf": no nc input; an extra scalar-prefetch ncrow_ref
        #              gives each tile row's 33-row window into tilebuf
        #              (32 nonComp rows of its 4 blocks + 1 straddle row)
        if nc_mode == "tilebuf":
            (
                tile_row0_ref,
                lrow_ref,
                ncrow_ref,
                meta_ref,
                states_ref,
                symtab_ref,
                pdfcdf_ref,
                plo_ref,
                phi_ref,
                suf_ref,
                arc_ref,
                out_ref,
                tilebuf,
                st0,
                st1,
                st2,
                st3,
                ncs,
                dma_sem,
            ) = refs
            nc_ref = ncnxt_ref = None
        else:
            (
                tile_row0_ref,
                lrow_ref,
                meta_ref,
                states_ref,
                symtab_ref,
                pdfcdf_ref,
                plo_ref,
                phi_ref,
                suf_ref,
                nc_ref,
                *rest,
            ) = refs
            if nc_mode == "alias":
                (ncnxt_ref, arc_ref, out_ref, tilebuf, st0, st1, st2, st3,
                 dma_sem) = rest
            else:
                ncnxt_ref = None
                (arc_ref, out_ref, tilebuf, st0, st1, st2, st3,
                 dma_sem) = rest
        nc_lo_ref = nc_hi_ref = None
    K = 1 << prob_bits
    SR = rank_rows(prob_bits) if lut_mode == "rank" else max(K // 512, 1)
    RT = rt_rows  # DMA row counts must be 8-aligned

    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(_I32, (T, 128), 1)
    lane31 = lane & 31
    gid = _srl(lane, 5)  # lane group 0..3
    gbase = lane & ~31
    zeros = jnp.zeros((T, 128), _I32)
    sh0 = ((2 * lane) & 3) << 3  # byte shifts for the fused join
    sh1 = ((2 * lane + 1) & 3) << 3

    # ---- tile-range DMA + per-block realign ----
    # Cross-step DMA pipelining: tile i+1's payload copy is issued as soon
    # as realign() has drained tilebuf for tile i, so the next tile's HBM
    # read overlaps this tile's decode compute. Step 0 issues its own copy;
    # every step waits on the copy issued for it (same descriptor).
    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(
            arc_ref.at[pl.ds(tile_row0_ref[0], RT), :], tilebuf, dma_sem
        ).start()

    pltpu.make_async_copy(
        arc_ref.at[pl.ds(tile_row0_ref[i], RT), :], tilebuf, dma_sem
    ).wait()

    # stacked refill: the four group streams live in ONE scratch (st0,
    # (BPR*T, ROWS, 128), group g's block rows at [g*T, (g+1)*T)) so the
    # refill page loop gathers all four groups in one (4T,128) op
    streams = (st0,) if refill_stack else (st0, st1, st2, st3)

    def realign(r, _):
        b0 = i * (BPR * T) + BPR * r
        for g in range(BPR):
            if refill_stack:
                st0[g * T + r] = tilebuf[
                    pl.ds(lrow_ref[b0 + g], ROWS_PER_BLOCK), :
                ]
            else:
                streams[g][r] = tilebuf[
                    pl.ds(lrow_ref[b0 + g], ROWS_PER_BLOCK), :
                ]
        if nc_mode == "tilebuf":
            # the row's 4 blocks are member-local consecutive, so their
            # 32 nonComp rows are contiguous in the window; +1 straddle
            ncs[r] = tilebuf[pl.ds(ncrow_ref[i * T + r], 33), :]
        return 0

    if "realign" not in _ABLATE:
        jax.lax.fori_loop(0, T, realign, 0, unroll=False)
    else:
        for g in range(BPR):
            if refill_stack:
                st0[g * T] = tilebuf[pl.ds(0, ROWS_PER_BLOCK), :]
            else:
                streams[g][0] = tilebuf[pl.ds(0, ROWS_PER_BLOCK), :]

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        pltpu.make_async_copy(
            arc_ref.at[pl.ds(tile_row0_ref[i + 1], RT), :], tilebuf, dma_sem
        ).start()

    meta = meta_ref[:]
    uncomp = _taa(meta, gbase)  # block symbol count (drives the act mask)
    cwords = _taa(meta, gbase | 2)
    off32 = _taa(meta, gbase | 3)
    if fuse_ft is not None:
        # member-local word base / total word count of block (r, g),
        # broadcast to all 128 lanes per group (loop-invariant)
        wb_g = [_taa(meta, zeros + (32 * g | 4)) for g in range(BPR)]
        nn_g = [_taa(meta, zeros + (32 * g | 5)) for g in range(BPR)]

    if per_row_tables:
        symtab = [symtab_ref[:, r, :] for r in range(SR)]
        pdfcdf = [pdfcdf_ref[:, r, :] for r in range(2)]
    else:
        symtab = [
            jnp.broadcast_to(symtab_ref[r : r + 1, :], (T, 128))
            for r in range(SR)
        ]
        pdfcdf = [
            jnp.broadcast_to(pdfcdf_ref[r : r + 1, :], (T, 128))
            for r in range(2)
        ]
    plo = [plo_ref[d] for d in range(4)]
    phi = [phi_ref[d] for d in range(4)]
    suf = suf_ref[0]
    # loop-invariant hoists: the activity threshold and the lane-group
    # select masks (one compare per step instead of re-deriving both)
    negu = lane31 - uncomp
    gmask = [gid == gg for gg in range(1, BPR)]
    g32 = [zeros + 32 * gg for gg in range(BPR)]  # refill broadcast indices
    if refill_stack:
        lane4 = jax.lax.broadcasted_iota(_I32, (BPR * T, 128), 1)
    if nc_mode == "alias":
        # straddle row for the last subrow's lane+4 reads: the tile's rows
        # shifted up by one, closed by the first row past the tile
        if fuse_ft == C.FLOAT_TYPE_FLOAT32:
            nc_wrap = jnp.concatenate(
                [nc_lo_ref[1:, 0, :], lonxt_ref[:, 0, :]], axis=0
            )
        else:
            nc_wrap = jnp.concatenate(
                [nc_ref[1:, 0, :], ncnxt_ref[:, 0, :]], axis=0
            )

    def one_step(kk, state, posw, wins, masked):
        # lanes past the block's symbol count go inactive; the single
        # hoisted-subtract compare covers full steps, the partial tail
        # step, and dead blocks at once (kk is the step index, 32
        # symbols/step). Grids whose blocks are ALL full (full_tiles) skip
        # the activity machinery entirely (masked=False): every step saves
        # the compare + three act-selects (~7% of the hot loop).
        act = (negu < -(kk << 5)) if masked else None

        s_bar = state & (K - 1)
        if lut_mode == "rank":
            # one delta-table gather -> rank among nonzero symbols, then
            # the combined (pdf | cdf | sym) entry by rank: 3 gathers/step
            # at pb10 where the two-level path needs 4 (build_rank_tables)
            q3 = _srl(s_bar, 3)
            if "lut" not in _ABLATE:
                e = _taa(symtab[0], q3 & 127 if SR > 1 else q3)
                for r in range(1, SR):
                    e = jnp.where(
                        _srl(q3, 7) == r, _taa(symtab[r], q3 & 127), e
                    )
                rk = (e & 0xFF) + (_srl(e, (s_bar & 7) * 3 + 8) & 7)
                pv = jnp.where(
                    rk < 128,
                    _taa(pdfcdf[0], rk & 127),
                    _taa(pdfcdf[1], rk & 127),
                )
            else:
                pv = q3 | (q3 << (2 * prob_bits + 1))
            pdf = pv & ((2 << prob_bits) - 1)
            cdf = _srl(pv, prob_bits + 1) & (K - 1)
            # bits above 2pb+9 are zero, so the shift alone yields sym
            sym = _srl(pv, 2 * prob_bits + 1)
        else:
            q = _srl(s_bar, 2)
            if "lut" not in _ABLATE:
                g = _taa(symtab[0], q & 127)
                for r in range(1, SR):
                    g = jnp.where(
                        _srl(q, 7) == r, _taa(symtab[r], q & 127), g
                    )
                sym = _srl(g, (s_bar & 3) << 3) & 0xFF
                pv = jnp.where(
                    sym < 128,
                    _taa(pdfcdf[0], sym & 127),
                    _taa(pdfcdf[1], sym & 127),
                )
            else:
                sym = q & 0xFF
                pv = sym | (sym << 12)
            pdf = pv & 0xFFF
            # entries are pdf | cdf<<12 with both fields < 2^12 (pb <= 11),
            # so the shift alone yields cdf — no mask op
            cdf = _srl(pv, 12)

        ns = pdf * _srl(state, prob_bits) + (s_bar - cdf)
        state1 = jnp.where(act, ns, state) if masked else ns

        read = state1 < C.ANS_MIN_STATE
        if masked:
            read = act & read
        if "rank" not in _ABLATE:
            rb = read.astype(jnp.bfloat16)
            # one matmul yields rank + 64*cnt packed (see _suffix_matrix)
            rc = jax.lax.dot_general(
                rb, suf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(_I32)
            rank = rc & 63
            cnt = _srl(rc, 6)
        else:
            rank = read.astype(_I32)
            cnt = _taa(rank, gbase)

        # posw is the u16-word stream position RELATIVE to the window base
        # (pos - 2*baseq): the per-step window-base subtract of round 2 is
        # folded into the refill-time rebase. Reading lanes always satisfy
        # rj >= 0 (their reads land inside the window), so the logical
        # shift is safe; non-reading lanes' values are select-discarded.
        rj = posw - rank
        if "read" not in _ABLATE:
            widx = _srl(rj, 1) & 127
            v32 = _taa(wins[0], widx)
            for gg in range(1, BPR):
                v32 = jnp.where(gmask[gg - 1], _taa(wins[gg], widx), v32)
            v16 = _srl(v32, (rj & 1) << 4) & 0xFFFF
        else:
            v16 = rj & 0xFFFF

        state2 = jnp.where(read, (state1 << 16) | v16, state1)
        posw = posw - cnt
        return (jnp.where(act, sym, 0) if masked else sym), state2, posw

    def refill(pos, bnd, reuse_from=None):
        """Per-group 256-u16-word windows covering the next 8 steps' reads.

        One union page loop serves all four groups (four separate
        dynamically-bounded loops drown the scalar core). pos/off32 are
        group-uniform, so base/hi are too: the union page range comes from
        two GLOBAL lane reductions (no per-group min/max chains), and each
        group needs only one broadcast-gather of its base (the round-2
        composite base|hi packing and its per-group unpacks are gone).

        In pipelined mode `bnd` carries this refill's page bounds (computed
        at the PREVIOUS refill, so the scalar readback latency hides behind
        8 steps of compute) and the next refill's bounds are returned.

        Returns baseq = window base minus the block's off32, so the hot
        read path computes widx with one subtract instead of two."""
        hi = off32 + _srl(jnp.maximum(pos - 1, 0), 1)
        base = jnp.maximum(hi - 127, 0)
        if "refill" in _ABLATE:
            return (zeros, zeros, zeros, zeros), base - off32, bnd
        if refill_mode == "static":
            # NO reductions, NO dynamic fori: a fully static unrolled page
            # chain. The dynamic while-loop boundary breaks Mosaic's
            # software pipeline every 8 steps — the r5 bridge kernel
            # measured the dynamic refill machinery at -45% (29.7 -> 16.4
            # G-sym/s) where its vector op count predicts ~-20%. Trading
            # ~3x the refill gathers (all ROWS_PER_BLOCK pages tested,
            # most selects discard) for an unbroken schedule.
            # group-sequential to bound the live set (T=512's scoped VMEM
            # overflowed with all 8 pg/li tensors live across the chain)
            accs = []
            for gg in range(BPR):
                g0 = _taa(base, g32[gg]) + lane
                pg = _srl(g0, 7)
                li = g0 & 127
                acc = zeros
                for p in range(ROWS_PER_BLOCK):
                    acc = jnp.where(
                        pg == p, _taa(streams[gg][:, p, :], li), acc
                    )
                accs.append(acc)
            return tuple(accs), base - off32, bnd
        if refill_mode == "reuse" and reuse_from is not None:
            # second refill of the chunk (m == 1, a PYTHON-static
            # position): reuse the m == 3 refill's page bounds widened by
            # one page — base moves <= 128 u32 words (one page) per
            # refill and hi is monotone non-increasing — halving the two
            # full (T,128) min/max reductions (~63 linear vector ops
            # each) that dominate the refill's fixed cost
            lo = jnp.maximum(reuse_from[0] - 1, 0)
            hi_p = reuse_from[1]
            nbnd = reuse_from
        elif refill_pipe:
            lo, hi_p = bnd
            # next refill's conservative bounds: minpage drops <= 1 per
            # refill; maxpage never rises; finished blocks never read again
            alive = pos > 0
            bact = jnp.where(alive, base, 0x7FFFFFF)
            hact = jnp.where(alive, hi, -1)
            nbnd = (
                jnp.maximum((jnp.min(bact) >> 7) - 1, 0),
                jnp.minimum(jnp.max(hact) >> 7, ROWS_PER_BLOCK - 1),
            )
        else:
            lo = jnp.min(base) >> 7
            hi_p = jnp.minimum(jnp.max(hi) >> 7, ROWS_PER_BLOCK - 1)
            # "reuse" hands this refill's bounds to the chunk's second
            # refill (see above)
            nbnd = (lo, hi_p) if refill_mode == "reuse" else bnd

        if refill_stack:
            # one (4T,128) gather + select per page instead of four
            bg4 = jnp.concatenate(
                [_taa(base, g32[gg]) for gg in range(BPR)], axis=0
            )
            g0 = bg4 + lane4
            pg4 = _srl(g0, 7)
            li4 = g0 & 127

            def page_body(p, acc):
                return jnp.where(pg4 == p, _taa(st0[:, p, :], li4), acc)

            w4 = jax.lax.fori_loop(
                lo, hi_p + 1, page_body, jnp.zeros((BPR * T, 128), _I32)
            )
            wins = tuple(w4[g * T : (g + 1) * T] for g in range(BPR))
            return wins, base - off32, nbnd

        pgs, lis = [], []
        for gg in range(BPR):
            bg = _taa(base, g32[gg])
            g0 = bg + lane
            pgs.append(_srl(g0, 7))
            lis.append(g0 & 127)

        def page_body(p, accs):
            return tuple(
                jnp.where(pgs[gg] == p, _taa(streams[gg][:, p, :], lis[gg]), accs[gg])
                for gg in range(BPR)
            )

        wins = jax.lax.fori_loop(
            lo, hi_p + 1, page_body, (zeros, zeros, zeros, zeros)
        )
        return wins, base - off32, nbnd

    def chunk_body(masked, c, carry):
        if refill_pipe:
            state, posw, bq2, blo, bhi = carry
            bnd = (blo, bhi)
            w0 = w1 = w2 = w3 = None
        elif lazy_refill or not slim_carry:
            state, posw, w0, w1, w2, w3, bq2 = carry
            bnd = None
        else:
            # EAGER carry slimming: the windows never cross the chunk
            # boundary live (m = 3 refills before any step uses them), and
            # loop-carried (T,128) tensors are expensive — the r5 bridge
            # kernel measured 4 extra carried tensors at -34% throughput
            # (45.6 -> 30.0 G-sym/s) even when dead. Keep them body-local.
            state, posw, bq2 = carry
            bnd = None
            w0 = w1 = w2 = w3 = None
        cc = (S // CHUNK) - 1 - c  # chunks processed high-to-low
        packs = [None] * (CHUNK // GROUP)
        chunk_rb = None  # "reuse": the m == 3 refill's bounds for m == 1
        for m in range(CHUNK // GROUP - 1, -1, -1):
            # each per-group window covers two 4-step groups; refill on odd m
            if m % 2 == 1:
                if lazy_refill:
                    # the window covers u32 words [base, base+128); the next
                    # 8 steps read u16 indices >= pos - 256. In window-
                    # relative terms that is simply posw < 256. Worst-case
                    # data consumes the whole window in 8 steps, but typical
                    # N(0,1) exponent streams emit ~5 words/step/block — the
                    # window then lasts ~5x longer, and the page-loop refill
                    # (~16% of kernel time when run eagerly) is skipped until
                    # any live block actually approaches its window base.
                    need = jnp.any((posw < 256) & (posw + bq2 > 0))

                    def _do():
                        pa = posw + bq2
                        wins_n, bq, _ = refill(pa, None)
                        b2 = bq << 1
                        return wins_n, b2, pa - b2

                    (w0, w1, w2, w3), bq2, posw = jax.lax.cond(
                        need,
                        _do,
                        lambda: ((w0, w1, w2, w3), bq2, posw),
                    )
                else:
                    pa = posw + bq2
                    (w0, w1, w2, w3), bq, nb_ = refill(
                        pa, bnd,
                        reuse_from=(
                            chunk_rb if refill_mode == "reuse" else None
                        ),
                    )
                    if refill_mode == "reuse":
                        chunk_rb = nb_
                    else:
                        bnd = nb_
                    bq2 = bq << 1
                    posw = pa - bq2
            wins = (w0, w1, w2, w3)
            syms = [None] * GROUP
            for d in range(GROUP - 1, -1, -1):
                kk = cc * CHUNK + GROUP * m + d
                syms[d], state, posw = one_step(
                    kk, state, posw, wins, masked
                )
            if "pack" in _ABLATE:
                packs[m] = syms[0]
                continue
            lo = None
            hi = None
            for d in range(GROUP):
                sb = syms[d].astype(jnp.bfloat16)
                ld = jax.lax.dot_general(
                    sb, plo[d], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                hd = jax.lax.dot_general(
                    sb, phi[d], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                lo = ld if lo is None else lo + ld
                hi = hd if hi is None else hi + hd
            packs[m] = lo.astype(_I32) | (hi.astype(_I32) << 16)
        # rotate group-local u32 runs into block-contiguous output rows:
        # block (row, g) chunk word u = 32m + w' comes from packs[m] lane
        # 32g + w'
        for g in range(BPR):
            row = None
            for m in range(CHUNK // GROUP):
                piece = pltpu.roll(packs[m], (32 * (m - g)) % 128, 1)
                piece = jnp.where(gid == m, piece, 0)
                row = piece if row is None else row | piece
            if fuse_ft is None:
                out_ref[:, 8 * g + cc, :] = row
                continue
            if fuse_ft == C.FLOAT_TYPE_FLOAT32:
                # fused 3-plane join: row = 512 decoded exponent bytes of
                # block (r,g) chunk cc; meet the low-u16 and high-u8 raw
                # planes and emit finished f32 words (rotr1(exp<<24 |
                # hi<<16 | lo), GpuFloatUtils.cuh:181-203), tail-masked
                jlo = 16 * g + 2 * cc
                if nc_mode == "alias":
                    # archive-aliased lo rows (+4-lane header shift):
                    # need subrows jlo, jlo+1 and the straddle jlo+2
                    # (jlo+2 wraps past 63 only for g == 3's last chunk)
                    if g < BPR - 1:
                        lo2 = nc_lo_ref[:, jlo + 2, :]
                    else:
                        lo2 = jnp.where(
                            cc == (S // CHUNK) - 1,
                            nc_wrap,
                            nc_lo_ref[:, jnp.minimum(jlo + 2, 63), :],
                        )
                    lo_rows = (
                        nc_lo_ref[:, jlo, :],
                        nc_lo_ref[:, jlo + 1, :],
                        lo2,
                    )
                else:
                    lo_rows = (
                        nc_lo_ref[:, jlo, :],
                        nc_lo_ref[:, jlo + 1, :],
                    )
                hi_row = nc_hi_ref[:, 8 * g + cc, :]
                wbase = wb_g[g] + cc * 512
                shb = (lane & 3) << 3
                shh = (lane & 1) << 4
                nn = nn_g[g]
                for p in range(4):
                    qidx = 32 * p + _srl(lane, 2)
                    eb = _srl(_taa(row, qidx), shb) & 0xFF
                    hb = _srl(_taa(hi_row, qidx), shb) & 0xFF
                    lidx = 64 * (p & 1) + _srl(lane, 1)
                    if nc_mode == "alias":
                        ii = (lidx + 4) & 127
                        lo32 = jnp.where(
                            lidx < 124,
                            _taa(lo_rows[p >> 1], ii),
                            _taa(lo_rows[(p >> 1) + 1], ii),
                        )
                    else:
                        lo32 = _taa(lo_rows[p >> 1], lidx)
                    lo16 = _srl(lo32, shh) & 0xFFFF
                    v = (eb << 24) | (hb << 16) | lo16
                    word = _srl(v, 1) | (v << 31)
                    widx = wbase + 128 * p + lane
                    word = jnp.where(widx < nn, word, 0)
                    out_ref[:, 32 * g + 4 * cc + p, :] = word
                continue
            # fused join: row = 512 decoded exponent bytes of block (r,g)
            # chunk cc; combine with the chunk's nonComp row and emit the
            # finished float word-pairs (JoinFloatWriter analogue,
            # GpuFloatUtils.cuh:111-159), tail-masked by the word count
            j = 8 * g + cc
            if nc_mode == "tilebuf":
                # raw archive rows copied by realign: logical nc word w
                # lives at window row j lane+4; subrow 32 is the straddle
                nc_row = ncs[:, j, :]
                nc_row1 = ncs[:, j + 1, :]
            else:
                nc_row = nc_ref[:, j, :]
            if nc_mode == "alias":
                # archive-aliased rows: logical nc word w lives at arc
                # word w+4 — gather at lane+4, straddling into the next
                # subrow for lanes 124..127 (j+1 wraps into nc_wrap; only
                # g == 3 can reach subrow 31)
                if g < BPR - 1:
                    nc_row1 = nc_ref[:, j + 1, :]
                else:
                    nc_row1 = jnp.where(
                        cc == (S // CHUNK) - 1,
                        nc_wrap,
                        nc_ref[:, jnp.minimum(j + 1, 31), :],
                    )
            wbase = wb_g[g] + cc * 512
            for p in range(2):
                qidx = 64 * p + _srl(lane, 1)
                eb = _taa(row, qidx)
                if nc_mode in ("alias", "tilebuf"):
                    ii = (qidx + 4) & 127
                    mb = jnp.where(
                        qidx < 124, _taa(nc_row, ii), _taa(nc_row1, ii)
                    )
                else:
                    mb = _taa(nc_row, qidx)
                c0 = _srl(eb, sh0) & 0xFF
                c1 = _srl(eb, sh1) & 0xFF
                m0 = _srl(mb, sh0) & 0xFF
                m1 = _srl(mb, sh1) & 0xFF
                if fuse_ft == C.FLOAT_TYPE_BFLOAT16:
                    w0j = (c0 << 8) | m0
                    w0j = (_srl(w0j, 1) | (w0j << 15)) & 0xFFFF
                    w1j = (c1 << 8) | m1
                    w1j = (_srl(w1j, 1) | (w1j << 15)) & 0xFFFF
                else:  # f16: comp byte is the high byte
                    w0j = (c0 << 8) | m0
                    w1j = (c1 << 8) | m1
                pair = w0j | (w1j << 16)
                widx0 = wbase + 256 * p + 2 * lane
                nn = nn_g[g]
                pair = jnp.where(
                    widx0 + 1 < nn, pair,
                    jnp.where(widx0 < nn, pair & 0xFFFF, 0),
                )
                out_ref[:, 16 * g + 2 * cc + p, :] = pair
        if refill_pipe:
            return state, posw, bq2, bnd[0], bnd[1]
        if lazy_refill or not slim_carry:
            return state, posw, w0, w1, w2, w3, bq2
        return state, posw, bq2

    if lazy_refill or not slim_carry:
        init = (
            states_ref[:],
            # lazy mode: a huge initial bq2 (with posw shifted to
            # compensate) forces the first refill's need-check true
            cwords - (1 << 29) if lazy_refill else cwords,
            zeros,
            zeros,
            zeros,
            zeros,
            zeros + (1 << 29) if lazy_refill else zeros,
        )
    else:
        init = (states_ref[:], cwords, zeros)
    if refill_pipe:
        # initial page bounds from the XLA prologue (exact for refill 0,
        # which recomputes base from the same pos = cwords)
        init = init + (rb0_ref[i, 0], rb0_ref[i, 1])
    if full_tiles:
        jax.lax.fori_loop(
            0, S // CHUNK, functools.partial(chunk_body, False), init
        )
    elif act_spec:
        # tiles whose blocks are ALL full run the unmasked loop (one traced
        # copy each; the grid picks per tile) — only the final tile of a
        # member carries a partial/dead block and pays the act machinery
        is_full = jnp.all(uncomp == C.DEFAULT_BLOCK_SIZE)

        @pl.when(is_full)
        def _():
            jax.lax.fori_loop(
                0, S // CHUNK, functools.partial(chunk_body, False), init
            )

        @pl.when(jnp.logical_not(is_full))
        def _():
            jax.lax.fori_loop(
                0, S // CHUNK, functools.partial(chunk_body, True), init
            )
    else:
        jax.lax.fori_loop(
            0, S // CHUNK, functools.partial(chunk_body, True), init
        )

    if cks_ref is not None:
        # XOR-fold this tile's out rows (VMEM-resident, tail words already
        # zero-masked) into the running (8,128) digest. ~1 vector op per
        # decode step — no extra HBM traffic.
        if fuse_ft is None:
            n_out_rows = S // CHUNK * BPR
        elif fuse_ft == C.FLOAT_TYPE_FLOAT32:
            n_out_rows = 128
        else:
            n_out_rows = 64
        acc = out_ref[:, 0, :]
        for j in range(1, n_out_rows):
            acc = acc ^ out_ref[:, j, :]
        fold = acc[0:8, :]
        for k in range(1, T // 8):
            fold = fold ^ acc[8 * k : 8 * (k + 1), :]

        @pl.when(i == 0)
        def _():
            cks_ref[:] = fold

        @pl.when(i > 0)
        def _():
            cks_ref[:] = cks_ref[:] ^ fold


@functools.lru_cache(maxsize=None)
def _build_decode_call(
    NBp: int,
    prob_bits: int,
    T: int,
    XR: int,
    fuse_ft=None,
    per_row_tables: bool = False,
    rt_rows: int | None = None,
    nc_mode: str = "xla",
    with_cksum: bool = False,
    lazy_refill: bool = False,
    act_spec: bool = False,
    full_tiles: bool = False,
    lut_mode: str = "two",
    refill_mode: str = "pergroup",
    slim_carry: bool = True,
):
    K = 1 << prob_bits
    SR = rank_rows(prob_bits) if lut_mode == "rank" else max(K // 512, 1)
    grid = NBp // (BPR * T)
    RT = rt_rows if rt_rows is not None else BPR * T * (MW // 256) + 48
    refill_stack = refill_mode == "stacked"
    # the pipelined carry layout is always slim (state, posw, bq2, bounds)
    slim_carry = slim_carry or refill_mode == "pipelined"
    assert not (lazy_refill and refill_mode == "pipelined"), (
        "lazy refill carries its windows under lax.cond; the pipelined "
        "bounds carry is not wired through that path"
    )
    assert nc_mode == "xla" or fuse_ft is not None, (
        "inline nonComp modes exist only for the fused joins"
    )
    assert nc_mode != "tilebuf" or fuse_ft in (
        C.FLOAT_TYPE_FLOAT16, C.FLOAT_TYPE_BFLOAT16
    ), "tilebuf nonComp exists only for the f16/bf16 fused join"

    kernel = functools.partial(
        _decode_kernel, prob_bits, T, fuse_ft, per_row_tables, RT,
        lut_mode, refill_mode, nc_mode,
        with_cksum, lazy_refill, slim_carry, act_spec, full_tiles,
    )
    if per_row_tables:
        table_specs = [
            pl.BlockSpec(
                (T, SR, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (T, 2, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
    else:
        table_specs = [
            pl.BlockSpec(
                (SR, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
    small = [
        pl.BlockSpec((T, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        *table_specs,
        pl.BlockSpec(
            (4, 128, 128), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (4, 128, 128), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (2, 128, 128), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    n_prefetch = 2
    if fuse_ft is None:
        in_specs = small + [pl.BlockSpec(memory_space=pl.ANY)]
        out_spec = pl.BlockSpec(
            (T, S // CHUNK * BPR, 128), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (NBp // BPR, S // CHUNK * BPR, 128), _I32
        )
    elif fuse_ft == C.FLOAT_TYPE_FLOAT32:
        lo_specs = [
            pl.BlockSpec(
                (T, 64, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        if nc_mode == "alias":
            # lo plane aliases the archive's (rows//64, 64, 128) bitcast
            # view (tile i = dim-0 slots [T*i, T*(i+1))), plus one
            # straddle slot; the dynamic-offset hi plane stays pre-sliced
            lo_specs.append(
                pl.BlockSpec(
                    (1, 64, 128), lambda i, *_: (T * (i + 1), 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        in_specs = small + lo_specs + [
            pl.BlockSpec(
                (T, 32, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        out_spec = pl.BlockSpec(
            (T, 128, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((NBp // BPR, 128, 128), _I32)
    else:
        if nc_mode == "alias":
            # both nonComp inputs alias the archive's (rows//32, 32, 128)
            # bitcast view: tile i's nc region is exactly dim-0 slots
            # [T*i, T*(i+1)) (32T archive rows = T tile rows x 4 blocks x
            # 8 rows each), plus one straddle slot for the 16-byte header
            # offset of the last subrow
            in_specs = small + [
                pl.BlockSpec(
                    (T, 32, 128), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 32, 128), lambda i, *_: (T * (i + 1), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
        elif nc_mode == "tilebuf":
            # no nc input at all: the join reads nonComp rows out of the
            # payload DMA window (spanning-batch geometry)
            in_specs = small + [pl.BlockSpec(memory_space=pl.ANY)]
        else:
            in_specs = small + [
                pl.BlockSpec(
                    (T, 32, 128), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
        out_spec = pl.BlockSpec(
            (T, 64, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((NBp // BPR, 64, 128), _I32)

    if refill_stack:
        # one shared stream scratch (group g at rows [g*T, (g+1)*T)); the
        # three trailing dummies keep the kernel's scratch arity fixed
        scratch = [
            pltpu.VMEM((RT, 128), _I32),
            pltpu.VMEM((BPR * T, ROWS_PER_BLOCK, 128), _I32),
            pltpu.VMEM((8, 1, 128), _I32),
            pltpu.VMEM((8, 1, 128), _I32),
            pltpu.VMEM((8, 1, 128), _I32),
        ]
    else:
        scratch = [
            pltpu.VMEM((RT, 128), _I32),
            pltpu.VMEM((T, ROWS_PER_BLOCK, 128), _I32),
            pltpu.VMEM((T, ROWS_PER_BLOCK, 128), _I32),
            pltpu.VMEM((T, ROWS_PER_BLOCK, 128), _I32),
            pltpu.VMEM((T, ROWS_PER_BLOCK, 128), _I32),
        ]
    if nc_mode == "tilebuf":
        n_prefetch = 3  # + per-tile-row nonComp window offsets
        scratch.append(pltpu.VMEM((T, 33, 128), _I32))
    if refill_mode == "pipelined":
        n_prefetch += 1  # + per-tile initial refill page bounds
    scratch.append(pltpu.SemaphoreType.DMA)
    if with_cksum:
        out_spec = [
            out_spec,
            pl.BlockSpec(
                (8, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        out_shape = (out_shape, jax.ShapeDtypeStruct((8, 128), _I32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        # v5e has 128 MB physical VMEM; the default 16 MB scoped budget
        # capped fused tiles at T=80. Raising it lets larger tiles amortize
        # per-vector-op fixed overhead across more sublane rows.
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB physical VMEM; the static refill chain at
            # T=512 needs ~103 MB scoped (r5 session C OOM at 100)
            vmem_limit_bytes=112 * 1024 * 1024
        ),
    )


def _pick_tile(NB: int, block_tile: int) -> int:
    """Largest tile (sublane rows, multiple of 8) up to block_tile//BPR
    whose grid padding wastes <= ~6% of NB. Bigger tiles amortize the
    per-vector-op fixed overhead (v5e: T=128 +18% over T=80 fused;
    T=512 +13% over T=128 raw), but NBp rounds up to a tile multiple, so
    small/odd sizes need smaller tiles."""
    cap = max(8, min(block_tile, C.round_up(NB, BPR)) // BPR)
    cap = C.round_up(cap, 8)
    best = 8
    t = 8
    while t <= cap:
        if C.round_up(NB, BPR * t) - NB <= max(NB // 16, 4 * 8):
            best = t
        t *= 2
    if cap != best and C.round_up(NB, BPR * cap) - NB <= max(NB // 16, 32):
        best = cap
    return best


def build_sym_tables(pdf: jnp.ndarray, prob_bits: int):
    """XLA prologue: packed symbol LUT + (pdf | cdf<<12) table."""
    K = 1 << prob_bits
    SR = max(K // 512, 1)
    incl = jnp.cumsum(pdf.astype(_I32))
    slots = jnp.arange(K, dtype=_I32)
    # searchsorted(incl, slot, 'right') == #(incl <= slot); the comparison
    # matrix lowers to pure vector compares + a reduce, which stays fast
    # under vmap — searchsorted lowers to gathers (~1000x slower on TPU
    # when vmapped over a batch of archives)
    sym = jnp.sum(
        (incl[None, :] <= slots[:, None]).astype(_I32), axis=1
    )
    sym = jnp.minimum(sym, _I32(C.NUM_SYMBOLS - 1))
    # pack 4 syms/u32 with a broadcast-multiply + row reduce: the four
    # minor-dim-4 column slices this replaces each lower to a strided op
    # with heavy per-op dispatch cost on TPU (the prologue is tiny-op bound)
    symtab = jnp.sum(
        sym.reshape(-1, 4) * jnp.array([1, 1 << 8, 1 << 16, 1 << 24], _I32),
        axis=1,
    )
    cdf = incl - pdf.astype(_I32)
    pdfcdf = pdf.astype(_I32) | (cdf << 12)
    return symtab.reshape(SR, 128), pdfcdf.reshape(2, 128)


def rank_rows(prob_bits: int) -> int:
    """Sublane rows of the rank-mode delta table (8 slots per u32)."""
    return max((1 << prob_bits) // 8 // 128, 1)


def build_rank_tables(pdf: jnp.ndarray, prob_bits: int):
    """XLA prologue for the rank-mode decode LUT (one gather fewer/step).

    Two tables:
      * delta table, (2^pb)//8 u32 entries (8 decode slots each): bits 0..7
        hold rank(8i) — the index AMONG NONZERO-pdf SYMBOLS of the symbol
        owning slot 8i — and bits 8+3j hold rank(8i+j) - rank(8i). The
        deltas fit 3 bits because nonzero symbols have strictly increasing
        inclusive cumsums, so at most j run boundaries fall in (8i, 8i+j]
        (the raw symbol id does NOT have this property: zero-pdf symbols
        share cumsums and can make it jump by >7 within a group, which is
        why the round-2 two-level LUT kept a 4-syms-per-u32 table).
      * rank-indexed entry table, 256 u32: for the t-th nonzero symbol,
        pdf | cdf<<(pb+1) | sym<<(2pb+1) — symbol, pdf AND cdf in one
        value, so the hot loop needs one delta gather + the two-row entry
        gather instead of the two-level symtab + pdfcdf pair (the
        reference's one-u32-per-slot LUT, GpuANSDecode.cuh:29-53, needs
        2^pb entries = 8 gather rows here; this layout keeps the per-slot
        table at 2^pb/8 entries).
    """
    K = 1 << prob_bits
    DR = rank_rows(prob_bits)
    NB8 = K // 8
    pdf_i = pdf.astype(_I32)
    incl = jnp.cumsum(pdf_i)
    nz = pdf_i > 0
    # Bin construction instead of the round-4 (K, 256) comparison matrix
    # (8x the needed volume; at B=128 batched it materialized ~134 MB of
    # intermediates): each NONZERO symbol's inclusive cumsum e lands in
    # value-range bin b = (e-1)>>3 at in-bin position t = e - 8b in
    # [1, 8], and
    #   * base rank of entry i = #{nz: e <= 8i} = #{nz: b < i}
    #     = exclusive-cumsum of bin counts,
    #   * position t contributes +1 to the 3-bit delta fields j >= t,
    #     i.e. the closed-form constant V[t] = sum_{j=t..7} 8^j << 8
    #     = ((8^8 - 8^t) / 7) << 8   (V[8] = 0 falls out of the formula).
    # Field carries are impossible: strictly increasing cumsums bound
    # each delta by 7 and the base rank by 255 (the original rank-LUT
    # correctness argument).
    b = _srl(incl - 1, 3)
    t3 = 3 * (incl - (b << 3))
    vt = ((_I32(1 << 24) - (_I32(1) << t3)) // 7) << 8
    bins = jnp.arange(NB8, dtype=_I32)
    onehot = (b[None, :] == bins[:, None]) & nz[None, :]
    cntb = jnp.sum(onehot.astype(_I32), axis=1)
    vsum = jnp.sum(jnp.where(onehot, vt[None, :], 0), axis=1)
    base = jnp.concatenate([jnp.zeros(1, _I32), jnp.cumsum(cntb)[:-1]])
    dtab = base + vsum
    if NB8 < 128 * DR:  # pb9: 64 live entries in one 128-lane row
        dtab = jnp.concatenate(
            [dtab, jnp.zeros(128 * DR - NB8, _I32)]
        )
    # entry table by rank: scatter-free (rank_of_symbol == t) masked sum
    cdf = incl - pdf_i
    sym_ids = jnp.arange(C.NUM_SYMBOLS, dtype=_I32)
    entry = pdf_i | (cdf << (prob_bits + 1)) | (sym_ids << (2 * prob_bits + 1))
    rk_of_sym = jnp.cumsum(nz.astype(_I32)) - 1
    t = jnp.arange(C.NUM_SYMBOLS, dtype=_I32)
    sel = (rk_of_sym[None, :] == t[:, None]) & nz[None, :]
    etab = jnp.sum(jnp.where(sel, entry[None, :], 0), axis=1)
    return dtab.reshape(DR, 128), etab.reshape(2, 128)


def _lut_mode() -> str:
    """Decode symbol-lookup strategy (hardware A/B knob).

    "rank" (default): delta-packed rank table + combined entry table — one
    gather fewer per step at pb10/11 (measured on the v5e, r4 session A:
    5.37 vs 5.62 ms fused bf16 decode at 64Mi words, +4.6%).
    "two": the round-2 two-level symtab + pdfcdf pair."""
    m = _os.environ.get("DIETGPU_DECODE_LUT", "rank")
    if m not in ("two", "rank"):
        raise ValueError(f"DIETGPU_DECODE_LUT={m!r} must be 'two' or 'rank'")
    return m


def _slim_carry() -> bool:
    """Eager chunk-loop carry layout (A/B knob). "on" (default) drops the
    four window tensors from the fori carry — they never cross the chunk
    boundary live in eager mode (m = 3 refills before first use). The r5
    bridge kernel measured 4 extra LIVE loop-carried (T,128) tensors at
    -34% (45.6 -> 30.0 G-sym/s synthetic), but the real-kernel A/B was a
    WASH (r5 session B, 128Mi bf16: 10.06/10.03/10.08 ms on/off/on) —
    Mosaic already dead-code-eliminates the dead carry. Kept as the
    simpler default; "off" reproduces the round-4 7-tensor carry."""
    return _os.environ.get("DIETGPU_DECODE_SLIMCARRY", "on") != "off"


def _refill_mode() -> str:
    """Refill page-loop strategy (hardware A/B knob).

    "pipelined": pergroup layout, page bounds computed one refill ahead
    so the vector->scalar readback feeding the dynamic fori bound hides
    behind 8 steps of compute, and finished blocks are excluded from the
    bounds. Measured a WASH on the v5e (r5 session A, A/B/A at 128Mi
    bf16 fused: 10.20 / 10.31 / 10.09 ms) — Mosaic already hides the
    per-refill scalar readback, so the refill ablation share is the
    page-loop's vector work, not sync stalls. Knob kept as evidence.
    "pergroup" (default): bounds reduced and read back synchronously
    every refill.
    "stacked": one (4T, ROWS, 128) stream scratch so each page is one
    wide gather; measured a wash vs pergroup on the v5e (5.38 vs 5.37 ms
    at 64Mi bf16, r4 session A).
    "static": NO reductions and NO dynamic page loop — a fully static
    unrolled chain over all ROWS_PER_BLOCK pages. Measured a LOSS on the
    v5e (r5 session C, 128Mi bf16 fused A/B/A: 10.04 / 12.41 / 10.03 ms):
    the ~3x extra page gathers outweigh the dynamic-loop overhead they
    remove. Knob kept as evidence.
    "reuse": the chunk's second refill (python-static position m == 1)
    reuses the m == 3 refill's page bounds widened by one page (base
    moves <= one page per refill; hi is monotone non-increasing) —
    halving the two full (T,128) min/max reductions that dominate the
    refill's fixed cost, with no dynamic control flow and no extra
    carries. Measured a LOSS on the v5e (r5 session C2, 128Mi bf16
    fused: 10.07 vs 10.47 ms): the widened page trip at the second
    refill outcosts the saved reductions — the page-trip gathers, not
    the reductions, are the refill's real cost. Knob kept as
    evidence."""
    m = _os.environ.get("DIETGPU_DECODE_REFILL2", "pergroup")
    if m not in ("pergroup", "stacked", "pipelined", "static", "reuse"):
        raise ValueError(
            f"DIETGPU_DECODE_REFILL2={m!r} must be 'pergroup', 'stacked', "
            "'pipelined', 'static' or 'reuse'"
        )
    return m


def _refill_bounds(cwords, off32, T: int):
    """XLA prologue for the pipelined refill: per-tile initial page
    bounds at pos = cwords (exact for refill 0; dead blocks excluded)."""
    hi0 = off32 + jnp.maximum(cwords - 1, 0) // 2
    b0 = jnp.maximum(hi0 - 127, 0)
    alive = cwords > 0
    bact = jnp.where(alive, b0, 0x7FFFFFF).reshape(-1, BPR * T)
    hact = jnp.where(alive, hi0, -1).reshape(-1, BPR * T)
    return jnp.stack(
        [
            jnp.min(bact, axis=1) >> 7,
            jnp.clip(jnp.max(hact, axis=1) >> 7, -1, ROWS_PER_BLOCK - 1),
        ],
        axis=1,
    )


def _decode_tables(pdf, prob_bits: int, lut_mode: str):
    if lut_mode == "rank":
        return build_rank_tables(pdf, prob_bits)
    return build_sym_tables(pdf, prob_bits)


def ans_decode_padded_pallas(
    archive: jnp.ndarray,
    prob_bits: int,
    out_max: int,
    verify_checksum: bool = False,
    block_tile: int = 2048,
    return_u32: bool = False,
    arc_base=None,
    arc_base_bound: int = 0,
    fuse_float=None,
    static_full: bool = False,
):
    """Pallas-backed drop-in for ans_decode_padded (same contract).

    `static_full=True` asserts (statically, from the caller's knowledge of
    the uncompressed length) that the archive holds EXACTLY out_max bytes in
    full 4096-byte blocks: the kernel then drops the per-step activity
    masking for the whole grid (~7% of the hot loop). A lying header cannot
    read out of bounds — it just fails the `success` flag with garbage
    output, exactly like the reference's capacity check
    (GpuANSDecode.cuh:326-340).

    With return_u32=True, `out` is the decoded byte stream packed
    little-endian 4 bytes per u32 (shape (out_max//4,)) — the layout the
    float codec consumes directly. `block_tile` is the number of 4096-byte
    blocks per grid step (a multiple of 32; 4 blocks ride each sublane row).

    `arc_base` (dynamic u32-word offset, default 0) decodes an ANS archive
    embedded inside a larger u32 buffer IN PLACE — no slice copy; the float
    codec uses this to decode straight out of its container. The caller must
    supply the static bound `arc_base_bound >= max possible arc_base`.

    `fuse_float` (FLOAT_TYPE_FLOAT16/BFLOAT16, requires arc_base into a
    float archive) runs the fused decode+join: `out` is then the finished
    float word-pair stream ((out_max//2,) u32, tail-masked), the reference's
    fused JoinFloatWriter path (GpuFloatDecompress.cuh:391-521).
    """
    assert out_max % C.DEFAULT_BLOCK_SIZE == 0 and out_max > 0
    NB = out_max // C.DEFAULT_BLOCK_SIZE
    T = _pick_tile(NB, block_tile)  # sublane rows
    NBp = C.round_up(NB, BPR * T)
    NR = NBp // BPR
    RT = BPR * T * (MW // 256) + 48

    if archive.dtype == jnp.uint8:
        arc32 = layout.u8_to_u32le(archive)
    else:
        assert archive.dtype in (_U32, jnp.int32)
        arc32 = layout.bitcast_u32(archive)
    A32 = arc32.shape[0]
    base = jnp.asarray(0 if arc_base is None else arc_base, _I32)

    # fast path: the buffer itself is row-shaped and long enough that every
    # section slice and the tile DMA stay in bounds — zero padding copies.
    # The DMA bound must cover the worst-case payload END plus a full RT-row
    # tile read past it (a tile's DMA always spans RT rows even when the
    # archive tail is short); archive_buffer_bytes_pallas allocates that
    # slack. Without it, clipping tile_row0 would misalign live streams.
    sect_end = arc_base_bound + 136 + NBp * W + 2 * NBp + 2
    # The last tile's DMA window [tile_row0, tile_row0 + RT) starts at its
    # FIRST block's stream row, which is at most ds32_rows +
    # (NBp - BPR*T) * 10 (every earlier block's payload <= 10 rows), and
    # RT = BPR*T*10 + 48 — so the window never extends more than ~56 rows
    # past the worst-case payload end; RT does NOT add on top of it
    # (round-2 sized buffers for payload + RT, double-counting the last
    # tile's own blocks and fixing ~5.4 MB of slack into every buffer).
    dma_end_rows = (
        C.div_up(arc_base_bound + 138 + 34 * NBp, 128)
        + NBp * (MW // 256)
        + 56
    )
    fast = (
        A32 % 128 == 0
        and A32 // 128 >= dma_end_rows
        and A32 >= sect_end
    )
    if fuse_float is not None:
        assert arc_base is not None, "fused join needs a float-archive base"
        nc_need = NBp * (
            3072 if fuse_float == C.FLOAT_TYPE_FLOAT32
            else C.DEFAULT_BLOCK_SIZE // 4
        )
        fast = fast and A32 >= 4 + nc_need

    h = jax.lax.dynamic_slice(arc32, (base,), (8,))
    magic_ok = h[0] == _U32((C.ANS_MAGIC << 16) | C.ANS_VERSION)
    nb = h[1].astype(_I32)
    n = h[2].astype(_I32)
    options = h[4]
    pb_ok = (options & _U32(0xF)) == _U32(prob_bits)
    has_checksum = (options & _U32(0x10)) != 0
    stored_checksum = h[5]
    capacity_ok = n <= _I32(out_max)
    success = magic_ok & pb_ok & capacity_ok
    nb_eff = jnp.clip(nb, 0, NB)

    pw = jax.lax.dynamic_slice(arc32, (base + 8,), (128,))
    # interleave lo/hi halves via stack+reshape (pdf[2i]=lo[i], pdf[2i+1]=
    # hi[i]); the strided .at[0::2] pair this replaces costs two dispatches
    pdf = jnp.stack([pw & _U32(0xFFFF), pw >> _U32(16)], axis=1).reshape(
        C.NUM_SYMBOLS
    )
    lm = _lut_mode()
    symtab, pdfcdf = _decode_tables(pdf, prob_bits, lm)

    bidx = jnp.arange(NBp, dtype=_I32)
    live = bidx < nb_eff
    bw_start = base + 136 + nb_eff * W
    # blockWords is a contiguous section: one dynamic slice, no gathers
    if fast:
        arc_ext = arc32
    else:
        pad = arc_base_bound + NBp * 34 + 140
        if fuse_float is not None:
            pad += 4 + nc_need
        arc_ext = jnp.concatenate([arc32, jnp.zeros(pad, _U32)])
    bw_flat = jax.lax.dynamic_slice(
        arc_ext, (bw_start,), (2 * NBp + 2,)
    )
    # deinterleave via reshape + unstack (strided 1-D slices lower to a
    # slow strided-copy op on TPU; a (NBp,2) minor-dim view reads cheaper)
    bw2 = bw_flat[: 2 * NBp].reshape(NBp, 2)
    bw_x = jnp.where(live, bw2[:, 0], _U32(0))
    bw_y = jnp.where(live, bw2[:, 1], _U32(0))
    uncomp = (bw_x >> _U32(16)).astype(_I32)
    cwords = (bw_x & _U32(0xFFFF)).astype(_I32)
    starts = bw_y.astype(_I32)
    rnb2 = nb_eff + (nb_eff & 1)
    ds32 = bw_start + rnb2 * 2  # u32 offset of the payload


    # per-block payload geometry (u32 rows of 128)
    s32 = ds32 + (starts >> 1)  # first u32 of the block's stream
    row0 = s32 >> 7  # s32 is non-negative i32, arithmetic shift is fine
    off32 = s32 & 127

    # dense meta: lanes 32g+0..5 of row r = fields of block 4r+g
    # (lanes 4/5 feed the fused join's tail masking: member-local word base
    # and total word count — per-block so one grid can span many archives)
    # one stack+pad instead of five chained scatter-updates on the padded
    # (NR, BPR, 32) layout (each DUS is its own dispatched op; the decode
    # prologue is tiny-op bound)
    meta3 = jnp.stack(
        [
            uncomp,
            jnp.zeros_like(uncomp),
            cwords,
            off32,
            bidx * C.DEFAULT_BLOCK_SIZE,
            jnp.broadcast_to(jnp.clip(n, 0, out_max), uncomp.shape),
        ],
        axis=1,
    )
    meta = jnp.pad(meta3, ((0, 0), (0, W - 6))).reshape(NR, 128)

    # states is a contiguous section; slice + reshape — dense layout: row r
    # lanes 32g..32g+31 = block 4r+g states
    st_flat = jax.lax.dynamic_slice(arc_ext, (base + 136,), (NBp * W,))
    states = st_flat.reshape(NBp, W)
    states = jnp.where(live[:, None], states, _U32(C.ANS_START_STATE))
    states128 = layout.bitcast_i32(states).reshape(NR, 128)

    # tile geometry for the tile-range DMA (in-place on the fast path).
    # Clip BEFORE deriving lrow so the per-block window offsets always agree
    # with the actual DMA start (the clip only ever fires for tiles with no
    # live blocks, given the dma_end_rows slack guarantee).
    if fast:
        need_rows = A32 // 128
        arc_rows = layout.bitcast_i32(arc32).reshape(need_rows, 128)
    else:
        need_rows = int(C.div_up(A32, 128)) + RT + 1
        if fuse_float in (C.FLOAT_TYPE_FLOAT16, C.FLOAT_TYPE_BFLOAT16):
            # inline-nc aliasing needs a 32-row-aligned buffer covering
            # the straddle slot past the last tile's nonComp region
            need_rows = C.round_up(max(need_rows, 8 * NBp + 32), 32)
        elif fuse_float == C.FLOAT_TYPE_FLOAT32:
            # lo-plane aliasing: 64-row slots + straddle slot
            need_rows = C.round_up(max(need_rows, 16 * NBp + 64), 64)
        arc_rows = jnp.zeros((need_rows * 128,), _U32).at[:A32].set(arc32)
        arc_rows = layout.bitcast_i32(arc_rows).reshape(need_rows, 128)
    tile_row0 = row0[0 :: BPR * T] & ~7  # 8-row-aligned DMA sources
    tile_row0 = jnp.clip(tile_row0, 0, need_rows - RT)
    lrow = jnp.clip(
        row0 - jnp.repeat(tile_row0, BPR * T), 0, RT - ROWS_PER_BLOCK
    )

    plo_np, phi_np = _pack_matrices()
    plo = jnp.asarray(plo_np, jnp.bfloat16)
    phi = jnp.asarray(phi_np, jnp.bfloat16)
    suf = jnp.asarray(_suffix_matrix(), jnp.bfloat16)
    # f16/bf16 fused join: when the buffer is 32-row-aligned with room for
    # the straddle slot, the nonComp plane rides as bitcast ALIASES of the
    # archive rows — no XLA plane copy (half the input bytes) at all
    if (
        fuse_float in (C.FLOAT_TYPE_FLOAT16, C.FLOAT_TYPE_BFLOAT16)
        and need_rows % 32 == 0
        and need_rows >= 8 * NBp + 32
    ):
        nc_mode = "alias"
    elif (
        fuse_float == C.FLOAT_TYPE_FLOAT32
        and need_rows % 64 == 0
        and need_rows >= 16 * NBp + 64
    ):
        nc_mode = "alias"
    else:
        nc_mode = "xla"
    if _os.environ.get("DIETGPU_DECODE_NCMODE") == "xla":
        nc_mode = "xla"  # hardware A/B knob: force the XLA-slice path
    rm = _refill_mode()
    call = _build_decode_call(
        NBp, prob_bits, T, need_rows, fuse_float, nc_mode=nc_mode,
        with_cksum=verify_checksum,
        lazy_refill=_os.environ.get("DIETGPU_DECODE_REFILL") == "lazy",
        act_spec=_os.environ.get("DIETGPU_DECODE_ACTSPEC") == "on",
        # every block full AND no grid-padding blocks -> unmasked hot loop
        full_tiles=static_full and NBp == NB
        and _os.environ.get("DIETGPU_DECODE_FULLTILES") != "off",
        lut_mode=lm, refill_mode=rm, slim_carry=_slim_carry(),
    )
    if rm == "pipelined":
        # insert the per-tile initial page bounds after the two standard
        # scalar-prefetch args at every call site below
        rbnd = _refill_bounds(cwords, off32, T)
        _call0 = call
        call = lambda t0, lr, *rest: _call0(t0, lr, rbnd, *rest)

    def _digest(call_out):
        """Unpack (out, cks) when the fused checksum rides along; fold the
        (8,128) XOR accumulator to the 8-bit checksum value."""
        if not verify_checksum:
            return call_out, None
        out, cks = call_out
        acc = jax.lax.reduce(
            cks.astype(_U32), _U32(0), jax.lax.bitwise_xor, (0, 1)
        )
        from .checksum import _fold8

        return out, _fold8(acc)

    result = {
        "size": n.astype(_U32),
        "success": success,
        "checksum_ok": jnp.bool_(True),
    }
    if fuse_float == C.FLOAT_TYPE_FLOAT32:
        # f32 fused 3-plane join: low-u16 and high-u8 raw planes ride as
        # pipelined inputs. Block b's plane data sits at static offsets
        # WITHIN each plane (b*8192 / b*4096 bytes); only the hi plane's
        # base depends on the dynamic length (lo plane is
        # 2*roundUp(n,8) bytes, GpuFloatUtils.cuh:181-203). Reads past a
        # partial tail block's plane data are masked by the word count.
        n_eff = jnp.clip(n, 0, out_max)
        lo_len32 = C.round_up(n_eff, 8) >> 1
        hi_flat = jax.lax.dynamic_slice(
            arc_ext, (4 + lo_len32,), (NBp * 1024,)
        )
        hi3 = layout.bitcast_i32(hi_flat).reshape(NBp // BPR, 32, 128)
        if nc_mode == "alias":
            # zero-copy lo plane: bitcast 64-row-slot view of the buffer
            arc64 = arc_rows.reshape(need_rows // 64, 64, 128)
            out, dig = _digest(call(
                tile_row0, lrow, meta, states128, symtab, pdfcdf, plo,
                phi, suf, arc64, arc64, hi3, arc_rows,
            ))
        else:
            lo_flat = jax.lax.dynamic_slice(arc_ext, (4,), (NBp * 2048,))
            lo3 = layout.bitcast_i32(lo_flat).reshape(NBp // BPR, 64, 128)
            out, dig = _digest(call(
                tile_row0, lrow, meta, states128, symtab, pdfcdf, plo,
                phi, suf, lo3, hi3, arc_rows,
            ))
        result["out"] = layout.bitcast_u32(out).reshape(
            NBp * C.DEFAULT_BLOCK_SIZE
        )[:out_max]
        if dig is not None:
            result["checksum_digest"] = dig
        return result
    if fuse_float is not None:
        if nc_mode == "alias":
            # zero-copy: both nc inputs are a bitcast 3-D view of the rows
            arc3 = arc_rows.reshape(need_rows // 32, 32, 128)
            out, dig = _digest(call(
                tile_row0, lrow, meta, states128, symtab, pdfcdf, plo, phi,
                suf, arc3, arc3, arc_rows,
            ))
        else:
            # nonComp plane rows for the fused join: a pipelined input
            # built by an XLA slice (fallback for odd buffer shapes)
            nc_flat = jax.lax.dynamic_slice(
                arc_ext, (4,), (NBp * (C.DEFAULT_BLOCK_SIZE // 4),)
            )
            nc3 = layout.bitcast_i32(nc_flat).reshape(NBp // BPR, 32, 128)
            out, dig = _digest(call(
                tile_row0, lrow, meta, states128, symtab, pdfcdf, plo, phi,
                suf, nc3, arc_rows,
            ))
        result["out"] = layout.bitcast_u32(out).reshape(
            NBp * (C.DEFAULT_BLOCK_SIZE // 2)
        )[: out_max // 2]
        if dig is not None:
            result["checksum_digest"] = dig
        return result

    out32, dig = _digest(call(
        tile_row0, lrow, meta, states128, symtab, pdfcdf, plo, phi, suf,
        arc_rows,
    ))

    out32 = layout.bitcast_u32(out32).reshape(NBp * S * W // 4)[
        : out_max // 4
    ]
    if verify_checksum:
        # fused digest: bytes past n are zero in the kernel output, so the
        # full-buffer XOR equals the length-masked checksum — no extra
        # HBM pass over the decoded output (was checksum_u32(out32, n))
        result["checksum_ok"] = ~has_checksum | (dig == stored_checksum)
    if return_u32:
        result["out"] = out32
        return result

    out = layout.u32_to_u8le(out32)
    result["out"] = out
    return result


def ans_decode_batched_pallas(
    archives: jnp.ndarray,
    prob_bits: int,
    out_max: int,
    block_tile: int = 512,
    arc_base=None,
    arc_base_bound: int = 0,
    fuse_float=None,
    static_nb: int | None = None,
    f32_hi_off: int | None = None,
    static_full: bool = False,
):
    """Decode B independent archives with ONE kernel grid.

    The TPU analogue of the reference's batched decode (a grid-stride loop
    over batch elements, GpuANSDecode.cuh:362-402): every sublane row
    carries its own member's symbol/pdfcdf tables (per-row table inputs),
    so the whole batch is one `pallas_call` — vmap over the single-archive
    kernel would serialize the B small grids instead.

    Args:
      archives: (B, F4) u32 — member m's archive starts at word m*F4. Use
        `float_archive_u32_bytes` / `archive_buffer_bytes_pallas` strides so
        each member's region carries the fast-path DMA slack.
      out_max: per-member output byte capacity (equal across members; the
        actual sizes may be ragged — they come from each member's header).
      arc_base: None, a python int (same for every member), or (B,) i32 —
        member-local u32 offsets of the embedded ANS archives (float
        containers); `arc_base_bound` bounds them.
      fuse_float: FLOAT_TYPE_FLOAT16/BFLOAT16 for the fused decode+join.
      static_nb: per-member block count when known at trace time. With a
        static arc_base this makes EVERY per-member section offset static,
        so the vmapped prologue lowers to plain strided slices — without
        it, member-dependent `dynamic_slice` starts become XLA gathers,
        which run ~1000x slower than copies on this TPU and dominate the
        whole decode.
      f32_hi_off: (fuse_float=f32 only) static member-local u32 offset of
        the high-u8 raw plane (4 + roundUp(n,8)/2); None derives it per
        member from the headers (slow ragged path).

    Returns dict: out (B, out_max//4) u32 raw bytes (or (B, out_max//2)
    float word-pairs when fused), size (B,) u32, success (B,) bool.
    """
    assert out_max % C.DEFAULT_BLOCK_SIZE == 0 and out_max > 0
    B, F4 = archives.shape
    assert archives.dtype in (_U32, jnp.int32)
    assert F4 % 128 == 0, "member stride must be 512-byte aligned"
    F4r = F4 // 128
    NB = out_max // C.DEFAULT_BLOCK_SIZE
    K = 1 << prob_bits
    lm = _lut_mode()
    SR = rank_rows(prob_bits) if lm == "rank" else max(K // 512, 1)

    # Tile choice. Small members would force member-sized (slow) tiles if
    # tiles could not cross member boundaries; instead let a tile span k
    # members by widening its DMA window to cover k+1 member strides (the
    # payload rows of spanned members are NOT contiguous — the window must
    # bridge the per-member header/nonComp/slack gaps).
    T_aligned = _pick_tile(NB, block_tile)
    NBp_min = C.round_up(NB, BPR)
    Tcap = C.round_up(max(8, min(block_tile, 2048) // BPR), 8)
    spanning = None
    if NBp_min < BPR * Tcap:
        NRm = NBp_min // BPR
        for Tc in range(Tcap, T_aligned, -8):
            if (B * NRm) % Tc:
                continue
            k = C.div_up(BPR * Tc, NBp_min)
            rt = C.round_up((k + 1) * F4r + 56, 8)
            if rt * 512 > 12 * 1024 * 1024:  # tilebuf VMEM budget
                continue
            if rt + 8 > B * F4r:  # window must fit in the whole buffer
                continue
            spanning = (Tc, rt)
            break
    if spanning is not None:
        T, RT = spanning
        NBp = NBp_min
    else:
        T = T_aligned
        NBp = C.round_up(NB, BPR * T)  # tiles never span members
        RT = BPR * T * (MW // 256) + 48
    NR = NBp // BPR

    # fast-path guarantees, per member (same bounds as the single driver)
    sect_end = arc_base_bound + 136 + NBp * W + 2 * NBp + 2
    payload_end_rows = (
        C.div_up(arc_base_bound + 138 + 34 * NBp, 128) + NBp * (MW // 256)
    )
    if spanning is None:
        # the last tile's window starts at its first block's stream row, so
        # it ends <= payload_end_rows + 56 (see the single-archive driver);
        # earlier members' windows may bleed into the next member's region,
        # which realign never reads
        assert F4r >= payload_end_rows + 56 and F4 >= sect_end, (
            "member stride lacks DMA slack: use archive_buffer_bytes_pallas/"
            "float_archive_u32_bytes strides"
        )
    else:
        # spanning tiles clip against the buffer end; live payload only
        # needs to end >= 16 rows before each member stride
        assert F4r >= payload_end_rows + 16 and F4 >= sect_end, (
            "member stride lacks payload slack"
        )
    if fuse_float is not None:
        assert arc_base is not None
        assert F4 >= 4 + NBp * (
            3072 if fuse_float == C.FLOAT_TYPE_FLOAT32
            else C.DEFAULT_BLOCK_SIZE // 4
        )
    static_base = (
        arc_base if isinstance(arc_base, int)
        else (0 if arc_base is None else None)
    )
    if static_base is None:
        bases = jnp.asarray(arc_base, _I32)
        assert bases.shape == (B,)
    else:
        bases = jnp.zeros(B, _I32)  # unused
    # the member geometry is fully static iff both base and nb are static
    nb_s = min(static_nb, NB) if static_nb is not None else None
    static_geom = static_base is not None and nb_s is not None

    def member_prologue(arc32, base):
        # mirrors the single-archive fast-path prologue above. With
        # static_geom every slice start below is a python int, so vmap
        # emits strided slices; otherwise member-dependent starts lower
        # to (slow) gathers — acceptable only for the ragged general case.
        arc32 = layout.bitcast_u32(arc32)
        if static_base is not None:
            base = static_base
        h = jax.lax.dynamic_slice(arc32, (base,), (8,))
        magic_ok = h[0] == _U32((C.ANS_MAGIC << 16) | C.ANS_VERSION)
        nb = h[1].astype(_I32)
        n = h[2].astype(_I32)
        options = h[4]
        pb_ok = (options & _U32(0xF)) == _U32(prob_bits)
        success = magic_ok & pb_ok & (n <= _I32(out_max))
        nb_eff = jnp.clip(nb, 0, NB)

        pw = jax.lax.dynamic_slice(arc32, (base + 8,), (128,))
        pdf = jnp.stack(
            [pw & _U32(0xFFFF), pw >> _U32(16)], axis=1
        ).reshape(C.NUM_SYMBOLS)
        symtab, pdfcdf = _decode_tables(pdf, prob_bits, lm)

        bidx = jnp.arange(NBp, dtype=_I32)
        if static_geom:
            # geometry from the static block count; a header mismatch
            # cannot corrupt memory (reads stay in the member's region) —
            # it just fails the success flag
            success = success & (nb == nb_s)
            live = (bidx < nb_s) & (bidx < nb_eff)
            bw_start = base + 136 + nb_s * W
            rnb2 = nb_s + (nb_s & 1)
        else:
            live = bidx < nb_eff
            bw_start = base + 136 + nb_eff * W
            rnb2 = nb_eff + (nb_eff & 1)
        bw_flat = jax.lax.dynamic_slice(arc32, (bw_start,), (2 * NBp + 2,))
        bw2 = bw_flat[: 2 * NBp].reshape(NBp, 2)
        bw_x = jnp.where(live, bw2[:, 0], _U32(0))
        bw_y = jnp.where(live, bw2[:, 1], _U32(0))
        uncomp = (bw_x >> _U32(16)).astype(_I32)
        cwords = (bw_x & _U32(0xFFFF)).astype(_I32)
        starts = bw_y.astype(_I32)
        ds32 = bw_start + rnb2 * 2

        s32 = ds32 + (starts >> 1)
        row0 = s32 >> 7
        off32 = s32 & 127

        meta3 = jnp.stack(
            [
                uncomp,
                jnp.zeros_like(uncomp),
                cwords,
                off32,
                bidx * C.DEFAULT_BLOCK_SIZE,
                jnp.broadcast_to(jnp.clip(n, 0, out_max), uncomp.shape),
            ],
            axis=1,
        )
        meta = jnp.pad(meta3, ((0, 0), (0, W - 6))).reshape(NR, 128)

        st_flat = jax.lax.dynamic_slice(arc32, (base + 136,), (NBp * W,))
        states = st_flat.reshape(NBp, W)
        states = jnp.where(live[:, None], states, _U32(C.ANS_START_STATE))
        states128 = layout.bitcast_i32(states).reshape(NR, 128)
        return meta, states128, symtab, pdfcdf, row0, success, n

    meta, states128, symtab, pdfcdf, row0, success, n = jax.vmap(
        member_prologue
    )(archives, bases)

    need_rows = B * F4r
    glob_row0 = (row0 + (jnp.arange(B, dtype=_I32) * F4r)[:, None]).reshape(
        B * NBp
    )
    nc_mode = "xla"
    if spanning is not None:
        # start each tile's DMA window at its first member's REGION start:
        # the (k+1)-member-stride window then also covers the spanned
        # members' nonComp planes, so the fused f16/bf16 join reads them
        # straight out of tilebuf — no XLA plane slice, no extra HBM read
        ntiles = (B * NBp) // (BPR * T)
        t_first = jnp.arange(ntiles, dtype=_I32) * (BPR * T)
        tile_row0 = ((t_first // NBp) * F4r) & ~7
        if fuse_float in (
            C.FLOAT_TYPE_FLOAT16, C.FLOAT_TYPE_BFLOAT16
        ) and _os.environ.get("DIETGPU_DECODE_NCMODE") != "xla":
            nc_mode = "tilebuf"
    else:
        tile_row0 = glob_row0[0 :: BPR * T] & ~7  # 8-row-aligned DMA
    # the end-of-buffer clip (which spanning tiles hit by design) must also
    # land on an 8-row boundary — unaligned DMA starts crash the TPU worker
    tile_row0 = jnp.clip(tile_row0, 0, (need_rows - RT) & ~7)
    lrow = jnp.clip(
        glob_row0 - jnp.repeat(tile_row0, BPR * T), 0, RT - ROWS_PER_BLOCK
    )
    if nc_mode == "tilebuf":
        # per tile row: window offset of its 4 blocks' 32 contiguous
        # nonComp rows (+1 straddle row for the header's +4 lane shift)
        gr = jnp.arange(B * NR, dtype=_I32)
        ncrow = (
            (gr // NR) * F4r
            + 32 * (gr % NR)
            - jnp.repeat(tile_row0, T)
        )
        ncrow = jnp.clip(ncrow, 0, RT - 33)

    meta = meta.reshape(B * NR, 128)
    states128 = states128.reshape(B * NR, 128)
    # per-row tables: each member's tables broadcast over its NR rows
    symtab_rows = jnp.broadcast_to(
        symtab[:, None], (B, NR, SR, 128)
    ).reshape(B * NR, SR, 128)
    pdfcdf_rows = jnp.broadcast_to(
        pdfcdf[:, None], (B, NR, 2, 128)
    ).reshape(B * NR, 2, 128)

    arc_rows = layout.bitcast_i32(archives.reshape(-1)).reshape(
        need_rows, 128
    )
    plo_np, phi_np = _pack_matrices()
    plo = jnp.asarray(plo_np, jnp.bfloat16)
    phi = jnp.asarray(phi_np, jnp.bfloat16)
    suf = jnp.asarray(_suffix_matrix(), jnp.bfloat16)
    rm = _refill_mode()
    call = _build_decode_call(
        B * NBp, prob_bits, T, need_rows, fuse_float, per_row_tables=True,
        rt_rows=RT, nc_mode=nc_mode,
        lazy_refill=_os.environ.get("DIETGPU_DECODE_REFILL") == "lazy",
        act_spec=_os.environ.get("DIETGPU_DECODE_ACTSPEC") == "on",
        # static member geometry with every block full -> unmasked hot loop
        full_tiles=static_full and static_geom and NBp == NB
        and _os.environ.get("DIETGPU_DECODE_FULLTILES") != "off",
        lut_mode=lm, refill_mode=rm, slim_carry=_slim_carry(),
    )
    if rm == "pipelined":
        # per-tile initial page bounds over the batch-flattened block
        # order (meta lane layout: lanes 32g+2/32g+3 = cwords/off32)
        cw_flat = meta.reshape(B * NBp // BPR, BPR, 32)[:, :, 2].reshape(-1)
        o32_flat = meta.reshape(B * NBp // BPR, BPR, 32)[:, :, 3].reshape(-1)
        rbnd = _refill_bounds(cw_flat, o32_flat, T)
        _call0 = call
        if nc_mode == "tilebuf":
            call = lambda t0, lr, nc, *rest: _call0(t0, lr, nc, rbnd, *rest)
        else:
            call = lambda t0, lr, *rest: _call0(t0, lr, rbnd, *rest)
    result = {"size": n.astype(_U32), "success": success}
    if fuse_float == C.FLOAT_TYPE_FLOAT32:
        # 3-plane fused join: per-member lo/hi raw-plane slices. The hi
        # plane's base depends on each member's length; with static
        # geometry it is a python int and the vmapped slices stay strided
        lo3 = jax.vmap(
            lambda a: jax.lax.dynamic_slice(a, (4,), (NBp * 2048,))
        )(archives.astype(_I32)).reshape(B * NR, 64, 128)
        if f32_hi_off is not None:
            hi3 = jax.vmap(
                lambda a: jax.lax.dynamic_slice(
                    a, (f32_hi_off,), (NBp * 1024,)
                )
            )(layout.bitcast_i32(archives)).reshape(B * NR, 32, 128)
        else:
            hi_offs = 4 + (
                C.round_up(jnp.clip(n, 0, out_max), 8) >> 1
            ).astype(_I32)
            hi3 = jax.vmap(
                lambda a, o: jax.lax.dynamic_slice(a, (o,), (NBp * 1024,))
            )(
                layout.bitcast_i32(archives), hi_offs
            ).reshape(B * NR, 32, 128)
        out = call(
            tile_row0, lrow, meta, states128, symtab_rows, pdfcdf_rows,
            plo, phi, suf, lo3, hi3, arc_rows,
        )
        result["out"] = layout.bitcast_u32(out).reshape(
            B, NBp * C.DEFAULT_BLOCK_SIZE
        )[:, :out_max]
        return result
    if fuse_float is not None:
        if nc_mode == "tilebuf":
            # zero-copy: the join reads nonComp rows out of the payload
            # DMA window (covered by the member-region window start)
            out = call(
                tile_row0, lrow, ncrow, meta, states128, symtab_rows,
                pdfcdf_rows, plo, phi, suf, arc_rows,
            )
        else:
            nc3 = jax.vmap(
                lambda a: jax.lax.dynamic_slice(
                    a, (4,), (NBp * (C.DEFAULT_BLOCK_SIZE // 4),)
                )
            )(archives.astype(_I32)).reshape(B * NR, 32, 128)
            out = call(
                tile_row0, lrow, meta, states128, symtab_rows, pdfcdf_rows,
                plo, phi, suf, nc3, arc_rows,
            )
        result["out"] = layout.bitcast_u32(out).reshape(
            B, NBp * (C.DEFAULT_BLOCK_SIZE // 2)
        )[:, : out_max // 2]
        return result

    out32 = call(
        tile_row0, lrow, meta, states128, symtab_rows, pdfcdf_rows, plo, phi,
        suf, arc_rows,
    )
    result["out"] = layout.bitcast_u32(out32).reshape(
        B, NBp * S * W // 4
    )[:, : out_max // 4]
    return result
