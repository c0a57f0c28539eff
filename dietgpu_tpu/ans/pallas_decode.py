"""Pallas TPU rANS decoder — the hot decode loop as a Mosaic kernel.

TPU-native redesign of the reference decode kernel (GpuANSDecode.cuh:305-403):
the warp-per-block loop becomes a grid of block tiles; each tile holds T
blocks, one block per sublane row, with the 32 interleaved rANS states in
lanes 0..31. All per-symbol table lookups are lane-wise `tpu.dynamic_gather`s
(the only fast gather on TPU): the 2^probBits -> symbol LUT is packed four
u8 symbols per i32 so a lookup is K/512 row-gathers, and (pdf | cdf<<12) is a
256-entry two-row gather. The backwards u16 stream reads
(GpuANSDecode.cuh:91-104) are handled by staging each block's stream
*reversed* and packed two words per i32 (XLA prologue, runs at HBM speed), so
every block's read pointer starts at 0 and advances monotonically; per step
the readers gather from a small window of 128-lane pages selected by a
dynamically-bounded page loop. Warp ballot/popc becomes a suffix-sum over
lanes via 5 static rolls; output bytes are packed 4-per-i32 with two MXU
matmuls per 4 steps and stored one 512-byte chunk at a time.

Everything stays int32: rANS states are < 2^31 (GpuANSUtils.cuh:41) so all
arithmetic is sign-safe.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from .checksum import checksum_u8

_I32 = jnp.int32
_U32 = jnp.uint32

S = C.STEPS_PER_BLOCK  # 128 steps of 32 symbols per block
W = C.NUM_INTERLEAVED  # 32
MW = C.MAX_COMP_WORDS_PER_BLOCK  # 2560 u16 words
MW2 = MW // 2  # 1280 packed i32
PAGES = MW2 // 128  # 10
CHUNK = 16  # steps per unrolled output chunk (16*32 = 512 bytes)


def _taa(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=1)


def _pack_matrices():
    """(128,128) bf16 matrices turning 4 steps' symbols into packed u32 lanes.

    Input lane j = 32*d + w (sub-step d, rANS lane w) maps to output lane
    Lg = 8*d + w//4, byte w%4 of the packed word. lo covers bytes 0/1,
    hi covers bytes 2/3 (so each matmul result stays < 2^16, exact in f32).
    """
    plo = np.zeros((128, 128), np.float32)
    phi = np.zeros((128, 128), np.float32)
    for d in range(4):
        for w in range(32):
            j = 32 * d + w
            lg = 8 * d + w // 4
            b = w % 4
            if b == 0:
                plo[j, lg] = 1.0
            elif b == 1:
                plo[j, lg] = 256.0
            elif b == 2:
                phi[j, lg] = 1.0
            else:
                phi[j, lg] = 256.0
    return jnp.asarray(plo, jnp.bfloat16), jnp.asarray(phi, jnp.bfloat16)


def _decode_kernel(
    prob_bits: int,
    T: int,
    meta_ref,
    states_ref,
    streams_ref,
    symtab_ref,
    pdfcdf_ref,
    plo_ref,
    phi_ref,
    out_ref,
):
    K = 1 << prob_bits
    SR = max(K // 512, 1)  # symtab rows of 128 packed i32

    lane = jax.lax.broadcasted_iota(_I32, (T, 128), 1)
    zeros = jnp.zeros((T, 128), _I32)

    meta = meta_ref[:]
    steps = _taa(meta, zeros)
    rem = _taa(meta, zeros + 1)

    symtab = [
        jnp.broadcast_to(symtab_ref[r : r + 1, :], (T, 128)) for r in range(SR)
    ]
    pdfcdf = [
        jnp.broadcast_to(pdfcdf_ref[r : r + 1, :], (T, 128)) for r in range(2)
    ]
    plo = plo_ref[:]
    phi = phi_ref[:]

    def one_step(kk, state, consumed):
        """One decode step (32 symbols/block). Returns (sym, state, consumed)."""
        is_tail = kk == steps - 1
        limit = jnp.where(is_tail & (rem > 0), rem, 32)
        act = (kk < steps) & (lane < limit)

        s_bar = state & (K - 1)
        # two-level LUT: symbol by s_bar (u8 packed 4/i32), then pdf|cdf<<12
        q = s_bar >> 2
        g = _taa(symtab[0], q & 127)
        for r in range(1, SR):
            g = jnp.where((q >> 7) == r, _taa(symtab[r], q & 127), g)
        sym = (g >> ((s_bar & 3) << 3)) & 0xFF
        pv = jnp.where(
            sym < 128,
            _taa(pdfcdf[0], sym & 127),
            _taa(pdfcdf[1], sym & 127),
        )
        pdf = pv & 0xFFF
        cdf = (pv >> 12) & 0xFFF

        ns = pdf * (state >> prob_bits) + (s_bar - cdf)
        state1 = jnp.where(act, ns, state)

        # stream reads: suffix-rank over lanes (ballot/popc analogue)
        read = act & (state1 < C.ANS_MIN_STATE)
        r = read.astype(_I32)
        for d in (1, 2, 4, 8, 16):
            r = r + pltpu.roll(r, 128 - d, 1)
        cnt = _taa(r, zeros)  # lane 0 = total readers, broadcast

        rj = consumed + r - 1  # reversed-stream word index per reader
        u = rj >> 1
        pg = u >> 7
        li = u & 127
        lop = jnp.min(consumed) >> 8
        hip = jnp.minimum((jnp.max(consumed) + 31) >> 8, PAGES - 1)

        def page_body(p, acc):
            slab = streams_ref[:, p, :]
            return jnp.where(read & (pg == p), _taa(slab, li), acc)

        gv = jax.lax.fori_loop(lop, hip + 1, page_body, zeros)
        v16 = (gv >> ((rj & 1) << 4)) & 0xFFFF

        state2 = jnp.where(read, (state1 << 16) | v16, state1)
        consumed = consumed + cnt
        return jnp.where(act, sym, 0), state2, consumed

    def chunk_body(c, carry):
        state, consumed = carry
        cc = (S // CHUNK) - 1 - c  # chunks processed high-to-low
        base = cc * CHUNK
        chunk_acc = zeros
        for g in range(CHUNK // 4 - 1, -1, -1):
            syms = [None] * 4
            for d in range(3, -1, -1):
                kk = base + 4 * g + d
                syms[d], state, consumed = one_step(kk, state, consumed)
            combined = syms[0]
            for d in range(1, 4):
                combined = combined | pltpu.roll(syms[d], 32 * d, 1)
            cb = combined.astype(jnp.bfloat16)
            lo = jax.lax.dot_general(
                cb, plo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(_I32)
            hi = jax.lax.dot_general(
                cb, phi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(_I32)
            packed = lo | (hi << 16)  # packed u32s in lanes 0..31
            placed = pltpu.roll(packed, 32 * g, 1)
            chunk_acc = jnp.where((lane >> 5) == g, placed, chunk_acc)
        out_ref[:, cc, :] = chunk_acc
        return state, consumed

    state0 = states_ref[:]
    jax.lax.fori_loop(
        0, S // CHUNK, chunk_body, (state0, jnp.zeros((T, 128), _I32))
    )


@functools.lru_cache(maxsize=None)
def _build_decode_call(NBp: int, prob_bits: int, T: int):
    K = 1 << prob_bits
    SR = max(K // 512, 1)
    grid = NBp // T

    kernel = functools.partial(_decode_kernel, prob_bits, T)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NBp, S // CHUNK, 128), _I32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (T, PAGES, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((SR, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, S // CHUNK, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )


def _u16_from_arc32(arc32, widx):
    """Fetch u16 stream words (by u16-word index) from the u32 archive view."""
    w = jnp.take(arc32, jnp.clip(widx >> 1, 0, arc32.shape[0] - 1))
    return (w >> ((widx.astype(_U32) & 1) << 4)) & _U32(0xFFFF)


def build_sym_tables(pdf: jnp.ndarray, prob_bits: int):
    """XLA prologue: packed symbol LUT + (pdf | cdf<<12) table.

    Returns (symtab (SR,128) i32 — four u8 symbols per i32 —
    and pdfcdf (2,128) i32).
    """
    K = 1 << prob_bits
    SR = max(K // 512, 1)
    incl = jnp.cumsum(pdf.astype(_U32))
    slots = jnp.arange(K, dtype=_U32)
    sym = jnp.searchsorted(incl, slots, side="right").astype(_U32)
    sym = jnp.minimum(sym, _U32(C.NUM_SYMBOLS - 1))
    packed = sym.reshape(-1, 4)
    symtab = (
        packed[:, 0]
        | (packed[:, 1] << 8)
        | (packed[:, 2] << 16)
        | (packed[:, 3] << 24)
    )
    cdf = incl - pdf.astype(_U32)
    pdfcdf = pdf.astype(_U32) | (cdf << 12)
    return (
        symtab.astype(_I32).reshape(SR, 128),
        pdfcdf.astype(_I32).reshape(2, 128),
    )


def ans_decode_padded_pallas(
    archive: jnp.ndarray,
    prob_bits: int,
    out_max: int,
    verify_checksum: bool = False,
    block_tile: int = 256,
):
    """Pallas-backed drop-in for ans_decode_padded (same contract).

    XLA prologue parses the header, builds tables, and stages each block's
    u16 stream reversed and packed 2-per-i32 (affine gathers, HBM-speed);
    the Pallas kernel runs the sequential decode; the XLA epilogue restores
    natural byte order and applies the masks.
    """
    assert archive.dtype == jnp.uint8
    assert out_max % C.DEFAULT_BLOCK_SIZE == 0 and out_max > 0
    NB = out_max // C.DEFAULT_BLOCK_SIZE
    T = min(block_tile, max(8, NB))
    # tile must divide the padded block count and stay sublane-friendly
    while T % 8 != 0:
        T += 1
    NBp = C.round_up(NB, T)

    b = archive.reshape(-1, 4).astype(_U32)
    arc32 = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    A32 = arc32.shape[0]

    h = arc32[:8]
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

    pw = arc32[8:136]
    pdf = jnp.zeros(C.NUM_SYMBOLS, _U32)
    pdf = pdf.at[0::2].set(pw & _U32(0xFFFF)).at[1::2].set(pw >> _U32(16))
    symtab, pdfcdf = build_sym_tables(pdf, prob_bits)

    # per-block metadata
    bidx = jnp.arange(NBp, dtype=_I32)
    st_idx = jnp.clip(136 + bidx * W, 0, A32 - 1)
    live = bidx < nb_eff
    bw_start = 136 + nb_eff * W
    bw_x = jnp.where(
        live, jnp.take(arc32, jnp.clip(bw_start + 2 * bidx, 0, A32 - 1)), _U32(0)
    )
    bw_y = jnp.where(
        live,
        jnp.take(arc32, jnp.clip(bw_start + 2 * bidx + 1, 0, A32 - 1)),
        _U32(0),
    )
    uncomp = (bw_x >> _U32(16)).astype(_I32)
    cwords = (bw_x & _U32(0xFFFF)).astype(_I32)
    starts = bw_y.astype(_I32)
    rnb2 = nb_eff + (nb_eff & 1)
    data_start_w = (bw_start + rnb2 * 2) * 2  # u16-word offset of payload

    steps = (uncomp + W - 1) // W
    remainder = uncomp % W
    meta = jnp.zeros((NBp, 128), _I32)
    meta = meta.at[:, 0].set(steps).at[:, 1].set(remainder)

    states = jnp.take(
        arc32, jnp.clip(st_idx[:, None] + jnp.arange(W)[None, :], 0, A32 - 1)
    )
    states = jnp.where(live[:, None], states, _U32(C.ANS_START_STATE))
    states128 = jnp.zeros((NBp, 128), _I32)
    states128 = states128.at[:, :W].set(states.astype(_I32))

    # reversed packed stream staging: rword(j) = stream[cwords-1-j]
    i_idx = jnp.arange(MW2, dtype=_I32)[None, :]
    base = (data_start_w + starts + cwords - 1)[:, None]
    w0 = _u16_from_arc32(arc32, jnp.maximum(base - 2 * i_idx, 0))
    w1 = _u16_from_arc32(arc32, jnp.maximum(base - 2 * i_idx - 1, 0))
    rstreams = (w0 | (w1 << 16)).astype(_I32).reshape(NBp, PAGES, 128)

    plo, phi = _pack_matrices()
    call = _build_decode_call(NBp, prob_bits, T)
    out32 = call(meta, states128, rstreams, symtab, pdfcdf, plo, phi)

    out = jax.lax.bitcast_convert_type(
        out32.reshape(NBp, S * W // 4), jnp.uint8
    ).reshape(NBp * S * W)[:out_max]

    result = {
        "out": out,
        "size": n.astype(_U32),
        "success": success,
        "checksum_ok": jnp.bool_(True),
    }
    if verify_checksum:
        actual = checksum_u8(out, n)
        result["checksum_ok"] = ~has_checksum | (actual == stored_checksum)
    return result
