"""Pallas TPU rANS decoder — the hot decode loop as a Mosaic kernel.

TPU-native redesign of the reference decode kernel (GpuANSDecode.cuh:305-403).
Layout: a grid of block tiles; each tile holds T blocks, one block per
sublane row, the 32 interleaved rANS states in lanes 0..31 (the "warp" of
GpuANSUtils.cuh:62-65 mapped onto VPU lanes).

Data movement (the part XLA gathers do ~1000x too slowly on TPU) happens
in-kernel:
  * one DMA per tile pulls the tile's contiguous payload row range from the
    archive (HBM) into VMEM — block payloads are prefix-ordered so a tile's
    streams are contiguous (GpuANSUtils.cuh:219-224);
  * a short scalar loop realigns each block's stream to an 11-row window at
    512-byte granularity; the residual sub-row offset is folded into the
    read-index arithmetic (no data rotation).

Per decode step the kernel does: two-level symbol lookup via lane-wise
`tpu.dynamic_gather` (2^probBits u8 symbols packed 4/i32, then pdf|cdf<<12 by
symbol), the rANS state update, and the backwards u16 stream reads
(GpuANSDecode.cuh:91-104) from a 256-word register window refilled once per
4 steps by a dynamically-bounded page loop. The warp ballot/popc suffix rank
is one MXU matmul against a constant suffix-sum matrix. Output bytes are
packed 4-per-i32 with two MXU matmuls per 4 steps, yielding rows that are
the natural little-endian byte stream.

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
from .checksum import checksum_u8

_I32 = jnp.int32
_U32 = jnp.uint32

S = C.STEPS_PER_BLOCK  # 128 steps of 32 symbols per block
W = C.NUM_INTERLEAVED  # 32
MW = C.MAX_COMP_WORDS_PER_BLOCK  # 2560 u16 words
ROWS_PER_BLOCK = MW // 256 + 1  # 11 x (128 u32) rows cover a misaligned stream
CHUNK = 16  # steps per output chunk (16*32 = 512 bytes)
GROUP = 4  # steps per window refill / output pack group


def _taa(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=1)


def _srl(x, s):
    return jax.lax.shift_right_logical(x, s)


@functools.lru_cache(maxsize=None)
def _pack_matrices():
    """(128,128) bf16 matrices turning 4 steps' symbols into packed u32 lanes.

    Input lane j = 32*d + w (sub-step d, rANS lane w) maps to output lane
    8*d + w//4, byte w%4. lo covers bytes 0/1, hi bytes 2/3 (each result
    < 2^16, exact in f32).
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
    return plo.astype(np.float32), phi.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _suffix_matrix():
    """(128,128) bf16: rank[w] = sum_{w' >= w, w' < 32} read[w'] via MXU."""
    m = np.zeros((128, 128), np.float32)
    for j in range(32):
        for l in range(j + 1):
            m[j, l] = 1.0  # contribution of lane j to rank at lane l <= j
    return m


def _decode_kernel(
    prob_bits: int,
    T: int,
    tile_row0_ref,  # SMEM (ntiles,) payload row of each tile's DMA start
    lrow_ref,  # SMEM (NBp,) block's row offset inside its tile buffer
    meta_ref,  # VMEM (T,128): lane0 steps, lane1 rem, lane2 cwords, lane3 off32
    states_ref,  # VMEM (T,128)
    symtab_ref,
    pdfcdf_ref,
    plo_ref,
    phi_ref,
    suf_ref,
    arc_ref,  # ANY (XR,128) u32 archive rows
    out_ref,  # VMEM (T, 8, 128)
    tilebuf,  # scratch (RT,128) i32
    streams,  # scratch (T, ROWS_PER_BLOCK, 128) i32
    dma_sem,
):
    K = 1 << prob_bits
    SR = max(K // 512, 1)
    RT = T * (MW // 256) + 24  # DMA row counts must be 8-aligned

    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(_I32, (T, 128), 1)
    zeros = jnp.zeros((T, 128), _I32)

    # ---- tile-range DMA + per-block realign ----
    dma = pltpu.make_async_copy(
        arc_ref.at[pl.ds(tile_row0_ref[i], RT), :], tilebuf, dma_sem
    )
    dma.start()
    dma.wait()

    def realign(b, _):
        streams[b] = tilebuf[pl.ds(lrow_ref[i * T + b], ROWS_PER_BLOCK), :]
        return 0

    jax.lax.fori_loop(0, T, realign, 0, unroll=False)

    meta = meta_ref[:]
    steps = _taa(meta, zeros)
    rem = _taa(meta, zeros + 1)
    cwords = _taa(meta, zeros + 2)
    off32 = _taa(meta, zeros + 3)

    symtab = [
        jnp.broadcast_to(symtab_ref[r : r + 1, :], (T, 128)) for r in range(SR)
    ]
    pdfcdf = [
        jnp.broadcast_to(pdfcdf_ref[r : r + 1, :], (T, 128)) for r in range(2)
    ]
    plo = plo_ref[:]
    phi = phi_ref[:]
    suf = suf_ref[:]

    def one_step(kk, state, pos, win, base):
        is_tail = kk == steps - 1
        limit = jnp.where(is_tail & (rem > 0), rem, 32)
        act = (kk < steps) & (lane < limit)

        s_bar = state & (K - 1)
        q = _srl(s_bar, 2)
        g = _taa(symtab[0], q & 127)
        for r in range(1, SR):
            g = jnp.where(_srl(q, 7) == r, _taa(symtab[r], q & 127), g)
        sym = _srl(g, (s_bar & 3) << 3) & 0xFF
        pv = jnp.where(
            sym < 128, _taa(pdfcdf[0], sym & 127), _taa(pdfcdf[1], sym & 127)
        )
        pdf = pv & 0xFFF
        cdf = _srl(pv, 12) & 0xFFF

        ns = pdf * _srl(state, prob_bits) + (s_bar - cdf)
        state1 = jnp.where(act, ns, state)

        read = act & (state1 < C.ANS_MIN_STATE)
        rank = (
            jax.lax.dot_general(
                read.astype(jnp.bfloat16), suf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ).astype(_I32)
        cnt = _taa(rank, zeros)  # lane 0 = total readers

        rj = pos - rank  # u16-word index of each reader (backwards stream)
        widx = off32 + _srl(rj, 1) - base
        v32 = _taa(win, widx & 127)
        v16 = _srl(v32, (rj & 1) << 4) & 0xFFFF

        state2 = jnp.where(read, (state1 << 16) | v16, state1)
        pos = pos - cnt
        return jnp.where(act, sym, 0), state2, pos

    def refill(pos, _win, _base):
        """256-u16-word register window covering the next 4 steps' reads."""
        hi = off32 + _srl(jnp.maximum(pos - 1, 0), 1)
        base = jnp.maximum(hi - 127, 0)
        g0 = base + lane
        pg = _srl(g0, 7)
        li = g0 & 127
        lop = jnp.min(base) >> 7
        hip = jnp.minimum(jnp.max(hi) >> 7, ROWS_PER_BLOCK - 1)

        def page_body(p, acc):
            return jnp.where(pg == p, _taa(streams[:, p, :], li), acc)

        win = jax.lax.fori_loop(lop, hip + 1, page_body, zeros)
        return win, base

    def chunk_body(c, carry):
        state, pos = carry
        cc = (S // CHUNK) - 1 - c  # chunks processed high-to-low
        chunk_acc = zeros
        for g in range(CHUNK // GROUP - 1, -1, -1):
            # the 256-word window covers two 4-step groups; refill on odd g
            if g % 2 == 1:
                win, base = refill(pos, None, None)
            syms = [None] * GROUP
            for d in range(GROUP - 1, -1, -1):
                kk = cc * CHUNK + 4 * g + d
                syms[d], state, pos = one_step(kk, state, pos, win, base)
            combined = syms[0]
            for d in range(1, GROUP):
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
            packed = lo | (hi << 16)  # 32 packed u32s in lanes 0..31
            placed = pltpu.roll(packed, 32 * g, 1)
            chunk_acc = jnp.where(_srl(lane, 5) == g, placed, chunk_acc)
        out_ref[:, cc, :] = chunk_acc
        return state, pos

    jax.lax.fori_loop(
        0, S // CHUNK, chunk_body, (states_ref[:], cwords)
    )


@functools.lru_cache(maxsize=None)
def _build_decode_call(NBp: int, prob_bits: int, T: int, XR: int):
    K = 1 << prob_bits
    SR = max(K // 512, 1)
    grid = NBp // T
    RT = T * (MW // 256) + 24

    kernel = functools.partial(_decode_kernel, prob_bits, T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SR, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (T, S // CHUNK, 128), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((RT, 128), _I32),
            pltpu.VMEM((T, ROWS_PER_BLOCK, 128), _I32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NBp, S // CHUNK, 128), _I32),
        grid_spec=grid_spec,
    )


def build_sym_tables(pdf: jnp.ndarray, prob_bits: int):
    """XLA prologue: packed symbol LUT + (pdf | cdf<<12) table."""
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
    return_u32: bool = False,
):
    """Pallas-backed drop-in for ans_decode_padded (same contract).

    With return_u32=True, `out` is the decoded byte stream packed
    little-endian 4 bytes per u32 (shape (out_max//4,)) — the layout the
    float codec consumes directly.
    """
    assert out_max % C.DEFAULT_BLOCK_SIZE == 0 and out_max > 0
    NB = out_max // C.DEFAULT_BLOCK_SIZE
    T = min(block_tile, max(8, NB))
    while T % 8 != 0:
        T += 1
    NBp = C.round_up(NB, T)

    if archive.dtype == jnp.uint8:
        arc32 = layout.u8_to_u32le(archive)
    else:
        assert archive.dtype in (_U32, jnp.int32)
        arc32 = archive.astype(_U32)
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

    bidx = jnp.arange(NBp, dtype=_I32)
    live = bidx < nb_eff
    bw_start = 136 + nb_eff * W
    # blockWords is a contiguous section: one dynamic slice, no gathers
    arc_ext = jnp.concatenate([arc32, jnp.zeros(2 * NBp + 2, _U32)])
    bw_flat = jax.lax.dynamic_slice(
        arc_ext, (bw_start,), (2 * NBp + 2,)
    )
    bw_x = jnp.where(live, bw_flat[0:-2:2], _U32(0))
    bw_y = jnp.where(live, bw_flat[1:-1:2], _U32(0))
    uncomp = (bw_x >> _U32(16)).astype(_I32)
    cwords = (bw_x & _U32(0xFFFF)).astype(_I32)
    starts = bw_y.astype(_I32)
    rnb2 = nb_eff + (nb_eff & 1)
    ds32 = bw_start + rnb2 * 2  # u32 offset of the payload

    steps = (uncomp + W - 1) // W
    remainder = uncomp % W

    # per-block payload geometry (u32 rows of 128)
    s32 = ds32 + (starts >> 1)  # first u32 of the block's stream
    row0 = s32 >> 7  # s32 is non-negative i32, arithmetic shift is fine
    off32 = s32 & 127

    meta = jnp.zeros((NBp, 128), _I32)
    meta = (
        meta.at[:, 0]
        .set(steps)
        .at[:, 1]
        .set(remainder)
        .at[:, 2]
        .set(cwords)
        .at[:, 3]
        .set(off32)
    )

    # states is a contiguous section at a static offset: slice + reshape
    st_flat = jax.lax.dynamic_slice(
        jnp.concatenate([arc32, jnp.zeros(NBp * W + 136, _U32)]),
        (136,), (NBp * W,),
    )
    states = st_flat.reshape(NBp, W)
    states = jnp.where(live[:, None], states, _U32(C.ANS_START_STATE))
    states128 = jnp.zeros((NBp, 128), _I32)
    states128 = states128.at[:, :W].set(states.astype(_I32))

    # tile geometry + archive padding for the tile-range DMA
    RT = T * (MW // 256) + 24
    ntiles = NBp // T
    tile_row0 = row0[0::T] & ~7  # 8-row-aligned DMA sources
    lrow = jnp.clip(row0 - jnp.repeat(tile_row0, T), 0, RT - ROWS_PER_BLOCK)
    need_rows = int(C.div_up(A32, 128)) + RT + 1
    arc_rows = jnp.zeros((need_rows * 128,), _U32).at[:A32].set(arc32)
    arc_rows = arc_rows.astype(_I32).reshape(need_rows, 128)
    tile_row0 = jnp.clip(tile_row0, 0, need_rows - RT)

    plo_np, phi_np = _pack_matrices()
    plo = jnp.asarray(plo_np, jnp.bfloat16)
    phi = jnp.asarray(phi_np, jnp.bfloat16)
    suf = jnp.asarray(_suffix_matrix(), jnp.bfloat16)
    call = _build_decode_call(NBp, prob_bits, T, need_rows)
    out32 = call(
        tile_row0, lrow, meta, states128, symtab, pdfcdf, plo, phi, suf,
        arc_rows,
    )

    out32 = out32.reshape(NBp * S * W // 4)[: out_max // 4].astype(_U32)
    result = {
        "size": n.astype(_U32),
        "success": success,
        "checksum_ok": jnp.bool_(True),
    }
    if return_u32:
        result["out"] = out32
        if verify_checksum:
            out = layout.u32_to_u8le(out32)
            actual = checksum_u8(out, n)
            result["checksum_ok"] = ~has_checksum | (actual == stored_checksum)
        return result

    out = layout.u32_to_u8le(out32)
    result["out"] = out
    if verify_checksum:
        actual = checksum_u8(out, n)
        result["checksum_ok"] = ~has_checksum | (actual == stored_checksum)
    return result
