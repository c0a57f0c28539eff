"""Pallas TPU rANS encoder — the hot encode loop as a Mosaic kernel.

TPU-native redesign of the reference encode kernel
(GpuANSEncode.cuh:49-211): one block per sublane row, 32 interleaved rANS
states in lanes 0..31. Per step: symbol table lookups ((pdf|cdf<<12|shift<<24)
and magic, 256 entries each = two lane-gathers + select), the renormalization
ballot/popc stream compaction (GpuANSEncode.cuh:68-74) as an inclusive
lane-prefix-sum via 5 static rolls, and magic-number division
(__umulhi, GpuANSEncode.cuh:79-86) via 16-bit limb products with logical
shifts (all values stay bit-correct in i32 two's-complement).

Emitted u16 words append into a 128-lane register window per block (plus a
spill window for boundary straddles); the inverse write permutation is a
5-step binary search over the prefix sums. Full windows flush to a paged
VMEM staging buffer selected by a dynamically-bounded page loop (all blocks
start at position 0, so the page spread across a tile stays small). The
kernel outputs dense per-block streams + word counts + final states; the XLA
epilogue (shared with the XLA encoder) coalesces them into the archive at
HBM speed.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from . import encode as enc_mod
from . import stats
from .checksum import checksum_u8

_I32 = jnp.int32
_U32 = jnp.uint32

S = C.STEPS_PER_BLOCK  # 128
W = C.NUM_INTERLEAVED  # 32
MW = C.MAX_COMP_WORDS_PER_BLOCK  # 2560
PAGES = MW // 128  # 20 pages of 128 u16 words (held zero-extended in i32)
CHUNK = 16  # steps per input chunk (16*32 = 512 bytes = 128 packed i32)


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


def _encode_kernel(
    prob_bits: int,
    T: int,
    meta_ref,
    data_ref,
    pcs_ref,
    magic_ref,
    words_ref,
    counts_ref,
    states_ref,
):
    lane = jax.lax.broadcasted_iota(_I32, (T, 128), 1)
    zeros = jnp.zeros((T, 128), _I32)

    meta = meta_ref[:]
    steps = _taa(meta, zeros)
    rem = _taa(meta, zeros + 1)

    pcs = [jnp.broadcast_to(pcs_ref[r : r + 1, :], (T, 128)) for r in range(2)]
    magic = [
        jnp.broadcast_to(magic_ref[r : r + 1, :], (T, 128)) for r in range(2)
    ]

    # zero-init the staging pages (flush does read-modify-write)
    for p in range(PAGES):
        words_ref[:, p, :] = zeros

    def one_step(kk, d32, l, carry):
        state, win_lo, win_hi, fill, base = carry
        is_tail = kk == steps - 1
        limit = jnp.where(is_tail & (rem > 0), rem, 32)
        act = (kk < steps) & (lane < limit)

        sym = (
            _srl(_taa(d32, 8 * l + _srl(lane, 2)), (lane & 3) << 3) & 0xFF
        )
        pv = jnp.where(
            sym < 128, _taa(pcs[0], sym & 127), _taa(pcs[1], sym & 127)
        )
        pdf = pv & 0xFFF
        cdf = _srl(pv, 12) & 0xFFF
        shift = _srl(pv, 24) & 0x1F
        mg = jnp.where(
            sym < 128, _taa(magic[0], sym & 127), _taa(magic[1], sym & 127)
        )

        write = act & (_srl(state, 31 - prob_bits) >= pdf)
        outv = state & 0xFFFF
        state1 = jnp.where(write, _srl(state, 16), state)

        t = _umulhi_i32(state1, mg)
        div = _srl(t + state1, shift)
        mod = state1 - div * pdf
        state2 = jnp.where(act, (div << prob_bits) + mod + cdf, state1)

        # inclusive prefix over lanes (ballot/popc with laneMaskLt analogue)
        r = write.astype(_I32)
        for d in (1, 2, 4, 8, 16):
            r = r + pltpu.roll(r, d, 1)
        cnt = _taa(r, zeros + 31)  # lane 31 = total writers, broadcast

        # append: window slot j receives the (j - fill mod 128)-th writer
        jj = (lane - fill) & 127
        wsel = zeros
        for b in (16, 8, 4, 2, 1):
            nw = wsel + b
            v = _taa(r, nw - 1)
            wsel = jnp.where(v < jj + 1, nw, wsel)
        val = _taa(outv, wsel & 127)
        hit = jj < cnt
        win_lo = jnp.where(hit & (lane >= fill), val, win_lo)
        win_hi = jnp.where(hit & (lane < fill), val, win_hi)
        fill = fill + cnt

        # flush full windows to the paged staging buffer
        flushing = fill >= 128
        pg = jnp.where(flushing, _srl(base, 7), -1)
        any_flush = jnp.max(pg)

        @pl.when(any_flush >= 0)
        def _():
            lop = jnp.maximum(jnp.min(jnp.where(flushing, pg, PAGES)), 0)

            def page_body(p, wl):
                slab = words_ref[:, p, :]
                words_ref[:, p, :] = jnp.where(pg == p, wl, slab)
                return wl

            jax.lax.fori_loop(lop, any_flush + 1, page_body, win_lo)

        win_lo = jnp.where(flushing, win_hi, win_lo)
        win_hi = jnp.where(flushing, 0, win_hi)
        base = base + jnp.where(flushing, 128, 0)
        fill = fill - jnp.where(flushing, 128, 0)
        return state2, win_lo, win_hi, fill, base

    def chunk_body(c, carry):
        d32 = data_ref[:, c, :]
        for l in range(CHUNK):
            carry = one_step(c * CHUNK + l, d32, l, carry)
        return carry

    init = (
        jnp.full((T, 128), C.ANS_START_STATE, _I32),
        zeros,
        zeros,
        zeros,
        zeros,
    )
    state, win_lo, win_hi, fill, base = jax.lax.fori_loop(
        0, S // CHUNK, chunk_body, init
    )

    # final flush of the partial window (lanes >= fill already zero)
    pg = jnp.where(fill > 0, _srl(base, 7), -1)
    hi_p = jnp.max(pg)

    @pl.when(hi_p >= 0)
    def _():
        lop = jnp.maximum(jnp.min(jnp.where(fill > 0, pg, PAGES)), 0)

        def page_body(p, wl):
            slab = words_ref[:, p, :]
            words_ref[:, p, :] = jnp.where(pg == p, wl, slab)
            return wl

        jax.lax.fori_loop(lop, hi_p + 1, page_body, win_lo)

    counts_ref[:] = base + fill
    states_ref[:] = state


@functools.lru_cache(maxsize=None)
def _build_encode_call(NBp: int, prob_bits: int, T: int):
    grid = NBp // T
    kernel = functools.partial(_encode_kernel, prob_bits, T)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NBp, PAGES, 128), _I32),
            jax.ShapeDtypeStruct((NBp, 128), _I32),
            jax.ShapeDtypeStruct((NBp, 128), _I32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (T, S // CHUNK, 128), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (T, PAGES, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )


def build_encode_tables(pdf: jnp.ndarray):
    """XLA prologue: (pdf | cdf<<12 | shift<<24) and magic, 256 each."""
    pdf = pdf.astype(_U32)
    cdf = jnp.concatenate([jnp.zeros(1, _U32), jnp.cumsum(pdf)[:-1]])
    magic, shift = stats.div_magic_u32(pdf)
    pcs = pdf | (cdf << 12) | (shift << 24)
    return pcs.astype(_I32).reshape(2, 128), magic.astype(_I32).reshape(2, 128)


def ans_encode_padded_pallas(
    data: jnp.ndarray,
    length,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
    precomputed_histogram=None,
    precomputed_pdf=None,
    block_tile: int = 256,
):
    """Pallas-backed drop-in for ans_encode_padded (same contract)."""
    assert prob_bits in C.SUPPORTED_PROB_BITS
    assert data.dtype == jnp.uint8
    L = data.shape[0]
    NB = L // C.DEFAULT_BLOCK_SIZE
    length = jnp.asarray(length, _I32)
    nb = (length + C.DEFAULT_BLOCK_SIZE - 1) // C.DEFAULT_BLOCK_SIZE

    if precomputed_pdf is not None:
        pdf = precomputed_pdf.astype(_U32)
    else:
        hist = (
            precomputed_histogram
            if precomputed_histogram is not None
            else stats.histogram_u8(data, length)
        )
        pdf = stats.normalize_probs(hist, length.astype(_U32), prob_bits)

    T = min(block_tile, max(8, NB))
    while T % 8 != 0:
        T += 1
    NBp = C.round_up(NB, T)

    pcs, magic = build_encode_tables(pdf)

    bidx = jnp.arange(NBp, dtype=_I32)
    tail = length - (nb - 1) * C.DEFAULT_BLOCK_SIZE
    uncomp = jnp.where(bidx < nb, C.DEFAULT_BLOCK_SIZE, 0)
    uncomp = jnp.where(bidx == nb - 1, tail, uncomp)
    steps = (uncomp + W - 1) // W
    remainder = uncomp % W
    meta = jnp.zeros((NBp, 128), _I32)
    meta = meta.at[:, 0].set(steps).at[:, 1].set(remainder)

    data32 = jax.lax.bitcast_convert_type(
        data.reshape(NB * S * W // 4, 4), _U32
    ).astype(_I32)
    if NBp > NB:
        data32 = jnp.concatenate(
            [data32, jnp.zeros((NBp - NB) * S * W // 4, _I32)]
        )
    data32 = data32.reshape(NBp, S // CHUNK, 128)

    call = _build_encode_call(NBp, prob_bits, T)
    staged, counts, states_out = call(meta, data32, pcs, magic)

    words = counts[:NB, 0]
    states = states_out[:NB, :W].astype(_U32)
    compacted = staged[:NB].reshape(NB, MW).astype(_U32)

    checksum = checksum_u8(data, length) if use_checksum else _U32(0)
    return enc_mod.assemble_archive(
        L, pdf, states, words, compacted, length, nb, prob_bits, use_checksum,
        checksum=checksum,
    )
