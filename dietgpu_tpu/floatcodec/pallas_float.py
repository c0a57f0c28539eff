"""Pallas float-codec kernels: split, join, and exponent histogram.

TPU-native equivalents of the reference's fused float kernels:
  * split (FloatTypeInfo<FT>::split, GpuFloatUtils.cuh:111-167, fused with
    the exponent histogram as in splitFloat, GpuFloatCompress.cuh:280-365):
    raw f16/bf16 words arrive packed two per u32; the kernel emits the
    rANS-bound exponent bytes and the raw sign/significand bytes, each
    packed four per u32 (the layout the Pallas rANS kernels consume), plus
    a 256-bin histogram of the exponent bytes.
  * join (JoinFloatWriter / joinFloat, GpuFloatDecompress.cuh:25-141):
    exponent bytes + raw bytes back to packed float words.

Byte re-interleaving is done with lane-wise `tpu.dynamic_gather`s (XLA's
strided slices run ~1000x too slowly on TPU). The histogram uses the
16x16 nibble factorization on the MXU: joint(hi,lo) = OH_hi^T @ OH_lo.
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..ans.pallas_hist import fold_hist, hist_chunk_counts

_I32 = jnp.int32
_U32 = jnp.uint32

# input u32-pair rows per grid step (hardware sweep knob; read at import —
# A/B arms need separate processes). v5e sweep (r4, 64Mi bf16 split):
# 256 -> 3.26 ms, 512 -> 3.18, 1024 -> 3.09; small inputs sit at the
# dispatch floor either way.
SPLIT_TILE = int(_os.environ.get("DIETGPU_SPLIT_TILE", "1024"))


def _taa(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=1)


def _srl(x, s):
    return jax.lax.shift_right_logical(x, s)


def _fold_cks(acc: jnp.ndarray) -> jnp.ndarray:
    """Fold the kernel's (8,128) XOR accumulator to the 8-bit checksum."""
    x = jax.lax.reduce(
        acc.astype(_U32), _U32(0), jax.lax.bitwise_xor, (0, 1)
    )
    x = x ^ (x >> _U32(16))
    x = x ^ (x >> _U32(8))
    return x & _U32(0xFF)


def _xor_slabs(x, R: int):
    """XOR-fold (R,128) i32 rows to an (8,128) accumulator (unrolled)."""
    s = x.reshape(R // 8, 8, 128)
    acc = s[0]
    for k in range(1, R // 8):
        acc = acc ^ s[k]
    return acc


def _split_pair(p, float_type: int):
    """Split a u32 holding two f16/bf16 words -> (c0, c1, m0, m1) bytes."""
    w0 = p & 0xFFFF
    w1 = _srl(p, 16)
    if float_type == C.FLOAT_TYPE_BFLOAT16:
        w0 = ((w0 << 1) | _srl(w0, 15)) & 0xFFFF
        w1 = ((w1 << 1) | _srl(w1, 15)) & 0xFFFF
    return _srl(w0, 8), _srl(w1, 8), w0 & 0xFF, w1 & 0xFF


def _join_word(c, m, float_type: int):
    w = ((c & 0xFF) << 8) | (m & 0xFF)
    if float_type == C.FLOAT_TYPE_BFLOAT16:
        w = (_srl(w, 1) | (w << 15)) & 0xFFFF
    return w


def _split_kernel(
    float_type: int, R: int, with_cksum: bool,
    in_ref, exp_ref, nc_ref, hist_ref, cks_ref,
):
    """in (R,128) u32-pairs -> exp/nc (R/2,128) packed bytes + histogram
    + a fused XOR-checksum accumulator (the reference fuses the float
    checksum the same way, GpuFloatCompress.cuh:461-468 — here it rides
    the split kernel so `use_checksum=True` costs no extra HBM pass)."""
    lane = jax.lax.broadcasted_iota(_I32, (R // 2, 128), 1)
    i = pl.program_id(0)

    pairs = in_ref[:]
    c0, c1, m0, m1 = _split_pair(pairs, float_type)

    # byte k of output u32 l comes from word 4l+k, i.e. pair (4l+k)>>1 of
    # the DOUBLE-width input: out row r draws input row 2r + (l>=64)
    half = in_ref[:].reshape(R // 2, 2, 128)
    del half  # (documentation of the mapping; gathers below do the work)

    def pack(v0, v1):
        # v0/v1: (R,128) byte planes of word0/word1 per pair.
        # out[r, l] = v0[pair 2l'] | v1[pair 2l']<<8 | v0[pair 2l'+1]<<16 ...
        # where pair index = 128*(2r + (l>=64)) + (2l & 127).
        src0 = v0.reshape(R // 2, 2, 128)
        src1 = v1.reshape(R // 2, 2, 128)
        il = (2 * lane) & 127
        lo_sel = lane < 64
        a0 = jnp.where(
            lo_sel, _taa(src0[:, 0, :], il), _taa(src0[:, 1, :], il)
        )
        a1 = jnp.where(
            lo_sel, _taa(src1[:, 0, :], il), _taa(src1[:, 1, :], il)
        )
        a2 = jnp.where(
            lo_sel, _taa(src0[:, 0, :], il + 1), _taa(src0[:, 1, :], il + 1)
        )
        a3 = jnp.where(
            lo_sel, _taa(src1[:, 0, :], il + 1), _taa(src1[:, 1, :], il + 1)
        )
        return a0 | (a1 << 8) | (a2 << 16) | (a3 << 24)

    exp_ref[:] = pack(c0, c1)
    nc_ref[:] = pack(m0, m1)

    # --- fused exponent histogram (exact) on the MXU: stacked nibble
    # one-hots, block-diagonal joint counts (see pallas_hist docstring)
    @pl.when(i == 0)
    def _():
        hist_ref[:] = jnp.zeros((16, 128), _I32)
        cks_ref[:] = jnp.zeros((8, 128), _I32)

    c = jnp.concatenate([c0, c1], axis=0)  # (2R,128) exponent bytes
    hist_ref[:] = hist_ref[:] + hist_chunk_counts(c).astype(_I32)

    if with_cksum:  # fused checksum costs nothing when unused
        cks_ref[:] = cks_ref[:] ^ _xor_slabs(pairs, R)


@functools.lru_cache(maxsize=None)
def _build_split_call(RP: int, float_type: int, with_cksum: bool = True):
    grid = RP // SPLIT_TILE
    kernel = functools.partial(
        _split_kernel, float_type, SPLIT_TILE, with_cksum
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((RP // 2, 128), _I32),
            jax.ShapeDtypeStruct((RP // 2, 128), _I32),
            jax.ShapeDtypeStruct((16, 128), _I32),
            jax.ShapeDtypeStruct((8, 128), _I32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (SPLIT_TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (SPLIT_TILE // 2, 128), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (SPLIT_TILE // 2, 128), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((16, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )


def split_total_words(Lw: int) -> int:
    """Total words (incl. zero padding) the split kernel histograms."""
    n2 = Lw // 2
    RP = C.round_up(max(C.div_up(n2, 128), SPLIT_TILE), SPLIT_TILE)
    return 2 * RP * 128


def split_words_pallas(
    words32: jnp.ndarray, float_type: int, with_cksum: bool = True
):
    """(Lw/2,) u32 word-pairs -> (exp32, nc32, hist256, checksum).

    exp32/nc32 are (Lw/4,) u32 (bytes packed little-endian, natural order);
    hist256 is the exact exponent histogram of ALL Lw bytes (callers mask
    padding by ensuring padded words are zero and correcting bin counts, or
    simply by passing the true length to normalize via the zero bin) — here
    padded input words must be zero and the caller subtracts the pad count
    from the histogram bin of the zero-word exponent byte. `checksum` is
    the fused folded 8-bit XOR checksum (u32) of the input bytes — exact
    for the true length because padding words are zero (XOR identity).
    """
    assert float_type in (C.FLOAT_TYPE_FLOAT16, C.FLOAT_TYPE_BFLOAT16)
    n2 = words32.shape[0]
    RP = C.div_up(n2, 128)
    RP = C.round_up(max(RP, SPLIT_TILE), SPLIT_TILE)
    x = jnp.zeros(RP * 128, _I32)
    x = x.at[:n2].set(words32.astype(_I32))
    call = _build_split_call(RP, float_type, with_cksum)
    exp32, nc32, hist, cks = call(x.reshape(RP, 128))
    hist256 = fold_hist(hist).astype(_U32)
    return exp32.reshape(-1), nc32.reshape(-1), hist256, _fold_cks(cks)


def _join_kernel(float_type: int, R: int, exp_ref, nc_ref, out_ref):
    """exp/nc (R,128) packed bytes -> out (2R,128) u32 word-pairs."""
    lane = jax.lax.broadcasted_iota(_I32, (R, 128), 1)
    exp = exp_ref[:]
    nc = nc_ref[:]

    # out pair i (word 2i, 2i+1) needs bytes 2i,2i+1 of exp/nc:
    # byte j lives in u32 j>>2 at byte j&3. For out row q (of 2R rows),
    # out[q, l]: i = 128q + l; src u32 index = i>>1 = 64q + (l>>1):
    # src row q>>1, src lane 64*(q&1) + (l>>1).
    def halves(src):
        # returns bytes (2i)&... as two planes for even/odd output rows
        b0 = _taa(src, _srl(lane, 1))          # u32 containing byte 2i
        b1 = _taa(src, 64 + _srl(lane, 1))
        return b0, b1

    eb0, eb1 = halves(exp)
    mb0, mb1 = halves(nc)

    def build(eb, mb):
        # for out lane l: i = 128q + l, byte index j0 = 2i & 3 = (2l)&3,
        # j1 = (2l+1)&3 within the gathered u32
        sh0 = ((2 * lane) & 3) << 3
        sh1 = ((2 * lane + 1) & 3) << 3
        c0 = _srl(eb, sh0) & 0xFF
        c1 = _srl(eb, sh1) & 0xFF
        m0 = _srl(mb, sh0) & 0xFF
        m1 = _srl(mb, sh1) & 0xFF
        w0 = _join_word(c0, m0, float_type)
        w1 = _join_word(c1, m1, float_type)
        return w0 | (w1 << 16)

    out0 = build(eb0, mb0)  # even output rows
    out1 = build(eb1, mb1)  # odd output rows
    out = jnp.stack([out0, out1], axis=1).reshape(2 * R, 128)
    out_ref[:] = out


@functools.lru_cache(maxsize=None)
def _build_join_call(RP: int, float_type: int):
    TILE = SPLIT_TILE // 2
    grid = RP // TILE
    kernel = functools.partial(_join_kernel, float_type, TILE)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * RP, 128), _I32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )


def join_words_pallas(exp32: jnp.ndarray, nc32: jnp.ndarray, float_type: int):
    """(Lw/4,) packed exponent + raw bytes -> (Lw/2,) u32 word-pairs."""
    assert float_type in (C.FLOAT_TYPE_FLOAT16, C.FLOAT_TYPE_BFLOAT16)
    n4 = exp32.shape[0]
    TILE = SPLIT_TILE // 2
    RP = C.round_up(max(C.div_up(n4, 128), TILE), TILE)
    if n4 == RP * 128:  # aligned: no padding copies
        e = exp32.astype(_I32)
        m = nc32.astype(_I32)
    else:
        e = jnp.zeros(RP * 128, _I32).at[:n4].set(exp32.astype(_I32))
        m = jnp.zeros(RP * 128, _I32).at[:n4].set(nc32.astype(_I32))
    call = _build_join_call(RP, float_type)
    out = call(e.reshape(RP, 128), m.reshape(RP, 128))
    return out.reshape(-1)[: 2 * n4].astype(_U32)


# ---------------------------------------------------------------------------
# float32: rotl-1, exponent byte + two raw planes (GpuFloatUtils.cuh:181-203)
# ---------------------------------------------------------------------------


def _split_kernel_f32(
    R: int, with_cksum: bool,
    in_ref, exp_ref, lo_ref, hi_ref, hist_ref, cks_ref,
):
    """in (R,128) u32 words -> exp (R/4,128), lo (R/2,128), hi (R/4,128),
    plus the fused XOR-checksum accumulator (no extra HBM pass when
    use_checksum=True; GpuFloatCompress.cuh:461-468 analogue)."""
    i = pl.program_id(0)
    w = in_ref[:]
    v = (w << 1) | _srl(w, 31)  # rotl32(w, 1)
    c = _srl(v, 24)  # exponent byte, one per word
    lo = v & 0xFFFF
    hi = _srl(v, 16) & 0xFF

    lane4 = jax.lax.broadcasted_iota(_I32, (R // 4, 128), 1)
    lane2 = jax.lax.broadcasted_iota(_I32, (R // 2, 128), 1)

    def pack4(src):
        # out[r, l] = src[4k..4k+3], k = 128r + l; word 4k+d sits at input
        # row 4r + (l >> 5), lane (4*l + d) & 127
        s4 = src.reshape(R // 4, 4, 128)
        q = _srl(lane4, 5)  # plane select, independent of d
        acc = None
        for d in range(4):
            il = (4 * lane4 + d) & 127
            g = _taa(s4[:, 0, :], il)
            for qq in range(1, 4):
                g = jnp.where(q == qq, _taa(s4[:, qq, :], il), g)
            acc = g if acc is None else acc | (g << (8 * d))
        return acc

    def pack2(src):
        # out[r, l] = src[2k] | src[2k+1] << 16, k = 128r + l
        s2 = src.reshape(R // 2, 2, 128)
        q = _srl(lane2, 6)
        out = None
        for d in range(2):
            il = (2 * lane2 + d) & 127
            g = jnp.where(
                q == 0, _taa(s2[:, 0, :], il), _taa(s2[:, 1, :], il)
            )
            out = g if out is None else out | (g << 16)
        return out

    exp_ref[:] = pack4(c)
    hi_ref[:] = pack4(hi)
    lo_ref[:] = pack2(lo)

    @pl.when(i == 0)
    def _():
        hist_ref[:] = jnp.zeros((16, 128), _I32)
        cks_ref[:] = jnp.zeros((8, 128), _I32)

    hist_ref[:] = hist_ref[:] + hist_chunk_counts(c).astype(_I32)

    if with_cksum:  # fused checksum costs nothing when unused
        cks_ref[:] = cks_ref[:] ^ _xor_slabs(w, R)


@functools.lru_cache(maxsize=None)
def _build_split_call_f32(RP: int, with_cksum: bool = True):
    T = SPLIT_TILE
    grid = RP // T
    kernel = functools.partial(_split_kernel_f32, T, with_cksum)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((RP // 4, 128), _I32),
            jax.ShapeDtypeStruct((RP // 2, 128), _I32),
            jax.ShapeDtypeStruct((RP // 4, 128), _I32),
            jax.ShapeDtypeStruct((16, 128), _I32),
            jax.ShapeDtypeStruct((8, 128), _I32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((T // 4, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T // 2, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T // 4, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )


def split_total_words_f32(Lw: int) -> int:
    RP = C.round_up(max(C.div_up(Lw, 128), SPLIT_TILE), SPLIT_TILE)
    return RP * 128


def split_words_pallas_f32(words: jnp.ndarray, with_cksum: bool = True):
    """(Lw,) u32 f32 words -> (exp32, lo32, hi32, hist256, checksum).

    `checksum` is the fused folded 8-bit XOR checksum (u32) of the input
    bytes — exact for the true length because padding words are zero."""
    Lw = words.shape[0]
    RP = C.round_up(max(C.div_up(Lw, 128), SPLIT_TILE), SPLIT_TILE)
    x = jnp.zeros(RP * 128, _I32).at[:Lw].set(words.astype(_I32))
    call = _build_split_call_f32(RP, with_cksum)
    exp32, lo32, hi32, hist, cks = call(x.reshape(RP, 128))
    return (
        exp32.reshape(-1),
        lo32.reshape(-1),
        hi32.reshape(-1),
        fold_hist(hist).astype(_U32),
        _fold_cks(cks),
    )


def _join_kernel_f32(R: int, exp_ref, lo_ref, hi_ref, out_ref):
    """exp/hi (R/4,128) + lo (R/2,128) packed -> out (R,128) u32 words."""
    lane = jax.lax.broadcasted_iota(_I32, (R // 4, 128), 1)
    exp = exp_ref[:]
    hi = hi_ref[:]
    lo = lo_ref[:]
    lo2 = lo.reshape(R // 4, 2, 128)

    outs = []
    for j in range(4):  # output sub-row j of each 4-row group
        # word k = 128*(4g+j) + l: byte index k in exp/hi: u32 32*(4g+j)+l>>2
        # = row g, lane 32*j + (l>>2); u16 index k in lo: u32 k>>1 = row
        # 2g + (j>>1), lane 64*(j&1) + (l>>1)
        bidx = 32 * j + _srl(lane, 2)
        sh = (lane & 3) << 3
        cb = _srl(_taa(exp, bidx), sh) & 0xFF
        hb = _srl(_taa(hi, bidx), sh) & 0xFF
        lidx = 64 * (j & 1) + _srl(lane, 1)
        lg = _taa(lo2[:, j >> 1, :], lidx)
        lw = _srl(lg, (lane & 1) << 4) & 0xFFFF
        v = (cb << 24) | (hb << 16) | lw
        w = _srl(v, 1) | (v << 31)  # rotr32(v, 1)
        outs.append(w)
    out = jnp.stack(outs, axis=1).reshape(R, 128)
    out_ref[:] = out


@functools.lru_cache(maxsize=None)
def _build_join_call_f32(RP4: int):
    T4 = SPLIT_TILE // 4
    grid = RP4 // T4
    kernel = functools.partial(_join_kernel_f32, 4 * T4)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4 * RP4, 128), _I32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T4, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * T4, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T4, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * T4, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )


def join_words_pallas_f32(exp32, lo32, hi32):
    """packed exp/lo/hi planes -> (Lw,) u32 f32 words (Lw = 4*len(exp32))."""
    n4 = exp32.shape[0]
    T4 = SPLIT_TILE // 4
    RP4 = C.round_up(max(C.div_up(n4, 128), T4), T4)
    if n4 == RP4 * 128 and lo32.shape[0] == 2 * n4:
        e = exp32.astype(_I32)
        h = hi32.astype(_I32)
        lo = lo32.astype(_I32)
    else:
        e = jnp.zeros(RP4 * 128, _I32).at[:n4].set(exp32.astype(_I32))
        h = jnp.zeros(RP4 * 128, _I32).at[:n4].set(hi32.astype(_I32))
        lo = jnp.zeros(2 * RP4 * 128, _I32).at[: 2 * n4].set(lo32.astype(_I32))
    call = _build_join_call_f32(RP4)
    out = call(
        e.reshape(RP4, 128), lo.reshape(2 * RP4, 128), h.reshape(RP4, 128)
    )
    return out.reshape(-1)[: 4 * n4].astype(_U32)
