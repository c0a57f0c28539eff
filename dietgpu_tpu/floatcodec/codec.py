"""Float codec compress/decompress pipelines (JAX, jittable).

Pipeline mirrors the reference orchestration (GpuFloatCompress.cuh:446-579):
split floats into exponent bytes + raw planes with a fused histogram, rANS-
encode the exponents (histogram passed through so the ANS layer skips its
own), and assemble `[FloatHeader | nonComp plane(s) | ANS archive]`.
Decompress reverses it with the size cross-check
(GpuFloatDecompress.cuh:304-313).
"""

import jax
import jax.numpy as jnp

from .. import constants as C
from ..ans import decode as ans_decode_mod
from ..ans import encode as ans_encode_mod
from ..ans import layout
from ..ans import stats
from ..ans.checksum import checksum_u8
from .split import join_words, split_words

_U32 = jnp.uint32
_I32 = jnp.int32


def _words_to_bytes(words: jnp.ndarray) -> jnp.ndarray:
    """Little-endian byte view of a u16/u32 array (TPU-layout-safe)."""
    if words.dtype == jnp.uint32:
        return layout.u32_to_u8le(words)
    assert words.dtype == jnp.uint16
    n = words.shape[0]
    pad = (-n) % 2
    if pad:
        words = jnp.concatenate([words, jnp.zeros(1, jnp.uint16)])
    w32 = words[0::2].astype(_U32) | (words[1::2].astype(_U32) << 16)
    return layout.u32_to_u8le(w32)[: 2 * n]


def float_archive_buffer_bytes(float_type: int, padded_words: int) -> int:
    """Static float-archive buffer size for inputs padded to padded_words."""
    return (
        C.FLOAT_HEADER_BYTES
        + C.float_noncomp_bytes(float_type, padded_words)
        + ans_encode_mod.archive_buffer_bytes(padded_words)
    )


def float_compress_padded(
    words: jnp.ndarray,
    length,
    float_type: int,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
):
    """Compress words[:length] into a float archive.

    Args:
      words: (Lw,) u16 (f16/bf16) or u32 (f32) raw float words, Lw a positive
        multiple of 4096 (static).
      length: dynamic word count.
      float_type / prob_bits / use_checksum: static.

    Returns (archive u8 (F,), size u32), F = float_archive_buffer_bytes.
    """
    Lw = words.shape[0]
    assert Lw % C.DEFAULT_BLOCK_SIZE == 0 and Lw > 0
    length = jnp.asarray(length, _I32)
    word_size = C.float_word_size(float_type)

    valid = jnp.arange(Lw, dtype=_I32) < length
    comp, noncomp = split_words(words, float_type)
    comp = jnp.where(valid, comp, jnp.uint8(0))

    hist = stats.histogram_u8(comp, length)
    ans_arc, ans_size = ans_encode_mod.ans_encode_padded(
        comp, length, prob_bits, use_checksum=False, precomputed_histogram=hist
    )

    checksum = (
        checksum_u8(_words_to_bytes(words), length * word_size)
        if use_checksum
        else _U32(0)
    )
    header = jnp.array([(C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION, 0, 0, 0], _U32)
    header = header.at[1].set(length.astype(_U32))
    header = header.at[2].set(_U32((float_type & 0xF) | (int(use_checksum) << 4)))
    header = header.at[3].set(checksum)
    header_bytes = jax.lax.bitcast_convert_type(header, jnp.uint8).reshape(-1)

    F = float_archive_buffer_bytes(float_type, Lw)
    buf = jnp.zeros(F, jnp.uint8)
    buf = jax.lax.dynamic_update_slice(buf, header_bytes, (0,))

    if float_type == C.FLOAT_TYPE_FLOAT32:
        lo, hi = noncomp
        lo = jnp.where(valid, lo, jnp.uint16(0))
        hi = jnp.where(valid, hi, jnp.uint8(0))
        buf = jax.lax.dynamic_update_slice(buf, _words_to_bytes(lo), (16,))
        hi_off = 16 + 2 * C.round_up(length, 8)
        buf = jax.lax.dynamic_update_slice(buf, hi, (hi_off,))
        plane_bytes = 2 * C.round_up(length, 8) + C.round_up(length, 16)
    else:
        (nc,) = noncomp
        nc = jnp.where(valid, nc, jnp.uint8(0))
        buf = jax.lax.dynamic_update_slice(buf, nc, (16,))
        plane_bytes = C.round_up(length, 16)

    ans_off = 16 + plane_bytes
    buf = jax.lax.dynamic_update_slice(buf, ans_arc, (ans_off,))
    size = _U32(16) + plane_bytes.astype(_U32) + ans_size
    return buf, size


def float_decompress_padded(
    archive: jnp.ndarray,
    float_type: int,
    out_max_words: int,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    verify_checksum: bool = False,
):
    """Decompress a float archive buffer.

    Args:
      archive: (F,) u8 with F >= float_archive_buffer_bytes(float_type, Lw)
        for Lw = out_max_words; extra bytes ignored.
      float_type / prob_bits: static; must match the archive.
      out_max_words: static output capacity (words), multiple of 4096.

    Returns dict: out (out_max_words,) u16/u32, size u32 (words), success,
    checksum_ok.
    """
    Lw = out_max_words
    assert Lw % C.DEFAULT_BLOCK_SIZE == 0 and Lw > 0
    word_size = C.float_word_size(float_type)

    h = archive[:16].reshape(4, 4).astype(_U32)
    h = h[:, 0] | (h[:, 1] << 8) | (h[:, 2] << 16) | (h[:, 3] << 24)
    magic_ok = h[0] == _U32((C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION)
    n = h[1].astype(_I32)
    options = h[2]
    ft_ok = (options & _U32(0xF)) == _U32(float_type)
    has_checksum = (options & _U32(0x10)) != 0
    stored_checksum = h[3]

    capacity_ok = n <= Lw
    n_eff = jnp.clip(n, 0, Lw)

    if float_type == C.FLOAT_TYPE_FLOAT32:
        plane_bytes = 2 * C.round_up(n_eff, 8) + C.round_up(n_eff, 16)
    else:
        plane_bytes = C.round_up(n_eff, 16)
    ans_off = 16 + plane_bytes

    A = ans_encode_mod.archive_buffer_bytes(Lw)
    arc_padded = jnp.concatenate([archive, jnp.zeros(A + 4, jnp.uint8)])
    # ans_off = 16 + plane_bytes is always 4-byte aligned (plane_bytes is a
    # multiple of 16 for f16/bf16; 2*roundUp(n,8) + roundUp(n,16) for f32),
    # so the sliced ANS archive can be reinterpreted as u32 words.
    ans_arc = jax.lax.dynamic_slice(arc_padded, (ans_off,), (A,))

    res = ans_decode_mod.ans_decode_padded(
        ans_arc, prob_bits, Lw, verify_checksum=False
    )
    comp = res["out"]
    ans_n = res["size"].astype(_I32)
    size_ok = ans_n == n_eff

    valid = jnp.arange(Lw, dtype=_I32) < n_eff
    if float_type == C.FLOAT_TYPE_FLOAT32:
        lo_b = jax.lax.dynamic_slice(arc_padded, (16,), (2 * Lw,))
        lo = lo_b[0::2].astype(jnp.uint16) | (
            lo_b[1::2].astype(jnp.uint16) << jnp.uint16(8)
        )
        hi_off = 16 + 2 * C.round_up(n_eff, 8)
        hi = jax.lax.dynamic_slice(arc_padded, (hi_off,), (Lw,))
        words = join_words(comp, (lo, hi), float_type)
        words = jnp.where(valid, words, jnp.uint32(0))
    else:
        nc = jax.lax.dynamic_slice(arc_padded, (16,), (Lw,))
        words = join_words(comp, (nc,), float_type)
        words = jnp.where(valid, words, jnp.uint16(0))

    success = magic_ok & ft_ok & capacity_ok & res["success"] & size_ok

    result = {
        "out": words,
        "size": n.astype(_U32),
        "success": success,
        "checksum_ok": jnp.bool_(True),
    }
    if verify_checksum:
        actual = checksum_u8(_words_to_bytes(words), n_eff * word_size)
        result["checksum_ok"] = ~has_checksum | (actual == stored_checksum)
    return result
