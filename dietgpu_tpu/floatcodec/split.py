"""Elementwise float word split/join transforms (JAX).

Pure VPU work on TPU. Bit-exact with FloatTypeInfo<FT>::split/join
(GpuFloatUtils.cuh:111-203):

  f16 : comp = word >> 8;   nonComp = word & 0xff
  bf16: r = rotl16(word,1); comp = r >> 8; nonComp = r & 0xff
  f32 : v = rotl32(word,1); comp = v >> 24; nonComp = v & 0xffffff
"""

import jax.numpy as jnp

from .. import constants as C

_U16 = jnp.uint16
_U32 = jnp.uint32


def split_words(words: jnp.ndarray, float_type: int):
    """Split raw float words into (comp u8, nonComp parts tuple)."""
    if float_type == C.FLOAT_TYPE_FLOAT16:
        assert words.dtype == _U16
        return (words >> _U16(8)).astype(jnp.uint8), (
            (words & _U16(0xFF)).astype(jnp.uint8),
        )
    if float_type == C.FLOAT_TYPE_BFLOAT16:
        assert words.dtype == _U16
        r = (words << _U16(1)) | (words >> _U16(15))
        return (r >> _U16(8)).astype(jnp.uint8), (
            (r & _U16(0xFF)).astype(jnp.uint8),
        )
    if float_type == C.FLOAT_TYPE_FLOAT32:
        assert words.dtype == _U32
        v = (words << _U32(1)) | (words >> _U32(31))
        comp = (v >> _U32(24)).astype(jnp.uint8)
        lo = (v & _U32(0xFFFF)).astype(_U16)
        hi = ((v >> _U32(16)) & _U32(0xFF)).astype(jnp.uint8)
        return comp, (lo, hi)
    raise ValueError(f"bad float type {float_type}")


def join_words(comp: jnp.ndarray, noncomp, float_type: int) -> jnp.ndarray:
    """Inverse of split_words."""
    if float_type == C.FLOAT_TYPE_FLOAT16:
        (nc,) = noncomp
        return (comp.astype(_U16) << _U16(8)) | nc.astype(_U16)
    if float_type == C.FLOAT_TYPE_BFLOAT16:
        (nc,) = noncomp
        r = (comp.astype(_U16) << _U16(8)) | nc.astype(_U16)
        return (r >> _U16(1)) | (r << _U16(15))
    if float_type == C.FLOAT_TYPE_FLOAT32:
        lo, hi = noncomp
        v = (
            (comp.astype(_U32) << _U32(24))
            | (hi.astype(_U32) << _U32(16))
            | lo.astype(_U32)
        )
        return (v >> _U32(1)) | (v << _U32(31))
    raise ValueError(f"bad float type {float_type}")
