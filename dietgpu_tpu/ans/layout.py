"""TPU-layout-safe byte<->word conversions.

A (N, 4) u8 array on TPU pads its minor dim from 4 to 128 (32x memory blowup;
the naive `reshape(-1, 4).astype(u32)` idiom OOMs on large archives). These
helpers keep every intermediate at a 128-lane minor dimension.
"""

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def u8_to_u32le(x: jnp.ndarray) -> jnp.ndarray:
    """(4n,) u8 -> (n,) u32 little-endian, layout-safe.

    Pads the input to a multiple of 512 bytes internally.
    """
    n = x.shape[0]
    assert n % 4 == 0
    pad = (-n) % 512
    if pad:
        x = jnp.concatenate([x, jnp.zeros(pad, jnp.uint8)])
    d2 = x.reshape(-1, 512)
    b0 = d2[:, 0::4].astype(_U32)
    b1 = d2[:, 1::4].astype(_U32)
    b2 = d2[:, 2::4].astype(_U32)
    b3 = d2[:, 3::4].astype(_U32)
    w = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    return w.reshape(-1)[: n // 4]


def u32_to_u8le(w: jnp.ndarray) -> jnp.ndarray:
    """(n,) u32 -> (4n,) u8 little-endian, layout-safe."""
    n = w.shape[0]
    pad = (-n) % 128
    if pad:
        w = jnp.concatenate([w, jnp.zeros(pad, _U32)])
    w2 = w.reshape(-1, 128)
    out = jnp.zeros((w2.shape[0], 512), jnp.uint8)
    for j in range(4):
        out = out.at[:, j::4].set(((w2 >> (8 * j)) & _U32(0xFF)).astype(jnp.uint8))
    return out.reshape(-1)[: 4 * n]


def bitcast_i32(x):
    """Width-preserving u32->i32 view (free bitcast; `astype` lowers to a
    full-buffer convert pass on TPU — measured 1.66 vs 0.98 ms per 96 MB)."""
    if x.dtype == jnp.int32:
        return x
    assert x.dtype == _U32
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def bitcast_u32(x):
    """Width-preserving i32->u32 view (free bitcast; see bitcast_i32)."""
    if x.dtype == _U32:
        return x
    assert x.dtype == jnp.int32
    return jax.lax.bitcast_convert_type(x, _U32)
