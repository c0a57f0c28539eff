"""Folded XOR checksum (JAX).

Equivalent to XOR-ing every byte of the input (the reference's vectorized
u32 XOR + byte fold, GpuChecksum.cuh:27-93, is byte-order insensitive by
design): XOR all u32 words, then fold the four byte lanes. Runs as one
XLA XOR-reduction over a (rows, 128)-shaped u32 view — the round-1 u8
log-tree was layout-hostile (32x-padded u8 slices) and compiled for
minutes at large sizes.
"""

import jax
import jax.numpy as jnp

from .. import constants as C
from . import layout

_U32 = jnp.uint32
_I32 = jnp.int32


def _fold8(x: jnp.ndarray) -> jnp.ndarray:
    """Fold a u32 XOR accumulator to the 8-bit checksum (as u32)."""
    x = x ^ (x >> _U32(16))
    x = x ^ (x >> _U32(8))
    return x & _U32(0xFF)


def checksum_u32(words: jnp.ndarray, length_bytes) -> jnp.ndarray:
    """Checksum of the first `length_bytes` bytes of a packed little-endian
    u32 byte stream. Returns the folded 8-bit value as u32."""
    assert words.dtype in (_U32, _I32)
    n4 = words.shape[0]
    nb = jnp.asarray(length_bytes, _I32)
    idx = jnp.arange(n4, dtype=_I32)
    full = idx < (nb >> 2)
    # boundary word: keep only the low (length % 4) bytes
    bmask = (_U32(1) << (_U32(8) * (nb & 3).astype(_U32))) - _U32(1)
    w = words.astype(_U32)
    w = jnp.where(full, w, jnp.where(idx == (nb >> 2), w & bmask, _U32(0)))
    pad = (-n4) % 128
    if pad:
        w = jnp.concatenate([w, jnp.zeros(pad, _U32)])
    acc = jax.lax.reduce(
        w.reshape(-1, 128), _U32(0), jax.lax.bitwise_xor, (0, 1)
    )
    return _fold8(acc)


def checksum_u8(data: jnp.ndarray, length) -> jnp.ndarray:
    """XOR of data[:length] bytes, returned as u32. `data` is 1-D u8."""
    assert data.dtype == jnp.uint8
    n = data.shape[0]
    if n % 4 != 0:
        data = jnp.concatenate([data, jnp.zeros((-n) % 4, jnp.uint8)])
    nb = jnp.minimum(jnp.asarray(length, _I32), n)
    return checksum_u32(layout.u8_to_u32le(data), nb)
