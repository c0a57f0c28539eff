"""Folded XOR checksum (JAX).

Equivalent to XOR-ing every byte of the input (the reference's vectorized u32
XOR + byte fold, GpuChecksum.cuh:27-93, is byte-order insensitive by design).
"""

import jax.numpy as jnp


def checksum_u8(data: jnp.ndarray, length) -> jnp.ndarray:
    """XOR of data[:length] bytes, returned as u32. `data` is 1-D u8."""
    assert data.dtype == jnp.uint8
    n = data.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32) < jnp.asarray(length, jnp.int32)
    masked = jnp.where(valid, data, jnp.uint8(0)).astype(jnp.uint32)
    # XOR-reduce == per-bit sum mod 2; do it with a log-tree via bitwise ops
    # on a padded power-of-two array.
    size = 1
    while size < max(n, 1):
        size *= 2
    padded = jnp.zeros(size, jnp.uint32).at[:n].set(masked)
    while size > 1:
        size //= 2
        padded = padded[:size] ^ padded[size : 2 * size]
    return padded[0]
