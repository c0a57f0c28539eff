"""Shared jitted entry points and size bucketing for the test suite.

Module-level jit wrappers ensure the compilation cache is shared across all
tests in a session; padding to a small set of bucket sizes keeps the number
of distinct compilations low.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import decode as jdecode
from dietgpu_tpu.ans import encode as jencode

BUCKET = 16384  # default padded length for tests


def pad_to(data: np.ndarray, L: int = BUCKET) -> np.ndarray:
    assert data.size <= L
    out = np.zeros(L, np.uint8)
    out[: data.size] = data
    return out


def gen_exp_bytes(rng, n, lam):
    v = rng.exponential(scale=lam, size=n)
    return np.minimum(v, 255).astype(np.uint8)


encode_jit = jax.jit(jencode.ans_encode_padded, static_argnums=(2, 3))
decode_jit = jax.jit(jdecode.ans_decode_padded, static_argnums=(1, 2, 3))

# Eagerly-dispatched jnp ops are pathologically slow in this environment
# (each tiny op pays a remote-compile round trip); always go through jit.
from dietgpu_tpu.ans import stats as _stats
from dietgpu_tpu.ans.checksum import checksum_u8 as _checksum_u8

normalize_jit = jax.jit(_stats.normalize_probs, static_argnums=(2,))
histogram_jit = jax.jit(_stats.histogram_u8)
checksum_jit = jax.jit(_checksum_u8)
div_magic_jit = jax.jit(_stats.div_magic_u32)
umulhi_jit = jax.jit(_stats.umulhi_u32)


def jax_encode(data: np.ndarray, prob_bits=10, use_checksum=False, L=BUCKET):
    arc, size = encode_jit(
        jnp.asarray(pad_to(data, L)), data.size, prob_bits, use_checksum
    )
    return np.asarray(arc), int(size)


def jax_decode(arc: np.ndarray, prob_bits=10, out_max=BUCKET, verify=False):
    A = C.round_up(arc.size, 4)
    buf = np.zeros(A, np.uint8)
    buf[: arc.size] = arc
    return decode_jit(jnp.asarray(buf), prob_bits, out_max, verify)
