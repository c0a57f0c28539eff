"""JAX float codec: bit-exact vs the NumPy oracle + roundtrips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.floatcodec import codec as fcodec
from dietgpu_tpu.ref import float_ref

FLOAT_TYPES = [
    C.FLOAT_TYPE_FLOAT16,
    C.FLOAT_TYPE_BFLOAT16,
    C.FLOAT_TYPE_FLOAT32,
]

LW = 16384  # padded word-count bucket

fcompress_jit = jax.jit(
    fcodec.float_compress_padded, static_argnums=(2, 3, 4)
)
fdecompress_jit = jax.jit(
    fcodec.float_decompress_padded, static_argnums=(1, 2, 3, 4)
)


def gen_float_words(rng, n, float_type):
    x = rng.standard_normal(n)
    if float_type == C.FLOAT_TYPE_FLOAT16:
        return x.astype(np.float16).view(np.uint16)
    if float_type == C.FLOAT_TYPE_BFLOAT16:
        return (x.astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
    return x.astype(np.float32).view(np.uint32)


def pad_words(words, Lw=LW):
    dt = words.dtype
    out = np.zeros(Lw, dt)
    out[: words.size] = words
    return out


def jax_fcompress(words, float_type, prob_bits=10, use_checksum=False):
    arc, size = fcompress_jit(
        jnp.asarray(pad_words(words)), words.size, float_type, prob_bits, use_checksum
    )
    return np.asarray(arc), int(size)


def jax_fdecompress(arc, float_type, prob_bits=10, verify=False):
    F = fcodec.float_archive_buffer_bytes(float_type, LW)
    buf = np.zeros(max(F, arc.size), np.uint8)
    buf[: arc.size] = arc
    return fdecompress_jit(jnp.asarray(buf), float_type, LW, prob_bits, verify)


@pytest.mark.parametrize("float_type", FLOAT_TYPES)
def test_compress_bitexact_vs_oracle(rng, float_type):
    for n in (1, 4095, 4096, 9000):
        words = gen_float_words(rng, n, float_type)
        expect = float_ref.float_compress(words, float_type, use_checksum=True)
        arc, size = jax_fcompress(words, float_type, 10, True)
        assert size == expect.size
        np.testing.assert_array_equal(arc[:size], expect)


@pytest.mark.parametrize("float_type", FLOAT_TYPES)
def test_roundtrip(rng, float_type):
    for n in (1, 4097, 12345):
        words = gen_float_words(rng, n, float_type)
        arc, size = jax_fcompress(words, float_type, 10, True)
        res = jax_fdecompress(arc[:size], float_type, 10, True)
        assert bool(res["success"]) and bool(res["checksum_ok"])
        assert int(res["size"]) == n
        np.testing.assert_array_equal(np.asarray(res["out"])[:n], words)


@pytest.mark.parametrize("float_type", FLOAT_TYPES)
def test_decode_oracle_archives(rng, float_type):
    n = 10000
    words = gen_float_words(rng, n, float_type)
    arc = float_ref.float_compress(words, float_type, use_checksum=True)
    res = jax_fdecompress(arc, float_type, 10, True)
    assert bool(res["success"]) and bool(res["checksum_ok"])
    np.testing.assert_array_equal(np.asarray(res["out"])[:n], words)


@pytest.mark.parametrize("float_type", FLOAT_TYPES)
def test_oracle_decodes_jax_archives(rng, float_type):
    n = 8000
    words = gen_float_words(rng, n, float_type)
    arc, size = jax_fcompress(words, float_type)
    out, ok, size2 = float_ref.float_decompress(arc[:size])
    assert ok and size2 == n
    np.testing.assert_array_equal(out, words)


def test_compression_ratio_bf16(rng):
    n = LW
    words = gen_float_words(rng, n, C.FLOAT_TYPE_BFLOAT16)
    _, size = jax_fcompress(words, C.FLOAT_TYPE_BFLOAT16)
    assert size / (2 * n) < 0.70


def test_split_join_jax(rng):
    for ft in FLOAT_TYPES:
        from dietgpu_tpu.floatcodec.split import join_words, split_words

        words = gen_float_words(rng, 4096, ft)

        def rt(w):
            comp, nc = split_words(w, ft)
            return join_words(comp, nc, ft)

        got = np.asarray(jax.jit(rt)(jnp.asarray(words)))
        np.testing.assert_array_equal(got, words)
