"""JAX codec must match the NumPy oracle bit-for-bit (CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.ref import ans_ref

from helpers import (
    BUCKET,
    checksum_jit,
    div_magic_jit,
    encode_jit,
    gen_exp_bytes,
    histogram_jit,
    jax_decode,
    jax_encode,
    normalize_jit,
    pad_to,
    umulhi_jit,
)


@pytest.mark.parametrize("prob_bits", [9, 10, 11])
def test_normalize_matches_oracle(rng, prob_bits):
    for lam in (2.0, 25.0, 300.0):
        data = gen_exp_bytes(rng, 50000, lam)
        hist = ans_ref.histogram_u8(data)
        expect = ans_ref.normalize_probs(hist, data.size, prob_bits)
        got = np.asarray(normalize_jit(jnp.asarray(hist), data.size, prob_bits))
        np.testing.assert_array_equal(got, expect)


def test_histogram_matches(rng):
    data = gen_exp_bytes(rng, 9999, 40.0)
    got = np.asarray(histogram_jit(jnp.asarray(pad_to(data)), data.size))
    np.testing.assert_array_equal(got, ans_ref.histogram_u8(data))


def test_div_magic_matches(rng):
    pdfs = np.arange(1, 2049, dtype=np.uint32)
    m_ref, s_ref = ans_ref.div_magic(pdfs)
    m_jax, s_jax = div_magic_jit(jnp.asarray(pdfs))
    np.testing.assert_array_equal(np.asarray(m_jax), m_ref)
    np.testing.assert_array_equal(np.asarray(s_jax), s_ref)


def test_umulhi_matches(rng):
    a = rng.integers(0, 1 << 32, size=10000, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=10000, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(umulhi_jit(jnp.asarray(a), jnp.asarray(b)))
    expect = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_checksum_matches(rng):
    data = rng.integers(0, 256, size=5001, dtype=np.uint8)
    got = int(checksum_jit(jnp.asarray(pad_to(data)), data.size))
    assert got == ans_ref.checksum_bytes(data)


@pytest.mark.parametrize("prob_bits", [9, 10, 11])
def test_encode_bitexact_vs_oracle(rng, prob_bits):
    for n in (1, 4095, 4096, 4097, 13000):
        data = gen_exp_bytes(rng, n, 20.0)
        expect = ans_ref.ans_encode(data, prob_bits=prob_bits, use_checksum=True)
        arc, size = jax_encode(data, prob_bits, True)
        assert size == expect.size
        np.testing.assert_array_equal(arc[:size], expect)


@pytest.mark.parametrize("prob_bits", [9, 10, 11])
def test_decode_roundtrip(rng, prob_bits):
    for n in (1, 31, 4096, 12345):
        data = gen_exp_bytes(rng, n, 15.0)
        arc, size = jax_encode(data, prob_bits, True)
        res = jax_decode(arc[:size], prob_bits, BUCKET, True)
        assert bool(res["success"]) and bool(res["checksum_ok"])
        assert int(res["size"]) == n
        np.testing.assert_array_equal(np.asarray(res["out"])[:n], data)


def test_decode_oracle_archives(rng):
    """JAX decode must accept archives produced by the NumPy oracle."""
    n = 13000
    data = gen_exp_bytes(rng, n, 25.0)
    arc = ans_ref.ans_encode(data, use_checksum=True)
    res = jax_decode(arc, 10, BUCKET, True)
    assert bool(res["success"]) and bool(res["checksum_ok"])
    np.testing.assert_array_equal(np.asarray(res["out"])[:n], data)


def test_oracle_decodes_jax_archives(rng):
    n = 13000
    data = gen_exp_bytes(rng, n, 10.0)
    arc, size = jax_encode(data)
    out, ok, size2 = ans_ref.ans_decode(arc[:size])
    assert ok and size2 == n
    np.testing.assert_array_equal(out, data)


def test_decode_capacity_failure(rng):
    data = gen_exp_bytes(rng, 9000, 15.0)
    arc, size = jax_encode(data)
    res = jax_decode(arc[:size], 10, C.DEFAULT_BLOCK_SIZE, False)
    assert not bool(res["success"])
    assert int(res["size"]) == data.size


def test_encode_empty(rng):
    arc, size = jax_encode(np.zeros(0, np.uint8))
    expect = ans_ref.ans_encode(np.zeros(0, np.uint8))
    assert size == expect.size
    np.testing.assert_array_equal(arc[:size], expect)


def test_incompressible_roundtrip(rng):
    data = rng.integers(0, 256, size=10000, dtype=np.uint8)
    arc, size = jax_encode(data)
    res = jax_decode(arc[:size])
    assert bool(res["success"])
    np.testing.assert_array_equal(np.asarray(res["out"])[: data.size], data)


def test_vmap_batched_encode(rng):
    """Batched encode via vmap must agree with the per-element oracle."""
    from dietgpu_tpu.ans import encode as jencode

    B, n = 4, 10000
    datas = [gen_exp_bytes(rng, n - 100 * i, float(5 + 30 * i)) for i in range(B)]
    padded = np.stack([pad_to(d) for d in datas])
    lengths = np.array([d.size for d in datas], np.int32)
    enc = jax.jit(
        jax.vmap(lambda d, l: jencode.ans_encode_padded(d, l, 10, False))
    )
    arcs, sizes = enc(jnp.asarray(padded), jnp.asarray(lengths))
    for i in range(B):
        expect = ans_ref.ans_encode(datas[i])
        assert int(sizes[i]) == expect.size
        np.testing.assert_array_equal(np.asarray(arcs[i])[: expect.size], expect)


def _overflow_input():
    """64 KiB of zeros + one 4 KiB block of weight-1 symbols: at probBits=11
    every rare symbol costs ~11 bits, so the block needs ~2816 > 2560 words
    (the reference device-asserts, GpuANSEncode.cuh:355-360)."""
    zeros = np.zeros(16 * C.DEFAULT_BLOCK_SIZE, np.uint8)
    rare = np.tile(np.arange(1, 256, dtype=np.uint8), 17)[: C.DEFAULT_BLOCK_SIZE]
    return np.concatenate([zeros, rare])


def test_encode_overflow_oracle_raises():
    with pytest.raises(OverflowError):
        ans_ref.ans_encode(_overflow_input(), prob_bits=11)


def test_encode_overflow_flagged():
    data = _overflow_input()
    L = C.round_up(data.size, C.DEFAULT_BLOCK_SIZE)
    arc, size = encode_jit(jnp.asarray(pad_to(data, L)), data.size, 11, False)
    assert int(size) & C.SIZE_OVERFLOW_BIT
    # sanity: the same data at probBits=9 (max ~9 bits/symbol) is fine
    arc, size = encode_jit(jnp.asarray(pad_to(data, L)), data.size, 9, False)
    assert not int(size) & C.SIZE_OVERFLOW_BIT
