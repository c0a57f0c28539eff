"""Float codec oracle tests (FloatTest.cu / float_test.py parity)."""

import numpy as np
import pytest

from dietgpu_tpu import constants as C
from dietgpu_tpu.ref import ans_ref, float_ref

FLOAT_TYPES = [
    C.FLOAT_TYPE_FLOAT16,
    C.FLOAT_TYPE_BFLOAT16,
    C.FLOAT_TYPE_FLOAT32,
]


def gen_float_words(rng, n, float_type):
    """N(0,1) data as raw words of the given float type."""
    x = rng.standard_normal(n)
    if float_type == C.FLOAT_TYPE_FLOAT16:
        return x.astype(np.float16).view(np.uint16)
    if float_type == C.FLOAT_TYPE_BFLOAT16:
        # bfloat16 = top 16 bits of the f32 pattern (truncation is fine for
        # test data)
        return (x.astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
    return x.astype(np.float32).view(np.uint32)


@pytest.mark.parametrize("float_type", FLOAT_TYPES)
@pytest.mark.parametrize("prob_bits", [9, 10])
@pytest.mark.parametrize("n", [1, 7, 16, 4095, 4096, 10000, 100000])
def test_roundtrip(rng, float_type, prob_bits, n):
    words = gen_float_words(rng, n, float_type)
    arc = float_ref.float_compress(
        words, float_type, prob_bits=prob_bits, use_checksum=True
    )
    out, ok, size = float_ref.float_decompress(arc, float_type)
    assert ok and size == n
    np.testing.assert_array_equal(out, words)


@pytest.mark.parametrize("float_type", FLOAT_TYPES)
def test_split_join_inverse(rng, float_type):
    words = gen_float_words(rng, 12345, float_type)
    comp, plane = float_ref.float_split(words, float_type)
    back = float_ref.float_join(comp, plane, float_type, words.size)
    np.testing.assert_array_equal(back, words)


def test_bf16_split_fields(rng):
    """bf16 comp must be exactly the 8 exponent bits."""
    words = gen_float_words(rng, 5000, C.FLOAT_TYPE_BFLOAT16)
    comp, plane = float_ref.float_split(words, C.FLOAT_TYPE_BFLOAT16)
    exponent = ((words >> 7) & 0xFF).astype(np.uint8)
    np.testing.assert_array_equal(comp, exponent)
    # nonComp = (mantissa << 1) | sign  (rotate-left-1 layout)
    sign = (words >> 15).astype(np.uint8)
    mant = (words & 0x7F).astype(np.uint8)
    np.testing.assert_array_equal(plane[: words.size], (mant << 1) | sign)


def test_f32_split_fields(rng):
    words = gen_float_words(rng, 5000, C.FLOAT_TYPE_FLOAT32)
    comp, _ = float_ref.float_split(words, C.FLOAT_TYPE_FLOAT32)
    exponent = ((words >> 23) & 0xFF).astype(np.uint8)
    np.testing.assert_array_equal(comp, exponent)


@pytest.mark.parametrize("float_type", FLOAT_TYPES)
def test_compression_gain_normal_data(rng, float_type):
    """N(0,1) data must actually compress (float_test.py:78-96).

    Expected ratios: bf16 ~0.67x, f16 ~0.86x, f32 ~0.78x (BASELINE.md).
    """
    n = 200000
    words = gen_float_words(rng, n, float_type)
    arc = float_ref.float_compress(words, float_type)
    raw_bytes = n * C.float_word_size(float_type)
    ratio = arc.size / raw_bytes
    limit = {
        C.FLOAT_TYPE_FLOAT16: 0.88,
        C.FLOAT_TYPE_BFLOAT16: 0.70,
        C.FLOAT_TYPE_FLOAT32: 0.86,  # theory (24 + ~2.7)/32 ~= 0.834
    }[float_type]
    assert ratio < limit, f"ratio {ratio:.3f} exceeds {limit}"


@pytest.mark.parametrize("float_type", FLOAT_TYPES)
def test_relu_sparse_data(rng, float_type):
    """ReLU-sparse tensors (half zeros) compress much better."""
    n = 100000
    x = rng.standard_normal(n)
    x = np.maximum(x, 0)
    if float_type == C.FLOAT_TYPE_FLOAT16:
        words = x.astype(np.float16).view(np.uint16)
    elif float_type == C.FLOAT_TYPE_BFLOAT16:
        words = (x.astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
    else:
        words = x.astype(np.float32).view(np.uint32)
    arc = float_ref.float_compress(words, float_type)
    out, ok, _ = float_ref.float_decompress(arc)
    assert ok
    np.testing.assert_array_equal(out, words)


def test_archive_size_bound(rng):
    for ft in FLOAT_TYPES:
        words = gen_float_words(rng, 33333, ft)
        arc = float_ref.float_compress(words, ft)
        assert arc.size <= C.max_float_compressed_size(ft, words.size)


def test_float_checksum_detects_corruption(rng):
    words = gen_float_words(rng, 10000, C.FLOAT_TYPE_BFLOAT16)
    arc = float_ref.float_compress(
        words, C.FLOAT_TYPE_BFLOAT16, use_checksum=True
    )
    arc2 = arc.copy()
    arc2[20] ^= 0x5A  # corrupt a nonComp plane byte
    with pytest.raises(ValueError, match="checksum"):
        float_ref.float_decompress(arc2)


def test_header_fields(rng):
    words = gen_float_words(rng, 777, C.FLOAT_TYPE_FLOAT16)
    arc = float_ref.float_compress(words, C.FLOAT_TYPE_FLOAT16, use_checksum=True)
    info = float_ref.parse_float_header(arc)
    assert info["size"] == 777
    assert info["float_type"] == C.FLOAT_TYPE_FLOAT16
    assert info["use_checksum"]
    # embedded ANS archive must itself be valid and checksum-free
    ans_info = ans_ref.parse_header(arc[info["ans_start"] :])
    assert not ans_info["use_checksum"]
    assert ans_info["total_uncompressed_words"] == 777
