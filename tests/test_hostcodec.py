"""Native C++ host codec (native/dietgpu_host.cpp via dietgpu_tpu.hostcodec).

Locks the native library to the same byte-identical container as the NumPy
oracle (and therefore the XLA/Pallas device paths): archives must match
bit-for-bit in both directions, and every status-code contract of the
reference host layer must hold (capacity discovery, checksum mismatch,
per-block payload overflow, malformed headers).
"""

import os

import numpy as np
import pytest

from dietgpu_tpu import constants as C
from dietgpu_tpu import hostcodec as hc
from dietgpu_tpu.ref import ans_ref, float_ref

pytestmark = pytest.mark.skipif(
    not hc.available(), reason="native host codec not buildable here"
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _data(n, lam=20.0, seed=0x60D):
    rng = np.random.default_rng(seed)
    return np.minimum(rng.exponential(lam, n), 255).astype(np.uint8)


@pytest.mark.parametrize("prob_bits", [9, 10, 11])
@pytest.mark.parametrize("n", [0, 1, 13, 4095, 4096, 4097, 70_000])
def test_ans_byte_identity_with_oracle(n, prob_bits):
    data = _data(n)
    native = hc.ans_encode(data, prob_bits=prob_bits, use_checksum=True)
    oracle = ans_ref.ans_encode(data, prob_bits=prob_bits, use_checksum=True)
    assert native.shape == oracle.shape
    assert (native == oracle).all()
    # cross-decode both directions
    assert (hc.ans_decode(oracle) == data).all()
    dec, ok, got_n = ans_ref.ans_decode(native)
    assert ok and got_n == n and (dec == data).all()


@pytest.mark.parametrize(
    "ft,dtype",
    [
        (C.FLOAT_TYPE_FLOAT16, np.uint16),
        (C.FLOAT_TYPE_BFLOAT16, np.uint16),
        (C.FLOAT_TYPE_FLOAT32, np.uint32),
    ],
)
@pytest.mark.parametrize("n", [0, 5, 4096, 12_345])
def test_float_byte_identity_with_oracle(ft, dtype, n):
    rng = np.random.default_rng(7)
    bits = 16 if dtype == np.uint16 else 32
    words = rng.integers(0, 1 << bits, n, dtype=np.uint64).astype(dtype)
    native = hc.float_compress(words, ft, use_checksum=True)
    oracle = float_ref.float_compress(words, ft, use_checksum=True)
    assert native.shape == oracle.shape
    assert (native == oracle).all()
    out, got_ft = hc.float_decompress(oracle)
    assert got_ft == ft and out.dtype == dtype and (out == words).all()
    w2, ok, got_n = float_ref.float_decompress(native)
    assert ok and got_n == n and (w2 == words).all()


def test_decodes_golden_fixtures():
    """The committed golden archives decode through the native path."""
    for name in sorted(os.listdir(FIXTURES)):
        arc = np.fromfile(os.path.join(FIXTURES, name), dtype=np.uint8)
        if name.startswith("ans_"):
            expected, ok, _ = ans_ref.ans_decode(arc)
            assert ok
            assert (hc.ans_decode(arc) == expected).all(), name
            # info parity with the oracle header parse
            info = hc.ans_info(arc)
            ref = ans_ref.parse_header(arc)
            assert info["total_uncompressed_words"] == ref["total_uncompressed_words"]
            assert info["prob_bits"] == ref["prob_bits"]
            assert info["total_compressed_size"] == ref["total_compressed_size"]
        elif name.startswith("float_"):
            expected, ok, _ = float_ref.float_decompress(arc)
            assert ok
            out, ft = hc.float_decompress(arc)
            assert ft == float_ref.parse_float_header(arc)["float_type"]
            assert (out == expected).all(), name


def test_checksum_mismatch_raises():
    data = _data(10_000)
    arc = hc.ans_encode(data, use_checksum=True)
    bad = arc.copy()
    bad[-1] ^= 0xFF  # corrupt payload
    with pytest.raises(ValueError, match="checksum"):
        hc.ans_decode(bad)


def test_float_checksum_mismatch_raises():
    rng = np.random.default_rng(3)
    words = rng.integers(0, 1 << 16, 5000, dtype=np.uint64).astype(np.uint16)
    arc = hc.float_compress(words, C.FLOAT_TYPE_BFLOAT16, use_checksum=True)
    bad = arc.copy()
    bad[20] ^= 0xFF  # corrupt the nonComp plane (not covered by ANS checksum)
    with pytest.raises(ValueError, match="checksum"):
        hc.float_decompress(bad)


def test_bad_magic_raises():
    arc = hc.ans_encode(_data(100))
    bad = arc.copy()
    bad[3] ^= 0xFF
    with pytest.raises(ValueError, match="format"):
        hc.ans_decode(bad)
    with pytest.raises(ValueError, match="format"):
        hc.ans_info(bad)


def test_malformed_block_words_rejected():
    """Hostile per-block metadata must fail cleanly, not scribble memory."""
    data = _data(8192)
    arc = hc.ans_encode(data)
    bad = arc.copy()
    # blockWords of block 0 sit at 544 + 128*nb; set compressedWords and the
    # payload start to absurd values.
    bw_off = 544 + 128 * 2
    bad[bw_off : bw_off + 8] = np.array(
        [0xFFFF_FFFF, 0xFFFF_FFFF], dtype=np.uint32
    ).view(np.uint8)
    with pytest.raises(ValueError, match="format"):
        hc.ans_decode(bad)


def test_block_payload_overflow_detected():
    """Adversarial input (weight-1 symbols at pb=11) exceeds the per-block
    payload bound; the native encoder must report overflow like the reference
    device assert (GpuANSEncode.cuh:355-360)."""
    # 255 rare symbols once each + the rest a single symbol: at probBits=11
    # rare symbols get weight 1 -> ~11 bits/symbol worst case on a block of
    # pure rare symbols.
    rng = np.random.default_rng(9)
    head = np.arange(256, dtype=np.uint8).repeat(16)  # uniform-ish block
    body = rng.integers(0, 256, 3 * 4096).astype(np.uint8)
    data = np.concatenate([np.tile(head, 4), body])
    # make the distribution highly skewed overall so per-symbol cost in the
    # uniform block is high
    skew = np.zeros(4096 * 64, np.uint8)
    data = np.concatenate([skew, data])
    try:
        hc.ans_encode(data, prob_bits=11)
    except OverflowError:
        pass  # acceptable: matches the oracle
    # byte-identity with the oracle on whether overflow occurs
    try:
        ans_ref.ans_encode(data, prob_bits=11)
        oracle_overflow = False
    except OverflowError:
        oracle_overflow = True
    try:
        hc.ans_encode(data, prob_bits=11)
        native_overflow = False
    except OverflowError:
        native_overflow = True
    assert native_overflow == oracle_overflow


def test_capacity_discovery():
    """outCap=0 probe reports the required size (reference outSize contract,
    GpuANSDecode.cuh:326-340) — exercised through the wrapper roundtrip."""
    data = _data(5000)
    arc = hc.ans_encode(data)
    assert hc.ans_info(arc)["total_uncompressed_words"] == 5000
    assert hc.ans_decode(arc).size == 5000


def test_max_compressed_size_matches_python():
    lib = hc._load()
    for n in [0, 1, 4096, 123_457, 1 << 20]:
        assert lib.dg_max_compressed_size(n) == C.max_compressed_size(n)
        for ft in (1, 2, 3):
            assert lib.dg_max_float_compressed_size(
                ft, n
            ) == C.max_float_compressed_size(ft, n)
