"""Golden-fixture format lock (VERDICT #5).

The committed archives in tests/fixtures/ pin the container layout to the
reference field math — expectations below are hand-derived from
GpuANSUtils.cuh:67-229 (ANSCoalescedHeader) and GpuFloatUtils.cuh:20-74
(GpuFloatHeader), NOT recomputed through the oracle. If the oracle (and
with it every bit-exactness test) ever drifts, these fail.

Layout being asserted (all little-endian u32 unless noted):
  [0] magicAndVersion = 0xd00d0001          [1] numBlocks
  [2] totalUncompressedWords                [3] totalCompressedWords
  [4] options = (checksum<<4) | probBits    [5] checksum
  [6..7] unused; u16 probs[256] @ 32; 32xu32 states per block @ 544;
  uint2 blockWords[roundUp(nb,2)] @ 544+128*nb:
      .x = (uncompWords<<16)|compWords, .y = prefix (u16 words, 16B-aligned)
  payload @ +8*roundUp(nb,2), each block's region 16B-aligned.
Float: [0] 0xf00f0001, [1] size (words), [2] (checksum<<4)|floatType,
  [3] checksum; then nonComp plane(s) 16B-rounded; then an ANS archive.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.ref import ans_ref, float_ref

HERE = os.path.join(os.path.dirname(__file__), "fixtures")


def load(name):
    return np.fromfile(os.path.join(HERE, name), dtype=np.uint8)


def u32(a):
    return a[: a.size & ~3].view("<u4")


def _data(n, lam=20.0, seed=0x60D):
    rng = np.random.default_rng(seed)
    return np.minimum(rng.exponential(lam, n), 255).astype(np.uint8)


def _floats(n, seed=0x60D):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


ANS_MAGIC_VER = 0xD00D0001
FLOAT_MAGIC_VER = 0xF00F0001


def test_ans_empty_header():
    a = load("ans_empty.bin")
    w = u32(a)
    assert a.size == 544  # 32B header + 512B probs, zero blocks
    assert w[0] == ANS_MAGIC_VER
    assert w[1] == 0 and w[2] == 0 and w[3] == 0
    assert w[4] == 10  # default probBits, no checksum


def test_ans_1byte_fields():
    a = load("ans_1byte.bin")
    w = u32(a)
    assert a.size == 32 + 512 + 128 + 16  # overhead(nb=1), empty payload
    assert w[0] == ANS_MAGIC_VER
    assert w[1] == 1 and w[2] == 1 and w[3] == 0
    # single symbol 0xA5 gets the full 2^10 weight
    probs = a[32 : 32 + 512].view("<u2")
    assert probs[0xA5] == 1 << 10
    assert probs.sum() == 1 << 10
    # encoding one symbol with pdf == 2^probBits leaves all 32 lane states
    # at the start state 2^15 (state = (s/pdf)<<pb + s%pdf + 0 = s)
    states = w[136:168]
    assert (states == C.ANS_START_STATE).all()
    # blockWords[0]: 1 uncompressed word, 0 compressed, prefix 0
    assert w[168] == (1 << 16) | 0
    assert w[169] == 0


@pytest.mark.parametrize(
    "name,n,nb,pb,cksum",
    [
        ("ans_4096.bin", 4096, 1, 10, False),
        ("ans_4097.bin", 4097, 2, 10, False),
        ("ans_pb9.bin", 10000, 3, 9, False),
        ("ans_pb11.bin", 10000, 3, 11, False),
        ("ans_checksum.bin", 5000, 2, 10, True),
    ],
)
def test_ans_header_fields(name, n, nb, pb, cksum):
    a = load(name)
    w = u32(a)
    assert w[0] == ANS_MAGIC_VER
    assert w[1] == nb
    assert w[2] == n
    assert w[4] == (int(cksum) << 4) | pb
    probs = a[32 : 32 + 512].view("<u2")
    assert int(probs.sum()) == 1 << pb
    # structural size identity: payload bytes == 2 * totalCompressedWords
    rnb2 = nb + (nb & 1)
    data_start = 32 + 512 + 128 * nb + 8 * rnb2
    assert a.size == data_start + 2 * int(w[3])
    # blockWords: uncomp sums to n, per-block prefixes are 16B-aligned and
    # match the cumulative 8-word-rounded compressed sizes
    bw = w[data_start // 4 - 2 * rnb2 :][: 2 * nb].reshape(nb, 2).astype(np.int64)
    uncomp = bw[:, 0] >> 16
    comp = bw[:, 0] & 0xFFFF
    assert int(uncomp.sum()) == n
    assert (uncomp[:-1] == 4096).all()
    prefix = np.concatenate([[0], np.cumsum((comp + 7) & ~7)[:-1]])
    assert (bw[:, 1] == prefix).all()
    assert (bw[:, 1] % 8 == 0).all()
    assert int(w[3]) == int(((comp + 7) & ~7).sum())
    if cksum:
        # byte-order-insensitive 8-bit-folded XOR (GpuChecksum.cuh:27-93)
        assert int(w[5]) == int(np.bitwise_xor.reduce(_data(n)))


@pytest.mark.parametrize(
    "name,ft,cksum,plane_bytes",
    [
        ("float_f16.bin", C.FLOAT_TYPE_FLOAT16, False, 3008),
        ("float_bf16.bin", C.FLOAT_TYPE_BFLOAT16, False, 3008),
        ("float_f32.bin", C.FLOAT_TYPE_FLOAT32, False, 6000 + 3008),
        ("float_bf16_checksum.bin", C.FLOAT_TYPE_BFLOAT16, True, 3008),
    ],
)
def test_float_header_fields(name, ft, cksum, plane_bytes):
    a = load(name)
    w = u32(a)
    n = 3000
    assert w[0] == FLOAT_MAGIC_VER
    assert w[1] == n
    assert w[2] == (int(cksum) << 4) | ft
    # the embedded ANS archive sits right after header + nonComp plane(s):
    # f16/bf16 plane = roundUp(n,16) bytes; f32 = 2*roundUp(n,8) u16 low
    # plane + roundUp(n,16) u8 high plane (GpuFloatUtils.cuh:123-203)
    ans_off = 16 + plane_bytes
    aw = u32(a[ans_off:])
    assert aw[0] == ANS_MAGIC_VER
    assert aw[2] == n  # exponent byte count == float word count
    if cksum:
        f = _floats(n)
        words = ((f.view(np.uint32) >> 16).astype(np.uint16)).view(np.uint8)
        assert int(w[3]) == int(np.bitwise_xor.reduce(words))


def test_oracle_reencode_identical():
    """Re-encoding the decoded payload must reproduce each fixture byte-
    for-byte (determinism lock)."""
    for name, pb in [
        ("ans_4096.bin", 10),
        ("ans_4097.bin", 10),
        ("ans_pb9.bin", 9),
        ("ans_pb11.bin", 11),
        ("ans_checksum.bin", 10),
    ]:
        a = load(name)
        cks = bool(u32(a)[4] & 0x10)
        out, ok, _ = ans_ref.ans_decode(a)
        assert ok
        re = ans_ref.ans_encode(out, prob_bits=pb, use_checksum=cks)
        assert np.array_equal(re, a), name
    for name, ft in [
        ("float_f16.bin", C.FLOAT_TYPE_FLOAT16),
        ("float_bf16.bin", C.FLOAT_TYPE_BFLOAT16),
        ("float_f32.bin", C.FLOAT_TYPE_FLOAT32),
    ]:
        a = load(name)
        words, ok, _ = float_ref.float_decompress(a)
        assert ok
        re = float_ref.float_compress(words, ft)
        assert np.array_equal(re, a), name


def test_all_decoders_read_fixtures():
    """Oracle, XLA, and Pallas-interpret decoders all decode the fixtures
    to the original data."""
    from dietgpu_tpu.ans import decode as jdec

    for name, n, pb in [
        ("ans_4096.bin", 4096, 10),
        ("ans_4097.bin", 4097, 10),
        ("ans_pb11.bin", 10000, 11),
    ]:
        a = load(name)
        want = _data(n)
        out, ok, _ = ans_ref.ans_decode(a)
        assert ok and np.array_equal(out, want)
        L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
        pad = np.zeros(C.round_up(a.size, 4), np.uint8)
        pad[: a.size] = a
        r = jdec.ans_decode_padded(jnp.asarray(pad), pb, L)
        assert bool(r["success"])
        assert np.array_equal(np.asarray(r["out"])[:n], want), name


def test_pallas_decoder_reads_fixtures(rng):
    import jax
    from jax.experimental import pallas as pl

    import dietgpu_tpu.ans.pallas_decode as pdec

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    for name in dir(pdec):
        obj = getattr(pdec, name)
        if hasattr(obj, "cache_clear"):
            obj.cache_clear()
    try:
        pl.pallas_call = patched
        a = load("ans_4097.bin")
        want = _data(4097)
        pad = np.zeros(C.round_up(a.size, 4), np.uint8)
        pad[: a.size] = a
        r = pdec.ans_decode_padded_pallas(jnp.asarray(pad), 10, 8192)
        assert bool(r["success"])
        assert np.array_equal(np.asarray(r["out"])[:4097], want)
    finally:
        pl.pallas_call = orig
        for name in dir(pdec):
            obj = getattr(pdec, name)
            if hasattr(obj, "cache_clear"):
                obj.cache_clear()
