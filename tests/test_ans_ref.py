"""Oracle tests: NumPy reference codec roundtrips and invariants.

Mirrors the reference test strategy (SURVEY.md §4): exponential-distributed
byte sweeps (ANSTest.cu:18-31), size boundaries (:248-260), statistics
invariants (ANSStatisticsTest.cu:127-207), and archive-format checks.
"""

import numpy as np
import pytest

from dietgpu_tpu import constants as C
from dietgpu_tpu.ref import ans_ref


def gen_exp_bytes(rng, n, lam):
    """Exponential-ish byte distribution like ANSTest.cu generateSymbols."""
    v = rng.exponential(scale=lam, size=n)
    return np.minimum(v, 255).astype(np.uint8)


@pytest.mark.parametrize("prob_bits", [9, 10, 11])
@pytest.mark.parametrize(
    "n", [1, 31, 32, 33, 4095, 4096, 4097, 8192, 12345, 65536 + 7]
)
def test_roundtrip_sizes(rng, n, prob_bits):
    data = gen_exp_bytes(rng, n, 20.0)
    arc = ans_ref.ans_encode(data, prob_bits=prob_bits, use_checksum=True)
    out, ok, size = ans_ref.ans_decode(arc)
    assert ok and size == n
    np.testing.assert_array_equal(out, data)


@pytest.mark.parametrize("lam", [1.0, 10.0, 100.0, 1000.0])
def test_roundtrip_lambda_sweep(rng, lam):
    n = 40000
    data = gen_exp_bytes(rng, n, lam)
    arc = ans_ref.ans_encode(data, use_checksum=True)
    out, ok, size = ans_ref.ans_decode(arc)
    assert ok and size == n
    np.testing.assert_array_equal(out, data)


def test_roundtrip_random_sizes(rng):
    for _ in range(20):
        n = int(rng.integers(1, 100000))
        data = gen_exp_bytes(rng, n, 30.0)
        arc = ans_ref.ans_encode(data)
        out, ok, _ = ans_ref.ans_decode(arc)
        assert ok
        np.testing.assert_array_equal(out, data)


def test_empty_archive():
    data = np.zeros(0, dtype=np.uint8)
    arc = ans_ref.ans_encode(data)
    info = ans_ref.parse_header(arc)
    assert info["num_blocks"] == 0
    assert info["total_uncompressed_words"] == 0
    assert arc.size == C.compressed_overhead(0)
    out, ok, size = ans_ref.ans_decode(arc)
    assert ok and size == 0 and out.size == 0


def test_incompressible_data(rng):
    data = rng.integers(0, 256, size=20000, dtype=np.uint8)  # ~uniform
    arc = ans_ref.ans_encode(data)
    out, ok, _ = ans_ref.ans_decode(arc)
    assert ok
    np.testing.assert_array_equal(out, data)


def test_constant_data():
    data = np.full(10000, 7, dtype=np.uint8)
    arc = ans_ref.ans_encode(data)
    # single-symbol data should compress extremely well
    assert arc.size < 2000
    out, ok, _ = ans_ref.ans_decode(arc)
    assert ok
    np.testing.assert_array_equal(out, data)


def test_compressed_size_reported_correctly(rng):
    data = gen_exp_bytes(rng, 50000, 25.0)
    arc = ans_ref.ans_encode(data)
    info = ans_ref.parse_header(arc)
    assert info["total_compressed_size"] == arc.size
    assert arc.size % 16 == 0 or arc.size == info["total_compressed_size"]
    assert arc.size <= C.max_compressed_size(data.size)


def test_truncation_to_reported_size(rng):
    """Decoding from a buffer truncated to the reported size must work
    (ans_test.py:21-26)."""
    data = gen_exp_bytes(rng, 30000, 15.0)
    arc = ans_ref.ans_encode(data, use_checksum=True)
    info = ans_ref.parse_header(arc)
    truncated = arc[: info["total_compressed_size"]].copy()
    out, ok, _ = ans_ref.ans_decode(truncated)
    assert ok
    np.testing.assert_array_equal(out, data)


def test_capacity_failure(rng):
    data = gen_exp_bytes(rng, 10000, 15.0)
    arc = ans_ref.ans_encode(data)
    out, ok, needed = ans_ref.ans_decode(arc, out_capacity=100)
    assert not ok and needed == 10000


def test_checksum_detects_corruption(rng):
    data = gen_exp_bytes(rng, 10000, 15.0)
    arc = ans_ref.ans_encode(data, use_checksum=True)
    # corrupt a per-block lane state (offset 544 = first warp state)
    arc2 = arc.copy()
    arc2[544] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        ans_ref.ans_decode(arc2)


def test_magic_division_matches_exact(rng):
    """The multiply-shift division must equal true division for every
    (state, pdf) pair family (SURVEY.md hard part #2)."""
    for prob_bits in (9, 10, 11):
        pdfs = np.unique(
            np.concatenate(
                [
                    np.arange(1, 70),
                    np.array([127, 128, 129, 255, 256, 257, 511, 512, 513]),
                    np.array([(1 << prob_bits) - 1, 1 << prob_bits]),
                ]
            )
        ).astype(np.uint32)
        magic, shift = ans_ref.div_magic(pdfs)
        states = np.concatenate(
            [
                np.arange(1 << 16, (1 << 16) + 4096),
                (1 << 31) - 1 - np.arange(4096),
                np.random.default_rng(1).integers(
                    1 << 15, 1 << 31, size=20000
                ),
            ]
        ).astype(np.uint32)
        for i, p in enumerate(pdfs):
            div = ans_ref.magic_div(states, np.uint32(p), magic[i], shift[i])
            np.testing.assert_array_equal(div, states // p)


@pytest.mark.parametrize("prob_bits", [9, 10, 11])
def test_normalization_invariants(rng, prob_bits):
    """Weights sum to 2^probBits; present symbols get weight >= 1; uniform
    data gets equal weights (ANSStatisticsTest.cu:127-207)."""
    K = 1 << prob_bits
    # skewed
    data = gen_exp_bytes(rng, 100000, 12.0)
    hist = ans_ref.histogram_u8(data)
    pdf = ans_ref.normalize_probs(hist, data.size, prob_bits)
    assert int(pdf.sum()) == K
    assert np.all(pdf[hist > 0] >= 1)
    # weights within 0.5x-2x of true probability for well-populated symbols
    true_p = hist / data.size
    est_p = pdf.astype(np.float64) / K
    sel = hist > 500
    assert np.all(est_p[sel] <= 2.0 * true_p[sel] + 1e-9)
    # the lower bound can be violated by entries rebalanced down to the
    # weight-1 floor; check it only away from the floor
    sel_lo = sel & (pdf > 1)
    assert np.all(est_p[sel_lo] >= 0.5 * true_p[sel_lo] - 1e-9)

    # uniform data -> equal weights
    u = np.arange(256 * 64, dtype=np.int64) % 256
    pdf_u = ans_ref.normalize_probs(
        ans_ref.histogram_u8(u.astype(np.uint8)), u.size, prob_bits
    )
    assert np.all(pdf_u == K // 256)

    # single symbol gets the full mass
    s = np.full(1000, 42, dtype=np.uint8)
    pdf_s = ans_ref.normalize_probs(ans_ref.histogram_u8(s), s.size, prob_bits)
    assert pdf_s[42] == K
    assert int(pdf_s.sum()) == K


def test_normalization_rebalance_paths():
    """Exercise both the deficit (+1) and excess (-1) rebalancing branches."""
    # Deficit: many tiny counts that each truncate to 0 -> clamped to 1,
    # leaving a large remainder handled by the +1 pass.
    hist = np.zeros(256, dtype=np.uint32)
    hist[:200] = 1
    hist[200] = 1_000_000
    pdf = ans_ref.normalize_probs(hist, int(hist.sum()), 10)
    assert int(pdf.sum()) == 1024
    assert np.all(pdf[:201] >= 1)

    # Excess: clamping many zero-truncated symbols to 1 overshoots
    hist2 = np.zeros(256, dtype=np.uint32)
    hist2[:256] = 1
    hist2[0] = 4_000_000
    pdf2 = ans_ref.normalize_probs(hist2, int(hist2.sum()), 9)
    assert int(pdf2.sum()) == 512
    assert np.all(pdf2[hist2 > 0] >= 1)


def test_checksum_is_byte_xor(rng):
    data = rng.integers(0, 256, size=1000, dtype=np.uint8)
    c = ans_ref.checksum_bytes(data)
    expect = 0
    for b in data.tolist():
        expect ^= b
    assert c == expect


def test_block_alignment_of_payloads(rng):
    data = gen_exp_bytes(rng, 3 * 4096 + 100, 20.0)
    arc = ans_ref.ans_encode(data)
    info = ans_ref.parse_header(arc)
    nb = info["num_blocks"]
    off = 32 + 512 + nb * 128
    bw = arc[off : off + C.round_up(nb, 2) * 8].view(np.uint32).reshape(-1, 2)[:nb]
    starts = bw[:, 1]
    assert np.all(starts % C.WORDS_PER_ALIGN == 0)
    assert info["total_compressed_words"] % C.WORDS_PER_ALIGN == 0


def test_encode_with_plain_division_matches_magic(rng):
    data = gen_exp_bytes(rng, 20000, 18.0)
    a1 = ans_ref.ans_encode(data, use_magic=True)
    a2 = ans_ref.ans_encode(data, use_magic=False)
    np.testing.assert_array_equal(a1, a2)
