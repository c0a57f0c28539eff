"""Torch tensor front-end (dietgpu_tpu.torch_api).

Mirrors the reference's Python integration tests
(/root/reference/dietgpu/ans_test.py, float_test.py): roundtrips with and
without checksums, the truncation test (archives narrowed to exactly the
reported size must still decode), split-size with interior 4-byte
alignment, and the *_simple tiers incl. actual compression gain on N(0,1).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dietgpu_tpu import torch_api as tapi


def _gaussian(n, dtype, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.normal(0.0, 1.0, (n,), generator=g).to(dtype)


@pytest.mark.parametrize("dtype", [torch.float16, torch.bfloat16, torch.float32])
@pytest.mark.parametrize("checksum", [False, True])
def test_float_roundtrip_truncated(dtype, checksum):
    ts = [_gaussian(n, dtype, seed=n) for n in (10_000, 4096, 77)]
    comp, sizes, tm = tapi.compress_data(True, ts, checksum=checksum)
    assert comp.dtype == torch.uint8 and comp.shape[0] == len(ts)
    assert tm >= 0
    # truncation: narrow each archive to exactly the reported size
    rows = [comp[i, : int(sizes[i])] for i in range(len(ts))]
    outs = [torch.empty_like(t) for t in ts]
    status, out_sizes, _ = tapi.decompress_data(True, rows, outs, checksum=checksum)
    assert bool(status.to(torch.bool).all())
    for t, o, s in zip(ts, outs, out_sizes):
        assert int(s) == t.numel() * t.element_size()
        assert torch.equal(t, o)


def test_ans_roundtrip_bytes():
    g = torch.Generator().manual_seed(3)
    ts = [
        (torch.randn(5000, generator=g) * 8 + 128)
        .clamp(0, 255)
        .to(torch.uint8),
        torch.zeros(4096, dtype=torch.uint8),
        torch.arange(256, dtype=torch.int32).repeat(16).to(torch.uint8),
    ]
    comp, sizes, _ = tapi.compress_data(False, ts, checksum=True)
    rows = [comp[i, : int(sizes[i])] for i in range(len(ts))]
    outs = [torch.empty_like(t) for t in ts]
    status, out_sizes, _ = tapi.decompress_data(False, rows, outs, checksum=True)
    assert bool(status.to(torch.bool).all())
    for t, o in zip(ts, outs):
        assert torch.equal(t, o)


def test_simple_tier_and_compression_gain():
    ts = [_gaussian(100_000, torch.bfloat16, seed=7)]
    arcs = tapi.compress_data_simple(True, ts)
    raw_bytes = ts[0].numel() * ts[0].element_size()
    # N(0,1) bf16 compresses to ~0.67x (README.md:94)
    assert arcs[0].numel() < 0.75 * raw_bytes
    outs = tapi.decompress_data_simple(True, arcs)
    assert torch.equal(outs[0], ts[0])


def test_split_size_roundtrip():
    t = _gaussian(12_000, torch.float16, seed=1)
    splits = [4096, 4096, 3808]  # interior starts stay 4-byte aligned
    comp, sizes, _ = tapi.compress_data_split_size(True, t, splits)
    rows = [comp[i, : int(sizes[i])] for i in range(len(splits))]
    out = torch.empty_like(t)
    status, _, _ = tapi.decompress_data_split_size(True, rows, out, splits)
    assert bool(status.to(torch.bool).all())
    assert torch.equal(out, t)


def test_split_size_misaligned_rejected():
    t = torch.zeros(100, dtype=torch.uint8)
    with pytest.raises(ValueError, match="aligned"):
        tapi.compress_data_split_size(False, t, [3, 97])


def test_capacity_failure_reports_required_size():
    ts = [_gaussian(10_000, torch.bfloat16, seed=2)]
    arcs = tapi.compress_data_simple(True, ts)
    small = [torch.empty(16, dtype=torch.bfloat16)]
    status, sizes, _ = tapi.decompress_data(True, arcs, small)
    assert int(status[0]) == 0
    assert int(sizes[0]) == 10_000 * 2  # required byte count


def test_checksum_corruption_raises():
    ts = [_gaussian(8192, torch.float16, seed=4)]
    arcs = tapi.compress_data_simple(True, ts, checksum=True)
    bad = arcs[0].clone()
    bad[20] ^= 0xFF  # nonComp plane byte
    with pytest.raises(ValueError, match="checksum"):
        tapi.decompress_data(
            True, [bad], [torch.empty_like(ts[0])], checksum=True
        )


def test_max_size_queries():
    ts = [torch.zeros(1000, dtype=torch.bfloat16)]
    sz, b = tapi.max_float_compressed_output_size(ts)
    assert b == 1 and sz >= 1000 * 2
    sz2, _ = tapi.max_any_compressed_output_size(ts)
    assert sz2 == tapi.max_any_compressed_size(2000)
    assert tapi.max_float_compressed_size(torch.bfloat16, 1000) == sz


def test_empty_tensor_archive():
    ts = [torch.zeros(0, dtype=torch.uint8)]
    arcs = tapi.compress_data_simple(False, ts)
    assert arcs[0].numel() == 544  # header + probs, zero blocks
    outs = tapi.decompress_data_simple(False, arcs)
    assert outs[0].numel() == 0
