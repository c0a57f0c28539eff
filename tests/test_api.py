"""Public API tests, mirroring the reference ans_test.py / float_test.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dietgpu_tpu import api
from dietgpu_tpu import constants as C


def normal_arrays(rng, dtype, sizes):
    out = []
    for n in sizes:
        x = rng.standard_normal(n).astype(np.float32)
        out.append(jnp.asarray(x).astype(dtype))
    return out


@pytest.mark.parametrize("checksum", [False, True])
def test_ans_roundtrip_with_truncation(rng, checksum):
    """compress -> truncate to reported sizes -> decompress (ans_test.py:15-47)."""
    ts = normal_arrays(rng, jnp.float32, [10000, 30000, 100])
    comp, sizes, temp_mem = api.compress_data(False, ts, checksum)
    assert temp_mem > 0
    sizes_h = np.asarray(sizes)
    for s, t in zip(sizes_h, ts):
        assert s <= api.max_any_compressed_size(t.size * t.dtype.itemsize)

    truncated = [comp[i, : sizes_h[i]] for i in range(len(ts))]
    outs, status, out_sizes, _ = api.decompress_data(
        False, truncated, ts, checksum
    )
    assert np.all(np.asarray(status) == 1)
    for t, o, sz in zip(ts, outs, np.asarray(out_sizes)):
        assert sz == t.size * t.dtype.itemsize
        np.testing.assert_array_equal(np.asarray(o), np.asarray(t))


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16, jnp.float32])
def test_float_roundtrip(rng, dtype):
    ts = normal_arrays(rng, dtype, [10000, 4096, 55555])
    comp, sizes, _ = api.compress_data(True, ts, checksum=True)
    sizes_h = np.asarray(sizes)
    truncated = [comp[i, : sizes_h[i]] for i in range(len(ts))]
    outs, status, out_sizes, _ = api.decompress_data(
        True, truncated, ts, checksum=True
    )
    assert np.all(np.asarray(status) == 1)
    for t, o in zip(ts, outs):
        np.testing.assert_array_equal(
            np.asarray(o).view(np.uint8), np.asarray(t).view(np.uint8)
        )


def test_float_compression_gain(rng):
    """N(0,1) bf16 must compress to ~0.67x (float_test.py:78-96)."""
    ts = normal_arrays(rng, jnp.bfloat16, [100000])
    comp = api.compress_data_simple(True, ts)
    ratio = comp[0].size / (ts[0].size * 2)
    assert ratio < 0.70


def test_simple_tier(rng):
    ts = normal_arrays(rng, jnp.float16, [5000, 20000])
    comp = api.compress_data_simple(True, ts)
    outs = api.decompress_data_simple(True, comp)
    for t, o in zip(ts, outs):
        np.testing.assert_array_equal(
            np.asarray(o).view(np.uint16), np.asarray(t).view(np.uint16)
        )


def test_simple_tier_ans(rng):
    ts = [jnp.asarray(rng.integers(0, 40, size=9000, dtype=np.uint8))]
    comp = api.compress_data_simple(False, ts)
    outs = api.decompress_data_simple(False, comp)
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(ts[0]))


def test_empty_tensor_archive(rng):
    """Empty tensors produce valid archives (ans_test.py:68-77)."""
    ts = [jnp.zeros(0, jnp.uint8), jnp.asarray(rng.integers(0, 9, 100, dtype=np.uint8))]
    comp, sizes, _ = api.compress_data(False, ts)
    assert int(sizes[0]) == C.compressed_overhead(0)
    outs, status, out_sizes, _ = api.decompress_data(False,
        [comp[i, : int(sizes[i])] for i in range(2)], ts)
    assert np.all(np.asarray(status) == 1)
    np.testing.assert_array_equal(np.asarray(outs[1]), np.asarray(ts[1]))


def test_split_size_roundtrip(rng):
    """Split-size compress/decompress (ans_test.py:79-139)."""
    flat = jnp.asarray(rng.integers(0, 30, size=16384, dtype=np.uint8))
    splits = [4096, 8192, 2048, 2048]
    comp, sizes, _ = api.compress_data_split_size(False, flat, splits)
    sizes_h = np.asarray(sizes)
    arcs = [comp[i, : sizes_h[i]] for i in range(len(splits))]
    out_flat, status, _, _ = api.decompress_data_split_size(
        False, arcs, jnp.zeros(16384, jnp.uint8), splits
    )
    assert np.all(np.asarray(status) == 1)
    np.testing.assert_array_equal(np.asarray(out_flat), np.asarray(flat))


def test_split_size_alignment_check():
    flat = jnp.zeros(100, jnp.uint8)
    with pytest.raises(ValueError, match="aligned"):
        api.compress_data_split_size(False, flat, [3, 97])


def test_capacity_failure_reports_size(rng):
    ts = normal_arrays(rng, jnp.float32, [10000])
    comp, sizes, _ = api.compress_data(False, ts)
    small_out = [jnp.zeros(10, jnp.uint8)]
    outs, status, out_sizes, _ = api.decompress_data(
        False, [comp[0, : int(sizes[0])]], small_out
    )
    assert int(status[0]) == 0
    assert int(out_sizes[0]) == 40000


def test_checksum_mismatch_raises(rng):
    ts = normal_arrays(rng, jnp.bfloat16, [8192])
    comp, sizes, _ = api.compress_data(True, ts, checksum=True)
    arc = np.asarray(comp[0, : int(sizes[0])]).copy()
    arc[17] ^= 0xA5  # corrupt a nonComp plane byte
    with pytest.raises(ValueError, match="checksum"):
        api.decompress_data(True, [jnp.asarray(arc)], ts, checksum=True)


def test_get_compressed_info(rng):
    ts = normal_arrays(rng, jnp.float16, [12345])
    comp = api.compress_data_simple(True, ts)
    info = api.get_compressed_info(True, comp)[0]
    assert info["size"] == 12345
    assert info["float_type"] == C.FLOAT_TYPE_FLOAT16


def test_max_size_queries():
    assert api.max_any_compressed_size(1) >= C.compressed_overhead(1)
    r, c = api.max_float_compressed_output_size(
        [jnp.zeros(1000, jnp.bfloat16), jnp.zeros(500, jnp.bfloat16)]
    )
    assert r == 2 and c == api.max_float_compressed_size(jnp.bfloat16, 1000)


def test_mixed_sizes_batch(rng):
    """Heterogeneous lengths in one batch."""
    ts = [
        jnp.asarray(rng.integers(0, 50, size=n, dtype=np.uint8))
        for n in (1, 4096, 10001, 37)
    ]
    comp, sizes, _ = api.compress_data(False, ts)
    arcs = [comp[i, : int(sizes[i])] for i in range(len(ts))]
    outs, status, _, _ = api.decompress_data(False, arcs, ts)
    assert np.all(np.asarray(status) == 1)
    for t, o in zip(ts, outs):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(t))


def test_stride_batch_roundtrip(rng):
    """2-D (batch, stride) convenience (BatchProvider.cuh:39-69 analogue)."""
    from dietgpu_tpu import api

    B, stride = 4, 6000
    sizes = [6000, 4096, 1024, 5000]
    x = rng.standard_normal((B, stride)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    comp, csizes, _ = api.compress_data_stride(True, xb, sizes)
    arcs = [comp[b, : int(csizes[b])] for b in range(B)]
    out2d, status, _, tm = api.decompress_data_stride(
        True, arcs, B, stride, jnp.bfloat16, sizes
    )
    assert np.all(np.asarray(status) == 1)
    assert tm > 0
    got = np.asarray(jax.lax.bitcast_convert_type(out2d, jnp.uint16))
    want = np.asarray(jax.lax.bitcast_convert_type(xb, jnp.uint16))
    for b in range(B):
        np.testing.assert_array_equal(got[b, : sizes[b]], want[b, : sizes[b]])
        assert not got[b, sizes[b]:].any()


def test_decompress_split_size_alignment_check():
    from dietgpu_tpu import api

    t_out = jnp.zeros(100, jnp.uint8)
    with pytest.raises(ValueError, match="4-byte aligned"):
        api.decompress_data_split_size(False, [jnp.zeros(64, jnp.uint8)], t_out, [33, 67])


def test_float_simple_self_describing_prob_bits(rng):
    """decompress_data_simple must decode float archives at any probBits
    without a caller hint — the embedded ANS header self-describes it
    (GpuANSUtils.cuh:205-206; reference decode never takes probBits)."""
    from dietgpu_tpu import api

    t = jnp.asarray(rng.standard_normal(3000).astype(np.float32)).astype(
        jnp.bfloat16
    )
    for pb in (9, 11):
        arcs = api.compress_data_simple(True, [t], prob_bits=pb)
        infos = api.get_compressed_info(True, arcs)
        assert infos[0]["prob_bits"] == pb
        outs = api.decompress_data_simple(True, arcs)
        assert np.array_equal(
            np.asarray(outs[0]).view(np.uint16), np.asarray(t).view(np.uint16)
        )


def test_get_compressed_info_device(rng):
    """Jittable device-side info parse matches the host-side tier
    (ansGetCompressedInfoDevice / floatGetCompressedInfoDevice parity)."""
    from dietgpu_tpu import api

    t = jnp.asarray(rng.standard_normal(2000).astype(np.float32)).astype(
        jnp.bfloat16
    )
    comp, sizes, _ = api.compress_data(True, [t, t], checksum=True)
    info_d = jax.jit(
        lambda a: api.get_compressed_info_device(True, a)
    )(comp)
    infos_h = api.get_compressed_info(True, [comp[0], comp[1]])
    assert np.asarray(info_d["valid"]).all()
    for i in range(2):
        assert int(np.asarray(info_d["size"])[i]) == infos_h[i]["size"]
        assert (
            int(np.asarray(info_d["float_type"])[i])
            == infos_h[i]["float_type"]
        )
        assert int(np.asarray(info_d["checksum"])[i]) == infos_h[i]["checksum"]

    b = jnp.asarray((rng.integers(0, 40, 5000)).astype(np.uint8))
    comp2, _, _ = api.compress_data(False, [b], prob_bits=11, checksum=True)
    info2 = api.get_compressed_info_device(False, comp2)
    h2 = api.get_compressed_info(False, [comp2[0]])[0]
    assert bool(np.asarray(info2["valid"])[0])
    assert int(np.asarray(info2["size"])[0]) == h2["total_uncompressed_words"]
    assert int(np.asarray(info2["prob_bits"])[0]) == 11
    assert int(np.asarray(info2["checksum"])[0]) == h2["checksum"]
