"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.parallel import (
    compressed_all_gather,
    compressed_all_to_all,
    make_mesh,
    shard_compress,
    shard_decompress,
)
from dietgpu_tpu.ref import ans_ref

N_DEV = 8
L = 8192  # bytes per shard


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest must force an 8-device mesh"
    return make_mesh(N_DEV)


def test_shard_compress_roundtrip(mesh, rng):
    data = rng.integers(0, 60, size=(N_DEV, L), dtype=np.uint8)
    lengths = np.full(N_DEV, L, np.int32)
    arcs, sizes = shard_compress(mesh, jnp.asarray(data), jnp.asarray(lengths))
    arcs_h, sizes_h = np.asarray(arcs), np.asarray(sizes)

    # every shard archive must match the single-device oracle (submission
    # order preserved)
    for d in range(N_DEV):
        expect = ans_ref.ans_encode(data[d])
        assert sizes_h[d] == expect.size
        np.testing.assert_array_equal(arcs_h[d, : expect.size], expect)

    outs, out_sizes, ok = shard_decompress(
        mesh, arcs, jnp.asarray(np.full(N_DEV, L, np.int32)), L
    )
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(outs)[:, :L], data)


def test_shard_compress_shared_stats(mesh, rng):
    """Shared (psum'd) probability tables: all shards carry identical probs."""
    data = rng.integers(0, 60, size=(N_DEV, L), dtype=np.uint8)
    lengths = np.full(N_DEV, L, np.int32)
    arcs, sizes = shard_compress(
        mesh, jnp.asarray(data), jnp.asarray(lengths), shared_stats=True
    )
    arcs_h = np.asarray(arcs)
    probs0 = arcs_h[0, 32 : 32 + 512]
    for d in range(1, N_DEV):
        np.testing.assert_array_equal(arcs_h[d, 32 : 32 + 512], probs0)
    # and the shared table must equal the normalization of the global hist
    hist = ans_ref.histogram_u8(data.reshape(-1))
    pdf = ans_ref.normalize_probs(hist, data.size, C.DEFAULT_PROB_BITS)
    np.testing.assert_array_equal(
        probs0.view(np.uint16).astype(np.uint32), pdf
    )
    # archives still decode
    for d in range(N_DEV):
        out, ok, _ = ans_ref.ans_decode(arcs_h[d, : int(np.asarray(sizes)[d])])
        assert ok
        np.testing.assert_array_equal(out, data[d])


def test_compressed_all_gather(mesh, rng):
    shard_words = 8192
    x = rng.standard_normal((N_DEV, shard_words)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    full, used = compressed_all_gather(xb, mesh)
    assert np.all(np.asarray(used)), "compression budget should fit N(0,1)"
    expect = np.asarray(xb).reshape(-1)
    got = np.asarray(full)
    for d in range(N_DEV):
        np.testing.assert_array_equal(
            got[d].view(np.uint16), expect.view(np.uint16)
        )


def test_compressed_all_gather_fallback(mesh, rng):
    """Incompressible data must overflow the budget and fall back to raw."""
    shard_words = 4096
    bits = rng.integers(0, 1 << 16, size=(N_DEV, shard_words), dtype=np.uint16)
    # avoid NaN-signalling issues by using the raw-bits view as bfloat16
    xb = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.bfloat16)
    full, used = compressed_all_gather(
        xb, mesh, budget_bytes=1024  # deliberately too small
    )
    assert not np.any(np.asarray(used))
    got = np.asarray(full)
    expect = bits.reshape(-1)
    for d in range(N_DEV):
        np.testing.assert_array_equal(got[d].view(np.uint16), expect)


def test_compressed_all_to_all(mesh, rng):
    chunk = 4096
    x = rng.standard_normal((N_DEV, N_DEV, chunk)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    out, used = compressed_all_to_all(xb, mesh)
    assert np.all(np.asarray(used))
    got = np.asarray(out)
    expect = np.asarray(xb)
    # device d receives chunk x[s, d] from every s: out[d, s] == x[s, d]
    for d in range(N_DEV):
        for s in range(N_DEV):
            np.testing.assert_array_equal(
                got[d, s].view(np.uint16), expect[s, d].view(np.uint16)
            )


def test_compressed_all_gather_auto(mesh, rng):
    """Two-phase size exchange: wire budget tracks the actual ratio."""
    from dietgpu_tpu.parallel.collectives import compressed_all_gather_auto

    shard_words = 8192
    x = rng.standard_normal((N_DEV, shard_words)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    full, wire = compressed_all_gather_auto(xb, mesh)
    raw = shard_words * 2
    assert wire < raw, f"wire bytes {wire} should beat raw {raw}"
    expect = np.asarray(xb).reshape(-1)
    got = np.asarray(full)
    for d in range(N_DEV):
        np.testing.assert_array_equal(
            got[d].view(np.uint16), expect.view(np.uint16)
        )


def test_compressed_all_gather_f32(mesh, rng):
    shard_words = 4096
    x = rng.standard_normal((N_DEV, shard_words)).astype(np.float32)
    xj = jnp.asarray(x)
    full, used = compressed_all_gather(xj, mesh)
    assert np.all(np.asarray(used))
    got = np.asarray(full)
    expect = x.reshape(-1)
    for d in range(N_DEV):
        np.testing.assert_array_equal(got[d].view(np.uint32), expect.view(np.uint32))


def test_compressed_reduce_scatter(mesh, rng):
    """Device d receives the f32-accumulated sum of everyone's chunk d."""
    from dietgpu_tpu.parallel import compressed_reduce_scatter

    chunk = 4096
    V = N_DEV * chunk
    # integer-valued bf16 inputs: the f32 accumulation is exact under ANY
    # association, so the check is independent of reduction order
    x = rng.integers(-64, 64, size=(N_DEV, V)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    out, used = compressed_reduce_scatter(xb, mesh)
    assert np.all(np.asarray(used))
    got = np.asarray(out)
    xbf = np.asarray(xb).astype(np.float32).reshape(N_DEV, N_DEV, chunk)
    expect = xbf.sum(axis=0).astype(jnp.bfloat16)  # exact, then cast
    for d in range(N_DEV):
        np.testing.assert_array_equal(
            got[d].astype(np.float32).view(np.uint32),
            expect[d].astype(np.float32).view(np.uint32),
        )


def test_compressed_all_reduce(mesh, rng):
    """Both wire phases compressed; every device ends with the full sum."""
    from dietgpu_tpu.parallel import compressed_all_reduce

    V = N_DEV * 4096
    # integer-valued floats: the f32 sum is exact under ANY association,
    # so the check is independent of reduction order
    x = rng.integers(-64, 64, size=(N_DEV, V)).astype(np.float32)
    out, used = compressed_all_reduce(jnp.asarray(x), mesh)
    assert np.all(np.asarray(used))
    got = np.asarray(out)
    expect = x.sum(axis=0)
    for d in range(N_DEV):
        np.testing.assert_array_equal(got[d], expect)


def test_compressed_ppermute_ring(mesh, rng):
    """Default +1 ring shift: device d receives device d-1's shard."""
    from dietgpu_tpu.parallel import compressed_ppermute

    shard_words = 8192
    x = rng.standard_normal((N_DEV, shard_words)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    out, used = compressed_ppermute(xb, mesh)
    assert np.all(np.asarray(used))
    got = np.asarray(out)
    expect = np.asarray(xb)
    for d in range(N_DEV):
        np.testing.assert_array_equal(
            got[d].view(np.uint16), expect[(d - 1) % N_DEV].view(np.uint16)
        )


def test_compressed_ppermute_partial_and_fallback(mesh, rng):
    """Sparse perm: unreceiving devices get zeros; tiny budget goes raw."""
    from dietgpu_tpu.parallel import compressed_ppermute

    shard_words = 4096
    perm = [(0, 3), (1, 5)]  # devices 2,4,6,7 receive nothing
    x = rng.standard_normal((N_DEV, shard_words)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    out, used = compressed_ppermute(xb, mesh, perm=perm)
    assert np.all(np.asarray(used))
    got = np.asarray(out)
    expect = np.asarray(xb)
    np.testing.assert_array_equal(
        got[3].view(np.uint16), expect[0].view(np.uint16)
    )
    np.testing.assert_array_equal(
        got[5].view(np.uint16), expect[1].view(np.uint16)
    )
    for d in (0, 1, 2, 4, 6, 7):
        assert not np.any(got[d].view(np.uint16)), f"device {d} not zeroed"

    # overflow vote: a 16-byte budget cannot hold any archive -> raw wire
    out2, used2 = compressed_ppermute(xb, mesh, perm=perm, budget_bytes=16)
    assert not np.any(np.asarray(used2))
    np.testing.assert_array_equal(
        np.asarray(out2)[3].view(np.uint16), expect[0].view(np.uint16)
    )
