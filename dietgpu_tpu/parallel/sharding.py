"""Data-parallel sharded compression over a device mesh.

The TPU-native replacement for the reference's (absent) distributed layer
(SURVEY.md §2, "Distributed / parallelism components"): independent tensors
or blocks are sharded across chips with shard_map; each chip runs the codec
on its shard; compressed outputs are gathered in submission order. Symbol
statistics can be shared across shards (psum of histograms) so all shards of
one logical tensor use a single probability table — required for the
"broadcast prob tables" collective mode.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import backend as backend_mod
from .. import constants as C
from ..ans import stats


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.lru_cache(maxsize=None)
def _sharded_encode(mesh: Mesh, axis: str, L: int, prob_bits: int,
                    shared_stats: bool):
    """Per-device encode of the local shard (one archive per device)."""

    # Pallas kernels on TPU platforms, XLA elsewhere (bit-identical
    # archives either way — backend.py routes, shard_map composes both)
    be = backend_mod.default_backend()

    def local(data, length):
        # data: (1, L) local shard; length: (1,) local byte count
        d = data[0]
        n = length[0]
        if shared_stats:
            # one probability table for the whole logical tensor: psum the
            # shard histograms, normalize once, encode every shard with it
            hist = jax.lax.psum(backend_mod.histogram_u8(d, n, be), axis)
            total = jax.lax.psum(n, axis)
            pdf = stats.normalize_probs(hist, total.astype(jnp.uint32), prob_bits)
            arc, size = backend_mod.ans_encode_padded(
                d, n, prob_bits, precomputed_pdf=pdf, backend=be
            )
        else:
            arc, size = backend_mod.ans_encode_padded(
                d, n, prob_bits, backend=be
            )
        return arc[None], size[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis)),
        check_vma=False,
    )
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _sharded_decode(mesh: Mesh, axis: str, A: int, L: int, prob_bits: int):
    be = backend_mod.default_backend()

    def local(arcs, caps):
        r = backend_mod.ans_decode_padded(arcs[0], prob_bits, L, False, be)
        ok = r["success"] & (r["size"] <= caps[0].astype(jnp.uint32))
        return r["out"][None], r["size"][None], ok[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(f)


def shard_compress(
    mesh: Mesh,
    data: jax.Array,
    lengths: jax.Array,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    axis: str = "dp",
    shared_stats: bool = False,
):
    """Compress a (n_dev, L) batch, one shard per device.

    Returns (archives (n_dev, A) u8, sizes (n_dev,) u32), gathered in
    submission order along the mesh axis.
    """
    n_dev = mesh.devices.size
    assert data.shape[0] == n_dev
    L = data.shape[1]
    fn = _sharded_encode(mesh, axis, L, prob_bits, shared_stats)
    sharding = NamedSharding(mesh, P(axis, None))
    data = jax.device_put(data, sharding)
    lengths = jax.device_put(lengths, NamedSharding(mesh, P(axis)))
    return fn(data, lengths)


def shard_decompress(
    mesh: Mesh,
    archives: jax.Array,
    capacities: jax.Array,
    out_len: int,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    axis: str = "dp",
):
    """Decompress a (n_dev, A) batch of archives, one per device."""
    A = archives.shape[1]
    fn = _sharded_decode(mesh, axis, A, out_len, prob_bits)
    archives = jax.device_put(archives, NamedSharding(mesh, P(axis, None)))
    capacities = jax.device_put(capacities, NamedSharding(mesh, P(axis)))
    return fn(archives, capacities)
