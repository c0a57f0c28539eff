"""Worker for the true multi-process runtime test (test_multiprocess.py).

Launched twice (process_id 0/1) with 2 virtual CPU devices each; the two
processes form one 4-device global mesh via jax.distributed (gloo
collectives — the CPU stand-in for ICI/DCN). Exercises the real multi-host
code path of parallel/runtime.py + sharding.py + collectives.py: shard
codec bit-exactness against the oracle and a compressed all-gather
roundtrip, each process validating its addressable shards.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = int(sys.argv[2])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dietgpu_tpu.parallel import initialize_multihost

assert initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp
import ml_dtypes

from dietgpu_tpu import constants as C
from dietgpu_tpu.parallel.sharding import make_mesh, shard_compress, shard_decompress
from dietgpu_tpu.parallel.collectives import compressed_all_gather
from dietgpu_tpu.ref import ans_ref

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2

mesh = make_mesh(4)
L = 8192
rng = np.random.default_rng(42)  # same seed on both processes
data = np.minimum(rng.exponential(20.0, (4, L)), 255).astype(np.uint8)
lengths = np.full((4,), L, np.int32)

# --- shard-parallel codec: per-shard archives must be bit-equal to the
# single-device oracle, independent of which host computed them -------------
arcs, sizes = shard_compress(mesh, jnp.asarray(data), jnp.asarray(lengths))
for shard in arcs.addressable_shards:
    row = shard.index[0].start
    arc_local = np.asarray(shard.data)[0]
    oracle = ans_ref.ans_encode(data[row], prob_bits=C.DEFAULT_PROB_BITS)
    assert (arc_local[: oracle.size] == oracle).all(), f"shard {row} archive drift"

out, ok, got = shard_decompress(mesh, arcs, jnp.asarray(lengths), L)
for shard in out.addressable_shards:
    row = shard.index[0].start
    assert (np.asarray(shard.data)[0] == data[row]).all(), f"shard {row} roundtrip"

# --- compressed all-gather over the 2-process mesh --------------------------
shard_words = 4096
xs = rng.standard_normal((4, shard_words)).astype(ml_dtypes.bfloat16)
full, used = compressed_all_gather(jnp.asarray(xs), mesh)
expect = xs.reshape(-1)
for shard in full.addressable_shards:
    got_row = np.asarray(shard.data)[0]
    assert (got_row == expect).all(), "all-gather mismatch"

# --- compressed all-reduce (both wire phases compressed) --------------------
from dietgpu_tpu.parallel.collectives import compressed_all_reduce

V = 4 * C.DEFAULT_BLOCK_SIZE
xa = rng.integers(-64, 64, size=(4, V)).astype(np.float32)  # exact f32 sums
summed, used2 = compressed_all_reduce(jnp.asarray(xa), mesh)
expect2 = xa.sum(axis=0)
for shard in summed.addressable_shards:
    got_row = np.asarray(shard.data)[0]
    assert (got_row == expect2).all(), "all-reduce mismatch"

print(f"MULTIPROC PASS {pid}", flush=True)
