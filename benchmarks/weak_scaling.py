"""Weak-scaling harness: shard-parallel codec throughput vs device count.

BASELINE.md north star: >=90% weak-scaling efficiency at 2+ hosts. Each
device compresses+decompresses its OWN fixed-size shard (work per device
constant), so perfect scaling is flat time as devices grow; efficiency(n) =
t(1) / t(n).

Runs anywhere:
  * default: the virtual 8-device CPU mesh (XLA_FLAGS forced below when no
    real multi-device platform is present) — validates the harness and the
    shard_map program; absolute GB/s are not meaningful on CPU.
  * real hardware: run unmodified on a multi-chip host; on a multi-host pod
    launch one process per host with dietgpu_tpu.parallel.initialize_multihost
    (see parallel/runtime.py) — the same global-mesh program spans hosts.

Writes benchmarks/weak_scaling.json and prints a table.
Usage: python benchmarks/weak_scaling.py [--mwords N] [--iters K]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_FORCE_CPU = "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS", "") == "cpu"
if _FORCE_CPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the driver sitecustomize overrides JAX_PLATFORMS at interpreter start;
    # override the config itself (same dance as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dietgpu_tpu import constants as C
    from dietgpu_tpu.parallel import compressed_all_reduce, initialize_multihost
    from dietgpu_tpu.parallel.collectives import _build_ag_phase1, _build_ag_phase2

    initialize_multihost()

    def arg(name, default):
        return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    mwords = arg("--mwords", 1)
    iters = arg("--iters", 8)
    shard_words = mwords << 20
    devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    rng = np.random.default_rng(0)
    rows = []
    t1 = None

    for n in counts:
        mesh = Mesh(np.array(devices[:n]), ("dp",))
        x = rng.standard_normal((n, shard_words)).astype(np.float32)
        xb = jnp.asarray(x).astype(jnp.bfloat16)
        xb = jax.device_put(xb, NamedSharding(mesh, P("dp", None)))
        f1 = _build_ag_phase1(mesh, "dp", shard_words, "bfloat16", 10)
        arcs, max_sizes = f1(xb)
        budget = C.round_up(
            int(jax.device_get(max_sizes[0])),
            max(C.round_up(shard_words * 2 // 16, 16), 4096),
        )
        f2 = _build_ag_phase2(mesh, "dp", shard_words, "bfloat16", budget, 10)

        def roundtrip(xb, arcs):
            return f2(f1(xb)[0])

        out = roundtrip(xb, arcs)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = roundtrip(xb, arcs)
        out.block_until_ready()
        t = (time.perf_counter() - t0) / iters
        if t1 is None:
            t1 = t
        per_dev_gbps = shard_words * 2 / t / 1e9
        eff = t1 / t
        rows.append(
            {
                "devices": n,
                "time_s": t,
                "op": "compressed_all_gather_auto(bf16) roundtrip",
                "per_device_GBps": per_dev_gbps,
                "efficiency": eff,
                "wire_bytes": budget,
            }
        )
        print(
            f"n={n:3d}  {t*1e3:8.2f} ms  {per_dev_gbps:7.3f} GB/s/dev  "
            f"eff {eff*100:6.1f}%  wire {budget}",
            flush=True,
        )

        # compressed all-reduce (both wire phases compressed); V scales
        # with n so per-device work stays constant (weak scaling). The
        # input is PRE-SHARDED so the timed loop moves only the
        # collective's wire bytes, not a host-array scatter per iteration.
        if n > 1 or len(counts) == 1:
            V = n * C.round_up(shard_words // max(n, 2), C.DEFAULT_BLOCK_SIZE)
            xa = jnp.asarray(
                rng.standard_normal((n, V)).astype(np.float32)
            ).astype(jnp.bfloat16)
            xa = jax.device_put(xa, NamedSharding(mesh, P("dp", None)))
            out2, _used = compressed_all_reduce(xa, mesh)
            jax.tree_util.tree_leaves(out2)[0].block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                out2, _used = compressed_all_reduce(xa, mesh)
            jax.tree_util.tree_leaves(out2)[0].block_until_ready()
            tar = (time.perf_counter() - t0) / iters
            rows.append(
                {
                    "devices": n,
                    "time_s": tar,
                    "op": "compressed_all_reduce(bf16)",
                    "per_device_GBps": V * 2 / tar / 1e9,
                }
            )
            print(
                f"n={n:3d}  {tar*1e3:8.2f} ms  all-reduce "
                f"{V*2/tar/1e9:7.3f} GB/s/dev",
                flush=True,
            )

    out_path = os.path.join(os.path.dirname(__file__), "weak_scaling.json")
    with open(out_path, "w") as f:
        json.dump(
            {
                "platform": jax.devices()[0].platform,
                "device": str(jax.devices()[0].device_kind),
                "shard_words": shard_words,
                # every row carries its own "op"; efficiency/wire_bytes
                # exist only on the all-gather-roundtrip rows
                "rows": rows,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
