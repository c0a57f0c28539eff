"""Weak-scaling harness: shard-parallel codec throughput vs device count.

BASELINE.md north star: >=90% weak-scaling efficiency at 2+ hosts for the
shard-parallel compress/decompress. The op that claim is about is the
codec-only shard_map program (each device compresses + decompresses its OWN
fixed-size bf16 shard, zero cross-device communication), so that is the op
this harness scores. The compressed collectives are measured separately and
labeled for what they are: their per-device work grows with n BY DESIGN
(an all-gather's output is n shards), so "flat wall time vs n" is not an
achievable or meaningful target for them — the relevant number there is the
speedup over the RAW (uncompressed) collective moving the same logical data.

Methodology (recorded in the JSON):
  * On a single-host virtual CPU mesh the n "devices" share one socket's
    cores and memory bandwidth, so even a PERFECT weak-scaling program slows
    per-device wall time by ~n; the contention-normalized ceiling is
    aggregate host throughput. We therefore report
        efficiency_aggregate(n) = (n * shard_bytes / t(n)) / (shard_bytes / t(1))
    on CPU meshes — flat aggregate throughput == perfect scaling.
  * On real multi-chip hardware (private HBM + cores per device; ICI idle
    for the codec-only op) the wall-clock metric
        efficiency_wall(n) = t(1) / t(n)
    is the >=90% target. The harness runs unchanged there; on a multi-host
    pod launch one process per host with initialize_multihost
    (parallel/runtime.py) — the same global-mesh program spans hosts.
    Both efficiencies are emitted; `efficiency_metric_for_target` names the
    one the claim should be judged by on the platform that produced the file.

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
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dietgpu_tpu import backend as backend_mod
    from dietgpu_tpu import constants as C
    from dietgpu_tpu.parallel import compressed_all_reduce, initialize_multihost
    from dietgpu_tpu.parallel.collectives import _build_ag_phase1, _build_ag_phase2

    initialize_multihost()

    def arg(name, default):
        return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    mwords = arg("--mwords", 1)
    iters = arg("--iters", 8)
    shard_words = mwords << 20
    shard_bytes = shard_words * 2  # bf16
    devices = jax.devices()
    on_cpu = devices[0].platform == "cpu"
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    rng = np.random.default_rng(0)
    rows = []

    # ---- op 1: codec-only shard-parallel roundtrip (THE weak-scaling op) ----
    use_pallas = backend_mod.default_backend() == "pallas"
    if use_pallas:
        from dietgpu_tpu.floatcodec import pallas_codec as fc

        fcomp = fc.float_compress_padded_pallas
        fdec = fc.float_decompress_padded_pallas
    else:
        from dietgpu_tpu.floatcodec import codec as fc

        fcomp = fc.float_compress_padded
        fdec = fc.float_decompress_padded

    @functools.lru_cache(maxsize=None)
    def build_codec_roundtrip(mesh):
        def local(words):
            w = words[0]
            if use_pallas:
                # pallas path prefers u32 word-pairs
                w = jax.lax.bitcast_convert_type(
                    w.reshape(-1, 2), jnp.uint32
                ).reshape(-1)
            arc, size = fcomp(w, shard_words, C.FLOAT_TYPE_BFLOAT16, 10, False)
            r = fdec(arc, C.FLOAT_TYPE_BFLOAT16, shard_words, 10, False)
            key = "out32" if "out32" in r else "out"
            return r[key][None], (size + r["size"])[None]

        f = shard_map(
            local,
            mesh=mesh,
            in_specs=(P("dp", None),),
            out_specs=(P("dp", None), P("dp")),
            check_vma=False,
        )
        return jax.jit(f)

    t1_codec = None
    for n in counts:
        mesh = Mesh(np.array(devices[:n]), ("dp",))
        x = rng.standard_normal((n, shard_words)).astype(np.float32)
        words = (x.view(np.uint32) >> 16).astype(np.uint16)
        wdev = jax.device_put(
            jnp.asarray(words), NamedSharding(mesh, P("dp", None))
        )
        fn = build_codec_roundtrip(mesh)
        out, sz = fn(wdev)
        jax.block_until_ready((out, sz))
        t0 = time.perf_counter()
        for _ in range(iters):
            out, sz = fn(wdev)
        jax.block_until_ready((out, sz))
        t = (time.perf_counter() - t0) / iters
        if t1_codec is None:
            t1_codec = t
        eff_wall = t1_codec / t
        eff_agg = n * t1_codec / t
        rows.append(
            {
                "devices": n,
                "op": "shard_codec_roundtrip(bf16)",
                "is_weak_scaling_op": True,
                "time_s": t,
                "per_device_GBps": shard_bytes / t / 1e9,
                "aggregate_GBps": n * shard_bytes / t / 1e9,
                "efficiency_wall": eff_wall,
                "efficiency_aggregate": eff_agg,
            }
        )
        print(
            f"codec     n={n:3d}  {t*1e3:8.2f} ms  "
            f"agg {n*shard_bytes/t/1e9:7.3f} GB/s  "
            f"eff_wall {eff_wall*100:6.1f}%  eff_agg {eff_agg*100:6.1f}%",
            flush=True,
        )

    # ---- op 2: compressed all-gather vs raw all-gather (collective demo) ----
    # NOT a weak-scaling op: each device decodes n shards, so per-device work
    # grows ~n by construction. The score is the speedup over the raw
    # collective moving the same logical data over the same fabric.
    @functools.lru_cache(maxsize=None)
    def build_raw_ag(mesh):
        f = shard_map(
            lambda xs: jax.lax.all_gather(xs[0], "dp")[None],
            mesh=mesh,
            in_specs=(P("dp", None),),
            out_specs=P("dp", None, None),
            check_vma=False,
        )
        return jax.jit(f)

    for n in counts:
        if n == 1:
            continue
        mesh = Mesh(np.array(devices[:n]), ("dp",))
        x = rng.standard_normal((n, shard_words)).astype(np.float32)
        xb = jax.device_put(
            jnp.asarray(x).astype(jnp.bfloat16),
            NamedSharding(mesh, P("dp", None)),
        )
        f1 = _build_ag_phase1(mesh, "dp", shard_words, "bfloat16", 10)
        arcs, max_sizes = f1(xb)
        budget = C.round_up(
            int(jax.device_get(max_sizes[0])),
            max(C.round_up(shard_words * 2 // 16, 16), 4096),
        )
        f2 = _build_ag_phase2(mesh, "dp", shard_words, "bfloat16", budget, 10)

        def comp_ag(xb):
            return f2(f1(xb)[0])

        out = comp_ag(xb)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = comp_ag(xb)
        out.block_until_ready()
        t_comp = (time.perf_counter() - t0) / iters

        raw = build_raw_ag(mesh)
        rout = raw(xb)
        rout.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            rout = raw(xb)
        rout.block_until_ready()
        t_raw = (time.perf_counter() - t0) / iters

        rows.append(
            {
                "devices": n,
                "op": "compressed_all_gather_auto(bf16) roundtrip",
                "is_weak_scaling_op": False,
                "time_s": t_comp,
                "raw_all_gather_time_s": t_raw,
                "speedup_vs_raw": t_raw / t_comp,
                "wire_bytes_per_shard": budget,
                "raw_bytes_per_shard": shard_bytes,
                "wire_ratio": budget / shard_bytes,
            }
        )
        print(
            f"all-gather n={n:3d}  comp {t_comp*1e3:8.2f} ms  raw "
            f"{t_raw*1e3:8.2f} ms  speedup {t_raw/t_comp:5.2f}x  "
            f"wire {budget/shard_bytes:.3f}x",
            flush=True,
        )

        # compressed all-reduce (both wire phases compressed); input
        # PRE-SHARDED so the timed loop moves only the collective's bytes
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
                "op": "compressed_all_reduce(bf16)",
                "is_weak_scaling_op": False,
                "time_s": tar,
                "per_device_GBps": V * 2 / tar / 1e9,
            }
        )
        print(
            f"all-reduce n={n:3d}  {tar*1e3:8.2f} ms  "
            f"{V*2/tar/1e9:7.3f} GB/s/dev",
            flush=True,
        )

    out_path = os.path.join(os.path.dirname(__file__), "weak_scaling.json")
    with open(out_path, "w") as f:
        json.dump(
            {
                "platform": devices[0].platform,
                "device": str(devices[0].device_kind),
                "n_physical_hosts": jax.process_count(),
                "shard_words": shard_words,
                "methodology": {
                    "weak_scaling_op": "shard_codec_roundtrip(bf16)",
                    # A single-host virtual CPU mesh cannot score the >=90%
                    # weak-scaling target AT ALL: the n "devices" share one
                    # socket, so efficiency_wall is depressed by contention,
                    # and the aggregate-throughput normalization is unsound
                    # too because the n=1 run does not saturate the host
                    # (measured eff_aggregate > 1 at n=2/4 proves the n=1
                    # ceiling assumption false). On CPU the target metric is
                    # therefore null and hardware_required is set; consumers
                    # scoring the target must reject this file. On real
                    # multi-chip hardware (private HBM/cores per device,
                    # zero communication in the codec-only op) the target
                    # applies to efficiency_wall(n) = t(1)/t(n).
                    "efficiency_metric_for_target": (
                        None if on_cpu else "efficiency_wall"
                    ),
                    "hardware_required": on_cpu,
                    "note": (
                        "On a single-host virtual CPU mesh the n devices "
                        "share one socket's cores and memory bandwidth, so "
                        "efficiency_wall is contention-depressed; and the "
                        "measured eff_aggregate of >1 at n=2/4 shows the "
                        "n=1 run does not saturate the host, so aggregate "
                        "normalization against the n=1 rate is not a valid "
                        "ceiling either. This CPU artifact is NOT scoreable "
                        "against the >=90% weak-scaling target "
                        "(efficiency_metric_for_target=null, "
                        "hardware_required=true); it documents only that "
                        "the sharded program runs and the per-row raw "
                        "measurements. On real multi-chip hardware each "
                        "device has private HBM/cores, the codec-only op "
                        "does zero communication, and the >=90% target "
                        "applies to efficiency_wall(n) = t(1)/t(n); "
                        "regenerate this file there for that claim. "
                        "Collective rows (is_weak_scaling_op=false) are "
                        "scored by speedup_vs_raw instead: their per-device "
                        "work grows with n by construction (an all-gather "
                        "produces n shards on every device), so flat wall "
                        "time is not a meaningful target for them."
                    ),
                },
                "rows": rows,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
