"""Benchmark: bf16 float-codec throughput on one chip (Pallas pipeline).

Prints ONE JSON line:
  {"metric": "bf16_float_decode_GBps", "value": N, "unit": "GB/s",
   "vs_baseline": N / 490.0, ...extras}

Baseline: DietGPU bf16 float-codec decompression ~490 GB/s at ~128M floats
on an A100 (BASELINE.md, images/dietgpu_bfloat16_nb.png).

Timing is honest for async/tunneled backends: K distinct inputs are cycled
through a dependency-ordered loop and a host readback closes the chain, so
neither dispatch-only returns nor backend result caching can fake speed.

Env knobs: DIETGPU_BENCH_MWORDS (default 64), DIETGPU_BENCH_ITERS (default 6),
DIETGPU_BENCH_BACKEND ('cpu' benches the XLA path on CPU).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_DECODE_GBPS = 490.0


def main():
    backend = os.environ.get("DIETGPU_BENCH_BACKEND")
    if backend:
        os.environ["JAX_PLATFORMS"] = backend
        import jax

        jax.config.update("jax_platforms", backend)
    else:
        import jax

    import jax.numpy as jnp

    from dietgpu_tpu import constants as C

    # Device init through the axon tunnel can hang indefinitely when the
    # remote worker is wedged; fail fast with an honest error line instead
    # of stalling the driver forever.
    import threading

    devbox = {}

    def _probe():
        devbox["devices"] = jax.devices()

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(float(os.environ.get("DIETGPU_BENCH_INIT_TIMEOUT", "240")))
    if "devices" not in devbox:
        # include the last hardware-measured number so an outage doesn't
        # erase the round's record (benchmarks/results.json is committed
        # after every real-chip sweep)
        last_hw = None
        try:
            import pathlib

            res = json.loads(
                (pathlib.Path(__file__).parent / "benchmarks" / "results.json")
                .read_text()
            )
            best = max(
                (
                    r
                    for r in res["rows"]
                    if r["codec"] == "float-bf16" and r["mwords"] >= 64
                ),
                key=lambda r: r["dec_GBps"],
            )
            last_hw = {
                "device": res["device"],
                "mwords": best["mwords"],
                "dec_GBps": best["dec_GBps"],
                "enc_GBps": best["enc_GBps"],
            }
        except Exception:
            pass
        print(
            json.dumps(
                {
                    "metric": "bf16_float_decode_GBps",
                    "value": 0.0,
                    "unit": "GB/s",
                    "vs_baseline": 0.0,
                    "error": "device init timeout (TPU worker unreachable)",
                    "last_hw_measured": last_hw,
                }
            )
        )
        os._exit(1)

    use_pallas = jax.devices()[0].platform in ("tpu", "axon")
    # 128Mi words matches the baseline chart point the vs_baseline ratio
    # is computed against (DietGPU bf16 decode ~490 GB/s at ~100M floats,
    # BASELINE.md); smaller sizes under-report both systems
    mwords = int(os.environ.get("DIETGPU_BENCH_MWORDS", "128"))
    # the tunnel's 1-element readback costs ~34 ms FIXED; enough iterations
    # amortize it below the noise floor (chained-dispatch timing otherwise)
    iters = int(os.environ.get("DIETGPU_BENCH_ITERS", "48"))
    n = mwords * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    raw_bytes = n * 2
    K = 3

    dev = jax.devices()[0]
    print(
        f"# device: {dev.device_kind}, n = {n} bf16 words "
        f"({raw_bytes / 1e6:.0f} MB), backend={'pallas' if use_pallas else 'xla'}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    words_list = []
    for k in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[n:] = 0
        words_list.append(w)

    if use_pallas:
        from dietgpu_tpu.floatcodec import pallas_codec as pfc

        # pass the raw bits as u32 word-pairs (same HBM bytes as the bf16
        # tensor; a bf16 array view is bit-identical)
        words_list = [jnp.asarray(w.view(np.uint32)) for w in words_list]
        compress = jax.jit(
            lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
        )
        decompress = jax.jit(
            lambda a: pfc.float_decompress_padded_pallas(
                a, ft, Lw, 10, False, static_length=n
            )
        )
        out_key = "out32"
    else:
        from dietgpu_tpu.floatcodec import codec as fcodec

        words_list = [jnp.asarray(w) for w in words_list]
        compress = jax.jit(
            lambda w: fcodec.float_compress_padded(w, n, ft, 10, False)
        )
        decompress = jax.jit(
            lambda a: fcodec.float_decompress_padded(a, ft, Lw, 10, False)
        )
        out_key = "out"

    # warm + validate roundtrip on every input (benchmark.py:83-84 parity);
    # the comparison runs ON DEVICE — full-buffer host readbacks through the
    # tunnel cost seconds and poison subsequent timing
    if out_key == "out32":
        check = jax.jit(
            lambda o, w: jnp.array_equal(o[: n // 2], w[: n // 2])
        )
    else:
        check = jax.jit(lambda o, w: jnp.array_equal(o[:n], w[:n]))
    arcs = []
    t0 = time.time()
    for k in range(K):
        arc, size = compress(words_list[k])
        arcs.append(arc)
        r = decompress(arc)
        assert bool(r["success"]), "decode reported failure"
        out = r[out_key]
        assert bool(check(out, words_list[k])), f"roundtrip mismatch input {k}"
    comp_size = int(size)
    ratio = comp_size / raw_bytes
    print(f"# compile+validate {time.time() - t0:.1f}s, ratio {ratio:.4f}",
          file=sys.stderr)

    def timeit(fn, args_list):
        # settle round: absorb post-transfer warmup effects
        for i in range(2):
            out = fn(args_list[i % K])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(args_list[i % K])
        leaf = jax.tree_util.tree_leaves(out)[0]
        # 1-element device-side slice: closes the chain without paying a
        # full-buffer transfer through the (slow) host tunnel
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        return (time.perf_counter() - t0) / iters

    t_comp = timeit(compress, words_list)
    t_decomp = timeit(decompress, arcs)

    comp_gbps = raw_bytes / t_comp / 1e9
    decomp_gbps = raw_bytes / t_decomp / 1e9

    # measured local HBM streaming bandwidth (read+write copy kernel),
    # for the %-of-HBM framing next to the A100 vs_baseline ratio: the
    # north-star target is a fraction of THIS part's bandwidth, not the
    # A100's absolute number. Two-size slope removes the fixed chained-
    # readback overhead (~34 ms / iters) that would otherwise understate
    # the bandwidth of this very fast op by 2-3x.
    copy = jax.jit(lambda x: x + 1)
    t_copy_full = timeit(copy, words_list)
    half_list = [w[: w.shape[0] // 2] for w in words_list]
    copy_h = jax.jit(lambda x: x + 1)
    t_copy_half = timeit(copy_h, half_list)
    hbm_gbps = raw_bytes / max(t_copy_full - t_copy_half, 1e-9) / 1e9

    print(
        json.dumps(
            {
                "metric": "bf16_float_decode_GBps",
                "value": round(decomp_gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(decomp_gbps / BASELINE_DECODE_GBPS, 4),
                "encode_GBps": round(comp_gbps, 3),
                "compression_ratio": round(ratio, 4),
                "hbm_GBps_measured": round(hbm_gbps, 1),
                "pct_hbm_decode": round(100 * decomp_gbps / hbm_gbps, 2),
                "pct_hbm_encode": round(100 * comp_gbps / hbm_gbps, 2),
                "n_words": n,
                "device": str(dev.device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
