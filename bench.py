"""Benchmark: bf16 float-codec throughput on one chip.

Prints ONE JSON line:
  {"metric": "bf16_float_decode_GBps", "value": N, "unit": "GB/s",
   "vs_baseline": N / 490.0, ...extras}

Baseline: DietGPU bf16 float-codec decompression ~490 GB/s at ~128M floats
on an A100 (BASELINE.md, images/dietgpu_bfloat16_nb.png).

Env knobs: DIETGPU_BENCH_MWORDS (default 32), DIETGPU_BENCH_RUNS (default 3),
DIETGPU_BENCH_BACKEND (pass 'cpu' to bench the CPU backend).
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
    from dietgpu_tpu.floatcodec import codec as fcodec

    mwords = int(os.environ.get("DIETGPU_BENCH_MWORDS", "32"))
    runs = int(os.environ.get("DIETGPU_BENCH_RUNS", "3"))
    n = mwords * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    raw_bytes = n * 2

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}, n = {n} bf16 words "
          f"({raw_bytes / 1e6:.0f} MB)", file=sys.stderr)

    # N(0,1) bf16 data as raw u16 words, generated on device
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (Lw,), dtype=jnp.float32).astype(jnp.bfloat16)
    words = jax.jit(
        lambda v: jax.lax.bitcast_convert_type(v, jnp.uint16)
    )(x)
    words.block_until_ready()

    compress = jax.jit(
        lambda w: fcodec.float_compress_padded(w, n, ft, 10, False)
    )
    F = fcodec.float_archive_buffer_bytes(ft, Lw)
    decompress = jax.jit(
        lambda a: fcodec.float_decompress_padded(a, ft, Lw, 10, False)
    )

    t0 = time.time()
    arc, size = compress(words)
    arc.block_until_ready()
    print(f"# compress compile+run {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    res = decompress(arc)
    res["out"].block_until_ready()
    print(f"# decompress compile+run {time.time() - t0:.1f}s", file=sys.stderr)

    # validate roundtrip before timing (benchmark.py:83-84 parity)
    assert bool(res["success"])
    ok = jax.jit(lambda a, b: jnp.array_equal(a[:n], b[:n]))(res["out"], words)
    assert bool(ok), "roundtrip mismatch"
    comp_size = int(size)
    ratio = comp_size / raw_bytes

    def timeit(fn, *args):
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            out = fn(*args)
            jax.tree_util.tree_map(
                lambda t: t.block_until_ready() if hasattr(t, "block_until_ready") else t,
                out,
            )
            best = min(best, time.time() - t0)
        return best

    t_comp = timeit(compress, words)
    t_decomp = timeit(decompress, arc)

    comp_gbps = raw_bytes / t_comp / 1e9
    decomp_gbps = raw_bytes / t_decomp / 1e9

    print(
        json.dumps(
            {
                "metric": "bf16_float_decode_GBps",
                "value": round(decomp_gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(decomp_gbps / BASELINE_DECODE_GBPS, 4),
                "encode_GBps": round(comp_gbps, 3),
                "compression_ratio": round(ratio, 4),
                "n_words": n,
                "device": str(dev.device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
