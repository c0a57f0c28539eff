"""Throughput sweep: the dietTPU analogue of the reference's benchmark.py.

Reproduces the reference benchmark matrix (SURVEY.md §6 / BASELINE.md):
encode/decode GB/s for the float codec across dtypes, sizes, and probBits,
plus the raw ANS codec, on one chip. Prints a markdown table and writes
benchmarks/results.json.

Honest timing for the tunneled/async backend: distinct inputs, chained
dispatch, 1-element device-slice readback.

Usage: python benchmarks/sweep.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from dietgpu_tpu import constants as C
    from dietgpu_tpu.ans import encode as enc
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    quick = "--quick" in sys.argv
    K = 3
    # the tunnel's chain-closing readback costs ~34 ms fixed; amortize it
    iters = 32
    # chunked runs (slow remote compiles): restrict rows and merge results
    only = os.environ.get("DIETGPU_SWEEP_ONLY", "")  # e.g. "bf16,f16,ans,batch"
    merge = os.environ.get("DIETGPU_SWEEP_MERGE") == "1"

    def want(tag):
        return not only or tag in only.split(",")
    rng = np.random.default_rng(0)
    results = []

    def timeit(fn, args_list):
        out = fn(args_list[0])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(args_list[i % K])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        return (time.perf_counter() - t0) / iters

    sizes_env = os.environ.get("DIETGPU_SWEEP_SIZES")
    if sizes_env:
        sizes_m = [int(x) for x in sizes_env.split(",")]
    else:
        sizes_m = [1, 16, 64] if quick else [1, 4, 16, 64, 128]

    # ---- float codec sweep ----
    for ft, name in (
        (C.FLOAT_TYPE_BFLOAT16, "bf16"),
        (C.FLOAT_TYPE_FLOAT16, "f16"),
        (C.FLOAT_TYPE_FLOAT32, "f32"),
    ):
        if not want(name):
            continue
        wordsize = C.float_word_size(ft)
        for m in sizes_m:
            n = m << 20
            Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
            raw = wordsize * n
            words = []
            for k in range(K):
                x = rng.standard_normal(Lw).astype(np.float32)
                if ft == C.FLOAT_TYPE_BFLOAT16:
                    w = (x.view(np.uint32) >> 16).astype(np.uint16)
                    w[n:] = 0
                    w = w.view(np.uint32)
                elif ft == C.FLOAT_TYPE_FLOAT16:
                    w = x.astype(np.float16).view(np.uint16)
                    w[n:] = 0
                    w = w.view(np.uint32)
                else:
                    w = x.view(np.uint32).copy()
                    w[n:] = 0
                words.append(jnp.asarray(w))
            compress = jax.jit(
                lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
            )
            decompress = jax.jit(
                lambda a: pfc.float_decompress_padded_pallas(a, ft, Lw, 10, False, static_length=n)
            )
            arcs = [compress(w)[0] for w in words]
            size = int(compress(words[0])[1])
            te = timeit(compress, words)
            td = timeit(decompress, arcs)
            row = {
                "codec": f"float-{name}", "mwords": m, "ratio": size / raw,
                "enc_GBps": raw / te / 1e9, "dec_GBps": raw / td / 1e9,
            }
            results.append(row)
            print(f"float {name:5s} {m:4d}Mi  ratio {row['ratio']:.4f}  "
                  f"enc {row['enc_GBps']:6.2f}  dec {row['dec_GBps']:6.2f} GB/s",
                  flush=True)

    # ---- raw ANS codec sweep (exponential bytes) ----
    for pb in ([10] if quick else [9, 10, 11]) if want("ans") else []:
        m = 32
        n = m << 20
        L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
        datas = []
        for k in range(K):
            d = np.minimum(rng.exponential(30, L), 255).astype(np.uint8)
            d[n:] = 0
            datas.append(jnp.asarray(d))
        encode = jax.jit(
            lambda d: penc.ans_encode_padded_pallas(d, n, pb, False, return_u32=True)
        )
        decode = jax.jit(
            lambda a: pdec.ans_decode_padded_pallas(a, pb, L, False, return_u32=True)
        )
        arcs = [encode(d)[0] for d in datas]
        size = int(encode(datas[0])[1])
        te = timeit(encode, datas)
        td = timeit(decode, arcs)
        row = {
            "codec": f"ans-pb{pb}", "mwords": m, "ratio": size / n,
            "enc_GBps": n / te / 1e9, "dec_GBps": n / td / 1e9,
        }
        results.append(row)
        print(f"ans pb={pb}   {m:4d}Mi  ratio {row['ratio']:.4f}  "
              f"enc {row['enc_GBps']:6.2f}  dec {row['dec_GBps']:6.2f} GB/s",
              flush=True)

    # ---- batched scenario: 128 x 512Ki bf16 (reference benchmark.py:149-221
    # runs the same non-batched vs 128-way-batched comparison) ----
    if not quick and want("batch"):
        B, nw = 128, 512 * 1024
        Lw = C.round_up(nw, C.DEFAULT_BLOCK_SIZE)
        ft = C.FLOAT_TYPE_BFLOAT16
        raw = B * nw * 2
        batches = []
        for k in range(K):
            x = rng.standard_normal(B * Lw).astype(np.float32)
            w = (x.view(np.uint32) >> 16).astype(np.uint16)
            batches.append(jnp.asarray(w.view(np.uint32).reshape(B, Lw // 2)))
        # encode: ONE stage-1 grid with per-row tables and member-spanning
        # tiles (vmap of the single-tensor pipeline leaves the hot loop on
        # member-sized tiles)
        bcompress = jax.jit(
            lambda w: pfc.float_compress_batched_pallas(w, nw, ft, 10, False)
        )
        # decode: ONE multi-archive grid with per-row tables (vmap of the
        # single-archive kernel serializes the 128 small grids)
        bdecompress = jax.jit(
            lambda a: pfc.float_decompress_batched_pallas(
                a, ft, Lw, 10, static_length=nw
            )
        )
        arcs = [bcompress(b)[0] for b in batches]
        sizes = np.asarray(bcompress(batches[0])[1])
        te = timeit(bcompress, batches)
        td = timeit(bdecompress, arcs)
        row = {
            "codec": "float-bf16-batch128", "mwords": B * nw >> 20,
            "ratio": float(sizes.sum()) / raw,
            "enc_GBps": raw / te / 1e9, "dec_GBps": raw / td / 1e9,
        }
        results.append(row)
        print(f"batch 128x512Ki bf16  ratio {row['ratio']:.4f}  "
              f"enc {row['enc_GBps']:6.2f}  dec {row['dec_GBps']:6.2f} GB/s",
              flush=True)

    out_path = os.path.join(os.path.dirname(__file__), "results.json")
    if merge and os.path.exists(out_path):
        with open(out_path) as f:
            old = json.load(f).get("rows", [])
        seen = {(r["codec"], r["mwords"]) for r in results}
        results = [r for r in old if (r["codec"], r["mwords"]) not in seen] + results
    with open(out_path, "w") as f:
        json.dump(
            {"device": str(jax.devices()[0].device_kind), "rows": results}, f,
            indent=1,
        )
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
