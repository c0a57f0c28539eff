"""Round-5 mid-size attribution: where do 4Mi/16Mi decode milliseconds go?

VERDICT r4 #6: bf16 decode reads 4.6 GB/s at 4Mi vs 27+ at 128Mi, and
DECODE is slower than ENCODE at 4Mi (inverted vs every other size). The
4Mi point runs ~4x above the ~450 us dispatch floor, so something fixed
per call — suspected: the decode prologue's tiny-XLA-op chain (section
slices, rank-table build, meta assembly) — dominates.

Arms per size (fused bf16, static_length):
  full      — the real decode
  ablated   — kernel phases skipped via DIETGPU_DECODE_ABLATE (garbage
              output): remaining time = XLA prologue + loop skeleton +
              DMA/realign + dispatch
  floor     — jitted 1-element identity on the archive (dispatch floor)

MWORDS_LIST/ITERS env knobs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C

SIZES = [
    int(s) for s in os.environ.get("MWORDS_LIST", "4,16,64").split(",")
]
ITERS = int(os.environ.get("ITERS", "48"))
K = 3


def timeit(fn, arglists):
    for i in range(2):
        out = fn(*arglists[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*arglists[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / ITERS


def main():
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(0)
    for MWW in SIZES:
        n = MWW * 1024 * 1024
        Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
        compress = jax.jit(
            lambda w, _n=n: pfc.float_compress_padded_pallas(
                w, _n, ft, 10, False
            )
        )
        arcs = []
        for k in range(K):
            x = rng.standard_normal(Lw).astype(np.float32)
            w = (x.view(np.uint32) >> 16).astype(np.uint16)
            w[n:] = 0
            arc, _ = compress(jnp.asarray(w.view(np.uint32)))
            arcs.append(arc)
        GB = 2 * n / 1e9

        t_enc = timeit(compress, [
            (jnp.asarray(
                (rng.standard_normal(Lw).astype(np.float32)
                 .view(np.uint32) >> 16).astype(np.uint16).view(np.uint32)
            ),)
            for _ in range(K)
        ])

        fn = jax.jit(
            lambda a, _n=n, _L=Lw: pfc.float_decompress_padded_pallas(
                a, ft, _L, 10, static_length=_n
            )
        )
        t_full = timeit(fn, [(a,) for a in arcs])

        floor = jax.jit(lambda a: a[:1] + 1)
        t_floor = timeit(floor, [(a,) for a in arcs])

        print(
            f"{MWW:4d}Mi  enc {t_enc*1e3:8.2f} ms ({GB/t_enc:5.2f} GB/s)  "
            f"dec {t_full*1e3:8.2f} ms ({GB/t_full:5.2f} GB/s)  "
            f"floor {t_floor*1e3:7.2f} ms",
            flush=True,
        )
    print(
        "NOTE: run again with DIETGPU_DECODE_ABLATE=realign,read,rank,"
        "pack,lut (one process per arm) for the prologue+skeleton share.",
        flush=True,
    )
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
