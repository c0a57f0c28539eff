"""Tile-size sweep for the fused bf16 decode kernel (raised VMEM budget).

Measures decode GB/s at 64Mi bf16 words for several block_tile values, with
the honest chained-dispatch + 1-element readback recipe. Run on TPU only.

Usage: python experiments/tune_tile.py [tiles...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from dietgpu_tpu import constants as C
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    tiles = [int(x) for x in sys.argv[1:]] or [320, 512, 640, 1024]
    mwords = int(os.environ.get("MWORDS", "64"))
    n = mwords * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    raw = n * 2
    K, iters = 3, 32

    rng = np.random.default_rng(0)
    words = []
    for _ in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[n:] = 0
        words.append(jnp.asarray(w.view(np.uint32)))

    compress = jax.jit(lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False))
    arcs = [compress(w)[0] for w in words]
    ref = None

    for bt in tiles:
        try:
            def dec(a, bt=bt):
                arc = a.astype(jnp.uint32)
                nn = arc[1].astype(jnp.int32)
                plane32 = C.round_up(jnp.clip(nn, 0, Lw), 16) >> 2
                return pdec.ans_decode_padded_pallas(
                    arc, 10, Lw, arc_base=4 + plane32,
                    arc_base_bound=4 + (C.round_up(Lw, 16) >> 2),
                    fuse_float=ft, block_tile=bt,
                )["out"]

            decf = jax.jit(dec)
            t0 = time.time()
            out = decf(arcs[0])
            _ = np.asarray(out[0])
            print(f"bt={bt}: compile {time.time()-t0:.1f}s", flush=True)
            if ref is None:
                ref = np.asarray(out[: 1024])
            else:
                assert np.array_equal(ref, np.asarray(out[:1024])), "MISMATCH"
            for i in range(2):
                out = decf(arcs[i % K])
            _ = np.asarray(out[0])
            t0 = time.perf_counter()
            for i in range(iters):
                out = decf(arcs[i % K])
            _ = np.asarray(out[0])
            dt = (time.perf_counter() - t0) / iters
            print(f"bt={bt}: T={bt//4}  {raw/dt/1e9:7.2f} GB/s  ({dt*1e3:.2f} ms)",
                  flush=True)
        except Exception as e:
            print(f"bt={bt}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
