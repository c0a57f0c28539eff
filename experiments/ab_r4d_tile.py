"""Round-4 session D: encode stage-1 tile sweep (DIETGPU_ENCODE_TILE).

Full bf16 compress at MWORDS for tile in {256, 512, 1024} blocks per grid
step. Archives must be byte-identical across arms (tile only changes the
grid split and buffer padding; NBp stays NB for power-of-two sizes).
MWORDS/ITERS env knobs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C

MWW = int(os.environ.get("MWORDS", "64"))
ITERS = int(os.environ.get("ITERS", "32"))
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

    n = MWW * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(0)
    words = []
    for k in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[n:] = 0
        words.append(jnp.asarray(w.view(np.uint32)))
    GB = n * 2 / 1e9

    base = None
    for tile in ("256", "512", "1024"):
        os.environ["DIETGPU_ENCODE_TILE"] = tile
        # _ENCODE_TILE is pinned at import (buffer-geometry coherence);
        # this in-process sweep overrides the pinned value per arm
        from dietgpu_tpu.ans import pallas_encode as penc

        penc._ENCODE_TILE = int(tile)
        compress = jax.jit(
            lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
        )
        decompress = jax.jit(
            lambda a: pfc.float_decompress_padded_pallas(
                a, ft, Lw, 10, False, static_length=n
            )
        )
        arcs = [compress(w)[0] for w in words]
        # different tiles may size the buffer differently; compare the
        # decoded output instead of raw buffers
        ok = True
        for a, w in zip(arcs, words):
            r = decompress(a)
            ok &= bool(r["success"]) and bool(
                jax.jit(lambda o, w: jnp.array_equal(o[: n // 2], w[: n // 2]))(
                    r["out32"], w
                )
            )
        t = timeit(compress, [(w,) for w in words])
        print(
            f"encode tile={tile:5s}  {t*1e3:8.2f} ms  {GB/t:6.2f} GB/s  "
            f"roundtrip={ok}",
            flush=True,
        )
        assert ok
        if base is None:
            base = t
    del os.environ["DIETGPU_ENCODE_TILE"]
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
