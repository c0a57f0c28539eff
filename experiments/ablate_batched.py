"""Time ONE batched-decode configuration under the current env knobs
(DIETGPU_DECODE_ABLATE is read at module import, so each ablation arm is
its own process; output is garbage for any non-empty ablate set — this is
a timing probe only). B/MEMKW/ITERS env knobs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C

B = int(os.environ.get("B", "128"))
MEMKW = int(os.environ.get("MEMKW", "512"))
ITERS = int(os.environ.get("ITERS", "24"))
K = 3


def main():
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = MEMKW * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    raw = B * n * 2
    rng = np.random.default_rng(0)
    enc = jax.jit(
        lambda w: pfc.float_compress_batched_pallas(w, n, ft, 10, False)
    )
    dec = jax.jit(
        lambda a: pfc.float_decompress_batched_pallas(
            a, ft, Lw, 10, static_length=n
        )
    )
    batches = []
    for k in range(K):
        x = rng.standard_normal((B, Lw)).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[:, n:] = 0
        wj = jnp.asarray(np.ascontiguousarray(w).view(np.uint32))
        batches.append(enc(wj)[0])

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

    t = timeit(dec, [(a,) for a in batches])
    print(
        f"ablate={os.environ.get('DIETGPU_DECODE_ABLATE','')!r:24s} "
        f"decode {t*1e3:8.2f} ms  {raw/t/1e9:6.2f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
