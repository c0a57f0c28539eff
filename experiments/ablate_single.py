"""Time ONE single-tensor fused bf16 decompress configuration under the
current env knobs (DIETGPU_DECODE_ABLATE is read at module import, so
each ablation arm is its own process; output is garbage for any
non-empty ablate set — timing probe only). MWORDS/ITERS env knobs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C

MWW = int(os.environ.get("MWORDS", "128"))
ITERS = int(os.environ.get("ITERS", "32"))
K = 3


def main():
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = MWW * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(0)
    compress = jax.jit(
        lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
    )
    decompress = jax.jit(
        lambda a: pfc.float_decompress_padded_pallas(
            a, ft, Lw, 10, False, static_length=n
        )
    )
    arcs = []
    for k in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[n:] = 0
        arcs.append(compress(jnp.asarray(w.view(np.uint32)))[0])

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

    t = timeit(decompress, [(a,) for a in arcs])
    print(
        f"ablate={os.environ.get('DIETGPU_DECODE_ABLATE','')!r:10s} "
        f"decode {t*1e3:8.2f} ms  {2*n/t/1e9:6.2f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
