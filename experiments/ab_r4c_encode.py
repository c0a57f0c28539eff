"""Round-4 session C encode A/B: flush group G=4 vs G=8 under the settled
quartet/flushstack-off defaults, with the normalize rank-matrix and
batched assembly pack landed. Full bf16 compress at MWORDS; bit-exactness
checked across arms. MWORDS/ITERS env knobs."""
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
    check_arc = jax.jit(lambda a, b: jnp.array_equal(a, b))

    base_arcs = None
    for g in ("4", "8"):
        os.environ["DIETGPU_ENCODE_FLUSH_GROUP"] = g
        compress = jax.jit(
            lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
        )
        arcs = [compress(w)[0] for w in words]
        if base_arcs is None:
            base_arcs = arcs
        ok = all(bool(check_arc(a, b)) for a, b in zip(arcs, base_arcs))
        t = timeit(compress, [(w,) for w in words])
        print(
            f"encode G={g}  {t*1e3:8.2f} ms  {GB/t:6.2f} GB/s  bitexact={ok}",
            flush=True,
        )
        assert ok
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
