"""Round-5 encode A/B (session B2): window-append scatter: rank binary-search vs butterfly compaction.

Full bf16 compress at MWORDS Mi words plus raw-ANS encode at MWORDS/2 Mi
bytes; bit-exactness checked across arms (the cache key includes the
knob, so each arm traces its own kernel). MWORDS/ITERS env knobs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C

MWW = int(os.environ.get("MWORDS", "128"))
ITERS = int(os.environ.get("ITERS", "24"))
K = 3
ARMS = os.environ.get("ARMS", "search,bfly,search").split(",")


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
    from dietgpu_tpu.ans import pallas_encode as penc
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
    for arm in ARMS:
        os.environ["DIETGPU_ENCODE_SCATTER"] = arm
        compress = jax.jit(
            lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
        )
        arcs = [compress(w)[0] for w in words]
        if base_arcs is None:
            base_arcs = arcs
        ok = all(bool(check_arc(a, b)) for a, b in zip(arcs, base_arcs))
        t = timeit(compress, [(w,) for w in words])
        print(
            f"bf16 compress {MWW}Mi [scatter={arm:3s}]: {t*1e3:8.2f} ms  "
            f"{GB/t:6.2f} GB/s  arcs-equal={ok}",
            flush=True,
        )
        assert ok

    # raw ANS encode
    nb = (MWW // 2) * 1024 * 1024
    Lb = C.round_up(nb, C.DEFAULT_BLOCK_SIZE)
    datas = []
    for k in range(K):
        d = np.minimum(rng.exponential(30, Lb), 255).astype(np.uint8)
        d[nb:] = 0
        datas.append(jnp.asarray(d))
    base_arcs = None
    for arm in ARMS:
        os.environ["DIETGPU_ENCODE_SCATTER"] = arm
        enc = jax.jit(
            lambda d: penc.ans_encode_padded_pallas(d, nb, 10, False, return_u32=True)
        )
        arcs = [enc(d)[0] for d in datas]
        if base_arcs is None:
            base_arcs = arcs
        ok = all(bool(check_arc(a, b)) for a, b in zip(arcs, base_arcs))
        t = timeit(enc, [(d,) for d in datas])
        print(
            f"raw ANS encode {MWW//2}Mi [scatter={arm:3s}]: "
            f"{t*1e3:8.2f} ms  {nb/t/1e9:6.2f} GB/s  arcs-equal={ok}",
            flush=True,
        )
        assert ok
    os.environ.pop("DIETGPU_ENCODE_SCATTER", None)
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
