"""Hardware matrix A/B: decode refill cadence x act-mask specialization.

Times the fused bf16 float decompress at MWORDS for the four combinations
of DIETGPU_DECODE_REFILL (lazy/eager) x DIETGPU_DECODE_ACTSPEC (on/off),
validating bit-exactness across all arms. Settles both round-3 knob
defaults in one session (each arm's Mosaic compile lands in the remote
compile cache, so the final bench/sweep reuse the winner for free).

MWORDS/ITERS env knobs.
"""
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
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = MWW * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(0)

    compress = jax.jit(
        lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
    )
    arcs = []
    for k in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[n:] = 0
        arc, _ = compress(jnp.asarray(w.view(np.uint32)))
        arcs.append(arc)

    ref = None
    for refill in ("lazy", "eager"):
        for act in ("on", "off"):
            if refill == "eager":
                os.environ["DIETGPU_DECODE_REFILL"] = "eager"
            else:
                os.environ.pop("DIETGPU_DECODE_REFILL", None)
            if act == "off":
                os.environ["DIETGPU_DECODE_ACTSPEC"] = "off"
            else:
                os.environ.pop("DIETGPU_DECODE_ACTSPEC", None)
            pdec._build_decode_call.cache_clear()
            fn = jax.jit(
                lambda a: pfc.float_decompress_padded_pallas(a, ft, Lw, 10, static_length=n)
            )
            t0 = time.time()
            out = np.asarray(fn(arcs[0])["out32"])
            compile_s = time.time() - t0
            if ref is None:
                ref = out
            eq = np.array_equal(out, ref)
            t = timeit(fn, [(a,) for a in arcs])
            print(
                f"refill={refill:5s} actspec={act:3s}: {t*1e3:8.2f} ms  "
                f"{2*n/t/1e9:6.2f} GB/s  (compile {compile_s:.0f}s, "
                f"bit-equal {eq})",
                flush=True,
            )


if __name__ == "__main__":
    main()
