"""Fused decode-checksum cost on hardware: verify on vs off (bf16 64Mi).

Round 2 verified the decode-side checksum with an XLA reduction over the
decoded output — an extra full-output HBM pass. Round 3 fuses an XOR
accumulator into the decode kernel (mirroring the encode-side fusion);
target: checksummed decode within 5% of unchecksummed (VERDICT #7).

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
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = MWW * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(0)
    compress = jax.jit(
        lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, True)
    )
    arcs = []
    for k in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[n:] = 0
        arc, _ = compress(jnp.asarray(w.view(np.uint32)))
        arcs.append(arc)

    times = {}
    for verify in (False, True):
        fn = jax.jit(
            lambda a: pfc.float_decompress_padded_pallas(a, ft, Lw, 10, verify, static_length=n)
        )
        r = fn(arcs[0])
        assert bool(r["success"]) and bool(r["checksum_ok"])
        t = timeit(fn, [(a,) for a in arcs])
        times[verify] = t
        print(
            f"bf16 {MWW}Mi decode verify={verify!s:5s}: {t*1e3:8.2f} ms  "
            f"{2*n/t/1e9:6.2f} GB/s",
            flush=True,
        )
    print(
        f"checksum overhead: {100 * (times[True] / times[False] - 1):.1f}%"
        " (target <= 5%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
