"""Hardware timing of the one-grid batched float codec (128 x 512Ki bf16).

Measures BOTH directions of the reference's headline batched scenario
(benchmark.py:149-221) through the one-grid multi-archive kernels:
  * float_compress_batched_pallas — ONE stage-1 encode grid spanning all
    members (landed round 2, never measured on hardware; VERDICT #3);
  * float_decompress_batched_pallas — spanning-tile fused decode.
Validates bit-exactness of a roundtrip before timing.

B/MEMKW/ITERS env knobs.
"""
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

    inputs, batches = [], []
    for k in range(K):
        x = rng.standard_normal((B, Lw)).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[:, n:] = 0
        wj = jnp.asarray(np.ascontiguousarray(w).view(np.uint32))
        inputs.append(wj)
        arcs, sizes = enc(wj)
        batches.append(arcs)
        if k == 0:
            r = dec(arcs)
            pairs = np.asarray(r["out32"])
            got = np.zeros((B, Lw), np.uint16)
            got[:, 0::2] = pairs & 0xFFFF
            got[:, 1::2] = pairs >> 16
            ok = bool(jnp.all(r["success"])) and np.array_equal(
                got[:, :n], w[:, :n]
            )
            print(f"roundtrip bit-exact: {ok}", flush=True)
            assert ok

    te = timeit(enc, [(x,) for x in inputs])
    print(
        f"batched encode {B}x{MEMKW}Ki: {te*1e3:8.2f} ms  "
        f"{raw/te/1e9:6.2f} GB/s",
        flush=True,
    )
    td = timeit(dec, [(a,) for a in batches])
    print(
        f"batched decode {B}x{MEMKW}Ki: {td*1e3:8.2f} ms  "
        f"{raw/td/1e9:6.2f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
