"""Probe: is the batched-decode prologue's cost the vmapped member slices?

Times, on hardware, the states/bw/header section extraction of a
(B, F4) archive batch done (a) as the driver does it today — vmap of
per-member dynamic_slice with static starts — vs (b) direct 2-D
lax.slice. Also the vmapped rank-table build. Forced materialization via
a 1-element readback of each result (not a full reduction).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import pallas_decode as pdec
from dietgpu_tpu.floatcodec import pallas_codec as pfc

_I32, _U32 = jnp.int32, jnp.uint32


def main():
    B, nw = 128, 512 * 1024
    Lw = C.round_up(nw, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    K, iters = 3, 32
    F4 = pfc.float_archive_u32_bytes(ft, Lw) // 4
    NB = Lw // C.DEFAULT_BLOCK_SIZE
    NBp = NB
    W = C.NUM_INTERLEAVED
    base = 4 + (C.round_up(nw, 16) >> 2)
    rng = np.random.default_rng(0)
    enc = jax.jit(lambda w: pfc.float_compress_batched_pallas(w, nw, ft, 10, False))
    batches = []
    for k in range(K):
        x = rng.standard_normal((B, Lw)).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        wj = jnp.asarray(np.ascontiguousarray(w).view(np.uint32))
        batches.append(enc(wj)[0])

    def timeit(label, fn):
        f = jax.jit(fn)
        for i in range(2):
            out = f(batches[i % K])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(batches[i % K])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:36s} {dt*1e3:8.2f} ms", flush=True)

    def states_vmap(a):
        st = jax.vmap(
            lambda m: jax.lax.dynamic_slice(m, (base + 136,), (NBp * W,))
        )(a.astype(_U32))
        return st.reshape(B * NBp // 4, 128).astype(_I32)

    def states_2d(a):
        st = jax.lax.slice(
            a.astype(_U32), (0, base + 136), (B, base + 136 + NBp * W)
        )
        return st.reshape(B * NBp // 4, 128).astype(_I32)

    def tables_vmap(a):
        pw = jax.lax.slice(a.astype(_U32), (0, base + 8), (B, base + 136))
        pdf = jnp.stack([pw & _U32(0xFFFF), pw >> _U32(16)], axis=2).reshape(
            B, C.NUM_SYMBOLS
        )
        s, p = jax.vmap(lambda q: pdec.build_rank_tables(q, 10))(pdf)
        return s, p

    timeit("states via vmap dynamic_slice", states_vmap)
    timeit("states via 2-D lax.slice", states_2d)
    timeit("pw 2-D + vmapped rank tables", tables_vmap)
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
