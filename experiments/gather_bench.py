"""Microbenchmark: per-lane table-lookup strategies inside a Pallas TPU kernel.

The rANS decode hot loop needs, per decoded byte, one gather from a
2^probBits-entry u32 LUT (probBits in {9,10,11}) and one gather from a
per-block u16 stream. This measures candidate lowerings on the real chip:

  A: jnp.take from a flat (K,) VMEM table, (R,128) i32 indices
  B: one-hot matmul (bf16) against a (K, 1) f32 table
  C: take_along_axis row-local gather from (R, K) replicated table
  D: scalar fori_loop (expected terrible; floor reference)

Run: python experiments/gather_bench.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 1024  # table entries
R = 256  # index rows (R x 128 lanes of lookups per iteration)
ITERS = 64  # serialized lookup iterations per kernel call


def _mix(idx, v, it):
    # serialize: next indices depend on previous values
    return (idx + v + it) & (K - 1)


def kern_take_flat(table_ref, idx0_ref, out_ref):
    def body(it, idx):
        v = jnp.take(table_ref[:], idx, axis=0)
        return _mix(idx, v.astype(jnp.int32), it)

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx0_ref[:])


def kern_onehot(table_ref, idx0_ref, out_ref):
    tab = table_ref[:].reshape(K, 1).astype(jnp.float32)

    def body(it, idx):
        oh = (idx[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (R, 128, K), 2)).astype(jnp.bfloat16)
        v = jax.lax.dot_general(
            oh.reshape(R * 128, K), tab.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(R, 128).astype(jnp.int32)
        return _mix(idx, v, it)

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx0_ref[:])


def kern_taa(table_ref, idx0_ref, out_ref):
    # row-local gather: table replicated to (8, K), index rows map to sublanes
    tab8 = jnp.broadcast_to(table_ref[:].reshape(1, K), (8, K))

    def body(it, idx):
        i8 = idx.reshape(R // 8 * 8, 128)
        # gather each (8,128) slab against (8,K) table
        def slab(j, acc):
            s = jax.lax.dynamic_slice(i8, (j * 8, 0), (8, 128))
            v = jnp.take_along_axis(tab8, s, axis=1)
            return jax.lax.dynamic_update_slice(acc, v, (j * 8, 0))

        v = jax.lax.fori_loop(0, R // 8, slab, jnp.zeros_like(i8))
        return _mix(idx, v.reshape(R, 128).astype(jnp.int32), it)

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx0_ref[:])


def make(kern):
    return jax.jit(
        lambda tab, idx: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    )


def bench(name, kern, tab):
    try:
        fn = make(kern)
        idx = jnp.arange(R * 128, dtype=jnp.int32).reshape(R, 128) % K
        out = fn(tab, idx)
        out.block_until_ready()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fn(tab, idx).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        n_lookups = R * 128 * ITERS
        print(f"{name:12s} {best*1e6:9.1f} us  {n_lookups/best/1e9:8.2f} G-lookups/s")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name:12s} FAILED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    tab = (jnp.arange(K, dtype=jnp.int32) * 7) & (K - 1)
    bench("take_flat", kern_take_flat, tab)
    bench("onehot_mxu", kern_onehot, tab)
    bench("taa_rows", kern_taa, tab)
