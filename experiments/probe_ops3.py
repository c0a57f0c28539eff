"""Probe 3: isolate the MXU-in-kernel crash + viable output-packing schemes."""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, ITERS = 512, 128


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def tryk(name, kern, out_sd, *args, iters=ITERS):
    try:
        fn = jax.jit(
            lambda *a: pl.pallas_call(
                kern,
                out_shape=out_sd,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        )
        t = timeit(fn, *args)
        print(f"{name:34s} {t/iters*1e9:8.1f} ns/step")
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e).splitlines()[0][:100]}")


# 1. matmul bf16 with table passed in (no tril inside kernel)
def k_mxu_arg(tri_ref, x_ref, out_ref):
    tri = tri_ref[:]

    def body(k, x):
        m = (x > 0).astype(jnp.bfloat16)
        r = jax.lax.dot_general(
            m, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return x - r.astype(jnp.int32)

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


# 2. same but single matmul, no loop
def k_mxu_once(tri_ref, x_ref, out_ref):
    m = (x_ref[:] > 0).astype(jnp.bfloat16)
    r = jax.lax.dot_general(
        m, tri_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = r.astype(jnp.int32)


# 3. pack via 4 gathers + shifts (output byte packing without MXU)
def k_pack_gather(x_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)

    def body(k, x):
        s = x & 0xFF
        g0 = jnp.take_along_axis(s, (4 * lane) % 128, axis=1)
        g1 = jnp.take_along_axis(s, (4 * lane + 1) % 128, axis=1)
        g2 = jnp.take_along_axis(s, (4 * lane + 2) % 128, axis=1)
        g3 = jnp.take_along_axis(s, (4 * lane + 3) % 128, axis=1)
        packed = g0 | (g1 << 8) | (g2 << 16) | (g3 << 24)
        return x + packed

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


# 4. u16-table lane gather (stream pages as u16 instead of packed u32)
def k_gather_u16(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]

    def body(k, idx):
        v = jnp.take_along_axis(tab, idx, axis=1)
        return (idx + v.astype(jnp.int32)) % 128

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx_ref[:])


# 5. sublane (second-minor) dynamic store: out[pl.ds(row, 32), :] = v
def k_dyn_sublane_store(x_ref, out_ref):
    def body(k, s):
        v = x_ref[0:32, :] + s
        out_ref[pl.ds(32 * (k % 16), 32), :] = v
        return s + 1

    jax.lax.fori_loop(0, ITERS, body, 0)


if __name__ == "__main__":
    tri = jnp.tril(jnp.ones((128, 128), jnp.bfloat16))
    x = jnp.ones((T, 128), jnp.int32)
    tryk("mxu_arg bf16 (512,128)@(128,128)", k_mxu_arg, jax.ShapeDtypeStruct((T, 128), jnp.int32), tri, x)
    tryk("mxu_once", k_mxu_once, jax.ShapeDtypeStruct((T, 128), jnp.int32), tri, x, iters=1)
    tryk("pack 4xgather", k_pack_gather, jax.ShapeDtypeStruct((T, 128), jnp.int32), x)
    tab16 = jnp.ones((T, 128), jnp.uint16)
    idx = jnp.zeros((T, 128), jnp.int32)
    tryk("gather u16 (512,128)", k_gather_u16, jax.ShapeDtypeStruct((T, 128), jnp.int32), tab16, idx)
    tryk(
        "dyn_sublane_store (32,128)",
        k_dyn_sublane_store,
        jax.ShapeDtypeStruct((T, 128), jnp.int32),
        x,
    )
