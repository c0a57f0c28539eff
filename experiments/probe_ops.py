"""Probe Mosaic primitive support + throughput on the real chip.

Measures the ops the rANS kernels will be built from:
  - tpu.dynamic_gather lane-wise (axis=1) and sublane-wise (axis=0),
    u32/u16/u8, at several shapes
  - cumsum along sublanes
  - u8/u16 (128,128) transpose
  - 32-bit integer multiply
Each benchmark serializes ITERS dependent iterations inside one kernel to
expose steady-state per-op cost.
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 256


def run(name, kern, out_sd, *args, iters=ITERS, elems=None):
    try:
        fn = jax.jit(
            lambda *a: pl.pallas_call(
                kern,
                out_shape=out_sd,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        )
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per_iter = best / iters
        msg = f"{name:28s} {per_iter*1e9:9.1f} ns/op"
        if elems:
            msg += f"  {elems/per_iter/1e9:8.2f} G-elem/s"
        print(msg)
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e).splitlines()[0][:110]}")


def gather_kern(axis, shape, dtype):
    M, N = shape
    lim = M if axis == 0 else N

    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]

        def body(it, idx):
            v = jnp.take_along_axis(tab, idx, axis=axis)
            return (idx + v.astype(jnp.int32) + it) % lim

        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx_ref[:])

    tab = (jnp.arange(M * N, dtype=jnp.int32) % 127).astype(dtype).reshape(M, N)
    idx = jnp.zeros(shape, jnp.int32)
    return kern, jax.ShapeDtypeStruct(shape, jnp.int32), (tab, idx), M * N


def cumsum_kern(shape, dtype):
    def kern(x_ref, out_ref):
        def body(it, x):
            return jnp.cumsum(x, axis=0, dtype=dtype) % jnp.array(1000, dtype)

        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    x = jnp.ones(shape, dtype)
    return kern, jax.ShapeDtypeStruct(shape, dtype), (x,), shape[0] * shape[1]


def transpose_kern(shape, dtype):
    def kern(x_ref, out_ref):
        def body(it, x):
            return x.T + jnp.array(1, dtype)

        out_ref[:] = jax.lax.fori_loop(0, ITERS // 2, body, x_ref[:])

    x = jnp.zeros(shape, dtype)
    return (
        kern,
        jax.ShapeDtypeStruct(shape, dtype),
        (x,),
        shape[0] * shape[1],
    )


def mul_kern(shape):
    def kern(x_ref, out_ref):
        def body(it, x):
            return x * (x + jnp.uint32(it))

        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    x = jnp.ones(shape, jnp.uint32)
    return kern, jax.ShapeDtypeStruct(shape, jnp.uint32), (x,), shape[0] * shape[1]


if __name__ == "__main__":
    for axis in (0, 1):
        for shape in ((8, 128), (32, 128), (64, 128), (128, 128), (1280, 128), (2560, 128)):
            for dt in (jnp.int32,):
                k, o, a, n = gather_kern(axis, shape, dt)
                run(f"gather ax{axis} {shape} i32", k, o, *a, elems=n)
    for dt in (jnp.uint8, jnp.int32):
        k, o, a, n = gather_kern(1, (32, 128), dt)
        run(f"gather ax1 (32,128) {jnp.dtype(dt).name}", k, o, *a, elems=n)
    k, o, a, n = cumsum_kern((32, 128), jnp.int32)
    run("cumsum ax0 (32,128) i32", k, o, *a, elems=n)
    k, o, a, n = cumsum_kern((4096, 128), jnp.int32)
    run("cumsum ax0 (4096,128) i32", k, o, *a, elems=n)
    for dt in (jnp.uint8, jnp.uint16, jnp.int32):
        k, o, a, n = transpose_kern((128, 128), dt)
        run(f"transpose (128,128) {jnp.dtype(dt).name}", k, o, *a, iters=ITERS // 2, elems=n)
    k, o, a, n = mul_kern((32, 128))
    run("mul u32 (32,128)", k, o, *a, elems=n)
    k, o, a, n = mul_kern((256, 128))
    run("mul u32 (256,128)", k, o, *a, elems=n)
