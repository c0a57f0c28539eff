"""Probe 2: staging + kernel-building-block costs on the real chip.

  1. XLA gather throughput: jnp.take(flat_u32, affine-per-row idx) — the
     archive->block-major stream staging transform.
  2. In-kernel per-row DMA issue cost (HBM->VMEM, dynamic offsets).
  3. MXU matmul inside a kernel per-step (rank-via-triangular-matmul).
  4. Dynamic lane-offset store of a (T, 32) u8 slab.
  5. pltpu.roll with traced shift (dynamic rotate).
  6. fori_loop with traced (non-static) bounds.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def probe_xla_gather():
    NB, W = 8192, 1280  # 8192 blocks x 1280 u32 = 40 MB staged
    flat = jnp.arange(NB * W, dtype=jnp.uint32)
    offs = (jnp.arange(NB, dtype=jnp.int32) * 717) % (NB * W - W)

    @jax.jit
    def stage(flat, offs):
        idx = offs[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        return jnp.take(flat, idx)

    t = timeit(stage, flat, offs)
    print(f"xla_gather_stage  {t*1e3:8.2f} ms  {NB*W*4/t/1e9:8.2f} GB/s")


def probe_dma_issue():
    NB, ROWB = 256, 1280  # 256 row DMAs of 5 KiB each per kernel call
    src = jnp.arange(NB * ROWB * 2, dtype=jnp.uint32)
    offs = ((np.arange(NB, dtype=np.int32) * 2561) % (NB * ROWB)).astype(np.int32)

    def kern(offs_ref, src_ref, out_ref, sems):
        def body(i, _):
            dma = pltpu.make_async_copy(
                src_ref.at[pl.ds(offs_ref[i], ROWB)],
                out_ref.at[i, :],
                sems.at[i % 16],
            )
            dma.start()
            @pl.when(i >= 15)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(offs_ref[i - 15], ROWB)],
                    out_ref.at[i - 15, :],
                    sems.at[(i - 15) % 16],
                ).wait()
            return 0

        jax.lax.fori_loop(0, NB, body, 0)

        def drain(i, _):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(offs_ref[i], ROWB)],
                out_ref.at[i, :],
                sems.at[i % 16],
            ).wait()
            return 0

        jax.lax.fori_loop(NB - 15, NB, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
    )
    fn = jax.jit(
        lambda o, s: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NB, ROWB), jnp.uint32),
            grid_spec=grid_spec,
        )(o, s)
    )
    t = timeit(fn, jnp.asarray(offs), src)
    print(f"dma_issue x{NB}    {t*1e3:8.2f} ms  {t/NB*1e9:8.1f} ns/DMA  {NB*ROWB*4/t/1e9:6.2f} GB/s")


def probe_mxu_step():
    T, ITERS = 512, 128
    tri = jnp.tril(jnp.ones((128, 128), jnp.bfloat16))

    def kern(x_ref, out_ref):
        tri_v = jnp.tril(jnp.ones((128, 128), jnp.bfloat16))

        def body(k, x):
            m = (x > 0).astype(jnp.bfloat16)
            r = jax.lax.dot_general(
                m, tri_v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return x - r.astype(jnp.int32)

        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    fn = jax.jit(
        lambda x: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    )
    x = jnp.ones((T, 128), jnp.int32)
    t = timeit(fn, x)
    print(f"mxu (512,128)@(128,128)/step {t/ITERS*1e9:8.1f} ns/step")


def probe_dyn_lane_store():
    T, ITERS = 512, 128

    def kern(x_ref, out_ref):
        def body(k, s):
            v = (x_ref[:, :32] + s).astype(jnp.uint16)
            out_ref[:, pl.ds(32 * (k % 128), 32)] = v
            return s + 1

        jax.lax.fori_loop(0, ITERS, body, 0)

    fn = jax.jit(
        lambda x: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, 4096), jnp.uint16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    )
    x = jnp.ones((T, 128), jnp.int32)
    t = timeit(fn, x)
    print(f"dyn_lane_store (512,32)u16   {t/ITERS*1e9:8.1f} ns/step")


def probe_dyn_roll():
    T, ITERS = 512, 128

    def kern(x_ref, out_ref):
        def body(k, x):
            return pltpu.roll(x, k, 1) + 1

        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    fn = jax.jit(
        lambda x: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    )
    x = jnp.ones((T, 128), jnp.int32)
    t = timeit(fn, x)
    print(f"dyn_roll (512,128)           {t/ITERS*1e9:8.1f} ns/step")


def probe_dyn_fori():
    def kern(n_ref, x_ref, out_ref):
        def body(k, x):
            return x + k

        out_ref[:] = jax.lax.fori_loop(0, n_ref[0], body, x_ref[:])

    fn = jax.jit(
        lambda n, x: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(n, x)
    )
    out = fn(jnp.array([7], jnp.int32), jnp.zeros((8, 128), jnp.int32))
    print(f"dyn_fori ok: out[0,0]={out[0,0]} (expect 21)")


if __name__ == "__main__":
    for name, f in [
        ("xla_gather", probe_xla_gather),
        ("dma_issue", probe_dma_issue),
        ("mxu_step", probe_mxu_step),
        ("dyn_lane_store", probe_dyn_lane_store),
        ("dyn_roll", probe_dyn_roll),
        ("dyn_fori", probe_dyn_fori),
    ]:
        try:
            f()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e).splitlines()[0][:110]}")
