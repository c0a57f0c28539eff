"""Probe: decode symbol-LUT schemes head to head (VERDICT r2 #1).

The reference packs (cdf_offset<<20)|(pdf<<8)|sym into ONE u32 LUT slot
indexed by s_bar (GpuANSDecode.cuh:29-53). On TPU the lane gather window is
128 entries, so a 2^probBits slot table costs 2^pb/128 gather+select pairs
per step, while the current two-level scheme costs (2^pb/512 sym gathers +
select) + (2 pdfcdf gathers + select) plus byte-extract ops. This probe
times BOTH schemes' per-step op sequences in isolation (synthetic states,
real table shapes) at pb 9/10/11 so the choice is a measurement, not a
guess.

Run on TPU. Each kernel iterates the LUT phase ITERS times on (T,128) i32.
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, ITERS = 256, 512
_I32 = jnp.int32


def _srl(x, s):
    return jax.lax.shift_right_logical(x, s)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run(name, kern, *args):
    fn = jax.jit(
        lambda *a: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, 128), _I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
    )
    t = timeit(fn, *args)
    print(f"{name:40s} {t/ITERS*1e9:8.1f} ns/step", flush=True)


def _taa(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=1)


def make_twolevel(pb):
    K = 1 << pb
    SR = max(K // 512, 1)

    def kern(symtab_ref, pdfcdf_ref, st_ref, out_ref):
        symtab = [
            jnp.broadcast_to(symtab_ref[r : r + 1, :], (T, 128))
            for r in range(SR)
        ]
        pdfcdf = [
            jnp.broadcast_to(pdfcdf_ref[r : r + 1, :], (T, 128))
            for r in range(2)
        ]

        def body(k, state):
            s_bar = state & (K - 1)
            q = _srl(s_bar, 2)
            g = _taa(symtab[0], q & 127)
            for r in range(1, SR):
                g = jnp.where(_srl(q, 7) == r, _taa(symtab[r], q & 127), g)
            sym = _srl(g, (s_bar & 3) << 3) & 0xFF
            pv = jnp.where(
                sym < 128,
                _taa(pdfcdf[0], sym & 127),
                _taa(pdfcdf[1], sym & 127),
            )
            pdf = pv & 0xFFF
            cdf = _srl(pv, 12) & 0xFFF
            return pdf * _srl(state, pb) + (s_bar - cdf)

        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, st_ref[:])

    return kern, SR


def make_slot(pb):
    K = 1 << pb
    R = K // 128

    def kern(tab_ref, st_ref, out_ref):
        tabs = [
            jnp.broadcast_to(tab_ref[r : r + 1, :], (T, 128))
            for r in range(R)
        ]

        def body(k, state):
            s_bar = state & (K - 1)
            li = s_bar & 127
            rsel = _srl(s_bar, 7)
            v = _taa(tabs[0], li)
            for r in range(1, R):
                v = jnp.where(rsel == r, _taa(tabs[r], li), v)
            pdf = _srl(v, 8) & 0xFFF
            cdfoff = _srl(v, 20)
            return pdf * _srl(state, pb) + cdfoff

        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, st_ref[:])

    return kern, R


def main():
    import numpy as np

    rng = np.random.default_rng(0)
    st = jnp.asarray(
        rng.integers(1 << 15, 1 << 30, (T, 128)).astype(np.int32)
    )
    for pb in (9, 10, 11):
        K = 1 << pb
        SRk, SR = make_twolevel(pb)
        symtab = jnp.asarray(
            rng.integers(0, 2**31, (max(K // 512, 1), 128)).astype(np.int32)
        )
        pdfcdf = jnp.asarray(
            rng.integers(0, 2**24, (2, 128)).astype(np.int32)
        )
        run(f"pb={pb} two-level (current)", SRk, symtab, pdfcdf, st)
        Sk, R = make_slot(pb)
        tab = jnp.asarray(
            rng.integers(0, 2**30, (R, 128)).astype(np.int32)
        )
        run(f"pb={pb} slot-packed (reference-style)", Sk, tab, st)


if __name__ == "__main__":
    main()
