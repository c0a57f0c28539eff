"""Synthetic decode-ceiling kernel: the irreducible rANS op set on fake data.

Strips the real decode kernel (pallas_decode._decode_kernel) to the ops no
rANS decoder on this VPU can avoid -- per symbol:
  * rank-LUT symbol lookup: 1 delta gather + rank extract + 2 entry-row
    gathers + select (pb10)
  * the rANS state update
  * the renorm read: ballot-rank MXU matmul + ONE window gather + u16
    extract + state merge  (variant "fourwin" uses the real kernel's
    4-window gather + 3 selects instead)
  * MXU output packing
and runs it with NO window refill, NO stream realign, NO tile DMA, and no
activity masking: a fixed VMEM window, fake tables, states chained
step-to-step so nothing collapses. The measured G-sym/s is the achievable
ceiling for the current decode STRUCTURE; real-kernel rate / this rate =
the refill+realign+DMA surcharge.

Variants (env VARIANTS=csv): full, fourwin, nopack, noread, nolut.
Also measures streaming HBM bandwidth (copy kernel) for the %%-of-HBM
framing. Run on the chip: python experiments/roofline_kernel.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import pallas_decode as pdec

_I32 = jnp.int32
PB = 10
K = 1 << PB
T = int(os.environ.get("T", "512"))
NT = int(os.environ.get("NT", "64"))  # grid tiles
S = 128  # steps per tile
ITERS = int(os.environ.get("ITERS", "24"))


def _srl(x, s):
    return jax.lax.shift_right_logical(x, s)


def _taa(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=1)


def _syn_kernel(variant, symtab_ref, e0_ref, e1_ref, suf_ref, plo_ref,
                phi_ref, win_ref, states_ref, out_ref):
    lane = jax.lax.broadcasted_iota(_I32, (T, 128), 1)
    gid = _srl(lane, 5)
    symtab = jnp.broadcast_to(symtab_ref[0:1, :], (T, 128))
    e0 = jnp.broadcast_to(e0_ref[0:1, :], (T, 128))
    e1 = jnp.broadcast_to(e1_ref[0:1, :], (T, 128))
    suf = suf_ref[0]
    plo = [plo_ref[d] for d in range(4)]
    phi = [phi_ref[d] for d in range(4)]
    wins = [win_ref[:], win_ref[:], win_ref[:], win_ref[:]]
    gmask = [gid == gg for gg in range(1, 4)]

    def one_step(state, posw):
        s_bar = state & (K - 1)
        if variant == "nolut":
            pdf = (s_bar & 7) + 1
            cdf = s_bar & (K - 1)
            sym = s_bar & 0xFF
        else:
            q3 = _srl(s_bar, 3)
            e = _taa(symtab, q3 & 127)
            rk = (e & 0xFF) + (_srl(e, (s_bar & 7) * 3 + 8) & 7)
            pv = jnp.where(
                rk < 128, _taa(e0, rk & 127), _taa(e1, rk & 127)
            )
            pdf = pv & ((2 << PB) - 1)
            cdf = _srl(pv, PB + 1) & (K - 1)
            sym = _srl(pv, 2 * PB + 1)
        ns = pdf * _srl(state, PB) + (s_bar - cdf)
        if variant == "noread":
            return sym, ns, posw
        read = ns < C.ANS_MIN_STATE
        rb = read.astype(jnp.bfloat16)
        rc = jax.lax.dot_general(
            rb, suf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(_I32)
        rank = rc & 63
        cnt = _srl(rc, 6)
        rj = posw - rank
        widx = _srl(rj, 1) & 127
        if variant == "fourwin":
            v32 = _taa(wins[0], widx)
            for gg in range(1, 4):
                v32 = jnp.where(gmask[gg - 1], _taa(wins[gg], widx), v32)
        else:
            v32 = _taa(wins[0], widx)
        v16 = _srl(v32, (rj & 1) << 4) & 0xFFFF
        state2 = jnp.where(read, (ns << 16) | v16, ns)
        # keep posw bounded so indices stay in-window forever (fake data)
        posw = ((posw - cnt) & 255) + 256
        return sym, state2, posw

    def chunk_body(c, carry):
        state, posw, acc = carry
        packs = [None] * 1
        syms = [None] * 4
        for d in range(3, -1, -1):
            syms[d], state, posw = one_step(state, posw)
        if variant == "nopack":
            acc = acc ^ syms[0]
        else:
            lo = None
            hi = None
            for d in range(4):
                sb = syms[d].astype(jnp.bfloat16)
                ld = jax.lax.dot_general(
                    sb, plo[d], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                hd = jax.lax.dot_general(
                    sb, phi[d], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                lo = ld if lo is None else lo + ld
                hi = hd if hi is None else hi + hd
            acc = acc ^ (lo.astype(_I32) | (hi.astype(_I32) << 16))
        return state, posw, acc

    state0 = states_ref[:]
    posw0 = jnp.zeros((T, 128), _I32) + 300
    acc0 = jnp.zeros((T, 128), _I32)
    state, posw, acc = jax.lax.fori_loop(
        0, S // 4, chunk_body, (state0, posw0, acc0)
    )
    out_ref[:] = acc ^ state


@functools.lru_cache(maxsize=None)
def _build(variant):
    kern = functools.partial(_syn_kernel, variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NT * T, 128), _I32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def timeit(fn, args_list):
    for a in args_list[:2]:
        out = fn(*a)
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args_list[i % len(args_list)])
    _ = np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    symtab = jnp.asarray(
        rng.integers(0, 2**31, (1, 128), dtype=np.int64), _I32
    )
    e0 = jnp.asarray(rng.integers(0, 2**31, (1, 128), dtype=np.int64), _I32)
    e1 = jnp.asarray(rng.integers(0, 2**31, (1, 128), dtype=np.int64), _I32)
    suf = jnp.asarray(pdec._suffix_matrix(), jnp.bfloat16)
    plo_np, phi_np = pdec._pack_matrices()
    plo = jnp.asarray(plo_np, jnp.bfloat16)
    phi = jnp.asarray(phi_np, jnp.bfloat16)
    win = jnp.asarray(
        rng.integers(0, 2**31, (T, 128), dtype=np.int64), _I32
    )
    states = [
        jnp.asarray(
            rng.integers(C.ANS_MIN_STATE, 2**30, (NT * T, 128),
                         dtype=np.int64), _I32
        )
        for _ in range(3)
    ]
    nsym = NT * T * 128 * S
    variants = os.environ.get(
        "VARIANTS", "full,fourwin,nopack,noread,nolut"
    ).split(",")
    for v in variants:
        fn = jax.jit(lambda s, _v=v: _build(_v)(
            symtab, e0, e1, suf, plo, phi, win, s
        ))
        t = timeit(fn, [(s,) for s in states])
        print(
            f"synthetic[{v:8s}]  T={T} NT={NT}  {t*1e3:8.3f} ms  "
            f"{nsym/t/1e9:7.2f} G-sym/s  "
            f"(bf16-fused-equiv {2*nsym/t/1e9:7.2f} GB/s)",
            flush=True,
        )

    # streaming HBM bandwidth: big u32 copy (read + write)
    NB = int(os.environ.get("HBM_MI", "256")) * 1024 * 1024 // 4
    bufs = [
        jnp.asarray(rng.integers(0, 2**31, NB, dtype=np.int64), _I32)
        for _ in range(3)
    ]
    cp = jax.jit(lambda x: x + 1)
    t = timeit(cp, [(b,) for b in bufs])
    bw = 2 * NB * 4 / t
    print(
        f"HBM streaming copy: {NB*4/2**20:.0f} MiB  {t*1e3:8.3f} ms  "
        f"{bw/1e9:7.1f} GB/s (r+w)",
        flush=True,
    )
    print("ROOFLINE DONE", flush=True)


if __name__ == "__main__":
    main()
