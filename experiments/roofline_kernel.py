"""Synthetic decode-ceiling kernel + bridge variants (fake data).

Strips the real decode kernel (pallas_decode._decode_kernel) to the ops no
rANS decoder on this VPU can avoid, then adds the real kernel's structure
back one piece at a time to localize where the real kernel's time goes
(r5 session A: the irreducible op set runs 45.6 G-sym/s on the v5e while
the real kernel runs ~15 — the gap is structural, not per-symbol ops).

Variants (env VARIANTS=csv):
  full      irreducible ops: rank-LUT (3 gathers) + state update + ballot
            matmul + ONE fixed-window gather + u16 merge + MXU pack, loop
            4-step chunks, XOR accumulator output, NO refill/realign/DMA
  fourwin   + the real 4-window gather + 3 selects read
  carrywin  + windows loop-CARRIED through the fori (cyclically permuted
            per chunk so they cannot be hoisted)
  refill    + the real per-8-step refill machinery: per-group base calc,
            two global reductions, dynamically-bounded page loop over a
            (T, 11, 128) stream scratch
  realloop  + the real loop shape: 16-step chunks, packs per 4-step
            subgroup, the roll/mask rotate phase, out rows written to a
            (T, 32, 128) block (HBM-backed) instead of an accumulator
            [NT is reduced for this variant: the output is symbol-sized]
  nopack / noread / nolut   ablations below "full"

Also measures streaming HBM bandwidth (copy kernel).
Run on the chip: python experiments/roofline_kernel.py
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
NT = int(os.environ.get("NT", "64"))  # grid tiles (non-outrow variants)
S = 128  # steps per tile
ITERS = int(os.environ.get("ITERS", "24"))
ROWS = 11  # stream scratch pages per block (mirrors ROWS_PER_BLOCK)

# structure level per variant: each includes everything below it
LEVEL = {"full": 0, "fourwin": 1, "carrywin": 2, "refill": 3, "realloop": 4}


def _srl(x, s):
    return jax.lax.shift_right_logical(x, s)


def _taa(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=1)


def _syn_kernel(variant, symtab_ref, e0_ref, e1_ref, suf_ref, plo_ref,
                phi_ref, win_ref, states_ref, out_ref, st_ref):
    lvl = LEVEL.get(variant, 0)
    lane = jax.lax.broadcasted_iota(_I32, (T, 128), 1)
    gid = _srl(lane, 5)
    gbase = lane & ~31
    zeros = jnp.zeros((T, 128), _I32)
    symtab = jnp.broadcast_to(symtab_ref[0:1, :], (T, 128))
    e0 = jnp.broadcast_to(e0_ref[0:1, :], (T, 128))
    e1 = jnp.broadcast_to(e1_ref[0:1, :], (T, 128))
    suf = suf_ref[0]
    plo = [plo_ref[d] for d in range(4)]
    phi = [phi_ref[d] for d in range(4)]
    fixed_wins = [win_ref[:], win_ref[:], win_ref[:], win_ref[:]]
    gmask = [gid == gg for gg in range(1, 4)]
    g32 = [zeros + 32 * gg for gg in range(4)]

    if lvl >= 3:
        # stream scratch pages (zero data; only the machinery is timed)
        for p in range(ROWS):
            st_ref[:, p, :] = zeros

    def one_step(state, posw, wins):
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
        if lvl >= 1:
            v32 = _taa(wins[0], widx)
            for gg in range(1, 4):
                v32 = jnp.where(gmask[gg - 1], _taa(wins[gg], widx), v32)
        else:
            v32 = _taa(wins[0], widx)
        v16 = _srl(v32, (rj & 1) << 4) & 0xFFFF
        state2 = jnp.where(read, (ns << 16) | v16, ns)
        if lvl >= 3:
            posw = posw - cnt  # real movement; refill rebases it
        else:
            posw = ((posw - cnt) & 255) + 256
        return sym, state2, posw

    def refill(pos):
        # mirrors _decode_kernel.refill (pergroup mode) over zero data
        hi = _srl(jnp.maximum(pos - 1, 0), 1)
        base = jnp.maximum(hi - 127, 0)
        lo = jnp.min(base) >> 7
        hi_p = jnp.minimum(jnp.max(hi) >> 7, ROWS - 1)
        pgs, lis = [], []
        for gg in range(4):
            bg = _taa(base, g32[gg])
            g0 = bg + lane
            pgs.append(_srl(g0, 7))
            lis.append(g0 & 127)

        def page_body(p, accs):
            return tuple(
                jnp.where(pgs[gg] == p, _taa(st_ref[:, p, :], lis[gg]),
                          accs[gg])
                for gg in range(4)
            )

        # init from real loads: replicated-layout constants in the while
        # carry trip a Mosaic relayout error against the gathered values
        z = st_ref[:, 0, :]
        wins = jax.lax.fori_loop(
            lo, hi_p + 1, page_body, (z, z, z, z)
        )
        return wins, base

    def pack4(syms):
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
        return lo.astype(_I32) | (hi.astype(_I32) << 16)

    if lvl >= 4:
        # the real raw-path loop: 16-step chunks, refill at odd subgroups,
        # rotate phase, out rows
        def chunk_body(c, carry):
            state, posw, w0, w1, w2, w3, bq = carry
            cc = (S // 16) - 1 - c
            packs = [None] * 4
            for m in range(3, -1, -1):
                if m % 2 == 1:
                    pa = posw + bq
                    (w0, w1, w2, w3), b = refill(pa)
                    bq = b << 1
                    posw = pa - bq
                wins = (w0, w1, w2, w3)
                syms = [None] * 4
                for d in range(3, -1, -1):
                    syms[d], state, posw = one_step(state, posw, wins)
                packs[m] = pack4(syms)
            for g in range(4):
                row = None
                for m in range(4):
                    piece = pltpu.roll(packs[m], (32 * (m - g)) % 128, 1)
                    piece = jnp.where(gid == m, piece, 0)
                    row = piece if row is None else row | piece
                out_ref[:, 8 * g + cc, :] = row
            return state, posw, w0, w1, w2, w3, bq

        z0 = st_ref[:, 0, :]
        init = (states_ref[:], z0 + 2500, z0, z0, z0, z0, z0)
        jax.lax.fori_loop(0, S // 16, chunk_body, init)
        return

    if lvl == 3:
        # real refill cadence without the real loop shape: 8-step chunks,
        # one unconditional refill at the top of each (no lax.cond — the
        # lazy-refill experiment showed cond-carried windows cost extra)
        def chunk_body(c, carry):
            state, posw, bq, acc = carry
            pa = posw + bq
            (w0, w1, w2, w3), b = refill(pa)
            bq = b << 1
            posw = pa - bq
            wins = (w0, w1, w2, w3)
            for half in range(2):
                syms = [None] * 4
                for d in range(3, -1, -1):
                    syms[d], state, posw = one_step(state, posw, wins)
                acc = acc ^ pack4(syms)
            return state, posw, bq, acc

        z0 = st_ref[:, 0, :]
        init = (states_ref[:], z0 + 2500, z0, z0)
        fin = jax.lax.fori_loop(0, S // 8, chunk_body, init)
        out_ref[:, 0, :] = fin[-1] ^ fin[0]
        return

    def chunk_body(c, carry):
        if lvl >= 2:
            state, posw, w0, w1, w2, w3, acc = carry
            wins = (w0, w1, w2, w3)
        else:
            state, posw, acc = carry
            wins = fixed_wins
        syms = [None] * 4
        for d in range(3, -1, -1):
            syms[d], state, posw = one_step(state, posw, wins)
        if variant == "nopack":
            acc = acc ^ syms[0]
        else:
            acc = acc ^ pack4(syms)
        if lvl >= 2:
            # cyclic permute so the carried windows cannot be hoisted
            return (state, posw, w1, w2, w3, w0, acc)
        return state, posw, acc

    state0 = states_ref[:]
    acc0 = jnp.zeros((T, 128), _I32)
    if lvl >= 2:
        init = (state0, zeros + 300, win_ref[:], win_ref[:], win_ref[:],
                win_ref[:], acc0)
    else:
        init = (state0, zeros + 300, acc0)
    fin = jax.lax.fori_loop(0, S // 4, chunk_body, init)
    out_ref[:, 0, :] = fin[-1] ^ fin[0]


@functools.lru_cache(maxsize=None)
def _build(variant, nt):
    kern = functools.partial(_syn_kernel, variant)
    lvl = LEVEL.get(variant, 0)
    out_rows = 32 if lvl >= 4 else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
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
            (T, out_rows, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((T, ROWS, 128), _I32)],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nt * T, out_rows, 128), _I32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def timeit(fn, args_list):
    for a in args_list[:2]:
        out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args_list[i % len(args_list)])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
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
    variants = os.environ.get(
        "VARIANTS",
        "full,fourwin,carrywin,refill,realloop,nopack,noread,nolut",
    ).split(",")
    for v in variants:
        nt = min(NT, 16) if LEVEL.get(v, 0) >= 4 else NT
        states = [
            jnp.asarray(
                rng.integers(C.ANS_MIN_STATE, 2**30, (nt * T, 128),
                             dtype=np.int64), _I32
            )
            for _ in range(3)
        ]
        nsym = nt * T * 128 * S
        fn = jax.jit(lambda s, _v=v, _nt=nt: _build(_v, _nt)(
            symtab, e0, e1, suf, plo, phi, win, s
        ))
        t = timeit(fn, [(s,) for s in states])
        print(
            f"synthetic[{v:8s}]  T={T} NT={nt}  {t*1e3:8.3f} ms  "
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
