"""Piece-wise timing of the batched decode XLA glue (128 x 512Ki bf16).

Replicates each prologue piece of ans_decode_batched_pallas (static
geometry) and times it with a forced full materialization (jnp.sum), to
find which glue ops eat the ~19 ms skeleton time. TPU only.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
    K, iters = 3, 24
    rng = np.random.default_rng(0)

    batches = []
    for _ in range(K):
        x = rng.standard_normal(B * Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        batches.append(jnp.asarray(w.view(np.uint32).reshape(B, Lw // 2)))
    bcompress = jax.jit(
        jax.vmap(lambda w: pfc.float_compress_padded_pallas(w, nw, ft, 10, False))
    )
    arcs = [bcompress(b)[0] for b in batches]

    NB = Lw // C.DEFAULT_BLOCK_SIZE
    NBp = C.round_up(NB, 4)
    NR = NBp // 4
    W = C.NUM_INTERLEAVED
    base = 4 + (C.round_up(nw, 16) >> 2)
    nb_s = C.div_up(nw, C.DEFAULT_BLOCK_SIZE)

    def timeit(label, fn):
        f = jax.jit(fn)
        out = f(arcs[0])
        _ = np.asarray(out)
        for i in range(2):
            out = f(arcs[i % K])
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(arcs[i % K])
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:32s} {dt*1e3:8.2f} ms", flush=True)

    def headers(a):
        arc = a.astype(_U32)
        h = jax.vmap(lambda m: jax.lax.dynamic_slice(m, (base,), (8,)))(arc)
        pw = jax.vmap(lambda m: jax.lax.dynamic_slice(m, (base + 8,), (128,)))(arc)
        return jnp.sum(h) + jnp.sum(pw)

    timeit("header+pdf slices", headers)

    def tables(a):
        arc = a.astype(_U32)
        pw = jax.vmap(lambda m: jax.lax.dynamic_slice(m, (base + 8,), (128,)))(arc)

        def one(pwm):
            pdf = jnp.zeros(C.NUM_SYMBOLS, _U32)
            pdf = pdf.at[0::2].set(pwm & _U32(0xFFFF)).at[1::2].set(pwm >> _U32(16))
            return pdec.build_sym_tables(pdf, 10)

        st, pc = jax.vmap(one)(pw)
        st_rows = jnp.broadcast_to(st[:, None], (B, NR, 2, 128)).reshape(B * NR, 2, 128)
        pc_rows = jnp.broadcast_to(pc[:, None], (B, NR, 2, 128)).reshape(B * NR, 2, 128)
        return jnp.sum(st_rows) + jnp.sum(pc_rows)

    timeit("tables + per-row broadcast", tables)

    def bw_meta(a):
        arc = a.astype(_U32)
        bw_start = base + 136 + nb_s * W
        bw = jax.vmap(
            lambda m: jax.lax.dynamic_slice(m, (bw_start,), (2 * NBp + 2,))
        )(arc)
        bidx = jnp.arange(NBp, dtype=_I32)
        live = bidx < nb_s
        bw_x = jnp.where(live[None], bw[:, 0:-2:2], _U32(0))
        bw_y = jnp.where(live[None], bw[:, 1:-1:2], _U32(0))
        uncomp = (bw_x >> _U32(16)).astype(_I32)
        cwords = (bw_x & _U32(0xFFFF)).astype(_I32)
        starts = bw_y.astype(_I32)
        ds32 = bw_start + (nb_s + (nb_s & 1)) * 2
        s32 = ds32 + (starts >> 1)
        row0 = s32 >> 7
        off32 = s32 & 127
        steps = (uncomp + W - 1) // W

        meta3 = jnp.zeros((B, NR, 4, W), _I32)
        meta3 = (
            meta3.at[:, :, :, 0].set(steps.reshape(B, NR, 4))
            .at[:, :, :, 2].set(cwords.reshape(B, NR, 4))
            .at[:, :, :, 3].set(off32.reshape(B, NR, 4))
            .at[:, :, :, 4].set((bidx * 4096).reshape(NR, 4)[None])
        )
        return jnp.sum(meta3) + jnp.sum(row0)

    timeit("bw section + meta assembly", bw_meta)

    def states(a):
        arc = a.astype(_U32)
        st = jax.vmap(
            lambda m: jax.lax.dynamic_slice(m, (base + 136,), (NBp * W,))
        )(arc)
        return jnp.sum(st.astype(_I32).reshape(B * NR, 128))

    timeit("states slice", states)

    def nc3(a):
        nc = jax.vmap(
            lambda m: jax.lax.dynamic_slice(m, (4,), (NBp * 1024,))
        )(a.astype(_I32)).reshape(B * NR, 32, 128)
        return jnp.sum(nc)

    timeit("nc plane slice (64MB)", nc3)

    def arcrows(a):
        return jnp.sum(a.astype(_I32).reshape(-1, 128)[:, 0])

    timeit("arc_rows view (col sum)", arcrows)

    full = jax.jit(
        lambda a: pfc.float_decompress_batched_pallas(a, ft, Lw, 10, static_length=nw)["out32"][0, 0]
    )
    def fullf(a):
        return full(a)
    timeit("full decode (1-elem close)", fullf)


if __name__ == "__main__":
    main()
