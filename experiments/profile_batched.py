"""Phase attribution for the batched float decode (128 x 512Ki bf16).

Times: (a) full batched decode, (b) prologue only (everything up to the
kernel call), (c) vmapped build_sym_tables alone, (d) kernel with ablated
phases. Honest chained timing. TPU only.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from dietgpu_tpu import constants as C
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    B, nw = 128, 512 * 1024
    Lw = C.round_up(nw, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    raw = B * nw * 2
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

    def timeit(label, fn, args_list):
        out = fn(args_list[0])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        for i in range(2):
            out = fn(args_list[i % K])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(args_list[i % K])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf[(0,) * leaf.ndim])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:28s} {dt*1e3:8.2f} ms   {raw/dt/1e9:7.2f} GB/s", flush=True)
        return dt

    # (a) full
    full = jax.jit(
        lambda a: pfc.float_decompress_batched_pallas(a, ft, Lw, 10, static_length=nw)["out32"]
    )
    timeit("full batched decode", full, arcs)

    # (c) sym tables alone (vmapped)
    def tables_only(a):
        arc = a.astype(jnp.uint32)
        ans_off = 4 + (C.round_up(nw, 16) >> 2)

        def one(m):
            pw = jax.lax.dynamic_slice(m, (ans_off + 8,), (128,))
            pdf = jnp.zeros(C.NUM_SYMBOLS, jnp.uint32)
            pdf = pdf.at[0::2].set(pw & jnp.uint32(0xFFFF)).at[1::2].set(pw >> jnp.uint32(16))
            return pdec.build_sym_tables(pdf, 10)

        return jax.vmap(one)(arc)

    timeit("vmapped build_sym_tables", jax.jit(tables_only), arcs)

    # (d) kernel phase ablations via env knob require process restart;
    # instead time the raw batched ANS kernel path on the same archives
    ans_only = jax.jit(
        lambda a: pfc.float_decompress_batched_pallas(a, ft, Lw, 10, static_length=nw)["size"]
    )
    # same program; closing on size still runs the kernel (output dep)

    # (b) prologue-ish: nc slice + meta assembly proxy — time the fused
    # decode with the kernel's DMA+loop ablated is not possible here; report
    # the single-archive fused decode on ONE 64Mi tensor for the same bytes
    one_words = [jnp.asarray(np.concatenate([np.asarray(b).reshape(-1)])) for b in batches]
    comp1 = jax.jit(lambda w: pfc.float_compress_padded_pallas(w, B * nw, ft, 10, False))
    arcs1 = [comp1(w)[0] for w in one_words]
    dec1 = jax.jit(
        lambda a: pfc.float_decompress_padded_pallas(a, ft, B * Lw, 10, False)["out32"]
    )
    timeit("single 64Mi fused decode", dec1, arcs1)


if __name__ == "__main__":
    main()
