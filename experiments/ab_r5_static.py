"""Round-5 session C: STATIC refill page chain vs the dynamic page loop.

The r5 bridge kernel showed the dynamic-bound refill fori costs -45%
(29.7 -> 16.4 G-sym/s) where its vector op count predicts ~-20%: the
dynamic while-loop boundary breaks Mosaic's software pipeline every 8
steps. DIETGPU_DECODE_REFILL2=static replaces it with a fully static
unrolled chain over all 11 pages (no reductions, no dynamic control
flow) — ~3x the refill gathers for an unbroken schedule.

Arms (A/B/A): fused bf16 decode at MWORDS Mi + raw-u32 decode at
MWORDS/2 Mi bytes. Bit-exactness asserted across arms.

Also re-tests the encode flush group G (1 pipeline break per G steps) at
G=4/8/16 under the same hypothesis — the flush's dynamic page loop
breaks the encode schedule every G steps, so larger G may now win where
it measured a wash in round 4.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C

MWW = int(os.environ.get("MWORDS", "128"))
ITERS = int(os.environ.get("ITERS", "24"))
K = 3
ARMS = os.environ.get("ARMS", "pergroup,static,pergroup").split(",")
GARMS = os.environ.get("GARMS", "4,16,8,4").split(",")


def timeit(fn, arglists):
    for i in range(2):
        out = fn(*arglists[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*arglists[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / ITERS


def main():
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = MWW * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(0)
    check = jax.jit(lambda a, b: jnp.array_equal(a, b))

    compress = jax.jit(
        lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
    )
    words, arcs = [], []
    for k in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[n:] = 0
        wj = jnp.asarray(w.view(np.uint32))
        words.append(wj)
        arcs.append(compress(wj)[0])

    base_out = None
    for arm in ARMS:
        os.environ["DIETGPU_DECODE_REFILL2"] = arm
        fn = jax.jit(
            lambda a: pfc.float_decompress_padded_pallas(
                a, ft, Lw, 10, static_length=n
            )
        )
        out = fn(arcs[0])["out32"]
        if base_out is None:
            base_out = out
        ok = bool(check(out, base_out))
        t = timeit(fn, [(a,) for a in arcs])
        print(
            f"bf16 decode {MWW}Mi [refill={arm:9s}]: {t*1e3:8.2f} ms  "
            f"{2*n/t/1e9:6.2f} GB/s  eq={ok}",
            flush=True,
        )
        assert ok

    # raw-u32 decode arms
    nb = (MWW // 2) * 1024 * 1024
    Lb = C.round_up(nb, C.DEFAULT_BLOCK_SIZE)
    enc0 = jax.jit(
        lambda d: penc.ans_encode_padded_pallas(d, nb, 10, False,
                                                return_u32=True)
    )
    datas, rarcs = [], []
    for k in range(K):
        d = np.minimum(rng.exponential(30, Lb), 255).astype(np.uint8)
        d[nb:] = 0
        dj = jnp.asarray(d)
        datas.append(dj)
        rarcs.append(enc0(dj)[0])
    base_r = None
    for arm in ARMS:
        os.environ["DIETGPU_DECODE_REFILL2"] = arm
        de = jax.jit(
            lambda a: pdec.ans_decode_padded_pallas(a, 10, Lb, False,
                                                    return_u32=True)
        )
        out = de(rarcs[0])["out"]
        if base_r is None:
            base_r = out
        ok = bool(check(out, base_r))
        td = timeit(de, [(a,) for a in rarcs])
        print(
            f"raw ANS {MWW//2}Mi decode [refill={arm:9s}]: "
            f"{td*1e3:8.2f} ms  {nb/td/1e9:5.2f} GB/s  eq={ok}",
            flush=True,
        )
        assert ok
    os.environ.pop("DIETGPU_DECODE_REFILL2", None)

    # encode flush-group re-test (pipeline breaks per 128 steps: 32/16/8)
    base_arc = None
    for g in GARMS:
        os.environ["DIETGPU_ENCODE_FLUSH_GROUP"] = g
        fn = jax.jit(
            lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
        )
        arc = fn(words[0])[0]
        if base_arc is None:
            base_arc = arc
        ok = bool(check(arc, base_arc))
        t = timeit(fn, [(w,) for w in words])
        print(
            f"bf16 compress {MWW}Mi [G={g:2s}]: {t*1e3:8.2f} ms  "
            f"{2*n/t/1e9:6.2f} GB/s  eq={ok}",
            flush=True,
        )
        assert ok
    os.environ.pop("DIETGPU_ENCODE_FLUSH_GROUP", None)
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
