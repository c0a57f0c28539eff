"""Round-5 session B: chunk-loop carry slimming A/B (real TPU).

The r5 bridge kernel showed 4 extra loop-carried (T,128) tensors cost
-34% (45.6 -> 30.0 G-sym/s) even when their values are dead. Decode's
eager chunk loop carried its 4 window tensors dead (m=3 refills before
first use); encode carried registers 1..G as known-zeros. SLIMCARRY=on
(new default) drops them.

Arms: on/off/on for decode (fused bf16 128Mi + raw-u32 64Mi) and encode
(full bf16 compress 128Mi + raw-u32). Bit-exactness asserted across arms.
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
ARMS = os.environ.get("ARMS", "on,off,on").split(",")


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

    # ---- decode arms ----
    base_out = None
    for arm in ARMS:
        os.environ["DIETGPU_DECODE_SLIMCARRY"] = arm
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
            f"bf16 decode {MWW}Mi [slim={arm:3s}]: {t*1e3:8.2f} ms  "
            f"{2*n/t/1e9:6.2f} GB/s  eq={ok}",
            flush=True,
        )
        assert ok

    # ---- encode arms ----
    base_arc = None
    for arm in ARMS:
        os.environ["DIETGPU_ENCODE_SLIMCARRY"] = arm
        fn = jax.jit(
            lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
        )
        arc = fn(words[0])[0]
        if base_arc is None:
            base_arc = arc
        ok = bool(check(arc, base_arc))
        t = timeit(fn, [(w,) for w in words])
        print(
            f"bf16 compress {MWW}Mi [slim={arm:3s}]: {t*1e3:8.2f} ms  "
            f"{2*n/t/1e9:6.2f} GB/s  eq={ok}",
            flush=True,
        )
        assert ok

    # ---- raw ANS (u32-native, both directions) ----
    nb = (MWW // 2) * 1024 * 1024
    Lb = C.round_up(nb, C.DEFAULT_BLOCK_SIZE)
    datas, rarcs = [], []
    enc0 = jax.jit(
        lambda d: penc.ans_encode_padded_pallas(d, nb, 10, False,
                                                return_u32=True)
    )
    for k in range(K):
        d = np.minimum(rng.exponential(30, Lb), 255).astype(np.uint8)
        d[nb:] = 0
        dj = jnp.asarray(d)
        datas.append(dj)
        rarcs.append(enc0(dj)[0])
    for arm in ARMS:
        os.environ["DIETGPU_DECODE_SLIMCARRY"] = arm
        os.environ["DIETGPU_ENCODE_SLIMCARRY"] = arm
        de = jax.jit(
            lambda a: pdec.ans_decode_padded_pallas(a, 10, Lb, False,
                                                    return_u32=True)
        )
        en = jax.jit(
            lambda d: penc.ans_encode_padded_pallas(d, nb, 10, False,
                                                    return_u32=True)
        )
        td = timeit(de, [(a,) for a in rarcs])
        te = timeit(en, [(d,) for d in datas])
        print(
            f"raw ANS {MWW//2}Mi [slim={arm:3s}]: dec {td*1e3:8.2f} ms "
            f"({nb/td/1e9:5.2f} GB/s)  enc {te*1e3:8.2f} ms "
            f"({nb/te/1e9:5.2f} GB/s)",
            flush=True,
        )
    for v in ("DIETGPU_DECODE_SLIMCARRY", "DIETGPU_ENCODE_SLIMCARRY"):
        os.environ.pop(v, None)
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
