"""Round-5 session A: pipelined refill bounds vs synchronous (real TPU).

DIETGPU_DECODE_REFILL2=pipelined computes each refill's page bounds one
refill ahead (carried scalars; initial bounds scalar-prefetched), so the
vector->scalar readback feeding the dynamic fori bound hides behind 8
steps of decode compute instead of stalling the loop — and finished
blocks are excluded from the bounds.

Times fused bf16 float decompress at MWORDS Mi words AND raw-ANS decode
at MWORDS/2 Mi bytes, validating bit-exactness between arms. Knobs are
read at jit-trace time: each arm rebuilds its jit after cache_clear.

MWORDS/ITERS env knobs; ITERS >= 24 to amortize the ~34 ms readback.
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
ARMS = os.environ.get("ARMS", "pergroup,pipelined,pergroup").split(",")


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


def clear_caches():
    from dietgpu_tpu.ans import pallas_decode as pdec

    pdec._build_decode_call.cache_clear()


def main():
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = MWW * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(0)

    compress = jax.jit(
        lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
    )
    arcs = []
    for k in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[n:] = 0
        arc, _ = compress(jnp.asarray(w.view(np.uint32)))
        arcs.append(arc)

    outs = {}
    for mode in ARMS:
        os.environ["DIETGPU_DECODE_REFILL2"] = mode
        clear_caches()
        fn = jax.jit(
            lambda a: pfc.float_decompress_padded_pallas(
                a, ft, Lw, 10, static_length=n
            )
        )
        t = timeit(fn, [(a,) for a in arcs])
        outs[mode] = np.asarray(fn(arcs[0])["out32"])
        print(
            f"bf16 single {MWW}Mi decode [{mode:9s}]: {t*1e3:8.2f} ms  "
            f"{2*n/t/1e9:6.2f} GB/s",
            flush=True,
        )
    ms = sorted(set(ARMS))
    for m in ms[1:]:
        print(
            f"bf16 {ms[0]}-vs-{m} bit-equal: "
            f"{np.array_equal(outs[ms[0]], outs[m])}",
            flush=True,
        )

    # raw ANS pb10 at MWORDS/2 Mi bytes
    nb = (MWW // 2) * 1024 * 1024
    Lb = C.round_up(nb, C.DEFAULT_BLOCK_SIZE)

    enc = jax.jit(lambda d: penc.ans_encode_padded_pallas(d, nb, 10, False))
    rarcs = []
    for k in range(K):
        data = np.minimum(rng.exponential(30, Lb), 255).astype(np.uint8)
        data[nb:] = 0
        arc, _ = enc(jnp.asarray(data))
        rarcs.append(arc)
    routs = {}
    for mode in ARMS:
        os.environ["DIETGPU_DECODE_REFILL2"] = mode
        clear_caches()
        fn = jax.jit(
            lambda a: pdec.ans_decode_padded_pallas(a, 10, Lb, False, return_u32=True)
        )
        t = timeit(fn, [(a,) for a in rarcs])
        routs[mode] = np.asarray(fn(rarcs[0])["out"])  # u32 words
        print(
            f"raw ANS {MWW//2}Mi decode   [{mode:9s}]: {t*1e3:8.2f} ms  "
            f"{nb/t/1e9:6.2f} GB/s",
            flush=True,
        )
    for m in ms[1:]:
        print(
            f"raw {ms[0]}-vs-{m} bit-equal: "
            f"{np.array_equal(routs[ms[0]], routs[m])}",
            flush=True,
        )
    os.environ.pop("DIETGPU_DECODE_REFILL2", None)
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
