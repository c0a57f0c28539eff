"""Hardware A/B for the decode nonComp modes (real TPU).

Times the fused bf16 (and f32) float decompress pipeline with
DIETGPU_DECODE_NCMODE unset (auto: alias / tilebuf) vs forced "xla",
on the same archives, validating bit-exactness between the two.

Also times the batched 128x512Ki bf16 scenario (spanning tiles), where
"auto" rides the tilebuf window instead of the vmapped XLA plane slice.

MWORDS/ITERS/BATCH env knobs; ITERS >= 24 to amortize the ~34 ms fixed
tunnel readback.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C

MWW = int(os.environ.get("MWORDS", "64"))
ITERS = int(os.environ.get("ITERS", "32"))
RUN_BATCH = os.environ.get("BATCH", "1") != "0"
K = 3


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


def single(ft, name, wordbytes):
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = MWW * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    rng = np.random.default_rng(0)
    arcs = []
    ref = None
    compress = jax.jit(
        lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
    )
    for k in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        if ft == C.FLOAT_TYPE_FLOAT32:
            w = x.view(np.uint32).copy()
            w[n:] = 0
            arr = jnp.asarray(w)
        else:
            w = (x.view(np.uint32) >> 16).astype(np.uint16)
            w[n:] = 0
            arr = jnp.asarray(w.view(np.uint32))
        arc, _ = compress(arr)
        arcs.append(arc)

    outs = {}
    for mode in ("auto", "xla"):
        if mode == "xla":
            os.environ["DIETGPU_DECODE_NCMODE"] = "xla"
        else:
            os.environ.pop("DIETGPU_DECODE_NCMODE", None)
        clear_caches()
        fn = jax.jit(
            lambda a: pfc.float_decompress_padded_pallas(a, ft, Lw, 10, static_length=n)
        )
        t = timeit(fn, [(a,) for a in arcs])
        outs[mode] = np.asarray(fn(arcs[0])["out32"])
        print(
            f"{name} single {MWW}Mi decode [{mode:4s}]: {t*1e3:8.2f} ms  "
            f"{wordbytes*n/t/1e9:6.2f} GB/s",
            flush=True,
        )
    print(
        f"{name} auto-vs-xla bit-equal: "
        f"{np.array_equal(outs['auto'], outs['xla'])}",
        flush=True,
    )


def batched():
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    B, mem_kw = 128, 512
    n = mem_kw * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(1)
    F4 = pfc.float_archive_u32_bytes(ft, Lw) // 4
    batches = []
    compress = jax.jit(
        lambda w: pfc.float_compress_batched_pallas(w, n, ft, 10, False)
    )
    for k in range(K):
        x = rng.standard_normal((B, Lw)).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        arcs, _ = compress(jnp.asarray(np.ascontiguousarray(w).view(np.uint32)))
        batches.append(arcs)

    outs = {}
    for mode in ("auto", "xla"):
        if mode == "xla":
            os.environ["DIETGPU_DECODE_NCMODE"] = "xla"
        else:
            os.environ.pop("DIETGPU_DECODE_NCMODE", None)
        clear_caches()
        fn = jax.jit(
            lambda a: pfc.float_decompress_batched_pallas(
                a, ft, Lw, 10, static_length=n
            )
        )
        t = timeit(fn, [(b,) for b in batches])
        outs[mode] = np.asarray(fn(batches[0])["out32"])
        print(
            f"bf16 batched {B}x{mem_kw}Ki decode [{mode:4s}]: "
            f"{t*1e3:8.2f} ms  {2*B*n/t/1e9:6.2f} GB/s",
            flush=True,
        )
    print(
        f"batched auto-vs-xla bit-equal: "
        f"{np.array_equal(outs['auto'], outs['xla'])}",
        flush=True,
    )


single(C.FLOAT_TYPE_BFLOAT16, "bf16", 2)
single(C.FLOAT_TYPE_FLOAT32, "f32", 4)
if RUN_BATCH:
    batched()
