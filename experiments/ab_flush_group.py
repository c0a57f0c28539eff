"""Hardware A/B for the encode kernel's flush cadence (real TPU).

DIETGPU_ENCODE_FLUSH_GROUP=G drains full 32-slot window quarters once per
G steps from a (G+1)-register window; G=1 reproduces the original
flush-every-step structure. This script times encode stage 1 (the only
phase the knob touches) for G in {1,2,4} on the same inputs, plus the full
bf16 compress pipeline at the best G.

MWORDS/ITERS env knobs; ITERS must be high enough to amortize the ~34 ms
fixed tunnel readback (>= 24).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import pallas_encode as penc
from dietgpu_tpu.ans import stats
from dietgpu_tpu.floatcodec import pallas_float as pf

MWW = int(os.environ.get("MWORDS", "64"))
ITERS = int(os.environ.get("ITERS", "48"))
GROUPS = [int(g) for g in os.environ.get("GROUPS", "1,2,4").split(",")]
n = MWW * 1024 * 1024
Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
ft = C.FLOAT_TYPE_BFLOAT16
K = 3

rng = np.random.default_rng(0)
words = []
for k in range(K):
    x = rng.standard_normal(Lw).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16)
    w[n:] = 0
    words.append(jnp.asarray(w.view(np.uint32)))

L = Lw
T = 256
NB = L // C.DEFAULT_BLOCK_SIZE
NBp = C.round_up(NB, T)

jf_split = jax.jit(lambda w: pf.split_words_pallas(w, ft))
jf_norm = jax.jit(lambda h: stats.normalize_probs(h, jnp.uint32(n), 10))
exps, pdfs = [], []
for k in range(K):
    e, _nc, h, _cks = jf_split(words[k])
    exps.append(e[: Lw // 4])
    pdfs.append(jf_norm(h))


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


ref_words = None  # stage-1 staged words at G=1 for cross-G equality spot check
for G in GROUPS:
    os.environ["DIETGPU_ENCODE_FLUSH_GROUP"] = str(G)
    penc._build_encode_call.cache_clear()

    def stage1_fn(exp32, pdf):
        return penc._encode_stage1(
            exp32.astype(jnp.int32), jnp.int32(n), pdf, L=L, NBp=NBp, T=T,
            prob_bits=10, use_checksum=False,
        )

    jf = jax.jit(stage1_fn)
    t = timeit(jf, list(zip(exps, pdfs)))
    out = jf(exps[0], pdfs[0])
    cnt0 = int(np.asarray(out[1][0, 0]))
    w0 = np.asarray(out[0][0, :2])
    if ref_words is None:
        ref_words = (cnt0, w0)
    ok = cnt0 == ref_words[0] and np.array_equal(w0, ref_words[1])
    print(
        f"G={G}: stage1 {t*1e3:8.2f} ms  {2*n/t/1e9:6.2f} GB/s(raw bf16)"
        f"  spot-check {'OK' if ok else 'MISMATCH'}",
        flush=True,
    )
