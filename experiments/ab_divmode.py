"""Hardware A/B for the encode kernel's division strategy (real TPU).

DIETGPU_ENCODE_DIVMODE selects the hot-loop division: "magic" is the
reference's magic-number division (umulhi via 16-bit limb products, ~19
vector ops/step); "f32" is the round-nearest reciprocal + one two-sided
correction (~13 ops/step, exactness proof in stats.div_rcp_f32_bits).
Both are bit-exact (interpret-locked at pb 9/10/11); this script times
encode stage 1 — the only phase the knob touches — on the same inputs and
spot-checks cross-mode equality of the staged words.

MWORDS/ITERS env knobs; ITERS must amortize the ~34 ms fixed tunnel
readback (>= 24).
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
MODES = os.environ.get("MODES", "magic,f32").split(",")
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


ref = None  # staged words in magic mode for the cross-mode equality check
for mode in MODES:
    os.environ["DIETGPU_ENCODE_DIVMODE"] = mode
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
    if ref is None:
        ref = (cnt0, w0)
    ok = cnt0 == ref[0] and np.array_equal(w0, ref[1])
    print(
        f"mode={mode:5s}: stage1 {t*1e3:8.2f} ms  {2*n/t/1e9:6.2f} GB/s"
        f"(raw bf16)  spot-check {'OK' if ok else 'MISMATCH'}",
        flush=True,
    )
