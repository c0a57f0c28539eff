"""Time ONLY the encode stage-1 kernel (hot loop) at MWORDS Mi bf16-exponent
bytes, honoring DIETGPU_ENCODE_ABLATE (set per process). Used for the
round-5 session-B2 encode phase budget."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import pallas_encode as penc
from dietgpu_tpu.ans import stats
from dietgpu_tpu.floatcodec import pallas_float as pf

MWW = int(os.environ.get("MWORDS", "128"))
ITERS = int(os.environ.get("ITERS", "32"))
n = MWW * 1024 * 1024
Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
K = 3
rng = np.random.default_rng(0)
T = 256
L = Lw
NB = L // C.DEFAULT_BLOCK_SIZE
NBp = C.round_up(NB, T)

exps, pdfs = [], []
split = jax.jit(lambda w: pf.split_words_pallas(w, C.FLOAT_TYPE_BFLOAT16))
norm = jax.jit(lambda h: stats.normalize_probs(h, jnp.uint32(n), 10))
for k in range(K):
    x = rng.standard_normal(Lw).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16); w[n:] = 0
    e, nc, h, _ = split(jnp.asarray(w.view(np.uint32)))
    exps.append(e[:Lw // 4].astype(jnp.int32))
    pdfs.append(norm(h))

st1 = jax.jit(lambda e, p: penc._encode_stage1(
    e, jnp.int32(n), p, L=L, NBp=NBp, T=T, prob_bits=10, use_checksum=False))
for i in range(2):
    out = st1(exps[i % K], pdfs[i % K])
_ = np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
t0 = time.perf_counter()
for i in range(ITERS):
    out = st1(exps[i % K], pdfs[i % K])
_ = np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
t = (time.perf_counter() - t0) / ITERS
ab = os.environ.get("DIETGPU_ENCODE_ABLATE", "-")
sc = os.environ.get("DIETGPU_ENCODE_SCATTER", "bfly")
print(f"stage1 {MWW}Mi ablate={ab:8s} scatter={sc:6s}: {t*1e3:8.2f} ms", flush=True)
