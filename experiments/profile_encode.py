"""Phase timing for the bf16 float compress pipeline on real TPU.

Phases: split (fused histogram), normalize, stage1 (encode kernel),
stage2+assembly (archive build), full.
MWORDS/ITERS env knobs; ITERS must be high enough to amortize the ~34 ms
fixed tunnel readback.
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
from dietgpu_tpu.floatcodec import pallas_codec as pfc
from dietgpu_tpu.floatcodec import pallas_float as pf

MWW = int(os.environ.get("MWORDS", "64"))
ITERS = int(os.environ.get("ITERS", "48"))
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

L = Lw  # exponent byte plane length == word count
T = 256
while T % 8 != 0:
    T += 1
NB = L // C.DEFAULT_BLOCK_SIZE
NBp = C.round_up(NB, T)


def split_fn(w):
    exp32, nc32, hist, _cks = pf.split_words_pallas(w, ft)
    return exp32[: Lw // 4], nc32[: Lw // 4], hist


def norm_fn(hist):
    return stats.normalize_probs(hist, jnp.uint32(n), 10)


def stage1_fn(exp32, pdf):
    return penc._encode_stage1(
        exp32.astype(jnp.int32), jnp.int32(n), pdf, L=L, NBp=NBp, T=T,
        prob_bits=10, use_checksum=False,
    )


def stage2_fn(staged, counts, states_out, uncomp, pdf):
    arc, trow, srow, dloc, drot, seed, prow0, size = penc._encode_stage2(
        staged, counts, states_out, uncomp, jnp.uint32(0), pdf,
        jnp.int32(n), L=L, NBp=NBp, T=T, prob_bits=10, use_checksum=False,
        block_tile=256, static_n=n,
    )
    XR = penc.archive_buffer_bytes_pallas(L, 256) // 512
    asm = penc._build_assembly_call(NBp, T, XR)
    arc_rows = asm(
        trow, srow, dloc, drot, staged, seed,
        arc.reshape(XR, 128).astype(jnp.int32),
    )
    return arc_rows[0, 0], size


def ans_full_fn(exp32, pdf):
    # the complete embedded-ANS encode (stage1 + stage2 + assembly)
    return penc.ans_encode_padded_pallas(
        exp32.astype(jnp.uint32), n, 10, use_checksum=False,
        precomputed_pdf=pdf, return_u32=True,
    )


def container_fn(nc32, ans_arc32, ans_size):
    # the float-container glue the phase split was missing: zeros(F4) +
    # header/nc/ans DUS passes (float_compress_padded_pallas tail)
    F4 = pfc.float_archive_u32_bytes(ft, Lw) // 4
    header = jnp.array(
        [(C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION, n, ft, 0], jnp.uint32
    )
    buf = jnp.zeros(F4, jnp.uint32)
    buf = jax.lax.dynamic_update_slice(buf, header, (0,))
    plane32 = C.round_up(n, 16) >> 2
    buf = jax.lax.dynamic_update_slice(buf, nc32.astype(jnp.uint32), (4,))
    buf = jax.lax.dynamic_update_slice(buf, ans_arc32, (4 + plane32,))
    return buf[0], jnp.uint32(16 + plane32 * 4) + ans_size


jf_split = jax.jit(split_fn)
jf_norm = jax.jit(norm_fn)
jf_stage1 = jax.jit(stage1_fn)
jf_stage2 = jax.jit(stage2_fn)
jf_ansfull = jax.jit(ans_full_fn)
jf_container = jax.jit(container_fn)
jf_full = jax.jit(lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False))

# prepare intermediates
exps, ncs, hists, pdfs, st1s, ansouts = [], [], [], [], [], []
for k in range(K):
    e, nc, h = jf_split(words[k])
    exps.append(e)
    ncs.append(nc)
    hists.append(h)
    p = jf_norm(h)
    pdfs.append(p)
    st1s.append(jf_stage1(e, p))
    ansouts.append(jf_ansfull(e, p))


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


cases = [
    ("full", jf_full, [(w,) for w in words]),
    ("split", jf_split, [(w,) for w in words]),
    ("normalize", jf_norm, [(h,) for h in hists]),
    ("stage1", jf_stage1, list(zip(exps, pdfs))),
    ("stage2+asm", jf_stage2, [
        (st1s[k][0], st1s[k][1], st1s[k][2], st1s[k][3], pdfs[k])
        for k in range(K)
    ]),
    ("ans_full", jf_ansfull, list(zip(exps, pdfs))),
    ("container", jf_container, [
        (ncs[k], ansouts[k][0], ansouts[k][1]) for k in range(K)
    ]),
]
for name, fn, arglist in cases:
    t = timeit(fn, arglist)
    print(f"{name:11s} {t*1e3:8.2f} ms   {2*n/t/1e9:7.2f} GB/s(raw bf16)",
          flush=True)
