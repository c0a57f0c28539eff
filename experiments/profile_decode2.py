"""Bisect the decode prologue cost (see profile_decode.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import pallas_decode as pdec
from dietgpu_tpu.ans import pallas_encode as penc
from dietgpu_tpu.floatcodec import pallas_codec as pfc

MWW = int(os.environ.get("MWORDS", "64"))
ITERS = int(os.environ.get("ITERS", "8"))
n = MWW * 1024 * 1024
Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
K = 3
BPR, MW = 4, 2560
NB = Lw // 4096
T = 64
NBp = C.round_up(NB, BPR * T)
NR = NBp // BPR
RT = BPR * T * 10 + 48

rng = np.random.default_rng(0)
words = []
for k in range(K):
    x = rng.standard_normal(Lw).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16)
    w[n:] = 0
    words.append(jnp.asarray(w.view(np.uint32)))
compress = jax.jit(lambda w: pfc.float_compress_padded_pallas(w, n, C.FLOAT_TYPE_BFLOAT16, 10, False))
plane32 = C.round_up(n, 16) >> 2
A4 = penc.archive_buffer_bytes_pallas(Lw) // 4
arcs = []
for k in range(K):
    arc, _ = compress(words[k])
    a = jax.jit(lambda a: jax.lax.dynamic_slice(
        jnp.concatenate([a, jnp.zeros(A4 + 4, jnp.uint32)]), (4 + plane32,), (A4,)
    ))(arc)
    arcs.append(a)
A32 = A4


def pads(arc32):
    arc_ext = jnp.concatenate([arc32, jnp.zeros(2 * NBp + 2, jnp.uint32)])
    st = jnp.concatenate([arc32, jnp.zeros(NBp * 32 + 136, jnp.uint32)])
    need_rows = int(C.div_up(A32, 128)) + RT + 1
    arc_rows = jnp.zeros((need_rows * 128,), jnp.uint32).at[:A32].set(arc32)
    return arc_ext[-1], st[-1], arc_rows.reshape(need_rows, 128)[0, 0]


def bwparse(arc32):
    h = arc32[:8]
    nb = jnp.clip(h[1].astype(jnp.int32), 0, NB)
    bw_start = 136 + nb * 32
    bw_flat = jax.lax.dynamic_slice(
        jnp.concatenate([arc32, jnp.zeros(2 * NBp + 2, jnp.uint32)]),
        (bw_start,), (2 * NBp + 2,))
    bw_x = bw_flat[0:-2:2]
    bw_y = bw_flat[1:-1:2]
    return bw_x.astype(jnp.int32).sum() + bw_y.astype(jnp.int32).sum()


def bwparse2d(arc32):
    """deinterleave via (NBp,2)->transpose-free reshape+2D slice"""
    h = arc32[:8]
    nb = jnp.clip(h[1].astype(jnp.int32), 0, NB)
    bw_start = 136 + nb * 32
    bw_flat = jax.lax.dynamic_slice(
        jnp.concatenate([arc32, jnp.zeros(2 * NBp + 2, jnp.uint32)]),
        (bw_start,), (2 * NBp + 2,))
    bw2 = bw_flat[: 2 * NBp].reshape(NBp, 2)
    return bw2[:, 0].astype(jnp.int32).sum() + bw2[:, 1].astype(jnp.int32).sum()


def symtabs(arc32):
    pw = arc32[8:136]
    pdf = jnp.zeros(256, jnp.uint32)
    pdf = pdf.at[0::2].set(pw & jnp.uint32(0xFFFF)).at[1::2].set(pw >> jnp.uint32(16))
    s, p = pdec.build_sym_tables(pdf, 10)
    return s[0, 0] + p[0, 0]


def epilogue(arc32):
    # stand-in for the out reshape/convert: i32->u32 convert of a
    # kernel-output-sized array
    x = jnp.zeros((NR, 32, 128), jnp.int32) + arc32[0].astype(jnp.int32)
    return x.reshape(NBp * 1024)[: Lw // 4].astype(jnp.uint32)[-1]


fns = {k: jax.jit(v) for k, v in
       dict(pads=pads, bwparse=bwparse, bwparse2d=bwparse2d,
            symtabs=symtabs, epilogue=epilogue).items()}


def timeit(fn, arglist):
    for i in range(2):
        out = fn(arglist[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(arglist[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / ITERS


for name, fn in fns.items():
    t = timeit(fn, arcs)
    print(f"{name:10s} {t*1e3:8.2f} ms", flush=True)
