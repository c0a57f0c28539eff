"""Phase timing for the bf16 float decompress pipeline on real TPU.

Times (chained dispatch, 1-element readback — see docs/TPU_DESIGN.md):
  full      float_decompress_padded_pallas
  ans       ans_decode_padded_pallas (u32 out) on the inner ANS archive
  prologue  everything ans decode does before the Mosaic kernel
  join      join_words_pallas alone
"""
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
from dietgpu_tpu.floatcodec import pallas_float as pf

MW = int(os.environ.get("MWORDS", "64"))
ITERS = int(os.environ.get("ITERS", "6"))
TILE = int(os.environ.get("TILE", "256"))
n = MW * 1024 * 1024
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

compress = jax.jit(lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False))
arcs = []
for k in range(K):
    arc, size = compress(words[k])
    arcs.append(arc)
print(f"# ratio {int(size)/(2*n):.4f}", file=sys.stderr)

# inner ANS archives (exponent plane)
plane32 = C.round_up(n, 16) >> 2
A4 = penc.archive_buffer_bytes_pallas(Lw) // 4
ans_arcs = [
    jax.jit(lambda a: jax.lax.dynamic_slice(
        jnp.concatenate([a, jnp.zeros(A4 + 4, jnp.uint32)]), (4 + plane32,), (A4,)
    ))(a)
    for a in arcs
]
exps = [jnp.zeros(Lw // 4, jnp.uint32) for _ in range(K)]
ncs = [jnp.zeros(Lw // 4, jnp.uint32) for _ in range(K)]


def prologue_only(archive, prob_bits, out_max, block_tile):
    """Mirror of ans_decode_padded_pallas up to (not including) the kernel."""
    NB = out_max // C.DEFAULT_BLOCK_SIZE
    BPR = pdec.BPR
    T = max(8, min(block_tile, C.round_up(NB, BPR)) // BPR)
    T = C.round_up(T, 8)
    NBp = C.round_up(NB, BPR * T)
    NR = NBp // BPR
    arc32 = archive.astype(jnp.uint32)
    A32 = arc32.shape[0]
    h = arc32[:8]
    nb = h[1].astype(jnp.int32)
    nb_eff = jnp.clip(nb, 0, NB)
    pw = arc32[8:136]
    pdf = jnp.zeros(256, jnp.uint32)
    pdf = pdf.at[0::2].set(pw & jnp.uint32(0xFFFF)).at[1::2].set(pw >> jnp.uint32(16))
    symtab, pdfcdf = pdec.build_sym_tables(pdf, prob_bits)
    bidx = jnp.arange(NBp, dtype=jnp.int32)
    live = bidx < nb_eff
    bw_start = 136 + nb_eff * 32
    arc_ext = jnp.concatenate([arc32, jnp.zeros(2 * NBp + 2, jnp.uint32)])
    bw_flat = jax.lax.dynamic_slice(arc_ext, (bw_start,), (2 * NBp + 2,))
    bw_x = jnp.where(live, bw_flat[0:-2:2], jnp.uint32(0))
    bw_y = jnp.where(live, bw_flat[1:-1:2], jnp.uint32(0))
    uncomp = (bw_x >> jnp.uint32(16)).astype(jnp.int32)
    cwords = (bw_x & jnp.uint32(0xFFFF)).astype(jnp.int32)
    starts = bw_y.astype(jnp.int32)
    rnb2 = nb_eff + (nb_eff & 1)
    ds32 = bw_start + rnb2 * 2
    steps = (uncomp + 31) // 32
    remainder = uncomp % 32
    s32 = ds32 + (starts >> 1)
    row0 = s32 >> 7
    off32 = s32 & 127
    meta3 = jnp.zeros((NR, BPR, 32), jnp.int32)
    meta3 = (
        meta3.at[:, :, 0].set(steps.reshape(NR, BPR))
        .at[:, :, 1].set(remainder.reshape(NR, BPR))
        .at[:, :, 2].set(cwords.reshape(NR, BPR))
        .at[:, :, 3].set(off32.reshape(NR, BPR))
    )
    meta = meta3.reshape(NR, 128)
    st_flat = jax.lax.dynamic_slice(
        jnp.concatenate([arc32, jnp.zeros(NBp * 32 + 136, jnp.uint32)]),
        (136,), (NBp * 32,),
    )
    states = st_flat.reshape(NBp, 32)
    states = jnp.where(live[:, None], states, jnp.uint32(C.ANS_START_STATE))
    states128 = states.astype(jnp.int32).reshape(NR, 128)
    RT = BPR * T * (2560 // 256) + 48
    tile_row0 = row0[0 :: BPR * T] & ~7
    lrow = jnp.clip(row0 - jnp.repeat(tile_row0, BPR * T), 0, RT - 11)
    need_rows = int(C.div_up(A32, 128)) + RT + 1
    arc_rows = jnp.zeros((need_rows * 128,), jnp.uint32).at[:A32].set(arc32)
    arc_rows = arc_rows.astype(jnp.int32).reshape(need_rows, 128)
    tile_row0 = jnp.clip(tile_row0, 0, need_rows - RT)
    return meta, states128, arc_rows, tile_row0, lrow


fns = {
    "full": jax.jit(lambda a: pfc.float_decompress_padded_pallas(a, ft, Lw, 10, False)["out32"]),
    "ans": jax.jit(lambda a: pdec.ans_decode_padded_pallas(a, 10, Lw, False, TILE, return_u32=True)["out"]),
    "prologue": jax.jit(lambda a: prologue_only(a, 10, Lw, TILE)),
    "join": jax.jit(lambda e, m: pf.join_words_pallas(e, m, ft)),
}
args = {
    "full": [(a,) for a in arcs],
    "ans": [(a,) for a in ans_arcs],
    "prologue": [(a,) for a in ans_arcs],
    "join": list(zip(exps, ncs)),
}


def timeit(fn, arglist):
    for i in range(2):
        out = fn(*arglist[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*arglist[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / ITERS


for name, fn in fns.items():
    t = timeit(fn, args[name])
    print(f"{name:9s} {t*1e3:8.2f} ms   {2*n/t/1e9:7.2f} GB/s(raw bf16)",
          flush=True)
