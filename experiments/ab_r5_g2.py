"""Round-5 session B2: flush-group G re-sweep UNDER THE BUTTERFLY SCATTER.

The r4 G=8/16 losses were measured with the search scatter; bfly removes
the per-step search so the G trade-off shifts. Full bf16 compress 128Mi,
bit-exactness across arms."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from dietgpu_tpu import constants as C

MWW = int(os.environ.get("MWORDS", "128"))
ITERS = int(os.environ.get("ITERS", "24"))
K = 3
ARMS = os.environ.get("ARMS", "4,8,16,4").split(",")

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

from dietgpu_tpu.floatcodec import pallas_codec as pfc
n = MWW * 1024 * 1024
Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
ft = C.FLOAT_TYPE_BFLOAT16
rng = np.random.default_rng(0)
words = []
for k in range(K):
    x = rng.standard_normal(Lw).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16); w[n:] = 0
    words.append(jnp.asarray(w.view(np.uint32)))
GB = n * 2 / 1e9
check_arc = jax.jit(lambda a, b: jnp.array_equal(a, b))
base_arcs = None
for arm in ARMS:
    os.environ["DIETGPU_ENCODE_FLUSH_GROUP"] = arm
    compress = jax.jit(lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False))
    arcs = [compress(w)[0] for w in words]
    if base_arcs is None:
        base_arcs = arcs
    ok = all(bool(check_arc(a, b)) for a, b in zip(arcs, base_arcs))
    t = timeit(compress, [(w,) for w in words])
    print(f"bf16 compress {MWW}Mi [G={arm:3s} bfly]: {t*1e3:8.2f} ms  "
          f"{GB/t:6.2f} GB/s  arcs-equal={ok}", flush=True)
    assert ok
print("AB DONE", flush=True)
