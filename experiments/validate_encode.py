import sys, time
sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import encode as enc, pallas_encode as penc

def rt(data, pb=10, tile=256, tag=""):
    n = data.size
    L = C.round_up(max(n,1), 4096)
    padded = np.zeros(L, np.uint8); padded[:n] = data
    dj = jnp.asarray(padded)
    t0 = time.time()
    arc_x, size_x = jax.jit(lambda d: enc.ans_encode_padded(d, n, pb, False))(dj)
    arc_x.block_until_ready(); tx = time.time()-t0
    t0 = time.time()
    arc_p, size_p = jax.jit(lambda d: penc.ans_encode_padded_pallas(d, n, pb, False, block_tile=tile))(dj)
    arc_p.block_until_ready(); tp = time.time()-t0
    sx, sp = int(size_x), int(size_p)
    ax, ap = np.asarray(arc_x), np.asarray(arc_p)
    ok = sx == sp and np.array_equal(ax[:sx], ap[:sp])
    print(("OK " if ok else "FAIL"), f"n={n:>9} pb={pb} {tag} sizes {sx}/{sp} (xla {tx:.1f}s pallas {tp:.1f}s)", flush=True)
    if not ok and sx == sp:
        bad = np.nonzero(ax[:sx] != ap[:sx])[0]
        print("   first byte diff at", bad[0], ax[bad[0]], ap[bad[0]], "count", len(bad), flush=True)
    return ok

rng = np.random.default_rng(1)
allok = True
for n, lam in [(1,10),(100,10),(4095,20),(4096,20),(4097,20),(100_000,5),(1<<20,40),(1234567,60)]:
    allok &= rt(np.minimum(rng.exponential(lam, n), 255).astype(np.uint8), tag=f"lam={lam}")
for pb in (9, 11):
    allok &= rt(np.minimum(rng.exponential(30, 100_000), 255).astype(np.uint8), pb=pb)
allok &= rt(rng.integers(0,256,200_000).astype(np.uint8), tag="uniform")
allok &= rt(np.full(200_000, 7, np.uint8), tag="const")
allok &= rt(np.zeros(200_000, np.uint8), tag="zeros")
print("ALL OK" if allok else "FAILURES", flush=True)
