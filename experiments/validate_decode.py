import sys, time
sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import encode as enc, pallas_decode as pdec

def rt(data, pb=10, tile=None, tag=""):
    n = data.size
    L = C.round_up(max(n,1), 4096)
    padded = np.zeros(L, np.uint8); padded[:n] = data
    arc, size = jax.jit(lambda d: enc.ans_encode_padded(d, n, pb, False))(jnp.asarray(padded))
    kw = {} if tile is None else {"block_tile": tile}
    r = jax.jit(lambda a: pdec.ans_decode_padded_pallas(a, pb, L, False, **kw))(arc)
    out = np.asarray(r["out"])
    ok = bool(r["success"]) and int(r["size"]) == n and np.array_equal(out[:n], data) and not out[n:].any()
    print(("OK " if ok else "FAIL"), f"n={n:>9} pb={pb} {tag}", flush=True)
    if not ok and not np.array_equal(out[:n], data):
        bad = np.nonzero(out[:n] != data)[0]
        print("   first bad", bad[0], out[bad[0]], data[bad[0]], "count", len(bad), flush=True)
    return ok

rng = np.random.default_rng(3)
allok = True
for n, lam in [(1,10),(100,10),(4095,20),(4096,20),(4097,20),(100_000,5),(300_000,60)]:
    allok &= rt(np.minimum(rng.exponential(lam, n), 255).astype(np.uint8), tag=f"lam={lam}")
for pb in (9, 11):
    allok &= rt(np.minimum(rng.exponential(30, 150_000), 255).astype(np.uint8), pb=pb)
allok &= rt(rng.integers(0,256,200_000).astype(np.uint8), tag="uniform")
allok &= rt(np.full(200_000, 7, np.uint8), tag="const")
# mixed compressibility in one buffer (stress page spread)
mix = np.concatenate([rng.integers(0,256,100_000), np.zeros(100_000, np.int64), rng.integers(0,64,100_000)]).astype(np.uint8)
allok &= rt(mix, tag="mixed")
print("ALL OK" if allok else "FAILURES", flush=True)
