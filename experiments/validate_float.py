import sys, time
sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from dietgpu_tpu import constants as C
from dietgpu_tpu.floatcodec import codec as fcodec, pallas_codec as pfc

def rt(n, ft, seed=0, dist="normal"):
    rng = np.random.default_rng(seed)
    Lw = C.round_up(max(n,1), 4096)
    if dist == "normal":
        x = rng.standard_normal(Lw).astype(np.float32)
    else:
        x = np.maximum(rng.standard_normal(Lw), 0).astype(np.float32)  # relu-sparse
    if ft == C.FLOAT_TYPE_BFLOAT16:
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
    else:
        w = x.astype(np.float16).view(np.uint16)
    w[n:] = 0
    wj = jnp.asarray(w)
    # XLA reference archive
    arc_x, size_x = jax.jit(lambda v: fcodec.float_compress_padded(v, n, ft, 10, False))(wj)
    # pallas archive
    arc_p, size_p = jax.jit(lambda v: pfc.float_compress_padded_pallas(v, n, ft, 10, False))(wj)
    sx, sp = int(size_x), int(size_p)
    ap8 = np.asarray(arc_p).view(np.uint8)
    ok_arc = sx == sp and np.array_equal(np.asarray(arc_x)[:sx], ap8[:sp])
    # pallas decode of pallas archive
    r = jax.jit(lambda a: pfc.float_decompress_padded_pallas(a, ft, Lw, 10, False))(arc_p)
    pairs = np.asarray(r["out32"])
    wout = np.zeros(Lw, np.uint16)
    wout[0::2] = pairs & 0xFFFF
    wout[1::2] = pairs >> 16
    ok_rt = bool(r["success"]) and np.array_equal(wout[:n], w[:n]) and not wout[n:].any()
    print(("OK " if (ok_arc and ok_rt) else "FAIL"),
          f"n={n:>9} ft={ft} {dist} arc={ok_arc} rt={ok_rt} ratio={sp/(2*n):.4f}", flush=True)
    if not ok_arc and sx == sp:
        ax = np.asarray(arc_x)
        bad = np.nonzero(ax[:sx] != ap8[:sx])[0]
        print("   first arc diff", bad[0], ax[bad[0]], ap8[bad[0]], "count", len(bad), flush=True)
    if not ok_rt:
        bad = np.nonzero(wout[:n] != w[:n])[0]
        if len(bad): print("   first rt diff", bad[0], hex(w[bad[0]]), hex(wout[bad[0]]), "count", len(bad), flush=True)
    return ok_arc and ok_rt

ok = True
for ft in (C.FLOAT_TYPE_BFLOAT16, C.FLOAT_TYPE_FLOAT16):
    for n in (1, 100, 4096, 100_000, 1_000_000):
        ok &= rt(n, ft)
ok &= rt(500_000, C.FLOAT_TYPE_BFLOAT16, dist="relu")
print("ALL OK" if ok else "FAILURES", flush=True)
