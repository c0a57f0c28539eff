"""Is a width-preserving integer convert (u32<->i32) on a big array free,
a full HBM pass, or elided? Decode's entry (archive u32 -> i32 rows) and
exit (kernel i32 out -> u32 result) each do one; if convert costs a pass,
bitcast_convert_type (or kernel-side dtype) saves ~2 full-buffer passes."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

ITERS = int(os.environ.get("ITERS", "48"))
MB = int(os.environ.get("MB", "96"))
K = 3
n = MB * 1024 * 1024 // 4
xs = [jnp.arange(n, dtype=jnp.int32) + k for k in range(K)]

def timeit(fn):
    for i in range(2):
        out = fn(xs[i % K])
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][0])
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(xs[i % K])
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][0])
    return (time.perf_counter() - t0) / ITERS

for name, f in (
    ("identity",       jax.jit(lambda x: x)),
    ("astype_u32",     jax.jit(lambda x: x.astype(jnp.uint32))),
    ("bitcast_u32",    jax.jit(lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32))),
    ("reshape+astype", jax.jit(lambda x: x.reshape(-1, 128).astype(jnp.uint32))),
    ("slice+astype",   jax.jit(lambda x: x[: n - 128].astype(jnp.uint32))),
    ("add1",           jax.jit(lambda x: x + 1)),
):
    t = timeit(f)
    print(f"{name:15s} {t*1e3:7.2f} ms  ({MB/t/1e3:6.1f} GB/s)", flush=True)
