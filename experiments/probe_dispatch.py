"""Measure the rig's fixed per-dispatch cost: a trivial jit under the same
chained-timing harness as the codec benches. If this floor is ~the small-
input decode time, small sizes are tunnel/dispatch-bound, not code-bound."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

ITERS = int(os.environ.get("ITERS", "96"))
K = 3
xs = [jnp.arange(8.0) + k for k in range(K)]
f = jax.jit(lambda x: x + 1.0)
g = jax.jit(lambda x: (x + 1.0, x * 2.0, x.sum()))  # 3 outputs

for name, fn in (("1op_1out", f), ("3out", g)):
    for i in range(2):
        out = fn(xs[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[0])
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(xs[i % K])
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[0])
    t = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {t*1e6:.0f} us/dispatch", flush=True)
