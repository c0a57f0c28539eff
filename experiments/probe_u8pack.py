"""u32 -> u8le conversion strategies on the chip.

ab_r5_refill exposed the raw-ANS default path spending ~10 ms of a
14.4 ms 64MiB decode in layout.u32_to_u8le (4 strided minor-dim scatter
slices -- the known-pathological op class). Candidates:

  cur     — the current 4x .at[:, j::4].set() implementation
  bc3     — bitcast (R,128) u32 -> (R,128,4) u8 -> reshape (R,512)
  bcflat  — bitcast (n,) u32 -> (n,4) u8 -> reshape (4n,)
  none    — just return the u32 (floor: chain-closing cost)

Each validated against the numpy byte view. MB/ITERS env knobs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

MB = int(os.environ.get("MB", "64"))
ITERS = int(os.environ.get("ITERS", "32"))
K = 3
_U32 = jnp.uint32


def cur(w):
    from dietgpu_tpu.ans import layout

    return layout.u32_to_u8le(w)


def bc3(w):
    n = w.shape[0]
    w2 = w.reshape(-1, 128)
    b = jax.lax.bitcast_convert_type(w2, jnp.uint8)  # (R,128,4)
    return b.reshape(-1, 512).reshape(-1)[: 4 * n]


def bcflat(w):
    n = w.shape[0]
    b = jax.lax.bitcast_convert_type(w, jnp.uint8)  # (n,4)
    return b.reshape(-1)[: 4 * n]


def none(w):
    return w


def timeit(fn, arglists):
    for i in range(2):
        out = fn(*arglists[i % K])
    _ = np.asarray(out[0])
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*arglists[i % K])
    _ = np.asarray(out[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    n = MB * 1024 * 1024 // 4
    ws_np = [
        rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        for _ in range(K)
    ]
    ws = [jnp.asarray(w) for w in ws_np]
    want = ws_np[0].view(np.uint8)
    for name, fn in (("none", none), ("cur", cur), ("bc3", bc3),
                     ("bcflat", bcflat)):
        f = jax.jit(fn)
        try:
            out = np.asarray(f(ws[0]))
            ok = name == "none" or np.array_equal(out, want)
            t = timeit(f, [(w,) for w in ws])
            print(
                f"u8pack[{name:7s}] {MB:4d} MB  {t*1e3:8.2f} ms  "
                f"{MB/1e3/t:7.2f} GB/s  ok={ok}",
                flush=True,
            )
        except Exception as e:
            print(f"u8pack[{name:7s}] FAILED: {type(e).__name__}: {e}",
                  flush=True)
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
