"""Round-4 hardware A/B: gather-count restructures in both hot loops.

Decode arms (fused bf16 float decompress, MWORDS):
  DIETGPU_DECODE_LUT in {rank, two} x DIETGPU_DECODE_REFILL2 in
  {stacked, pergroup}.
Encode arms (full bf16 float compress, MWORDS):
  DIETGPU_ENCODE_DATAMODE in {quartet, perstep} x
  DIETGPU_ENCODE_FLUSHSTACK in {on, off} (informative subsets) x
  DIETGPU_ENCODE_FLUSH_GROUP in {4, 8}.

Every arm validates bit-exactness before it is timed: decode output is
compared to the input words ON DEVICE (full-buffer host readbacks poison
tunnel timing), encode archives to the baseline arm's archive.
MWORDS/ITERS env knobs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C

MWW = int(os.environ.get("MWORDS", "64"))
ITERS = int(os.environ.get("ITERS", "32"))
K = 3


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


def main():
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = MWW * 1024 * 1024
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(0)
    words = []
    for k in range(K):
        x = rng.standard_normal(Lw).astype(np.float32)
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
        w[n:] = 0
        words.append(jnp.asarray(w.view(np.uint32)))
    GB = n * 2 / 1e9

    # IMPORTANT: the env knobs are read at trace time — each arm needs a
    # FRESH jit wrapper or the first arm's trace would serve every arm
    def make_compress():
        return jax.jit(
            lambda w: pfc.float_compress_padded_pallas(w, n, ft, 10, False)
        )

    def make_decompress():
        return jax.jit(
            lambda a: pfc.float_decompress_padded_pallas(
                a, ft, Lw, 10, False, static_length=n
            )
        )

    check_out = jax.jit(lambda o, w: jnp.array_equal(o[: n // 2], w[: n // 2]))
    check_arc = jax.jit(lambda a, b: jnp.array_equal(a, b))

    # ---- encode arms (first arm's archives feed the decode arms) ----
    base_arcs = None
    enc_rows = []
    enc_arms = [
        ("quartet", "on", "4"),
        ("quartet", "on", "8"),
        ("quartet", "off", "4"),
        ("perstep", "on", "4"),
        ("perstep", "off", "4"),  # round-3 baseline
    ]
    for dmode, fs, g in enc_arms:
        os.environ["DIETGPU_ENCODE_DATAMODE"] = dmode
        os.environ["DIETGPU_ENCODE_FLUSHSTACK"] = fs
        os.environ["DIETGPU_ENCODE_FLUSH_GROUP"] = g
        compress = make_compress()
        arcs = [compress(w)[0] for w in words]
        if base_arcs is None:
            base_arcs = arcs
        ok = all(
            bool(check_arc(a, b)) for a, b in zip(arcs, base_arcs)
        )
        t = timeit(compress, [(w,) for w in words])
        enc_rows.append((dmode, fs, g, round(t * 1e3, 2), ok))
        print(
            f"encode data={dmode:8s} stack={fs:3s} G={g}  {t*1e3:8.2f} ms  "
            f"{GB/t:6.2f} GB/s  bitexact={ok}",
            flush=True,
        )
        assert ok, "archive mismatch across encode arms"

    # ---- decode arms ----
    dec_rows = []
    for lut in ("rank", "two"):
        for rs in ("stacked", "pergroup"):
            os.environ["DIETGPU_DECODE_LUT"] = lut
            os.environ["DIETGPU_DECODE_REFILL2"] = rs
            decompress = make_decompress()
            outs = [decompress(a) for a in base_arcs]
            ok = all(
                bool(o["success"]) and bool(check_out(o["out32"], w))
                for o, w in zip(outs, words)
            )
            t = timeit(decompress, [(a,) for a in base_arcs])
            dec_rows.append((lut, rs, round(t * 1e3, 2), ok))
            print(
                f"decode lut={lut:4s} refill2={rs:8s}  {t*1e3:8.2f} ms  "
                f"{GB/t:6.2f} GB/s  bitexact={ok}",
                flush=True,
            )
            assert ok, f"decode mismatch lut={lut} rs={rs}"

    print("SUMMARY", flush=True)
    for r in enc_rows:
        print("enc", r, flush=True)
    for r in dec_rows:
        print("dec", r, flush=True)
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
