"""Validate + time the Pallas decoder against the XLA encoder/oracle."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import encode as enc
from dietgpu_tpu.ans import pallas_decode as pdec


def roundtrip(n_bytes, lam, prob_bits=10, seed=0, tile=256):
    rng = np.random.default_rng(seed)
    data = np.minimum(
        rng.exponential(lam, n_bytes), 255
    ).astype(np.uint8)
    L = C.round_up(max(n_bytes, 1), C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n_bytes] = data
    arc, size = jax.jit(
        lambda d: enc.ans_encode_padded(d, n_bytes, prob_bits, False)
    )(jnp.asarray(padded))
    dec = jax.jit(
        lambda a: pdec.ans_decode_padded_pallas(a, prob_bits, L, False, tile)
    )
    r = dec(arc)
    out = np.asarray(r["out"])
    ok_bytes = np.array_equal(out[:n_bytes], data)
    ok_zero = not out[n_bytes:].any()
    ok = bool(r["success"]) and int(r["size"]) == n_bytes and ok_bytes and ok_zero
    status = "OK " if ok else "FAIL"
    print(f"{status} n={n_bytes:>10} lam={lam:>5} pb={prob_bits} size={int(size)}")
    if not ok_bytes:
        bad = np.nonzero(out[:n_bytes] != data)[0]
        print(f"   first mismatch at {bad[0]}: got {out[bad[0]]} want {data[bad[0]]}"
              f" ({len(bad)} total)")
    return ok, dec, arc, n_bytes


def bench(dec, arc, n_bytes, runs=3):
    r = dec(arc)
    jax.block_until_ready(r["out"])
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(dec(arc)["out"])
        best = min(best, time.perf_counter() - t0)
    print(f"   decode {n_bytes/best/1e9:.2f} GB/s ({best*1e3:.2f} ms)")


if __name__ == "__main__":
    allok = True
    for n, lam in [
        (1, 10), (100, 10), (4095, 20), (4096, 20), (4097, 20),
        (100_000, 5), (1 << 20, 40), (12_345_67, 60),
    ]:
        ok, *_ = roundtrip(n, lam)
        allok &= ok
    for pb in (9, 11):
        ok, *_ = roundtrip(1 << 20, 30, prob_bits=pb)
        allok &= ok
    print("small/medium:", "ALL OK" if allok else "FAILURES")

    for tile in (128, 256, 512):
        ok, dec, arc, n = roundtrip(64 << 20, 40, tile=tile)
        print(f"  tile={tile}:")
        bench(dec, arc, n)
