"""Interpret-mode bit-exactness sanity for DIETGPU_DECODE_REFILL2=pipelined.

Covers: raw single-archive (partial tail block), fused bf16 join, and the
batched spanning decode — all against the oracle. Run on CPU:
    JAX_PLATFORMS=cpu python experiments/sanity_pipelined_refill.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["DIETGPU_DECODE_REFILL2"] = "pipelined"
os.environ["DIETGPU_ENCODE_FLUSHPIPE"] = "on"

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_orig = pl.pallas_call
pl.pallas_call = lambda *a, **k: _orig(*a, **{**k, "interpret": True})

from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import pallas_decode as pdec
from dietgpu_tpu.ans import pallas_encode as penc
from dietgpu_tpu.floatcodec import pallas_codec as pfc
from dietgpu_tpu.ref import ans_ref, float_ref


def main():
    rng = np.random.default_rng(7)

    # raw, partial tail block (act masking + dead-block exclusion)
    n = C.DEFAULT_BLOCK_SIZE * 2 + 777
    data = np.minimum(rng.exponential(20, n), 255).astype(np.uint8)
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    oracle = ans_ref.ans_encode(data, prob_bits=10)
    r = pdec.ans_decode_padded_pallas(jnp.asarray(oracle), 10, L)
    assert bool(r["success"]) and int(r["size"]) == n
    assert np.array_equal(np.asarray(r["out"])[:n], data)
    print("raw partial-tail ok")

    # encode with pipelined flush bounds, byte-identical to the oracle
    padded = np.zeros(L, np.uint8)
    padded[:n] = data
    arc, size = penc.ans_encode_padded_pallas(jnp.asarray(padded), n, 10)
    assert int(size) == oracle.size
    assert np.array_equal(np.asarray(arc)[: oracle.size], oracle)
    print("encode flush-pipe ok")

    # fused bf16 join (full tiles path)
    nw = C.DEFAULT_BLOCK_SIZE
    x = rng.standard_normal(nw).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16)
    arc = float_ref.float_compress(w, C.FLOAT_TYPE_BFLOAT16, 10)
    a32 = np.zeros(
        pfc.float_archive_u32_bytes(C.FLOAT_TYPE_BFLOAT16, nw) // 4, np.uint32
    )
    a32[: (arc.size + 3) // 4] = np.frombuffer(
        arc.tobytes() + b"\0" * (-arc.size % 4), np.uint32
    )
    res = pfc.float_decompress_padded_pallas(
        jnp.asarray(a32), C.FLOAT_TYPE_BFLOAT16, nw, 10,
        static_length=nw,
    )
    assert bool(res["success"])
    got = np.asarray(res["out32"]).view(np.uint16)[:nw]
    assert np.array_equal(got, w)
    print("fused bf16 ok")

    # batched fused decode (spanning tiles, tilebuf nc)
    B, nw2 = 4, C.DEFAULT_BLOCK_SIZE
    ws = []
    arcs = np.zeros(
        (B, pfc.float_archive_u32_bytes(C.FLOAT_TYPE_BFLOAT16, nw2) // 4),
        np.uint32,
    )
    for b in range(B):
        x = rng.standard_normal(nw2).astype(np.float32)
        wb = (x.view(np.uint32) >> 16).astype(np.uint16)
        ws.append(wb)
        ab = float_ref.float_compress(wb, C.FLOAT_TYPE_BFLOAT16, 10)
        arcs[b, : (ab.size + 3) // 4] = np.frombuffer(
            ab.tobytes() + b"\0" * (-ab.size % 4), np.uint32
        )
    res = pfc.float_decompress_batched_pallas(
        jnp.asarray(arcs), C.FLOAT_TYPE_BFLOAT16, nw2, 10,
        static_length=nw2,
    )
    assert bool(np.asarray(res["success"]).all())
    got = np.asarray(res["out32"]).view(np.uint16)[:, :nw2]
    for b in range(B):
        assert np.array_equal(got[b], ws[b]), b
    print("batched fused ok")
    print("PIPELINED REFILL SANITY: ALL OK")


if __name__ == "__main__":
    main()
