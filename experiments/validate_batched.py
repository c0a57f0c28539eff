"""Hardware validation: batched multi-archive decode is bit-exact.

8 x 512Ki bf16 members (ragged final member), compressed with the vmapped
Pallas pipeline, decoded with the ONE-grid batched kernel; every member's
roundtrip compared on device. Also cross-checks the ragged (dynamic
geometry) prologue path. Prints ALL OK.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.floatcodec import pallas_codec as pfc


def main():
    B, nw = 8, 512 * 1024
    Lw = C.round_up(nw, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    rng = np.random.default_rng(7)
    x = rng.standard_normal(B * Lw).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16).reshape(B, Lw)
    words = jnp.asarray(w.reshape(B, Lw).view(np.uint32))

    comp = jax.jit(
        jax.vmap(lambda v: pfc.float_compress_padded_pallas(v, nw, ft, 10, False))
    )
    arcs, sizes = comp(words)
    dec = jax.jit(
        lambda a: pfc.float_decompress_batched_pallas(a, ft, Lw, 10, static_length=nw)
    )
    res = dec(arcs)
    ok = bool(jnp.all(res["success"]))
    eq = bool(jnp.array_equal(res["out32"], words))
    print(f"static batched: success={ok} bitexact={eq}")
    assert ok and eq

    # ragged members via the dynamic-geometry prologue
    lens = [nw, nw - 12345, 4096, 1]
    w2 = w[: len(lens)].copy()
    for m, ln in enumerate(lens):
        w2[m, ln:] = 0
    words2 = jnp.asarray(w2.view(np.uint32))
    arcs2 = []
    for m, ln in enumerate(lens):
        a, _ = jax.jit(
            lambda v, ln=ln: pfc.float_compress_padded_pallas(v, ln, ft, 10, False)
        )(words2[m])
        arcs2.append(a)
    arcs2 = jnp.stack(arcs2)
    res2 = jax.jit(lambda a: pfc.float_decompress_batched_pallas(a, ft, Lw, 10))(arcs2)
    ok2 = bool(jnp.all(res2["success"]))
    eq2 = bool(jnp.array_equal(res2["out32"], words2))
    print(f"ragged batched: success={ok2} bitexact={eq2} sizes={np.asarray(res2['size'])}")
    assert ok2 and eq2
    print("ALL OK")


if __name__ == "__main__":
    main()
