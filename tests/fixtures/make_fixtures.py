"""Generate the golden archive fixtures (run once; outputs are committed).

The fixtures lock the container format against oracle drift: the test
(tests/test_fixtures.py) checks hand-derived header/payload expectations
computed from the reference field math (GpuANSUtils.cuh:67-229,
GpuFloatUtils.cuh:20-74) against these bytes, then round-trips them
through all three decoder paths.

Deterministic inputs only (fixed seed); regenerating must be byte-stable.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from dietgpu_tpu.ref import ans_ref, float_ref  # noqa: E402
from dietgpu_tpu import constants as C  # noqa: E402

HERE = os.path.dirname(__file__)


def _data(n, lam=20.0, seed=0x60D):
    rng = np.random.default_rng(seed)
    return np.minimum(rng.exponential(lam, n), 255).astype(np.uint8)


def _floats(n, seed=0x60D):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


def main():
    out = {}

    # raw ANS archives
    out["ans_empty.bin"] = ans_ref.ans_encode(np.zeros(0, np.uint8))
    out["ans_1byte.bin"] = ans_ref.ans_encode(np.array([0xA5], np.uint8))
    out["ans_4096.bin"] = ans_ref.ans_encode(_data(4096))  # exactly 1 block
    out["ans_4097.bin"] = ans_ref.ans_encode(_data(4097))  # block boundary +1
    out["ans_pb9.bin"] = ans_ref.ans_encode(_data(10000), prob_bits=9)
    out["ans_pb11.bin"] = ans_ref.ans_encode(_data(10000), prob_bits=11)
    out["ans_checksum.bin"] = ans_ref.ans_encode(_data(5000), use_checksum=True)

    # float archives, one per type (+ a checksummed bf16)
    f = _floats(3000)
    f16 = f.astype(np.float16).view(np.uint16)
    bf16 = (f.view(np.uint32) >> 16).astype(np.uint16)
    f32 = f.view(np.uint32)
    out["float_f16.bin"] = float_ref.float_compress(f16, C.FLOAT_TYPE_FLOAT16)
    out["float_bf16.bin"] = float_ref.float_compress(bf16, C.FLOAT_TYPE_BFLOAT16)
    out["float_f32.bin"] = float_ref.float_compress(f32, C.FLOAT_TYPE_FLOAT32)
    out["float_bf16_checksum.bin"] = float_ref.float_compress(
        bf16, C.FLOAT_TYPE_BFLOAT16, use_checksum=True
    )

    for name, arr in out.items():
        path = os.path.join(HERE, name)
        arr.astype(np.uint8).tofile(path)
        print(f"{name:26s} {arr.size:7d} bytes")


if __name__ == "__main__":
    main()
