"""Compressed checkpoint container (dietgpu_tpu.checkpoint).

Roundtrip of mixed-dtype array sets through the single-file container;
entries are standard float/ANS archives, so they also decode through the
oracle directly (format interop check).
"""

import io
import struct

import numpy as np
import pytest

from dietgpu_tpu import checkpoint as ckpt
from dietgpu_tpu.ref import float_ref


def _mixed_arrays(rng):
    import ml_dtypes

    return {
        "layer0/w": rng.standard_normal((64, 32)).astype(np.float32),
        "layer0/b": rng.standard_normal(32).astype(np.float16),
        "embed": rng.standard_normal((16, 128)).astype(ml_dtypes.bfloat16),
        "step": np.array(1234, dtype=np.int64),
        "mask": (rng.random(1000) > 0.5),
        "tokens": rng.integers(0, 50000, 4096).astype(np.int32),
    }


def test_roundtrip_mixed_dtypes(tmp_path, rng):
    arrays = _mixed_arrays(rng)
    path = str(tmp_path / "ckpt.dgt")
    stats = ckpt.save_arrays(path, arrays)
    assert set(stats) == set(arrays)
    back = ckpt.load_arrays(path)
    assert set(back) == set(arrays)
    for k, a in arrays.items():
        assert back[k].dtype == a.dtype and back[k].shape == a.shape
        assert (back[k] == a).all() or (
            np.isnan(a).any() and np.array_equal(a, back[k], equal_nan=True)
        ), k


def test_compression_gain_on_gaussian(tmp_path, rng):
    a = {"g": rng.standard_normal(200_000).astype(np.float32)}
    stats = ckpt.save_arrays(str(tmp_path / "g.dgt"), a)
    assert stats["g"]["ratio"] < 0.92  # f32 N(0,1) ~0.84x


def test_entries_are_standard_archives(tmp_path, rng):
    """The container's payloads are plain float archives: the oracle decodes
    them without going through the checkpoint reader."""
    a32 = rng.standard_normal(5000).astype(np.float32)
    path = str(tmp_path / "one.dgt")
    ckpt.save_arrays(path, {"x": a32})
    with open(path, "rb") as f:
        f.read(16)  # container header
        (nl,) = struct.unpack("<I", f.read(4))
        f.read(nl)
        kind, dtcode, ndim = struct.unpack("<BBH", f.read(4))
        f.read(8 * ndim)
        (arc_len,) = struct.unpack("<Q", f.read(8))
        arc = np.frombuffer(f.read(arc_len), dtype=np.uint8)
    assert kind == 1
    words, ok, n = float_ref.float_decompress(arc)
    assert ok and n == 5000
    assert (words.view(np.float32) == a32).all()


def test_corruption_detected(tmp_path, rng):
    path = str(tmp_path / "c.dgt")
    ckpt.save_arrays(path, {"x": rng.standard_normal(8192).astype(np.float16)})
    blob = bytearray(open(path, "rb").read())
    blob[60] ^= 0xFF  # inside the first archive's nonComp plane
    with pytest.raises(ValueError):
        ckpt.load_arrays(io.BytesIO(bytes(blob)))


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="checkpoint"):
        ckpt.load_arrays(io.BytesIO(b"\x00" * 16))
