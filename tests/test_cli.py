"""File-level CLI (dietgpu_tpu.cli) roundtrips + cross-path format lock."""

import json
import subprocess
import sys

import numpy as np
import pytest

from dietgpu_tpu import hostcodec

pytestmark = pytest.mark.skipif(
    not hostcodec.available(), reason="native host codec unavailable"
)


def _run(*args, expect=0):
    r = subprocess.run(
        [sys.executable, "-m", "dietgpu_tpu.cli", *args],
        capture_output=True, text=True,
    )
    assert r.returncode == expect, r.stderr
    return r


def test_cli_ans_roundtrip(tmp_path, rng):
    data = np.minimum(rng.exponential(20.0, 50000), 255).astype(np.uint8)
    src = tmp_path / "in.bin"
    data.tofile(src)
    arc = tmp_path / "a.dg"
    out = tmp_path / "out.bin"
    _run("compress", str(src), str(arc))
    info = json.loads(_run("info", str(arc)).stdout)
    assert info["kind"] == "ans"
    assert info["total_uncompressed_words"] == data.size
    _run("decompress", str(arc), str(out))
    assert np.array_equal(np.fromfile(out, dtype=np.uint8), data)
    # the on-disk archive is the standard container: the oracle decodes it
    from dietgpu_tpu.ref import ans_ref

    dec, ok, n = ans_ref.ans_decode(np.fromfile(arc, dtype=np.uint8))
    assert ok and n == data.size and np.array_equal(dec, data)


def test_cli_float_roundtrip(tmp_path, rng):
    words = (
        rng.standard_normal(30000).astype(np.float32).view(np.uint32) >> 16
    ).astype(np.uint16)
    src = tmp_path / "in.bin"
    words.tofile(src)
    arc = tmp_path / "a.dgf"
    out = tmp_path / "out.bin"
    _run("compress", "--float", "bf16", str(src), str(arc))
    info = json.loads(_run("info", str(arc)).stdout)
    assert info["kind"] == "float" and info["float_type_name"] == "bf16"
    assert info["size"] == words.size
    _run("decompress", str(arc), str(out))
    assert np.array_equal(np.fromfile(out, dtype=np.uint16), words)


def test_cli_bad_magic(tmp_path):
    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"not an archive at all")
    _run("info", str(junk), expect=2)
    _run("decompress", str(junk), str(tmp_path / "o"), expect=2)
