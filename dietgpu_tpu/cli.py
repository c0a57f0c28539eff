"""File-level CLI over the native host codec (persistence tooling).

The archive written to disk is the standard self-describing container
(ANSCoalescedHeader / GpuFloatHeader — GpuANSUtils.cuh:67-229,
GpuFloatUtils.cuh:20-74), so files produced here decode through every
path in the framework (JAX/XLA, Pallas, the NumPy oracle) and vice versa.
Runs without JAX: the multithreaded C++ host codec does the work.

Usage:
  python -m dietgpu_tpu.cli compress   [--float {f16,bf16,f32}]
                                       [--prob-bits {9,10,11}]
                                       [--no-checksum] IN OUT
  python -m dietgpu_tpu.cli decompress IN OUT
  python -m dietgpu_tpu.cli info       IN

`compress --float T` treats IN as raw little-endian T words (its size
must be a multiple of the word size); without --float IN is arbitrary
bytes through the raw ANS codec. `decompress` detects the archive kind
from its magic. `info` prints the header fields as JSON.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from . import constants as C
from . import hostcodec

_FT = {
    "f16": C.FLOAT_TYPE_FLOAT16,
    "bf16": C.FLOAT_TYPE_BFLOAT16,
    "f32": C.FLOAT_TYPE_FLOAT32,
}
_FT_NAME = {v: k for k, v in _FT.items()}


def _read(path: str) -> np.ndarray:
    if path == "-":
        return np.frombuffer(sys.stdin.buffer.read(), dtype=np.uint8)
    return np.fromfile(path, dtype=np.uint8)


def _write(path: str, data: np.ndarray) -> None:
    if path == "-":
        sys.stdout.buffer.write(data.tobytes())
    else:
        data.tofile(path)


def _magic(archive: np.ndarray) -> int:
    if archive.size < 4:
        return 0
    return int(archive[2]) | (int(archive[3]) << 8)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="dietgpu_tpu.cli", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("compress", help="bytes/floats -> archive")
    pc.add_argument("--float", choices=sorted(_FT), default=None)
    pc.add_argument("--prob-bits", type=int, default=C.DEFAULT_PROB_BITS,
                    choices=sorted(C.SUPPORTED_PROB_BITS))
    pc.add_argument("--no-checksum", action="store_true")
    pc.add_argument("infile")
    pc.add_argument("outfile")

    pd = sub.add_parser("decompress", help="archive -> original bytes")
    pd.add_argument("infile")
    pd.add_argument("outfile")

    pi = sub.add_parser("info", help="print archive header as JSON")
    pi.add_argument("infile")

    a = p.parse_args(argv)
    if not hostcodec.available():
        print("native host codec unavailable (g++ build failed?)",
              file=sys.stderr)
        return 2

    if a.cmd == "compress":
        data = _read(a.infile)
        checksum = not a.no_checksum
        if a.float is not None:
            ft = _FT[a.float]
            ws = C.float_word_size(ft)
            if data.size % ws:
                print(f"input size {data.size} is not a multiple of the "
                      f"{a.float} word size {ws}", file=sys.stderr)
                return 2
            wdt = np.uint32 if ft == C.FLOAT_TYPE_FLOAT32 else np.uint16
            arc = hostcodec.float_compress(
                data.view(wdt), ft, a.prob_bits, checksum
            )
        else:
            arc = hostcodec.ans_encode(data, a.prob_bits, checksum)
        _write(a.outfile, arc)
        ratio = arc.size / max(data.size, 1)
        print(f"{data.size} -> {arc.size} bytes ({ratio:.4f}x)",
              file=sys.stderr)
        return 0

    arc = _read(a.infile)
    magic = _magic(arc)
    if a.cmd == "info":
        if magic == C.FLOAT_MAGIC:
            info = hostcodec.float_info(arc)
            info["kind"] = "float"
            info["float_type_name"] = _FT_NAME.get(info["float_type"])
        elif magic == C.ANS_MAGIC:
            info = hostcodec.ans_info(arc)
            info["kind"] = "ans"
        else:
            print("not a dietgpu archive (bad magic)", file=sys.stderr)
            return 2
        print(json.dumps(info, indent=1))
        return 0

    # decompress
    if magic == C.FLOAT_MAGIC:
        words, _ft = hostcodec.float_decompress(arc)
        out = words.view(np.uint8).reshape(-1)
    elif magic == C.ANS_MAGIC:
        out = hostcodec.ans_decode(arc)
    else:
        print("not a dietgpu archive (bad magic)", file=sys.stderr)
        return 2
    _write(a.outfile, out)
    print(f"{arc.size} -> {out.size} bytes", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
