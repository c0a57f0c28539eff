"""Bit-exact NumPy reference for the float split codec.

Archive layout (reference: FloatANSOutProvider, GpuFloatCompress.cuh:420-427):

```
GpuFloatHeader (16 B):
    u32 magicAndVersion (0xf00f<<16 | 1)
    u32 size                       # float words
    u32 options                    # (27 unused)(1 useChecksum)(4 floatType)
    u32 checksum                   # folded-XOR of the raw input bytes
nonComp plane(s), 16 B-rounded     # raw-stored sign/significand bytes
complete ANS archive               # rANS-coded exponent bytes
```

Split transforms (GpuFloatUtils.cuh:111-203):
  f16 : comp = word >> 8, nonComp = word & 0xff
  bf16: r = rotl16(word, 1); comp = r >> 8 (the exponent), nonComp = r & 0xff
  f32 : v = rotl32(word, 1); comp = v >> 24 (exponent), nonComp = v & 0xffffff
        stored as a u16 low plane (roundUp(size,8) entries) then a u8 high
        plane (roundUp(size,16) entries).
"""

from __future__ import annotations

import numpy as np

from .. import constants as C
from . import ans_ref

_U32 = np.uint32

_NUMPY_DTYPES = {
    C.FLOAT_TYPE_FLOAT16: np.dtype(np.float16),
    C.FLOAT_TYPE_FLOAT32: np.dtype(np.float32),
}


def float_type_of_dtype(dtype) -> int:
    """Map a numpy/ml dtype (or its name) to the archive FloatType code."""
    name = np.dtype(dtype).name if not isinstance(dtype, str) else dtype
    return {
        "float16": C.FLOAT_TYPE_FLOAT16,
        "bfloat16": C.FLOAT_TYPE_BFLOAT16,
        "float32": C.FLOAT_TYPE_FLOAT32,
    }[name]


def float_split(words: np.ndarray, float_type: int):
    """Split float words into (comp u8, noncomp plane bytes u8)."""
    if float_type == C.FLOAT_TYPE_FLOAT16:
        assert words.dtype == np.uint16
        comp = (words >> 8).astype(np.uint8)
        nc = (words & 0xFF).astype(np.uint8)
        plane = np.zeros(C.float_noncomp_bytes(float_type, words.size), np.uint8)
        plane[: words.size] = nc
        return comp, plane
    if float_type == C.FLOAT_TYPE_BFLOAT16:
        assert words.dtype == np.uint16
        r = ((words << np.uint16(1)) | (words >> np.uint16(15))).astype(np.uint16)
        comp = (r >> 8).astype(np.uint8)
        nc = (r & 0xFF).astype(np.uint8)
        plane = np.zeros(C.float_noncomp_bytes(float_type, words.size), np.uint8)
        plane[: words.size] = nc
        return comp, plane
    if float_type == C.FLOAT_TYPE_FLOAT32:
        assert words.dtype == np.uint32
        v = ((words << _U32(1)) | (words >> _U32(31))).astype(_U32)
        comp = (v >> 24).astype(np.uint8)
        nc24 = v & _U32(0xFFFFFF)
        n = words.size
        lo_entries = C.round_up(n, 8)
        plane = np.zeros(C.float_noncomp_bytes(float_type, n), np.uint8)
        lo = np.zeros(lo_entries, np.uint16)
        lo[:n] = (nc24 & 0xFFFF).astype(np.uint16)
        plane[: 2 * lo_entries] = lo.view(np.uint8)
        plane[2 * lo_entries : 2 * lo_entries + n] = (nc24 >> 16).astype(np.uint8)
        return comp, plane
    raise ValueError(f"bad float type {float_type}")


def float_join(comp: np.ndarray, plane: np.ndarray, float_type: int, n: int):
    """Inverse of float_split: returns float words (u16/u32)."""
    if float_type == C.FLOAT_TYPE_FLOAT16:
        return (
            comp[:n].astype(np.uint16) << np.uint16(8)
        ) | plane[:n].astype(np.uint16)
    if float_type == C.FLOAT_TYPE_BFLOAT16:
        r = (comp[:n].astype(np.uint16) << np.uint16(8)) | plane[:n].astype(np.uint16)
        return ((r >> np.uint16(1)) | (r << np.uint16(15))).astype(np.uint16)
    if float_type == C.FLOAT_TYPE_FLOAT32:
        lo_entries = C.round_up(n, 8)
        lo = plane[: 2 * lo_entries].view(np.uint16)[:n].astype(_U32)
        hi = plane[2 * lo_entries : 2 * lo_entries + n].astype(_U32)
        v = (comp[:n].astype(_U32) << _U32(24)) | (hi << _U32(16)) | lo
        return ((v >> _U32(1)) | (v << _U32(31))).astype(_U32)
    raise ValueError(f"bad float type {float_type}")


def float_compress(
    words: np.ndarray,
    float_type: int,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
) -> np.ndarray:
    """Compress raw float words (u16/u32 view) into a float archive (u8)."""
    n = words.size
    comp, plane = float_split(words, float_type)
    # ANS-level checksumming is disallowed under the float codec; the float
    # header carries its own checksum over the raw input bytes
    # (GpuFloatCodec.h:55-77).
    ans = ans_ref.ans_encode(comp, prob_bits=prob_bits, use_checksum=False)

    checksum = (
        ans_ref.checksum_bytes(words.view(np.uint8).reshape(-1)) if use_checksum else 0
    )
    header = np.array(
        [
            (C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION,
            n,
            (float_type & 0xF) | (int(use_checksum) << 4),
            checksum,
        ],
        dtype=_U32,
    )
    out = np.zeros(C.FLOAT_HEADER_BYTES + plane.size + ans.size, np.uint8)
    out[:16] = header.view(np.uint8)
    out[16 : 16 + plane.size] = plane
    out[16 + plane.size :] = ans
    return out


def parse_float_header(archive: np.ndarray) -> dict:
    assert archive.dtype == np.uint8
    h = archive[:16].view(_U32)
    magic_ver = int(h[0])
    if (magic_ver >> 16) != C.FLOAT_MAGIC or (magic_ver & 0xFFFF) != C.FLOAT_VERSION:
        raise ValueError(f"bad float archive magic/version 0x{magic_ver:08x}")
    n = int(h[1])
    options = int(h[2])
    ft = options & 0xF
    return {
        "size": n,
        "float_type": ft,
        "use_checksum": bool(options & 0x10),
        "checksum": int(h[3]),
        "ans_start": C.FLOAT_HEADER_BYTES + C.float_noncomp_bytes(ft, n),
    }


def float_decompress(
    archive: np.ndarray, expected_float_type: int | None = None
) -> tuple[np.ndarray, bool, int]:
    """Decode a float archive. Returns (words, success, size_in_words)."""
    info = parse_float_header(archive)
    ft = info["float_type"]
    n = info["size"]
    if expected_float_type is not None:
        assert ft == expected_float_type, "float type mismatch"

    comp, ok, ans_n = ans_ref.ans_decode(archive[info["ans_start"] :])
    assert ok
    # Cross-check the ANS payload length against the float header
    # (GpuFloatDecompress.cuh:304-313).
    assert ans_n == n, f"ANS size {ans_n} != float header size {n}"
    plane = archive[16 : info["ans_start"]]
    words = float_join(comp, plane, ft, n)

    if info["use_checksum"]:
        actual = ans_ref.checksum_bytes(words.view(np.uint8).reshape(-1))
        if actual != info["checksum"]:
            raise ValueError(
                f"float checksum mismatch: archive 0x{info['checksum']:02x} "
                f"!= decoded 0x{actual:02x}"
            )
    return words, True, n
