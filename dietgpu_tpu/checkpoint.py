"""Compressed array checkpointing on the dietTPU archive format.

The reference documents its archives as the persistence format (checksums
recommended "if DietGPU data will be stored persistently on disk",
GpuFloatCodec.h:55-62) but ships no container for a *set* of tensors. This
module provides that: a single-file checkpoint holding many named arrays,
each stored as a standard float archive (f16/bf16/f32) or raw-ANS archive
(other dtypes, compressed as bytes), so any implementation of the format —
this repo's device paths, the native host codec, or the reference itself —
can decode the payloads.

File layout (little-endian):
    u32 magic 0xD1E77D17, u32 version 1, u32 n_entries, u32 reserved
    per entry: u32 name_len, name bytes (utf-8),
               u8 kind (1=float archive, 2=ans archive), u8 dtype_code,
               u16 ndim, u64 shape[ndim], u64 archive_bytes, archive
Entries are encoded/decoded with the native C++ host codec when available
(multithreaded), falling back to the NumPy oracle.
"""

from __future__ import annotations

import io
import struct

import numpy as np

from . import constants as C
from .ref import ans_ref, float_ref

_MAGIC = 0xD1E77D17
_VERSION = 1

# dtype codes persisted in the container (independent of numpy names)
_DTYPE_CODES = {
    "float16": 1,
    "bfloat16": 2,
    "float32": 3,
    "uint8": 4,
    "int8": 5,
    "int16": 6,
    "uint16": 7,
    "int32": 8,
    "uint32": 9,
    "int64": 10,
    "uint64": 11,
    "float64": 12,
    "bool": 13,
}
_DTYPE_BY_CODE = {v: k for k, v in _DTYPE_CODES.items()}
_FLOAT_TYPES = {"float16": 1, "bfloat16": 2, "float32": 3}


def _np_dtype(name: str):
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def _codec():
    """(float_compress, float_decompress, ans_encode, ans_decode) — native
    host codec when buildable, NumPy oracle otherwise (identical bytes)."""
    try:
        from . import hostcodec as hc

        if hc.available():
            return (
                hc.float_compress,
                lambda arc: hc.float_decompress(arc)[0],
                hc.ans_encode,
                hc.ans_decode,
            )
    except Exception:
        pass
    return (
        float_ref.float_compress,
        lambda arc: float_ref.float_decompress(arc)[0],
        ans_ref.ans_encode,
        lambda arc: ans_ref.ans_decode(arc)[0],
    )


def save_arrays(
    path_or_file,
    arrays: dict,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = True,
) -> dict:
    """Write a compressed checkpoint. Returns per-entry compression stats.

    `arrays` maps names to numpy/JAX arrays. f16/bf16/f32 arrays ride the
    float codec; every other dtype is compressed as raw bytes through the
    ANS codec.
    """
    fc, _, ae, _ = _codec()
    out = (
        open(path_or_file, "wb")
        if isinstance(path_or_file, (str, bytes))
        else path_or_file
    )
    close = isinstance(path_or_file, (str, bytes))
    stats = {}
    try:
        entries = list(arrays.items())
        out.write(struct.pack("<IIII", _MAGIC, _VERSION, len(entries), 0))
        for name, a in entries:
            a = np.asarray(a)
            dtname = a.dtype.name
            if dtname not in _DTYPE_CODES:
                raise TypeError(f"unsupported dtype {dtname} for entry {name}")
            flat = np.ascontiguousarray(a).reshape(-1)
            if dtname in _FLOAT_TYPES:
                kind = 1
                words = flat.view(
                    np.uint32 if dtname == "float32" else np.uint16
                )
                arc = fc(
                    words,
                    _FLOAT_TYPES[dtname],
                    prob_bits=prob_bits,
                    use_checksum=use_checksum,
                )
            else:
                kind = 2
                arc = ae(
                    flat.view(np.uint8),
                    prob_bits=prob_bits,
                    use_checksum=use_checksum,
                )
            nb = name.encode("utf-8")
            out.write(struct.pack("<I", len(nb)))
            out.write(nb)
            out.write(struct.pack("<BBH", kind, _DTYPE_CODES[dtname], a.ndim))
            out.write(struct.pack(f"<{a.ndim}Q", *a.shape))
            out.write(struct.pack("<Q", arc.size))
            out.write(arc.tobytes())
            stats[name] = {
                "raw_bytes": a.nbytes,
                "stored_bytes": int(arc.size),
                "ratio": float(arc.size) / max(a.nbytes, 1),
            }
        return stats
    finally:
        if close:
            out.close()


def load_arrays(path_or_file) -> dict:
    """Read a compressed checkpoint back into {name: numpy array}."""
    _, fd, _, ad = _codec()
    f = (
        open(path_or_file, "rb")
        if isinstance(path_or_file, (str, bytes))
        else path_or_file
    )
    close = isinstance(path_or_file, (str, bytes))
    try:
        magic, version, n, _ = struct.unpack("<IIII", f.read(16))
        if magic != _MAGIC:
            raise ValueError(f"not a dietTPU checkpoint (magic 0x{magic:08x})")
        if version != _VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        out = {}
        for _ in range(n):
            (name_len,) = struct.unpack("<I", f.read(4))
            name = f.read(name_len).decode("utf-8")
            kind, dtcode, ndim = struct.unpack("<BBH", f.read(4))
            shape = struct.unpack(f"<{ndim}Q", f.read(8 * ndim))
            (arc_len,) = struct.unpack("<Q", f.read(8))
            arc = np.frombuffer(f.read(arc_len), dtype=np.uint8)
            dtname = _DTYPE_BY_CODE[dtcode]
            dt = _np_dtype(dtname)
            if kind == 1:
                words = fd(arc)
                a = words.view(dt)
            else:
                raw = ad(arc)
                a = raw.view(dt)
            out[name] = a.reshape(shape)
        return out
    finally:
        if close:
            f.close()
