"""ctypes binding to the native C++ host codec (native/dietgpu_host.cpp).

The native library is the framework's host-side runtime: multithreaded
bit-exact archive encode/decode on CPU, for persistence / checkpoint IO and
as an independent second-language lock on the container format (reference
host layer: /root/reference/dietgpu/DietGpu.cpp). The shared object is built
on demand with g++ (cached by source mtime); callers that can tolerate its
absence should check :func:`available` first.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from . import constants as C

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "dietgpu_host.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libdietgpu_host.so")

_lock = threading.Lock()
_lib = None
_load_error: Exception | None = None

# Status codes (native/dietgpu_host.cpp Status enum)
OK = 0
ERR_CAPACITY = 1
ERR_CHECKSUM = 2
ERR_FORMAT = 3
ERR_OVERFLOW = 4

_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-fopenmp",
        "-fPIC",
        "-shared",
        "-std=c++17",
        # normalizeProbs relies on exact IEEE f32 rounding (no FMA fusion)
        "-ffp-contract=off",
        _SRC,
        "-o",
        _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _load_error
    with _lock:
        if _lib is not None:
            return _lib
        if _load_error is not None:
            raise _load_error
        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception as e:  # compiler missing, etc.
            _load_error = e
            raise
        u64, u64p = ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)
        i32, i32p = ctypes.c_int, ctypes.POINTER(ctypes.c_int)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.dg_max_compressed_size.restype = u64
        lib.dg_max_compressed_size.argtypes = [u64]
        lib.dg_max_float_compressed_size.restype = u64
        lib.dg_max_float_compressed_size.argtypes = [i32, u64]
        lib.dg_ans_encode.restype = i32
        lib.dg_ans_encode.argtypes = [_u8p, u64, i32, i32, _u8p, u64, u64p]
        lib.dg_ans_decode.restype = i32
        lib.dg_ans_decode.argtypes = [_u8p, u64, _u8p, u64, u64p]
        lib.dg_ans_info.restype = i32
        lib.dg_ans_info.argtypes = [_u8p, u64, u64p, u64p, i32p, i32p, u32p]
        lib.dg_float_compress.restype = i32
        lib.dg_float_compress.argtypes = [_u8p, u64, i32, i32, i32, _u8p, u64, u64p]
        lib.dg_float_decompress.restype = i32
        lib.dg_float_decompress.argtypes = [_u8p, u64, _u8p, u64, u64p]
        lib.dg_float_info.restype = i32
        lib.dg_float_info.argtypes = [_u8p, u64, u64p, i32p, i32p, u32p]
        lib.dg_num_threads.restype = i32
        lib.dg_num_threads.argtypes = []
        _lib = lib
        return lib


def available() -> bool:
    """True when the native library is loadable (building it if needed)."""
    try:
        _load()
        return True
    except Exception:
        return False


def _ptr(a: np.ndarray):
    if a.size == 0:
        # ctypes rejects zero-size buffers; any valid pointer works since the
        # native side never dereferences when n == 0.
        return ctypes.cast(ctypes.create_string_buffer(1), _u8p)
    return a.ctypes.data_as(_u8p)


def _raise_for(status: int, what: str) -> None:
    if status == ERR_CHECKSUM:
        raise ValueError(f"{what}: checksum mismatch")
    if status == ERR_FORMAT:
        raise ValueError(f"{what}: bad archive format")
    if status == ERR_OVERFLOW:
        raise OverflowError(f"{what}: per-block payload bound exceeded")
    if status != OK:
        raise RuntimeError(f"{what}: native status {status}")


def ans_encode(
    data: np.ndarray,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
) -> np.ndarray:
    """Compress bytes into a coalesced ANS archive (exact-size u8 array)."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    cap = lib.dg_max_compressed_size(data.size)
    out = np.empty(cap, dtype=np.uint8)
    size = ctypes.c_uint64()
    st = lib.dg_ans_encode(
        _ptr(data), data.size, prob_bits, int(use_checksum), _ptr(out), cap,
        ctypes.byref(size),
    )
    _raise_for(st, "ans_encode")
    return out[: size.value].copy()


def ans_decode(archive: np.ndarray) -> np.ndarray:
    """Decode an ANS archive to its original bytes. Raises on corruption."""
    lib = _load()
    archive = np.ascontiguousarray(archive, dtype=np.uint8)
    n = ctypes.c_uint64()
    st = lib.dg_ans_decode(_ptr(archive), archive.size, _ptr(archive), 0,
                           ctypes.byref(n))
    if st == ERR_CAPACITY:
        out = np.empty(n.value, dtype=np.uint8)
        st = lib.dg_ans_decode(_ptr(archive), archive.size, _ptr(out), out.size,
                               ctypes.byref(n))
        _raise_for(st, "ans_decode")
        return out
    _raise_for(st, "ans_decode")
    return np.empty(0, dtype=np.uint8)


def ans_info(archive: np.ndarray) -> dict:
    lib = _load()
    archive = np.ascontiguousarray(archive, dtype=np.uint8)
    out_bytes = ctypes.c_uint64()
    arc_bytes = ctypes.c_uint64()
    prob_bits = ctypes.c_int()
    use_ck = ctypes.c_int()
    ck = ctypes.c_uint32()
    st = lib.dg_ans_info(
        _ptr(archive), archive.size, ctypes.byref(out_bytes),
        ctypes.byref(arc_bytes), ctypes.byref(prob_bits), ctypes.byref(use_ck),
        ctypes.byref(ck),
    )
    _raise_for(st, "ans_info")
    return {
        "total_uncompressed_words": out_bytes.value,
        "total_compressed_size": arc_bytes.value,
        "prob_bits": prob_bits.value,
        "use_checksum": bool(use_ck.value),
        "checksum": ck.value,
    }


def float_compress(
    words: np.ndarray,
    float_type: int,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
) -> np.ndarray:
    """Compress raw float words (u16/u32 view) into a float archive."""
    lib = _load()
    n = words.size
    raw = np.ascontiguousarray(words).view(np.uint8).reshape(-1)
    cap = lib.dg_max_float_compressed_size(float_type, n)
    out = np.empty(cap, dtype=np.uint8)
    size = ctypes.c_uint64()
    st = lib.dg_float_compress(
        _ptr(raw), n, float_type, prob_bits, int(use_checksum), _ptr(out), cap,
        ctypes.byref(size),
    )
    _raise_for(st, "float_compress")
    return out[: size.value].copy()


def float_decompress(archive: np.ndarray) -> tuple[np.ndarray, int]:
    """Decode a float archive. Returns (words u16/u32, float_type)."""
    lib = _load()
    archive = np.ascontiguousarray(archive, dtype=np.uint8)
    info = float_info(archive)
    ft = info["float_type"]
    n = info["size"]
    word_dtype = np.uint32 if ft == C.FLOAT_TYPE_FLOAT32 else np.uint16
    out = np.empty(n, dtype=word_dtype)
    got = ctypes.c_uint64()
    st = lib.dg_float_decompress(
        _ptr(archive), archive.size, _ptr(out.view(np.uint8)), n,
        ctypes.byref(got),
    )
    _raise_for(st, "float_decompress")
    return out, ft


def float_info(archive: np.ndarray) -> dict:
    lib = _load()
    archive = np.ascontiguousarray(archive, dtype=np.uint8)
    n = ctypes.c_uint64()
    ft = ctypes.c_int()
    use_ck = ctypes.c_int()
    ck = ctypes.c_uint32()
    st = lib.dg_float_info(
        _ptr(archive), archive.size, ctypes.byref(n), ctypes.byref(ft),
        ctypes.byref(use_ck), ctypes.byref(ck),
    )
    _raise_for(st, "float_info")
    return {
        "size": n.value,
        "float_type": ft.value,
        "use_checksum": bool(use_ck.value),
        "checksum": ck.value,
    }


def num_threads() -> int:
    return _load().dg_num_threads()
