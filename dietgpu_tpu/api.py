"""Public batch API: the dietTPU equivalent of the DietGPU torch ops.

The ten reference ops (DietGpu.cpp:915-972) map to this JAX-functional
surface (outputs are returned, never written in place):

  torch.ops.dietgpu.*                 dietgpu_tpu.api.*
  ---------------------------------   ---------------------------------------
  max_any_compressed_size             max_any_compressed_size
  max_float_compressed_size           max_float_compressed_size
  max_any_compressed_output_size      max_any_compressed_output_size
  max_float_compressed_output_size    max_float_compressed_output_size
  compress_data                       compress_data -> (comp, sizes, tempMem)
  compress_data_split_size            compress_data_split_size
  compress_data_simple                compress_data_simple
  decompress_data                     decompress_data -> (outs, status, sizes)
  decompress_data_split_size          decompress_data_split_size
  decompress_data_simple              decompress_data_simple

Batch members are padded to a shared bucket (power-of-two blocks) and the
whole batch is processed by one vmapped, jitted program; compilations are
cached per (batch, bucket, dtype, flags).
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from . import backend as backend_mod
from . import constants as C
from .ans import decode as ans_decode_mod
from .ans import encode as ans_encode_mod
from .floatcodec import codec as float_codec_mod
from .ref import ans_ref, float_ref

_I32 = jnp.int32

_FLOAT_TYPE_BY_NAME = {
    "float16": C.FLOAT_TYPE_FLOAT16,
    "bfloat16": C.FLOAT_TYPE_BFLOAT16,
    "float32": C.FLOAT_TYPE_FLOAT32,
}
_DTYPE_BY_FLOAT_TYPE = {
    C.FLOAT_TYPE_FLOAT16: jnp.float16,
    C.FLOAT_TYPE_BFLOAT16: jnp.bfloat16,
    C.FLOAT_TYPE_FLOAT32: jnp.float32,
}
_WORD_DTYPE = {2: jnp.uint16, 4: jnp.uint32}


def float_type_of(dtype) -> int:
    name = jnp.dtype(dtype).name
    if name not in _FLOAT_TYPE_BY_NAME:
        raise ValueError(f"unsupported float dtype {name}")
    return _FLOAT_TYPE_BY_NAME[name]


def _byte_length(t: jax.Array) -> int:
    return t.size * t.dtype.itemsize


def _bucket_words(max_words: int) -> int:
    """Pad to a power-of-two number of 4096-word blocks (compile caching)."""
    blocks = max(1, C.div_up(max_words, C.DEFAULT_BLOCK_SIZE))
    p = 1
    while p < blocks:
        p *= 2
    return p * C.DEFAULT_BLOCK_SIZE


def _as_u8(t: jax.Array) -> jax.Array:
    t = t.reshape(-1)
    if t.dtype == jnp.uint8:
        return t
    return jax.lax.bitcast_convert_type(t, jnp.uint8).reshape(-1)


def _as_words(t: jax.Array) -> jax.Array:
    """Raw word view (u16/u32) of a float array."""
    wd = _WORD_DTYPE[t.dtype.itemsize]
    return jax.lax.bitcast_convert_type(t.reshape(-1), wd).reshape(-1)


# ---------------------------------------------------------------------------
# size queries (host)
# ---------------------------------------------------------------------------


def max_any_compressed_size(nbytes: int) -> int:
    """Reference-parity archive size bound (GpuANSEncode.cu:13-25)."""
    return C.max_compressed_size(nbytes)


def max_float_compressed_size(dtype, size: int) -> int:
    return C.max_float_compressed_size(float_type_of(dtype), size)


def max_any_compressed_output_size(ts: Sequence[jax.Array]) -> tuple[int, int]:
    return len(ts), max(max_any_compressed_size(_byte_length(t)) for t in ts)


def max_float_compressed_output_size(ts: Sequence[jax.Array]) -> tuple[int, int]:
    return len(ts), max(
        max_float_compressed_size(t.dtype, t.size) for t in ts
    )


# ---------------------------------------------------------------------------
# jitted batch kernels (cached per shape/config)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _batch_ans_encode(L: int, prob_bits: int, checksum: bool, backend: str):
    def one(d, n):
        return backend_mod.ans_encode_padded(
            d, n, prob_bits, checksum, backend=backend
        )

    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=None)
def _batch_ans_decode(A: int, L: int, prob_bits: int, checksum: bool,
                      backend: str):
    def one(arc, cap):
        r = backend_mod.ans_decode_padded(
            arc, prob_bits, L, checksum, backend=backend
        )
        ok = r["success"] & (r["size"] <= cap.astype(jnp.uint32))
        return r["out"], r["size"], ok, r["checksum_ok"]

    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=None)
def _batch_float_encode(Lw: int, float_type: int, prob_bits: int,
                        checksum: bool, backend: str):
    def one(w, n):
        if backend == "pallas":
            # Pallas float pipeline (u32-native); the u8 conversion happens
            # only at this API boundary
            from .ans import layout as ans_layout
            from .floatcodec import pallas_codec

            if w.dtype == jnp.uint16:
                pairs = jax.lax.bitcast_convert_type(
                    w.reshape(Lw // 2, 2), jnp.uint32
                )
            else:
                pairs = w
            buf32, size = pallas_codec.float_compress_padded_pallas(
                pairs, n, float_type, prob_bits, checksum
            )
            return ans_layout.u32_to_u8le(buf32), size
        return float_codec_mod.float_compress_padded(
            w, n, float_type, prob_bits, checksum
        )

    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=None)
def _batch_ans_encode_onegrid(L: int, n: int, prob_bits: int, checksum: bool):
    """Uniform-length batch: ONE encode grid spanning all members
    (per-row tables), vs. vmap's serialized member-sized grids."""
    from .ans import layout as ans_layout
    from .ans import pallas_encode as penc
    from .ans import pallas_hist
    from .ans import stats

    def fn(padded_u8):
        d32 = jax.vmap(ans_layout.u8_to_u32le)(padded_u8)
        hist = jax.vmap(
            lambda d: pallas_hist.histogram_u8_pallas(d.astype(_I32), n)
        )(d32)
        pdfs = jax.vmap(
            lambda h: stats.normalize_probs(h, jnp.uint32(n), prob_bits)
        )(hist)
        arcs, sizes = penc.ans_encode_batched_pallas(
            d32, n, pdfs, prob_bits, use_checksum=checksum
        )
        return jax.vmap(ans_layout.u32_to_u8le)(arcs), sizes

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _batch_float_encode_onegrid(
    Lw: int, n: int, float_type: int, prob_bits: int, checksum: bool
):
    from .ans import layout as ans_layout
    from .floatcodec import pallas_codec

    def fn(padded):
        if padded.dtype == jnp.uint16:
            words = jax.lax.bitcast_convert_type(
                padded.reshape(-1, Lw // 2, 2), jnp.uint32
            )
        else:
            words = padded.astype(jnp.uint32)
        bufs, sizes = pallas_codec.float_compress_batched_pallas(
            words, n, float_type, prob_bits, checksum
        )
        return jax.vmap(ans_layout.u32_to_u8le)(bufs), sizes

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _batch_ans_decode_onegrid(L: int, n: int, prob_bits: int):
    from .ans import layout as ans_layout
    from .ans import pallas_decode as pdec

    static_nb = C.div_up(n, C.DEFAULT_BLOCK_SIZE)

    def fn(arcs_u8):
        arcs32 = jax.vmap(ans_layout.u8_to_u32le)(arcs_u8)
        r = pdec.ans_decode_batched_pallas(
            arcs32, prob_bits, L, static_nb=static_nb
        )
        ok = r["success"] & (r["size"] == jnp.uint32(n))
        out = jax.vmap(ans_layout.u32_to_u8le)(r["out"])
        return out, r["size"], ok

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _batch_float_decode_onegrid(
    Lw: int, n: int, float_type: int, prob_bits: int
):
    from .ans import layout as ans_layout
    from .floatcodec import pallas_codec

    def fn(arcs_u8):
        arcs32 = jax.vmap(ans_layout.u8_to_u32le)(arcs_u8)
        r = pallas_codec.float_decompress_batched_pallas(
            arcs32, float_type, Lw, prob_bits, static_length=n
        )
        if float_type == C.FLOAT_TYPE_FLOAT32:
            out = r["out32"].astype(jnp.uint32)
        else:
            out = jax.vmap(
                lambda o: jax.lax.bitcast_convert_type(
                    o.astype(jnp.uint32), jnp.uint16
                ).reshape(Lw)
            )(r["out32"])
        ok = r["success"] & (r["size"] == jnp.uint32(n))
        return out, r["size"], ok

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _batch_float_decode(F: int, Lw: int, float_type: int, prob_bits: int,
                        checksum: bool, backend: str):
    def one(arc, cap):
        if backend == "pallas":
            from .ans import layout as ans_layout
            from .floatcodec import pallas_codec

            arc32 = ans_layout.u8_to_u32le(arc)
            r = pallas_codec.float_decompress_padded_pallas(
                arc32, float_type, Lw, prob_bits, checksum
            )
            if float_type == C.FLOAT_TYPE_FLOAT32:
                out = r["out32"].astype(jnp.uint32)
            else:
                out = jax.lax.bitcast_convert_type(
                    r["out32"].astype(jnp.uint32), jnp.uint16
                ).reshape(Lw)
            ok = r["success"] & (r["size"] <= cap.astype(jnp.uint32))
            return out, r["size"], ok, r["checksum_ok"]
        r = float_codec_mod.float_decompress_padded(
            arc, float_type, Lw, prob_bits, checksum
        )
        ok = r["success"] & (r["size"] <= cap.astype(jnp.uint32))
        return r["out"], r["size"], ok, r["checksum_ok"]

    return jax.jit(jax.vmap(one))


# ---------------------------------------------------------------------------
# compress
# ---------------------------------------------------------------------------


def compress_data(
    compress_as_float: bool,
    ts_in: Sequence[jax.Array],
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Compress a batch of arrays.

    Returns (comp u8 (B, bufsize), sizes i32 (B,), temp_mem_used int).
    Row b's archive occupies comp[b, :sizes[b]]. A negative sizes[b]
    (C.SIZE_OVERFLOW_BIT set) marks a per-block payload overflow — the
    reference device-asserts there (GpuANSEncode.cuh:355-360); that row's
    archive is invalid. Only adversarial inputs at probBits 10/11 can
    trigger this (a 4 KiB block made of weight-1 symbols).
    """
    if len(ts_in) == 0:
        raise ValueError("empty batch")
    backend = backend_mod.default_backend()
    if compress_as_float:
        ft = float_type_of(ts_in[0].dtype)
        for t in ts_in:
            if float_type_of(t.dtype) != ft:
                raise ValueError("all batch members must share a dtype")
        words = [_as_words(t) for t in ts_in]
        lens = np.array([w.size for w in words], np.int32)
        Lw = _bucket_words(int(lens.max()))
        padded = jnp.stack(
            [jnp.pad(w, (0, Lw - w.size)) for w in words]
        )
        n0 = int(lens[0])
        if backend == "pallas" and len(ts_in) > 1 and n0 > 0 and bool(
            (lens == n0).all()
        ):
            # uniform-length batch: one encode grid spans all members
            # (per-row tables) — the reference's 128-way batched scenario
            # (benchmark.py:149-221) without vmap's serialized small grids
            fn = _batch_float_encode_onegrid(Lw, n0, ft, prob_bits, checksum)
            comp, sizes = fn(padded)
        else:
            fn = _batch_float_encode(Lw, ft, prob_bits, checksum, backend)
            comp, sizes = fn(padded, jnp.asarray(lens))
        max_size = int(lens.max()) * C.float_word_size(ft)
    else:
        datas = [_as_u8(t) for t in ts_in]
        lens = np.array([d.size for d in datas], np.int32)
        L = _bucket_words(int(lens.max()))
        padded = jnp.stack([jnp.pad(d, (0, L - d.size)) for d in datas])
        n0 = int(lens[0])
        if backend == "pallas" and len(ts_in) > 1 and n0 > 0 and bool(
            (lens == n0).all()
        ):
            fn = _batch_ans_encode_onegrid(L, n0, prob_bits, checksum)
            comp, sizes = fn(padded)
        else:
            fn = _batch_ans_encode(L, prob_bits, checksum, backend)
            comp, sizes = fn(padded, jnp.asarray(lens))
        max_size = int(lens.max())

    temp_mem = ans_encode_mod.encode_scratch_bytes(max_size, len(ts_in))
    return comp, sizes.astype(_I32), temp_mem


def compress_data_simple(
    compress_as_float: bool,
    ts_in: Sequence[jax.Array],
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Convenience tier: returns a list of exactly-sized archive arrays
    (device->host sync for the sizes, like the reference's _simple ops).
    Raises OverflowError if any element hit the per-block payload bound."""
    comp, sizes, _ = compress_data(compress_as_float, ts_in, checksum, prob_bits)
    sizes_h = np.asarray(jax.device_get(sizes))
    if (sizes_h < 0).any():
        bad = np.nonzero(sizes_h < 0)[0].tolist()
        raise OverflowError(
            f"compressed block payload overflow in batch elements {bad}"
        )
    comp_h = jax.device_get(comp)
    return [jnp.asarray(comp_h[i, : sizes_h[i]]) for i in range(len(ts_in))]


def compress_data_split_size(
    compress_as_float: bool,
    t_in: jax.Array,
    split_sizes: Sequence[int],
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Compress consecutive splits of one flat array as a batch.

    Interior splits must keep 4-byte alignment of their start offsets within
    the flat buffer (reference requirement, GpuANSEncode.cu:131-148).
    """
    split_sizes = [int(s) for s in split_sizes]
    if sum(split_sizes) != t_in.size:
        raise ValueError("split sizes must sum to the input size")
    word = t_in.dtype.itemsize
    off = 0
    pieces = []
    for s in split_sizes[:-1]:
        off += s * word
        if off % C.ANS_REQUIRED_ALIGNMENT != 0:
            raise ValueError(
                "interior split boundaries must be 4-byte aligned "
                f"(offset {off})"
            )
    off = 0
    flat = t_in.reshape(-1)
    for s in split_sizes:
        pieces.append(jax.lax.dynamic_slice(flat, (off,), (s,)))
        off += s
    return compress_data(compress_as_float, pieces, checksum, prob_bits)


def compress_data_stride(
    compress_as_float: bool,
    t_in: jax.Array,
    sizes: Sequence[int] | None = None,
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Compress the rows of a 2-D (batch, stride) array as a batch — the
    natural TPU analogue of BatchProviderStride (ans/BatchProvider.cuh:39-69,
    tested ANSTest.cu:277-282). Row b's payload is t_in[b, :sizes[b]]
    (elements; defaults to the full stride).

    Returns (comp, sizes_bytes, temp_mem) as compress_data.
    """
    if t_in.ndim != 2:
        raise ValueError("stride form expects a 2-D (batch, stride) array")
    B, stride = t_in.shape
    if sizes is None:
        sizes = [stride] * B
    sizes = [int(s) for s in sizes]
    if len(sizes) != B or any(s < 0 or s > stride for s in sizes):
        raise ValueError("per-row sizes must be within [0, stride]")
    rows = [jax.lax.slice(t_in, (b, 0), (b + 1, sizes[b]))[0] for b in range(B)]
    return compress_data(compress_as_float, rows, checksum, prob_bits)


def decompress_data_stride(
    compress_as_float: bool,
    ts_in: Sequence[jax.Array],
    batch: int,
    stride: int,
    dtype,
    sizes: Sequence[int] | None = None,
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Decompress a batch into the rows of one (batch, stride) array
    (BatchProviderStride on the output side). Rows are zero-padded past
    their payload. Returns (out2d, status, sizes_bytes, temp_mem)."""
    if sizes is None:
        sizes = [stride] * batch
    sizes = [int(s) for s in sizes]
    specs = [jnp.zeros(s, dtype) for s in sizes]
    outs, status, sizes_bytes, tm = decompress_data(
        compress_as_float, ts_in, specs, checksum, prob_bits
    )
    out2d = jnp.stack(
        [jnp.pad(o.reshape(-1), (0, stride - o.size)) for o in outs]
    )
    return out2d, status, sizes_bytes, tm


# ---------------------------------------------------------------------------
# decompress
# ---------------------------------------------------------------------------


def _stack_archives(ts_in: Sequence[jax.Array], bufsize: int) -> jax.Array:
    rows = []
    for t in ts_in:
        b = _as_u8(t)
        if b.size > bufsize:
            b = b[:bufsize]
        rows.append(jnp.pad(b, (0, bufsize - b.size)))
    return jnp.stack(rows)


def decompress_data(
    compress_as_float: bool,
    ts_in: Sequence[jax.Array],
    ts_out: Sequence[jax.Array],
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    _static_sizes: bool = False,
):
    """Decompress archives into arrays shaped/typed like ts_out.

    Returns (outs, status u8 (B,), sizes i32 (B,), temp_mem_used). Per the
    reference contract, status[b] is 0 and sizes[b] holds the required byte
    count when ts_out[b] is too small (GpuANSCodec.h:213-223). A checksum
    mismatch raises ValueError (DietGpu.cpp:617-620).

    `_static_sizes` (internal, set by the `_simple` tier) promises every
    ts_out[b] size equals the archive's exact stored size; a uniform batch
    then rides ONE decode grid spanning all members (per-row tables)
    instead of a vmap of member-sized grids.
    """
    B = len(ts_in)
    assert len(ts_out) == B and B > 0
    backend = backend_mod.default_backend()
    if compress_as_float:
        ft = float_type_of(ts_out[0].dtype)
        caps = np.array([t.size for t in ts_out], np.int32)
        Lw = _bucket_words(int(caps.max()))
        onegrid = (
            backend == "pallas"
            and B > 1
            and not checksum
            and _static_sizes
            and int(caps[0]) > 0
            and bool((caps == caps[0]).all())
        )
        if backend == "pallas":
            # u32-row buffer with tile-DMA slack: the decode kernel's
            # in-place fast path needs it
            from .floatcodec import pallas_codec

            F = pallas_codec.float_archive_u32_bytes(ft, Lw)
        else:
            F = float_codec_mod.float_archive_buffer_bytes(ft, Lw)
        arcs = _stack_archives(ts_in, F)
        if onegrid:
            fn = _batch_float_decode_onegrid(
                Lw, int(caps[0]), ft, prob_bits
            )
            out, sizes, ok = fn(arcs)
            cs_ok = jnp.ones((B,), jnp.bool_)
        else:
            fn = _batch_float_decode(F, Lw, ft, prob_bits, checksum, backend)
            out, sizes, ok, cs_ok = fn(arcs, jnp.asarray(caps))
        outs = [
            jax.lax.bitcast_convert_type(
                out[i, : ts_out[i].size], ts_out[i].dtype
            ).reshape(ts_out[i].shape)
            for i in range(B)
        ]
        sizes_bytes = sizes.astype(_I32) * C.float_word_size(ft)
    else:
        caps = np.array([_byte_length(t) for t in ts_out], np.int32)
        L = _bucket_words(int(caps.max()))
        onegrid = (
            backend == "pallas"
            and B > 1
            and not checksum
            and _static_sizes
            and int(caps[0]) > 0
            and bool((caps == caps[0]).all())
        )
        if backend == "pallas":
            from .ans import pallas_encode as pallas_encode_mod

            A = pallas_encode_mod.archive_buffer_bytes_pallas(L)
        else:
            A = ans_encode_mod.archive_buffer_bytes(L)
        arcs = _stack_archives(ts_in, A)
        if onegrid:
            fn = _batch_ans_decode_onegrid(L, int(caps[0]), prob_bits)
            out, sizes, ok = fn(arcs)
            cs_ok = jnp.ones((B,), jnp.bool_)
        else:
            fn = _batch_ans_decode(A, L, prob_bits, checksum, backend)
            out, sizes, ok, cs_ok = fn(arcs, jnp.asarray(caps))
        outs = []
        for i, t in enumerate(ts_out):
            raw = out[i, : _byte_length(t)]
            if t.dtype != jnp.uint8:
                raw = jax.lax.bitcast_convert_type(
                    raw.reshape(-1, t.dtype.itemsize), t.dtype
                )
            outs.append(raw.reshape(t.shape))
        sizes_bytes = sizes.astype(_I32)

    if checksum and not bool(jnp.all(cs_ok)):
        bad = np.nonzero(~np.asarray(jax.device_get(cs_ok)))[0].tolist()
        raise ValueError(f"checksum mismatch in batch elements {bad}")
    temp_mem = ans_decode_mod.decode_scratch_bytes(int(caps.max()), B)
    return outs, ok.astype(jnp.uint8), sizes_bytes, temp_mem


def decompress_data_simple(
    compress_as_float: bool,
    ts_in: Sequence[jax.Array],
    checksum: bool = False,
):
    """Size-discovery tier: reads archive headers (host sync), allocates
    exact outputs, then decompresses (DietGpu.cpp:821-911)."""
    infos = get_compressed_info(compress_as_float, ts_in)
    outs_spec = []
    for info in infos:
        if compress_as_float:
            dt = _DTYPE_BY_FLOAT_TYPE[info["float_type"]]
            outs_spec.append(jnp.zeros(info["size"], dt))
        else:
            outs_spec.append(jnp.zeros(info["total_uncompressed_words"], jnp.uint8))
    # prob_bits is self-described by the (embedded) ANS header — the
    # reference never asks the caller for it on decode (GpuANSDecode.cuh:323)
    prob_bits = infos[0]["prob_bits"]
    outs, status, sizes, _ = decompress_data(
        compress_as_float, ts_in, outs_spec, checksum, prob_bits,
        _static_sizes=True,
    )
    if not bool(jnp.all(status.astype(bool))):
        raise ValueError("decompression failed")
    return outs


def decompress_data_split_size(
    compress_as_float: bool,
    ts_in: Sequence[jax.Array],
    t_out: jax.Array,
    split_sizes: Sequence[int],
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Decompress a batch into consecutive splits of one flat output.

    Interior split boundaries must keep the 4-byte alignment the compress
    side enforces (mirrors GpuANSEncode.cu:131-148 / GpuANSDecode.cu)."""
    split_sizes = [int(s) for s in split_sizes]
    if sum(split_sizes) != t_out.size:
        raise ValueError("split sizes must sum to the output size")
    word = t_out.dtype.itemsize
    off = 0
    for s in split_sizes[:-1]:
        off += s * word
        if off % C.ANS_REQUIRED_ALIGNMENT != 0:
            raise ValueError(
                "interior split boundaries must be 4-byte aligned "
                f"(offset {off})"
            )
    pieces = []
    off = 0
    flat = t_out.reshape(-1)
    for s in split_sizes:
        pieces.append(jax.lax.dynamic_slice(flat, (off,), (s,)))
        off += s
    outs, status, sizes, tm = decompress_data(
        compress_as_float, ts_in, pieces, checksum, prob_bits
    )
    return jnp.concatenate([o.reshape(-1) for o in outs]), status, sizes, tm


# ---------------------------------------------------------------------------
# archive info
# ---------------------------------------------------------------------------


def get_compressed_info_device(
    compress_as_float: bool, archives: jax.Array
) -> dict[str, jax.Array]:
    """Device-side (jittable, no host sync) archive info — the analogue of
    ansGetCompressedInfoDevice / floatGetCompressedInfoDevice
    (GpuANSInfo.cuh:16-37, GpuFloatInfo.cuh:18-41).

    `archives` is a (B, >=32) u8 matrix, one archive per row (only the
    header bytes are read). Returns device arrays:
      float: {size (words), float_type, checksum, valid}
      ans:   {size (words=bytes), prob_bits, checksum, valid}
    """
    if archives.ndim != 2 or archives.dtype != jnp.uint8:
        raise ValueError("expects a (B, bytes) u8 archive matrix")
    h = jax.lax.bitcast_convert_type(
        archives[:, :32].reshape(-1, 8, 4), jnp.uint32
    )
    if compress_as_float:
        valid = h[:, 0] == jnp.uint32(
            (C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION
        )
        return {
            "size": h[:, 1],
            "float_type": h[:, 2] & jnp.uint32(0xF),
            "checksum": h[:, 3],
            "valid": valid,
        }
    valid = h[:, 0] == jnp.uint32((C.ANS_MAGIC << 16) | C.ANS_VERSION)
    return {
        "size": h[:, 2],
        "prob_bits": h[:, 4] & jnp.uint32(0xF),
        "checksum": h[:, 5],
        "valid": valid,
    }


def get_compressed_info(compress_as_float: bool, ts_in: Sequence[jax.Array]):
    """Parse archive headers (host-side). Returns a list of dicts.

    Only the 32 header bytes of each archive travel device-to-host, in ONE
    batched sync for the whole batch (two for float archives, whose embedded
    ANS header sits at a header-dependent offset) — the analogue of the
    reference's single d2h of the info arrays (DietGpu.cpp:821-911), not a
    per-member full-archive readback.
    """
    bufs = [_as_u8(t).reshape(-1) for t in ts_in]
    if any(b.size < 32 for b in bufs):
        raise ValueError("archive too small to hold a header")
    heads = np.asarray(jax.device_get(jnp.stack([b[:32] for b in bufs])))
    if not compress_as_float:
        return [ans_ref.parse_header(h) for h in heads]
    infos = [float_ref.parse_float_header(h) for h in heads]
    # the embedded ANS archive self-describes its probBits
    # (GpuANSUtils.cuh:205-206); surface it so the _simple tier decodes
    # pb-9/11 float archives without caller hints. Its offset (ans_start)
    # depends on the float header, hence the second batched fetch.
    ans_heads = np.asarray(
        jax.device_get(
            jnp.stack(
                [
                    jax.lax.dynamic_slice(b, (info["ans_start"],), (32,))
                    for b, info in zip(bufs, infos)
                ]
            )
        )
    )
    for info, ah in zip(infos, ans_heads):
        info["prob_bits"] = ans_ref.parse_header(ah)["prob_bits"]
    return infos
