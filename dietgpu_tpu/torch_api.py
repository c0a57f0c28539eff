"""PyTorch tensor front-end for the dietTPU codec.

Drop-in analogue of the reference's ``torch.ops.dietgpu.*`` custom ops
(/root/reference/dietgpu/DietGpu.cpp:915-972): the same ten-operation
surface, taking and returning ``torch.Tensor``s, backed by the JAX batch
API (``dietgpu_tpu.api``) — which routes to the Pallas kernels on TPU and
the XLA path elsewhere. Torch tensors here live on host; the adapter moves
bytes across the torch<->JAX boundary via zero-copy NumPy views (bf16 via
``ml_dtypes``).

Contract differences from the reference, by design:
  * no CUDA stream / temp-mem tensor arguments — XLA owns scratch; the
    reported ``temp_mem_used`` mirrors the device-path accounting;
  * ``decompress_data[_split_size]`` still *writes into* ``ts_out`` /
    ``t_out`` in place (torch tensors are mutable) and returns
    (status, sizes, temp_mem_used) instead of out-parameter tensors.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
import ml_dtypes
import torch

from . import api
from . import constants as C

_TORCH_TO_NP = {
    torch.float16: np.dtype(np.float16),
    torch.bfloat16: np.dtype(ml_dtypes.bfloat16),
    torch.float32: np.dtype(np.float32),
    torch.uint8: np.dtype(np.uint8),
    torch.int8: np.dtype(np.int8),
    torch.int16: np.dtype(np.int16),
    torch.int32: np.dtype(np.int32),
    torch.int64: np.dtype(np.int64),
}

_NP_TO_TORCH = {
    "float16": torch.float16,
    "bfloat16": torch.bfloat16,
    "float32": torch.float32,
    "uint8": torch.uint8,
}


def _to_numpy(t: torch.Tensor) -> np.ndarray:
    """Zero-copy (where possible) torch -> numpy, bf16 via a bit view."""
    if not isinstance(t, torch.Tensor):
        raise TypeError(f"expected torch.Tensor, got {type(t)}")
    t = t.detach().contiguous().cpu()
    if t.dtype == torch.bfloat16:
        return t.view(torch.int16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def _to_jax(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(_to_numpy(t))


def _to_torch(a) -> torch.Tensor:
    arr = np.asarray(a)
    if arr.dtype == ml_dtypes.bfloat16:
        return torch.from_numpy(arr.view(np.int16).copy()).view(torch.bfloat16)
    return torch.from_numpy(arr.copy())


def _copy_into(dst: torch.Tensor, src) -> None:
    arr = np.asarray(src)
    if dst.dtype == torch.bfloat16:
        dst.view(torch.int16).copy_(
            torch.from_numpy(arr.view(np.int16).copy()).reshape(dst.shape)
        )
    else:
        dst.copy_(torch.from_numpy(arr.copy()).reshape(dst.shape))


# ---------------------------------------------------------------------------
# size queries (DietGpu.cpp max_* ops)
# ---------------------------------------------------------------------------


def max_any_compressed_size(nbytes: int) -> int:
    return api.max_any_compressed_size(nbytes)


def max_float_compressed_size(dtype: torch.dtype, size: int) -> int:
    return api.max_float_compressed_size(_TORCH_TO_NP[dtype], size)


def max_any_compressed_output_size(ts: Sequence[torch.Tensor]):
    nbytes = max(t.numel() * t.element_size() for t in ts)
    return api.max_any_compressed_size(nbytes), len(ts)


def max_float_compressed_output_size(ts: Sequence[torch.Tensor]):
    sz = max(
        api.max_float_compressed_size(_TORCH_TO_NP[t.dtype], t.numel())
        for t in ts
    )
    return sz, len(ts)


# ---------------------------------------------------------------------------
# compress
# ---------------------------------------------------------------------------


def compress_data(
    compress_as_float: bool,
    ts_in: Sequence[torch.Tensor],
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Compress a batch. Returns (comp u8 (B, bufsize) tensor, sizes i32
    tensor, temp_mem_used int); row b's archive is comp[b, :sizes[b]]
    (reference: DietGpu.cpp:149-308)."""
    comp, sizes, tm = api.compress_data(
        compress_as_float, [_to_jax(t) for t in ts_in], checksum, prob_bits
    )
    return _to_torch(comp), _to_torch(sizes).to(torch.int32), tm


def compress_data_split_size(
    compress_as_float: bool,
    t_in: torch.Tensor,
    split_sizes: Sequence[int] | torch.Tensor,
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Compress consecutive splits of one flat tensor (DietGpu.cpp:310-460).
    Interior split starts must be 4-byte aligned."""
    if isinstance(split_sizes, torch.Tensor):
        split_sizes = split_sizes.tolist()
    comp, sizes, tm = api.compress_data_split_size(
        compress_as_float, _to_jax(t_in), split_sizes, checksum, prob_bits
    )
    return _to_torch(comp), _to_torch(sizes).to(torch.int32), tm


def compress_data_simple(
    compress_as_float: bool,
    ts_in: Sequence[torch.Tensor],
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Convenience tier: exact-size archive tensors (DietGpu.cpp:462-522)."""
    outs = api.compress_data_simple(
        compress_as_float, [_to_jax(t) for t in ts_in], checksum, prob_bits
    )
    return [_to_torch(o) for o in outs]


# ---------------------------------------------------------------------------
# decompress
# ---------------------------------------------------------------------------


def decompress_data(
    compress_as_float: bool,
    ts_in: Sequence[torch.Tensor],
    ts_out: Sequence[torch.Tensor],
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Decompress archives INTO ts_out (in place). Returns (status u8
    tensor, sizes i32 tensor, temp_mem_used). status[b]=0 with the required
    byte count in sizes[b] when ts_out[b] is too small; checksum mismatch
    raises (DietGpu.cpp:530-677)."""
    specs = [jnp.zeros(tuple(t.shape), _TORCH_TO_NP[t.dtype]) for t in ts_out]
    outs, status, sizes, tm = api.decompress_data(
        compress_as_float, [_to_jax(t) for t in ts_in], specs, checksum,
        prob_bits,
    )
    status_h = np.asarray(status)
    for i, (dst, src) in enumerate(zip(ts_out, outs)):
        if status_h[i]:
            _copy_into(dst, src)
    return (
        torch.from_numpy(status_h.copy()),
        _to_torch(sizes).to(torch.int32),
        tm,
    )


def decompress_data_split_size(
    compress_as_float: bool,
    ts_in: Sequence[torch.Tensor],
    t_out: torch.Tensor,
    split_sizes: Sequence[int] | torch.Tensor,
    checksum: bool = False,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Decompress a batch into consecutive splits of t_out (in place);
    reference: DietGpu.cpp:679-819."""
    if isinstance(split_sizes, torch.Tensor):
        split_sizes = split_sizes.tolist()
    spec = jnp.zeros(t_out.numel(), _TORCH_TO_NP[t_out.dtype])
    flat, status, sizes, tm = api.decompress_data_split_size(
        compress_as_float, [_to_jax(t) for t in ts_in], spec, split_sizes,
        checksum, prob_bits,
    )
    if bool(np.asarray(status).all()):
        _copy_into(t_out, np.asarray(flat).reshape(-1)[: t_out.numel()])
    return (
        torch.from_numpy(np.asarray(status).copy()),
        _to_torch(sizes).to(torch.int32),
        tm,
    )


def decompress_data_simple(
    compress_as_float: bool,
    ts_in: Sequence[torch.Tensor],
    checksum: bool = False,
):
    """Size-discovery tier: allocates exact outputs from the archive headers
    and decompresses (DietGpu.cpp:821-911)."""
    outs = api.decompress_data_simple(
        compress_as_float, [_to_jax(t) for t in ts_in], checksum
    )
    return [_to_torch(o) for o in outs]
