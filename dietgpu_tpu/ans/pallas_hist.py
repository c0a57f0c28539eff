"""Pallas TPU exact 256-bin byte histogram on the MXU.

TPU-native equivalent of the reference's occupancy-sized histogramBatch
(GpuANSStatistics.cuh:21-143). A TPU has no fast scatter, so per-byte bin
increments are reformulated as matmuls: for each 8-row chunk of a byte
plane, build stacked nibble one-hots

    A[16*rho + h, lane] = [hi(byte[rho, lane]) == h]
    B[16*rho + v, lane] = [lo(byte[rho, lane]) == v]

and compute C = A @ B^T on the MXU. The block-diagonal (rho == rho') 16x16
blocks of C are exactly the joint (hi, lo) counts of the chunk — i.e. the
256-bin histogram, since byte = (hi << 4) | lo. Off-diagonal blocks pair
different rows and are masked after accumulation. Per-tile counts stay
below 2^24 so f32 accumulation is exact; cross-tile accumulation is i32.

The same routine is reused by the float split kernels (fused exponent
histogram, splitFloat analogue GpuFloatCompress.cuh:280-365).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C

_I32 = jnp.int32
_U32 = jnp.uint32

HIST_TILE = 512  # u32 rows per grid step (256 KiB of bytes)


def _srl(x, s):
    return jax.lax.shift_right_logical(x, s)


def hist_chunk_counts(byte_rows):
    """(R,128) i32 byte values (0..255, R % 8 == 0) -> (16,128) f32 counts.

    Returns the per-rho-slot joint counts: out[h, 16*rho + v] = number of
    bytes in sublane slot rho (mod 8) with hi nibble h and lo nibble v.
    Callers fold the 8 rho slots: hist256[(h<<4)|v] = sum_rho out[h, 16rho+v].
    Pure jnp — usable inside any Pallas kernel (or interpreted).
    """
    R = byte_rows.shape[0]
    assert R % 8 == 0
    hi = _srl(byte_rows, 4)
    lo = byte_rows & 15
    # one-hot row pattern: row 16*rho + j compares against nibble value j
    jpat = jax.lax.broadcasted_iota(_I32, (128, 128), 0) & 15
    rmask = (
        jax.lax.broadcasted_iota(_I32, (128, 128), 0) >> 4
        == jax.lax.broadcasted_iota(_I32, (128, 128), 1) >> 4
    )
    cacc = jnp.zeros((128, 128), jnp.float32)
    for c in range(R // 8):
        h8 = jax.lax.slice(hi, (8 * c, 0), (8 * c + 8, 128))
        l8 = jax.lax.slice(lo, (8 * c, 0), (8 * c + 8, 128))
        xh = jnp.broadcast_to(
            h8.reshape(8, 1, 128), (8, 16, 128)
        ).reshape(128, 128)
        xl = jnp.broadcast_to(
            l8.reshape(8, 1, 128), (8, 16, 128)
        ).reshape(128, 128)
        # bool -> bf16 convert (a bf16-operand select would need an i1
        # (8,128)->(16,128) mask relayout Mosaic can't do)
        a = (xh == jpat).astype(jnp.bfloat16)
        b = (xl == jpat).astype(jnp.bfloat16)
        cacc = cacc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    masked = jnp.where(rmask, cacc, 0.0)
    return masked.reshape(8, 16, 128).sum(axis=0)


def fold_hist(counts16: jnp.ndarray) -> jnp.ndarray:
    """(16,128) rho-slotted counts -> (256,) histogram (XLA epilogue)."""
    folded = counts16.reshape(16, 8, 16).sum(axis=1)  # (h, v)
    return folded.reshape(256)


def _hist_kernel(R: int, with_checksum: bool, len_ref, in_ref, *out_refs):
    """in (R,128) u32 (4 packed bytes each) -> accumulated (16,128) i32.

    Bytes at index >= len_ref[0] are masked to symbol 0 in-kernel (the host
    epilogue subtracts the pad count from bin 0), so callers need not zero
    their padding.

    With with_checksum, a second (8,128) i32 output accumulates the XOR of
    the length-masked words — the raw-ANS analogue of the float split
    kernels' fused checksum (GpuChecksum.cuh:27-93 fused like
    GpuFloatCompress.cuh:461-468), so `use_checksum=True` costs no extra
    HBM pass over the input.
    """
    if with_checksum:
        out_ref, cks_ref = out_refs
    else:
        (out_ref,) = out_refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros((16, 128), _I32)
        if with_checksum:
            cks_ref[:] = jnp.zeros((8, 128), _I32)

    x = in_ref[:]
    length = len_ref[0]
    pos4 = (
        (i * R + jax.lax.broadcasted_iota(_I32, (R, 128), 0)) * 128
        + jax.lax.broadcasted_iota(_I32, (R, 128), 1)
    ) * 4
    acc = jnp.zeros((16, 128), jnp.float32)
    for b in range(4):
        plane = _srl(x, 8 * b) & 0xFF
        plane = jnp.where(pos4 + b < length, plane, 0)
        acc = acc + hist_chunk_counts(plane)
    out_ref[:] = out_ref[:] + acc.astype(_I32)

    if with_checksum:
        # length-mask whole words: keep rem=clip(length-pos4,0,4) low bytes
        rem = length - pos4
        msk = (1 << (jnp.clip(rem, 0, 3) << 3)) - 1
        w = jnp.where(rem >= 4, x, x & msk)
        s = w.reshape(R // 8, 8, 128)
        cacc = s[0]
        for k in range(1, R // 8):
            cacc = cacc ^ s[k]
        cks_ref[:] = cks_ref[:] ^ cacc


@functools.lru_cache(maxsize=None)
def _build_hist_call(RP: int, with_checksum: bool = False):
    grid = RP // HIST_TILE
    kernel = functools.partial(_hist_kernel, HIST_TILE, with_checksum)
    out_shape = [jax.ShapeDtypeStruct((16, 128), _I32)]
    out_specs = [
        pl.BlockSpec((16, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    ]
    if with_checksum:
        out_shape.append(jax.ShapeDtypeStruct((8, 128), _I32))
        out_specs.append(
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (HIST_TILE, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=tuple(out_specs),
    )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
    )


def histogram_u8_pallas(data32: jnp.ndarray, length, with_checksum=False):
    """Exact 256-bin histogram of the first `length` bytes of a packed
    little-endian u32 byte stream (tail bytes may hold anything; they are
    counted as zeros in-kernel and removed from bin 0 here).

    Returns (256,) u32 counts, or (counts, checksum u32) with
    with_checksum (the folded 8-bit XOR checksum of the same bytes,
    accumulated in the same kernel pass).
    """
    n4 = data32.shape[0]
    RP = C.round_up(max(C.div_up(n4, 128), HIST_TILE), HIST_TILE)
    x = jnp.zeros(RP * 128, _I32).at[:n4].set(data32.astype(_I32))
    call = _build_hist_call(RP, with_checksum)
    lvec = jnp.asarray(length, _I32).reshape(1)
    out = call(lvec, x.reshape(RP, 128))
    hist = fold_hist(out[0]).astype(_U32)
    pad = _U32(RP * 512) - jnp.asarray(length, _I32).astype(_U32)
    hist = hist.at[0].add(-pad)
    if with_checksum:
        from .checksum import _fold8

        acc = jax.lax.reduce(
            out[1].astype(_U32), _U32(0), jax.lax.bitwise_xor, (0, 1)
        )
        return hist, _fold8(acc)
    return hist
