"""rANS encoder (JAX, jittable, any backend).

TPU-native rethink of the reference encode pipeline
(GpuANSEncode.cuh:674-849): the warp-synchronous interleaved state machines
become a `lax.scan` over 128 steps carrying a (num_blocks, 32) u32 state
matrix; warp ballot/popc stream compaction becomes a per-block cumsum; the
scratch+coalesce two-phase variable-length assembly becomes scatter + gather
with dynamic_update_slice section writes.

Static shapes: input is padded to a multiple of the 4096-byte block size; the
archive buffer has static size overhead(NB) + NB*5120 for NB = L/4096 blocks.
"""

import jax
import jax.numpy as jnp

from .. import constants as C
from . import layout
from . import stats
from .checksum import checksum_u8

_U32 = jnp.uint32
_I32 = jnp.int32


def archive_buffer_bytes(padded_len: int) -> int:
    """Static archive buffer size for inputs padded to `padded_len` bytes."""
    assert padded_len % C.DEFAULT_BLOCK_SIZE == 0 and padded_len > 0
    nb = padded_len // C.DEFAULT_BLOCK_SIZE
    return C.compressed_overhead(nb) + nb * C.raw_comp_block_max_size(
        C.DEFAULT_BLOCK_SIZE
    )


def encode_scratch_bytes(max_size: int, num_in_batch: int = 1) -> int:
    """Device scratch accounting, mirroring the reference's StackDeviceMemory
    reservations during ansEncodeBatchDevice (GpuANSEncode.cuh:690-738) with
    its 256-byte allocation granularity (StackDeviceMemory.h:24).

    Returned for API parity ("temp memory used"); XLA manages actual scratch.
    """

    def align(x):
        return C.round_up(x, 256)

    max_blocks = C.div_up(max_size, C.DEFAULT_BLOCK_SIZE)
    stride = 4 * C.NUM_INTERLEAVED + C.raw_comp_block_max_size(
        C.DEFAULT_BLOCK_SIZE
    )
    total = align(num_in_batch * C.NUM_SYMBOLS * 16)  # uint4 tables
    total += align(num_in_batch * C.NUM_SYMBOLS * 4)  # histograms
    total += align(num_in_batch * 4)  # checksums
    total += align(num_in_batch * max_blocks * stride)  # uncoalesced blocks
    total += 2 * align(num_in_batch * max_blocks * 4)  # words + prefix
    return total


def _encode_core(data, length, prob_bits, pdf):
    """Run the interleaved encoders. Returns (states, vals, mask)."""
    L = data.shape[0]
    NB = L // C.DEFAULT_BLOCK_SIZE
    S, W = C.STEPS_PER_BLOCK, C.NUM_INTERLEAVED

    e1, magic_tab = stats.build_encode_table(pdf)

    syms = data.astype(_I32).reshape(NB, S, W).transpose(1, 0, 2)
    valid = (
        (jnp.arange(L, dtype=_I32) < jnp.asarray(length, _I32))
        .reshape(NB, S, W)
        .transpose(1, 0, 2)
    )

    check_shift = _U32(C.ANS_STATE_BITS - prob_bits)

    def step(state, xs):
        sym, v = xs
        e1v = jnp.take(e1, sym)
        magic = jnp.take(magic_tab, sym)
        cdf = e1v & _U32(0xFFF)
        pdf_s = (e1v >> _U32(12)) & _U32(0xFFF)
        shift = e1v >> _U32(24)

        write = v & (state >= (pdf_s << check_shift))
        out_val = jnp.where(write, state & _U32(0xFFFF), _U32(0))
        state = jnp.where(write, state >> _U32(C.ANS_ENCODED_BITS), state)

        t = stats.umulhi_u32(state, magic)
        div = (t + state) >> shift
        mod = state - div * pdf_s
        new_state = (div << _U32(prob_bits)) + mod + cdf
        state = jnp.where(v, new_state, state)
        return state, (out_val, write)

    init = jnp.full((NB, W), C.ANS_START_STATE, dtype=_U32)
    states, (vals, mask) = jax.lax.scan(step, init, (syms, valid))
    return states, vals.transpose(1, 0, 2), mask.transpose(1, 0, 2)


def ans_encode_padded_with_pdf(data, length, prob_bits, pdf, use_checksum=False):
    """Encode with an externally-supplied quantized probability table.

    Used by the distributed layer to encode all shards of one logical tensor
    with a single shared table (derived from a psum'd histogram)."""
    return ans_encode_padded(
        data, length, prob_bits, use_checksum, precomputed_pdf=pdf
    )


def ans_encode_padded(
    data: jnp.ndarray,
    length,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
    precomputed_histogram=None,
    precomputed_pdf=None,
):
    """Compress data[:length] into a coalesced ANS archive.

    Args:
      data: (L,) u8 with L a positive multiple of 4096 (static).
      length: dynamic actual byte count, 0 <= length <= L.
      prob_bits: static, one of 9/10/11.
      use_checksum: static flag.
      precomputed_histogram: optional (256,) u32 histogram of data[:length]
        (the float codec passes the one fused into its split step).

    Returns:
      (archive u8 (A,), size u32) where A = archive_buffer_bytes(L); `size`
      is the real archive byte count; bytes in [0, size) are the archive.
    """
    assert prob_bits in C.SUPPORTED_PROB_BITS
    assert data.dtype == jnp.uint8
    L = data.shape[0]
    NB = L // C.DEFAULT_BLOCK_SIZE
    MW = C.MAX_COMP_WORDS_PER_BLOCK
    length = jnp.asarray(length, _I32)
    nb = (length + C.DEFAULT_BLOCK_SIZE - 1) // C.DEFAULT_BLOCK_SIZE

    if precomputed_pdf is not None:
        pdf = precomputed_pdf.astype(_U32)
    else:
        hist = (
            precomputed_histogram
            if precomputed_histogram is not None
            else stats.histogram_u8(data, length)
        )
        pdf = stats.normalize_probs(hist, length.astype(_U32), prob_bits)

    states, vals, mask = _encode_core(data, length, prob_bits, pdf)

    # --- per-block stream compaction (ballot/popc -> cumsum + scatter) ---
    flat_vals = vals.reshape(NB, C.DEFAULT_BLOCK_SIZE)
    flat_mask = mask.reshape(NB, C.DEFAULT_BLOCK_SIZE)
    words = flat_mask.sum(axis=1).astype(_I32)
    dst = jnp.cumsum(flat_mask.astype(_I32), axis=1) - 1
    rows = jnp.broadcast_to(jnp.arange(NB, dtype=_I32)[:, None], dst.shape)
    cols = jnp.where(flat_mask, dst, MW)
    compacted = (
        jnp.zeros((NB, MW + 1), _U32).at[rows, cols].set(flat_vals)[:, :MW]
    )
    return assemble_archive(
        L, pdf, states, words, compacted, length, nb, prob_bits, use_checksum,
        data=data, overflow=jnp.any(words > MW),
    )


def assemble_archive(
    L: int,
    pdf,
    states,
    words,
    compacted,
    length,
    nb,
    prob_bits: int,
    use_checksum: bool,
    data=None,
    checksum=None,
    overflow=None,
):
    """Assemble the coalesced archive from per-block encoder results.

    Shared epilogue for the XLA and Pallas encoders. `states` is (NB, 32)
    u32 final lane states, `words` (NB,) i32 per-block compressed word
    counts, `compacted` (NB, MW) u32-held-u16 dense streams. A true
    `overflow` flag (block payload > MAX_COMP_WORDS_PER_BLOCK; the reference
    device-asserts, GpuANSEncode.cuh:355-360) sets SIZE_OVERFLOW_BIT in the
    returned size — the archive is invalid in that case.
    """
    NB = L // C.DEFAULT_BLOCK_SIZE
    MW = C.MAX_COMP_WORDS_PER_BLOCK
    length = jnp.asarray(length, _I32)

    words_padded = C.round_up(words, C.WORDS_PER_ALIGN)
    prefix = jnp.concatenate(
        [jnp.zeros(1, _I32), jnp.cumsum(words_padded)[:-1]]
    )
    total_words = words_padded.sum()

    # --- archive assembly (u32 words, little-endian) ---
    if checksum is None:
        checksum = (
            checksum_u8(data, length) if use_checksum else _U32(0)
        )
    options = _U32(prob_bits | (int(use_checksum) << 4))
    header = jnp.array(
        [(C.ANS_MAGIC << 16) | C.ANS_VERSION, 0, 0, 0, 0, 0, 0, 0], _U32
    )
    header = header.at[1].set(nb.astype(_U32))
    header = header.at[2].set(length.astype(_U32))
    header = header.at[3].set(total_words.astype(_U32))
    header = header.at[4].set(options)
    header = header.at[5].set(checksum)

    probs32 = pdf[0::2] | (pdf[1::2] << _U32(16))

    # blockWords (x, y) pairs, zero for blocks >= nb
    bidx = jnp.arange(NB, dtype=_I32)
    tail = length - (nb - 1) * C.DEFAULT_BLOCK_SIZE
    uncomp = jnp.where(
        bidx == nb - 1, tail, _I32(C.DEFAULT_BLOCK_SIZE)
    )
    live = bidx < nb
    bw_x = jnp.where(
        live, (uncomp.astype(_U32) << _U32(16)) | words.astype(_U32), _U32(0)
    )
    bw_y = jnp.where(live, prefix.astype(_U32), _U32(0))
    RNB2 = C.round_up(NB, 2)
    bw = jnp.zeros((RNB2, 2), _U32)
    bw = bw.at[:NB, 0].set(bw_x).at[:NB, 1].set(bw_y)
    bw_flat = bw.reshape(-1)

    # payload: pack compacted u16 streams to u32 and lay out at per-block
    # aligned prefixes via one gather
    pay32_blocks = compacted[:, 0::2] | (compacted[:, 1::2] << _U32(16))  # (NB, MW/2)
    prefix32 = prefix // 2
    ends32 = jnp.cumsum(words_padded // 2)
    w_pos = jnp.arange(NB * (MW // 2), dtype=_I32)
    blk = jnp.searchsorted(ends32, w_pos, side="right").astype(_I32)
    blk_c = jnp.minimum(blk, NB - 1)
    off = w_pos - prefix32[blk_c]
    flat_src = blk_c * (MW // 2) + jnp.clip(off, 0, MW // 2 - 1)
    payload32 = jnp.where(
        w_pos < total_words // 2, jnp.take(pay32_blocks.reshape(-1), flat_src), _U32(0)
    )

    # --- section writes ---
    A32 = archive_buffer_bytes(L) // 4
    buf = jnp.zeros(A32, _U32)
    buf = jax.lax.dynamic_update_slice(buf, header, (0,))
    buf = jax.lax.dynamic_update_slice(buf, probs32, (8,))
    buf = jax.lax.dynamic_update_slice(
        buf, states.reshape(-1), (136,)
    )
    bw_start = 136 + nb * C.NUM_INTERLEAVED
    buf = jax.lax.dynamic_update_slice(buf, bw_flat, (bw_start,))
    rnb2 = nb + (nb & 1)
    data_start = bw_start + rnb2 * 2
    buf = jax.lax.dynamic_update_slice(buf, payload32, (data_start,))

    archive = layout.u32_to_u8le(buf)
    size = (data_start + total_words // 2).astype(_U32) * 4
    if overflow is not None:
        size = jnp.where(overflow, size | _U32(C.SIZE_OVERFLOW_BIT), size)
    return archive, size
