"""rANS decoder (JAX, jittable, any backend).

TPU-native rethink of the reference decode pipeline
(GpuANSDecode.cuh:305-476): the decode LUT becomes a packed u32 table built
with a searchsorted over the archive pdf; the warp-per-block loop becomes a
reverse `lax.scan` over 128 steps carrying (num_blocks, 32) states and
per-block stream positions; the backwards ballot/popc stream reads become a
reversed cumsum plus a per-lane gather.
"""

import jax
import jax.numpy as jnp

from .. import constants as C
from .checksum import checksum_u8

_U32 = jnp.uint32
_I32 = jnp.int32


def decode_scratch_bytes(max_size: int, num_in_batch: int = 1) -> int:
    """Device scratch accounting for decode, mirroring the reference's
    StackDeviceMemory reservations during ansDecodeBatch
    (GpuANSDecode.cuh:484-504: the per-batch 2^probBits u32 LUT table) plus
    the checksum staging arrays (GpuANSDecode.cuh:556-575), at the 256-byte
    allocation granularity (StackDeviceMemory.h:24).

    Returned for API parity ("temp memory used"); XLA manages actual scratch.
    """

    def align(x):
        return C.round_up(x, 256)

    table_bytes = 4 * (1 << 11)  # worst-case probBits=11 table per element
    total = align(num_in_batch * table_bytes)
    total += 2 * align(num_in_batch * 4)  # checksum + archive-checksum vecs
    return total


def _bytes_to_u32(arc: jnp.ndarray) -> jnp.ndarray:
    """Little-endian u8 (4n,) -> u32 (n,)."""
    b = arc.reshape(-1, 4).astype(_U32)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def build_decode_lut(pdf: jnp.ndarray, prob_bits: int) -> jnp.ndarray:
    """Packed decode LUT: (sminus << 20) | (pdf << 8) | sym, size 2^prob_bits.

    Layout matches the reference TableT packing (GpuANSDecode.cuh:34-41).
    """
    K = 1 << prob_bits
    incl = jnp.cumsum(pdf.astype(_U32))
    slots = jnp.arange(K, dtype=_U32)
    sym = jnp.searchsorted(incl, slots, side="right").astype(_U32)
    sym = jnp.minimum(sym, _U32(C.NUM_SYMBOLS - 1))
    pdf_of = jnp.take(pdf, sym).astype(_U32)
    cdf_of = jnp.take(incl, sym) - pdf_of
    sminus = slots - cdf_of
    return (sminus << _U32(20)) | (pdf_of << _U32(8)) | sym


def ans_decode_padded(
    archive: jnp.ndarray,
    prob_bits: int,
    out_max: int,
    verify_checksum: bool = False,
):
    """Decode an archive buffer.

    Args:
      archive: (A,) u8 with A % 4 == 0; bytes past the real archive ignored.
      prob_bits: static; must match the archive's (as in the reference API,
        GpuANSDecode.cuh:323).
      out_max: static output capacity in bytes, a positive multiple of 4096.
      verify_checksum: static; when True and the archive carries a checksum,
        recompute and compare.

    Returns dict with:
      out: (out_max,) u8 (bytes past `size` are zero)
      size: u32 uncompressed byte count from the header
      success: bool — header ok, prob_bits match, capacity sufficient
      checksum_ok: bool — False only on a verified-mismatch
    """
    assert archive.dtype == jnp.uint8
    assert out_max % C.DEFAULT_BLOCK_SIZE == 0 and out_max > 0
    NB = out_max // C.DEFAULT_BLOCK_SIZE
    S, W = C.STEPS_PER_BLOCK, C.NUM_INTERLEAVED
    MW = C.MAX_COMP_WORDS_PER_BLOCK
    K = 1 << prob_bits

    arc32 = _bytes_to_u32(archive)
    A32 = arc32.shape[0]

    h = arc32[:8]
    magic_ok = h[0] == _U32((C.ANS_MAGIC << 16) | C.ANS_VERSION)
    nb = h[1].astype(_I32)
    n = h[2].astype(_I32)
    options = h[4]
    pb_ok = (options & _U32(0xF)) == _U32(prob_bits)
    has_checksum = (options & _U32(0x10)) != 0
    stored_checksum = h[5]

    capacity_ok = n <= _I32(out_max)
    success = magic_ok & pb_ok & capacity_ok
    nb_eff = jnp.clip(nb, 0, NB)

    # --- probs + decode LUT ---
    pw = arc32[8:136]
    pdf = jnp.zeros(C.NUM_SYMBOLS, _U32)
    pdf = pdf.at[0::2].set(pw & _U32(0xFFFF)).at[1::2].set(pw >> _U32(16))
    lut = build_decode_lut(pdf, prob_bits)

    # --- per-block metadata ---
    states = jax.lax.dynamic_slice(arc32, (136,), (min(NB * W, A32 - 136),))
    if states.shape[0] < NB * W:
        states = jnp.concatenate(
            [states, jnp.zeros(NB * W - states.shape[0], _U32)]
        )
    states = states.reshape(NB, W)

    bidx = jnp.arange(NB, dtype=_I32)
    bw_start = 136 + nb_eff * W
    x_idx = jnp.clip(bw_start + 2 * bidx, 0, A32 - 1)
    y_idx = jnp.clip(bw_start + 2 * bidx + 1, 0, A32 - 1)
    live = bidx < nb_eff
    bw_x = jnp.where(live, jnp.take(arc32, x_idx), _U32(0))
    bw_y = jnp.where(live, jnp.take(arc32, y_idx), _U32(0))
    uncomp = (bw_x >> _U32(16)).astype(_I32)
    cwords = (bw_x & _U32(0xFFFF)).astype(_I32)
    starts = bw_y.astype(_I32)

    rnb2 = nb_eff + (nb_eff & 1)
    data_start = bw_start + rnb2 * 2

    # --- stage per-block streams densely: (NB, MW) u16 held as u32 ---
    cols32 = jnp.arange(MW // 2, dtype=_I32)
    sidx = jnp.clip(
        data_start + (starts[:, None] + 2 * cols32[None, :]) // 2, 0, A32 - 1
    )
    s32 = jnp.take(arc32, sidx)  # (NB, MW/2)
    streams = jnp.zeros((NB, MW), _U32)
    streams = (
        streams.at[:, 0::2].set(s32 & _U32(0xFFFF)).at[:, 1::2].set(s32 >> _U32(16))
    )

    # --- reverse scan over decode steps ---
    steps = (uncomp + W - 1) // W
    remainder = uncomp % W
    lanes = jnp.arange(W, dtype=_I32)
    state_mask = _U32(K - 1)

    def step(carry, k):
        state, pos = carry
        active = k < steps
        is_tail = active & (k == steps - 1) & (remainder > 0)
        lane_limit = jnp.where(is_tail, remainder, W)
        act = active[:, None] & (lanes[None, :] < lane_limit[:, None])

        s_bar = (state & state_mask).astype(_I32)
        t = jnp.take(lut, s_bar)
        sym = t & _U32(0xFF)
        pdf_s = (t >> _U32(8)) & _U32(0xFFF)
        sminus = t >> _U32(20)
        new_state = pdf_s * (state >> _U32(prob_bits)) + sminus
        state = jnp.where(act, new_state, state)

        read = act & (state < _U32(C.ANS_MIN_STATE))
        rank = jnp.cumsum(read[:, ::-1].astype(_I32), axis=1)[:, ::-1]
        ridx = jnp.clip(pos[:, None] - rank, 0, MW - 1)
        v = jnp.take_along_axis(streams, ridx, axis=1)
        state = jnp.where(read, (state << _U32(C.ANS_ENCODED_BITS)) + v, state)
        pos = pos - read.sum(axis=1)

        out_row = jnp.where(act, sym, _U32(0)).astype(jnp.uint8)
        return (state, pos), out_row

    init = (states, cwords)
    _, out_steps = jax.lax.scan(
        step, init, jnp.arange(S, dtype=_I32), reverse=True
    )
    out = out_steps.transpose(1, 0, 2).reshape(-1)

    result = {
        "out": out,
        "size": n.astype(_U32),
        "success": success,
        "checksum_ok": jnp.bool_(True),
    }
    if verify_checksum:
        actual = checksum_u8(out, n)
        result["checksum_ok"] = ~has_checksum | (actual == stored_checksum)
    return result
