"""Bit-exact NumPy reference for the batched interleaved-rANS codec.

Archive format: ``ANSCoalescedHeader`` layout, reproduced byte-for-byte
(reference: /root/reference/dietgpu/ans/GpuANSUtils.cuh:67-229):

```
u32 magicAndVersion (0xd00d<<16 | 1)
u32 numBlocks
u32 totalUncompressedWords
u32 totalCompressedWords          # sum of 8-word-aligned per-block payloads
u32 options                       # (27 unused)(1 useChecksum)(4 probBits)
u32 checksum
u32 unused0, unused1
u16 probs[256]                    # quantized pdf, sums to 2^probBits
u32 states[numBlocks][32]         # final rANS state per interleaved lane
uint2 blockWords[roundUp(numBlocks,2)]:
    .x = (uncompressedWords<<16) | compressedWords
    .y = block payload start (u16 words) within the payload region
u16 payload[...]                  # per-block streams, 16B-aligned regions
```

Each 4096-byte block is encoded independently by 32 interleaved rANS states;
lane L codes symbols L, L+32, L+64, ... of the block. Per step, lanes whose
state exceeds ``pdf << (31 - probBits)`` flush their low 16 bits to the stream
in ascending-lane order (reference encode hot loop: GpuANSEncode.cuh:49-90).
Decode consumes the stream backwards with descending-lane priority
(GpuANSDecode.cuh:55-105).
"""

from __future__ import annotations

import numpy as np

from .. import constants as C

_U32 = np.uint32
_I64 = np.int64


def histogram_u8(data: np.ndarray) -> np.ndarray:
    """256-bin symbol histogram (u32)."""
    assert data.dtype == np.uint8
    return np.bincount(data, minlength=C.NUM_SYMBOLS).astype(_U32)


def checksum_bytes(data: np.ndarray) -> int:
    """Byte-order-insensitive folded XOR checksum (GpuChecksum.cuh:27-93).

    The vectorized u32 XOR accumulation followed by a byte-fold is equivalent
    to XOR-ing every byte of the input.
    """
    assert data.dtype == np.uint8
    if data.size == 0:
        return 0
    return int(np.bitwise_xor.reduce(data))


def normalize_probs(hist: np.ndarray, total: int, prob_bits: int) -> np.ndarray:
    """Quantize a histogram to weights summing to exactly 2^prob_bits.

    Bit-exact replica of ``normalizeProbabilitiesFromHistogram``
    (GpuANSStatistics.cuh:179-367), including its quirks:

    * initial weight = trunc(f32(2^bits) * (f32(count) / f32(total))), clamped
      to >= 1 for present symbols;
    * if the sum falls short, +1 is applied to symbols by *symbol value*
      (< diff per 256-wide pass), not by rank (GpuANSStatistics.cuh:258-273);
    * if the sum overshoots, -1 is applied to the smallest weights > 1 in the
      fixed descending order of the packed key ``(q<<16)|sym``
      (GpuANSStatistics.cuh:274-315).
    """
    K = 1 << prob_bits
    if total == 0:
        return np.zeros(C.NUM_SYMBOLS, dtype=_U32)

    counts_f = hist.astype(np.float32)
    ratio = counts_f / np.float32(total)  # IEEE f32 round-nearest
    q = (np.float32(K) * ratio).astype(_U32)  # truncation, like C cast
    q = np.where((hist > 0) & (q == 0), _U32(1), q)

    diff = K - int(q.sum())
    if diff > 0:
        sym = np.arange(C.NUM_SYMBOLS, dtype=_I64)
        q = (
            q.astype(_I64) + diff // C.NUM_SYMBOLS + (sym < (diff % C.NUM_SYMBOLS))
        ).astype(_U32)
    elif diff < 0:
        key = (q.astype(_I64) << 16) | np.arange(C.NUM_SYMBOLS, dtype=_I64)
        order = np.argsort(-key, kind="stable")  # descending, total order
        vals = q[order].astype(_I64)
        need = -diff
        while need > 0:
            gt1 = int((vals > 1).sum())
            itr = min(need, gt1)
            assert itr > 0, "cannot reduce weights further"
            vals[gt1 - itr : gt1] -= 1
            need -= itr
        q = np.zeros(C.NUM_SYMBOLS, dtype=_U32)
        q[order] = vals.astype(_U32)

    assert int(q.sum()) == K
    return q


def div_magic(pdf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Constant-division (magic, shift) pairs for each pdf.

    shift = 32 - clz(pdf - 1); magic = (2^32 * (2^shift - pdf)) / pdf + 1.
    Reference: GpuANSStatistics.cuh:345-358. pdf == 0 entries produce
    (magic=1, shift=0) placeholders (never used by valid symbols).
    """
    pdf_i = np.maximum(pdf.astype(_I64), 1)
    # number of bits needed: shift = ceil(log2(pdf)); clz(0) == 32 -> shift 0
    shift = np.zeros_like(pdf_i)
    nz = pdf_i > 1
    shift[nz] = np.ceil(np.log2(pdf_i[nz].astype(np.float64))).astype(_I64)
    # recompute exactly via bit_length to avoid float edge cases
    shift = np.array([int(v - 1).bit_length() for v in pdf_i], dtype=_I64)
    magic = ((1 << 32) * ((1 << shift) - pdf_i)) // pdf_i + 1
    return magic.astype(_U32), shift.astype(_U32)


def _umulhi(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """High 32 bits of u32 x u32 products."""
    return ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(_U32)


def magic_div(state: np.ndarray, pdf: np.ndarray, magic: np.ndarray, shift) -> np.ndarray:
    """div = state // pdf via the reference's multiply-shift sequence."""
    t = _umulhi(state, magic)
    return ((t + state) >> shift.astype(_U32)).astype(_U32)


def _encode_blocks(
    data: np.ndarray, pdf: np.ndarray, cdf: np.ndarray, prob_bits: int, use_magic: bool
):
    """Run the interleaved encoders over all blocks at once.

    Returns (final_states [nb,32] u32, vals [nb,4096] u16 (stream-ordered,
    zero where unused), words [nb] per-block stream lengths).
    """
    n = data.size
    nb = C.div_up(n, C.DEFAULT_BLOCK_SIZE)
    W = C.NUM_INTERLEAVED
    S = C.STEPS_PER_BLOCK

    padded = np.zeros(nb * C.DEFAULT_BLOCK_SIZE, dtype=np.uint8)
    padded[:n] = data
    blocks = padded.reshape(nb, S, W)
    valid = (np.arange(nb * C.DEFAULT_BLOCK_SIZE) < n).reshape(nb, S, W)

    pdf32 = pdf.astype(_U32)
    cdf32 = cdf.astype(_U32)
    magic, shift = div_magic(pdf)

    state = np.full((nb, W), C.ANS_START_STATE, dtype=_U32)
    out_vals = np.zeros((nb, S, W), dtype=np.uint16)
    out_mask = np.zeros((nb, S, W), dtype=bool)

    check_shift = _U32(C.ANS_STATE_BITS - prob_bits)
    for k in range(S):
        sym = blocks[:, k, :]
        v = valid[:, k, :]
        p = pdf32[sym]
        write = v & (state >= (p << check_shift))
        out_vals[:, k, :] = np.where(write, state & _U32(0xFFFF), 0).astype(np.uint16)
        out_mask[:, k, :] = write
        state = np.where(write, state >> _U32(16), state)
        p_safe = np.maximum(p, _U32(1))
        if use_magic:
            div = magic_div(state, p_safe, magic[sym], shift[sym])
        else:
            div = state // p_safe
        new_state = (div << _U32(prob_bits)) + (state - div * p_safe) + cdf32[sym]
        state = np.where(v, new_state, state)

    words = out_mask.sum(axis=(1, 2)).astype(_U32)
    flat_vals = out_vals.reshape(nb, S * W)
    flat_mask = out_mask.reshape(nb, S * W)
    order = np.argsort(~flat_mask, axis=1, kind="stable")
    compacted = np.take_along_axis(flat_vals, order, axis=1)
    compacted = compacted[:, : C.MAX_COMP_WORDS_PER_BLOCK]
    return state, compacted, words


def ans_encode(
    data: np.ndarray,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
    precomputed_histogram: np.ndarray | None = None,
    use_magic: bool = True,
) -> np.ndarray:
    """Compress a byte array into a coalesced ANS archive (u8 array)."""
    assert data.dtype == np.uint8
    assert prob_bits in C.SUPPORTED_PROB_BITS
    n = data.size
    nb = C.div_up(n, C.DEFAULT_BLOCK_SIZE)

    hist = (
        precomputed_histogram
        if precomputed_histogram is not None
        else histogram_u8(data)
    )
    pdf = normalize_probs(hist, n, prob_bits)
    cdf = np.zeros(C.NUM_SYMBOLS, dtype=_U32)
    cdf[1:] = np.cumsum(pdf)[:-1]

    if nb > 0:
        states, compacted, words = _encode_blocks(data, pdf, cdf, prob_bits, use_magic)
        if int((words > C.MAX_COMP_WORDS_PER_BLOCK).sum()):
            # reference device-asserts here (GpuANSEncode.cuh:355-360); the
            # JAX encoders flag C.SIZE_OVERFLOW_BIT in the returned size
            raise OverflowError(
                "compressed block exceeds the per-block payload bound"
            )
    else:
        states = np.zeros((0, C.NUM_INTERLEAVED), dtype=_U32)
        compacted = np.zeros((0, C.MAX_COMP_WORDS_PER_BLOCK), dtype=np.uint16)
        words = np.zeros(0, dtype=_U32)

    words_padded = C.round_up(words.astype(_I64), C.WORDS_PER_ALIGN)
    prefix = np.zeros(nb, dtype=_I64)
    if nb > 0:
        prefix[1:] = np.cumsum(words_padded)[:-1]
    total_words = int(words_padded.sum())

    overhead = C.compressed_overhead(nb)
    archive = np.zeros(overhead + 2 * total_words, dtype=np.uint8)

    checksum = checksum_bytes(data) if use_checksum else 0
    options = (prob_bits & 0xF) | (int(use_checksum) << 4)
    header = np.array(
        [
            (C.ANS_MAGIC << 16) | C.ANS_VERSION,
            nb,
            n,
            total_words,
            options,
            checksum,
            0,
            0,
        ],
        dtype=_U32,
    )
    archive[:32] = header.view(np.uint8)
    archive[32 : 32 + 512] = pdf.astype(np.uint16).view(np.uint8)

    off = 32 + 512
    archive[off : off + nb * 128] = states.astype(_U32).reshape(-1).view(np.uint8)
    off += nb * 128

    bw = np.zeros((C.round_up(nb, 2), 2), dtype=_U32)
    if nb > 0:
        uncomp = np.full(nb, C.DEFAULT_BLOCK_SIZE, dtype=_I64)
        tail = n % C.DEFAULT_BLOCK_SIZE
        uncomp[nb - 1] = C.DEFAULT_BLOCK_SIZE if tail == 0 else tail
        bw[:nb, 0] = ((uncomp << 16) | words.astype(_I64)).astype(_U32)
        bw[:nb, 1] = prefix.astype(_U32)
    archive[off : off + bw.size * 4] = bw.reshape(-1).view(np.uint8)
    off += bw.size * 4

    if total_words > 0:
        payload = np.zeros(total_words, dtype=np.uint16)
        cols = np.arange(C.MAX_COMP_WORDS_PER_BLOCK, dtype=_I64)
        sel = cols[None, :] < words_padded[:, None]
        dst = (prefix[:, None] + cols[None, :])[sel]
        payload[dst] = compacted[sel]
        archive[off : off + 2 * total_words] = payload.view(np.uint8)

    return archive


def parse_header(archive: np.ndarray) -> dict:
    """Parse the coalesced header into a dict of Python ints."""
    assert archive.dtype == np.uint8
    h = archive[:32].view(_U32)
    magic_ver = int(h[0])
    if (magic_ver >> 16) != C.ANS_MAGIC or (magic_ver & 0xFFFF) != C.ANS_VERSION:
        raise ValueError(f"bad ANS archive magic/version 0x{magic_ver:08x}")
    nb = int(h[1])
    options = int(h[4])
    return {
        "num_blocks": nb,
        "total_uncompressed_words": int(h[2]),
        "total_compressed_words": int(h[3]),
        "prob_bits": options & 0xF,
        "use_checksum": bool(options & 0x10),
        "checksum": int(h[5]),
        "data_start": C.compressed_overhead(nb),
        "total_compressed_size": C.compressed_overhead(nb) + 2 * int(h[3]),
    }


def build_decode_lut(pdf: np.ndarray, prob_bits: int):
    """(sym, pdf, state-minus-cdf base) lookup arrays of size 2^prob_bits.

    Mirrors the decode table construction (GpuANSDecode.cuh:405-476): slot j in
    [cdf[s], cdf[s]+pdf[s]) holds (s, pdf[s], j - cdf[s]).
    """
    K = 1 << prob_bits
    pdf_i = pdf.astype(_I64)
    assert int(pdf_i.sum()) == K
    cdf = np.zeros(C.NUM_SYMBOLS, dtype=_I64)
    cdf[1:] = np.cumsum(pdf_i)[:-1]
    sym_of = np.repeat(np.arange(C.NUM_SYMBOLS, dtype=_U32), pdf_i)
    pdf_of = pdf_i[sym_of].astype(_U32)
    sminus = (np.arange(K, dtype=_I64) - cdf[sym_of]).astype(_U32)
    return sym_of, pdf_of, sminus


def ans_decode(
    archive: np.ndarray,
    out_capacity: int | None = None,
    expected_prob_bits: int | None = None,
) -> tuple[np.ndarray, bool, int]:
    """Decode an archive. Returns (data u8, success, uncompressed_bytes).

    ``success`` is False when out_capacity is given and insufficient
    (reference contract: GpuANSDecode.cuh:326-340). Checksum mismatch raises.
    """
    info = parse_header(archive)
    nb = info["num_blocks"]
    n = info["total_uncompressed_words"]
    prob_bits = info["prob_bits"]
    if expected_prob_bits is not None:
        assert prob_bits == expected_prob_bits, "prob_bits mismatch"
    if out_capacity is not None and out_capacity < n:
        return np.zeros(0, dtype=np.uint8), False, n
    if n == 0:
        return np.zeros(0, dtype=np.uint8), True, 0

    K = 1 << prob_bits
    W = C.NUM_INTERLEAVED
    S = C.STEPS_PER_BLOCK

    pdf = archive[32 : 32 + 512].view(np.uint16).astype(_U32)
    sym_of, pdf_of, sminus = build_decode_lut(pdf, prob_bits)

    off = 32 + 512
    states = archive[off : off + nb * 128].view(_U32).reshape(nb, W).copy()
    off += nb * 128
    bw = archive[off : off + C.round_up(nb, 2) * 8].view(_U32).reshape(-1, 2)[:nb]
    uncomp = (bw[:, 0] >> 16).astype(_I64)
    cwords = (bw[:, 0] & 0xFFFF).astype(_I64)
    starts = bw[:, 1].astype(_I64)

    payload = archive[info["data_start"] :].view(np.uint16)
    # Stage per-block streams into a dense (nb, maxw) matrix
    maxw = C.MAX_COMP_WORDS_PER_BLOCK
    cols = np.arange(maxw, dtype=_I64)
    if payload.size > 0:
        idx = np.minimum(starts[:, None] + cols[None, :], payload.size - 1)
        streams = payload[idx]
    else:
        streams = np.zeros((nb, maxw), dtype=np.uint16)
    streams[cols[None, :] >= cwords[:, None]] = 0

    state = states
    pos = cwords.copy()
    out = np.zeros((nb, S, W), dtype=np.uint8)

    steps = C.div_up(uncomp, W)  # per-block number of decode steps
    remainder = uncomp % W
    lanes = np.arange(W, dtype=_I64)

    mask_k = _U32(K - 1)
    for k in range(S - 1, -1, -1):
        active = k < steps
        if not active.any():
            continue
        is_tail = active & (k == steps - 1) & (remainder > 0)
        lane_limit = np.where(is_tail, remainder, W)
        act = active[:, None] & (lanes[None, :] < lane_limit[:, None])

        s_bar = state & mask_k
        sym = sym_of[s_bar]
        p = pdf_of[s_bar]
        smc = sminus[s_bar]
        new_state = p * (state >> _U32(prob_bits)) + smc
        state = np.where(act, new_state, state)
        out[:, k, :] = np.where(act, sym, 0).astype(np.uint8)

        read = act & (state < _U32(C.ANS_MIN_STATE))
        rank = np.cumsum(read[:, ::-1], axis=1)[:, ::-1].astype(_I64)
        ridx = np.clip(pos[:, None] - rank, 0, maxw - 1)
        v = np.take_along_axis(streams, ridx, axis=1).astype(_U32)
        state = np.where(read, (state << _U32(16)) + v, state)
        pos = pos - read.sum(axis=1)

    data = out.reshape(-1)[:n]

    if info["use_checksum"]:
        actual = checksum_bytes(data)
        if actual != info["checksum"]:
            raise ValueError(
                f"checksum mismatch: archive 0x{info['checksum']:02x} "
                f"!= decoded 0x{actual:02x}"
            )
    return data, True, n
