"""Pallas float codec: compress/decompress pipelines, u32-native end to end.

The TPU-fast twin of :mod:`dietgpu_tpu.floatcodec.codec` (which remains the
CPU-runnable XLA reference). Data stays packed four bytes per u32
throughout — the split kernel emits packed exponent/raw planes, the Pallas
rANS kernels consume and produce packed words, and archives are u32 row
buffers; no strided byte interleaves ever run in XLA.

Archive layout is the reference's (GpuFloatCompress.cuh:420-427):
[GpuFloatHeader 16B][nonComp plane(s), 16B-rounded][ANS archive of
exponents]. All three float types run fused decode+join Pallas kernels;
f32 uses the two-raw-plane layout (GpuFloatUtils.cuh:181-203) with a
3-plane fused join.
"""

import jax
import jax.numpy as jnp

from .. import constants as C
from ..ans import pallas_decode as pdec
from ..ans import pallas_encode as penc
from ..ans import stats
from ..profiling import annotate
from . import pallas_float as pf

_I32 = jnp.int32
_U32 = jnp.uint32


def float_archive_u32_bytes(float_type: int, padded_words: int) -> int:
    """Static u32 archive buffer size (bytes) for the Pallas float codec.

    32 KiB-rounded (64 x 512-byte rows) so the decoder can treat the whole
    buffer as (rows, 128) u32 without a padding copy AND bitcast it to
    (rows/32, 32, 128) / (rows/64, 64, 128) views for the zero-copy
    inline-nonComp fused joins (f16/bf16 nc rows; f32 lo-plane rows).

    Also bounded below by the BATCHED fused decoder's needs: it pads each
    member to >= 32 blocks (4 blocks/sublane row x 8-row minimum tiles)
    and slices NBp padded blocks' worth of nonComp plane from each member
    region (ans_decode_batched_pallas asserts this bound), so small
    buffers must carry that slack — the round-3 tile-geometry slack
    shrink briefly violated it for sub-128KiB f32 members.
    """
    nb = max(padded_words // C.DEFAULT_BLOCK_SIZE, 1)
    nbp = C.round_up(nb, 32)
    per_block_nc = 12288 if float_type == C.FLOAT_TYPE_FLOAT32 else 4096
    batched_min = C.FLOAT_HEADER_BYTES + per_block_nc * nbp
    return C.round_up(
        max(
            C.FLOAT_HEADER_BYTES
            + C.float_noncomp_bytes(float_type, padded_words)
            + penc.archive_buffer_bytes_pallas(padded_words),
            batched_min,
        ),
        32768,
    )


def float_compress_padded_pallas(
    words: jnp.ndarray,
    length,
    float_type: int,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
):
    """Compress words[:length] into a float archive (u32 buffer).

    Args:
      words: (Lw,) u16 raw float words, Lw a positive multiple of 4096.
      length: dynamic word count.

    Returns (archive u32 (F//4,), size u32 bytes).
    """
    static_n = length if isinstance(length, int) else None
    length = jnp.asarray(length, _I32)
    if float_type == C.FLOAT_TYPE_FLOAT32:
        return _f32_compress(words, length, static_n, prob_bits, use_checksum)
    if words.dtype == jnp.uint16:
        # slow path: XLA strided packing (prefer passing u32 word-pairs)
        Lw = words.shape[0]
        valid = jnp.arange(Lw, dtype=_I32) < length
        wz = jnp.where(valid, words, jnp.uint16(0))
        pairs = wz[0::2].astype(_U32) | (wz[1::2].astype(_U32) << 16)
    else:
        assert words.dtype in (_U32, _I32)
        Lw = words.shape[0] * 2
        idx2 = jnp.arange(Lw // 2, dtype=_I32)
        full = idx2 < (length >> 1)
        half = idx2 == (length >> 1)
        tailmask = jnp.where((length & 1) == 1, _U32(0xFFFF), _U32(0))
        w32 = words.astype(_U32)
        pairs = jnp.where(
            full, w32, jnp.where(half, w32 & tailmask, _U32(0))
        )
    assert Lw % C.DEFAULT_BLOCK_SIZE == 0 and Lw > 0

    with annotate("float.split"):
        exp32, nc32, hist, fused_cks = pf.split_words_pallas(
            pairs, float_type, with_cksum=use_checksum
        )
        exp32 = exp32[: Lw // 4].astype(_U32)
        nc32 = nc32[: Lw // 4].astype(_U32)
    with annotate("float.stats"):
        # the split kernel histograms its zero-padded full tile; padding
        # words (value 0) land in the exponent-0 bin
        total = pf.split_total_words(Lw)
        hist = hist.at[0].add(-(jnp.asarray(total, _U32) - length.astype(_U32)))
        pdf = stats.normalize_probs(hist, length.astype(_U32), prob_bits)

    # checksum is fused into the split kernel (zero-padded tail words XOR
    # to identity, so the padded accumulator equals the exact-length one)
    checksum = fused_cks if use_checksum else _U32(0)

    header = jnp.array([(C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION, 0, 0, 0], _U32)
    header = header.at[1].set(length.astype(_U32))
    header = header.at[2].set(_U32((float_type & 0xF) | (int(use_checksum) << 4)))
    header = header.at[3].set(checksum)

    F4 = float_archive_u32_bytes(float_type, Lw) // 4
    buf = jnp.zeros(F4, _U32)
    buf = jax.lax.dynamic_update_slice(buf, header, (0,))
    plane32 = C.round_up(
        static_n if static_n is not None else length, 16
    ) >> 2
    buf = jax.lax.dynamic_update_slice(buf, nc32, (4,))
    if static_n is not None:
        # static geometry: the embedded ANS archive assembles IN PLACE in
        # the container (sections DUS'd at ans_off, payload tiles DMA'd by
        # the assembly kernel) — no separate ANS buffer, no full-buffer
        # DUS stitch (~1.6 ms of the 64Mi bf16 encode was that glue)
        with annotate("float.ans_encode"):
            buf, ans_size = penc.ans_encode_padded_pallas(
                exp32, static_n, prob_bits,
                use_checksum=False, precomputed_pdf=pdf, return_u32=True,
                container=buf, container_base=4 + plane32,
            )
        size = _U32(16) + jnp.asarray(plane32 * 4, _U32) + ans_size
        return buf, size
    with annotate("float.ans_encode"):
        ans_arc32, ans_size = penc.ans_encode_padded_pallas(
            exp32, length, prob_bits,
            use_checksum=False, precomputed_pdf=pdf, return_u32=True,
        )
    ans_off = 4 + plane32
    buf = jax.lax.dynamic_update_slice(
        buf, ans_arc32, (jnp.asarray(ans_off, _I32),)
    )
    size = _U32(16) + jnp.asarray(plane32 * 4, _U32) + ans_size
    return buf, size


def float_decompress_padded_pallas(
    archive32: jnp.ndarray,
    float_type: int,
    out_max_words: int,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    verify_checksum: bool = False,
    static_length: int | None = None,
):
    """Decompress a float archive (u32 buffer view).

    `static_length` (the caller's trace-time knowledge of the word count)
    enables the unmasked full-tile hot loop when it fills out_max_words
    exactly; a mismatching archive fails `success`, never reads OOB.
    It is a CONTRACT, not a hint: decompress fails `success` whenever the
    archive header's word count differs from static_length, including
    smaller archives a masked decode would handle — fail-closed, because
    the unmasked path would otherwise emit garbage in the dead rows. Do
    not pass static_length speculatively.

    Returns dict: out32 (u16 word-pairs for f16/bf16; u32 words for f32),
    size u32 (words), success, checksum_ok.
    """
    if float_type == C.FLOAT_TYPE_FLOAT32:
        return _f32_decompress(
            archive32, out_max_words, prob_bits, verify_checksum,
            static_length=static_length,
        )
    assert float_type in (C.FLOAT_TYPE_FLOAT16, C.FLOAT_TYPE_BFLOAT16)
    assert archive32.dtype in (_U32, _I32)
    Lw = out_max_words
    assert Lw % C.DEFAULT_BLOCK_SIZE == 0 and Lw > 0
    arc = archive32.astype(_U32)

    h = arc[:4]
    magic_ok = h[0] == _U32((C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION)
    n = h[1].astype(_I32)
    options = h[2]
    ft_ok = (options & _U32(0xF)) == _U32(float_type)
    has_checksum = (options & _U32(0x10)) != 0
    stored_checksum = h[3]
    capacity_ok = n <= Lw
    if static_length is not None:
        # the caller's trace-time word count is a CONTRACT: an archive
        # whose header disagrees must fail success (it may have been
        # decoded with the unmasked full-tile loop, whose dead-block
        # rows are garbage) — mirrors the batched driver's check
        capacity_ok = capacity_ok & (n == min(static_length, Lw))
    n_eff = jnp.clip(n, 0, Lw)

    plane32 = C.round_up(n_eff, 16) >> 2
    ans_off = 4 + plane32

    # fused decode+join IN PLACE on the container (arc_base): the kernel
    # emits finished, tail-masked float word-pairs — no exponent-plane HBM
    # round trip, no separate join kernel, no XLA tail masks
    with annotate("float.fused_decode_join"):
        res = pdec.ans_decode_padded_pallas(
            arc, prob_bits, Lw, verify_checksum=verify_checksum,
            arc_base=ans_off, arc_base_bound=4 + (C.round_up(Lw, 16) >> 2),
            # T=512 rows: best measured tile (r3 v5e sweep at 64Mi:
            # T=128 22.10, T=256 22.31, T=512 22.74 GB/s under the raised
            # VMEM budget; r2's T=192 regression was grid padding)
            fuse_float=float_type, block_tile=2048,
            static_full=static_length is not None and static_length == Lw,
        )
    pairs = res["out"]
    ans_n = res["size"].astype(_I32)
    size_ok = ans_n == n_eff

    success = magic_ok & ft_ok & capacity_ok & res["success"] & size_ok
    result = {
        "out32": pairs,  # u16 word-pairs, little-endian: the decoded floats
        "size": n.astype(_U32),
        "success": success,
        "checksum_ok": jnp.bool_(True),
    }
    if verify_checksum:
        # fused in-kernel digest over the finished float words (tail words
        # already zero-masked): no extra full-output HBM pass
        result["checksum_ok"] = ~has_checksum | (
            res["checksum_digest"] == stored_checksum
        )
    return result


def float_compress_batched_pallas(
    words: jnp.ndarray,
    length: int,
    float_type: int,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    use_checksum: bool = False,
):
    """Compress B equal-length float tensors with ONE stage-1 encode grid.

    The batched-encode analogue of `float_decompress_batched_pallas` (the
    reference's 128-way benchmark scenario, benchmark.py:149-221): the
    split kernels vmap into one batched grid, per-member histograms feed
    per-member pdfs, and the rANS hot loop runs one grid whose tiles span
    members via per-row tables (`ans_encode_batched_pallas`) — vmapping the
    single-tensor pipeline instead leaves the encode kernel on small
    member-sized tiles. Stage 2 + assembly vmap with static geometry.

    Args:
      words: f16/bf16: (B, Lw//2) u32 word-pairs; f32: (B, Lw) u32 words.
      length: static per-member word count (every member equal — the
        batched benchmark shape; ragged batches should use the vmapped
        single-tensor path).

    Returns (archives (B, F4) u32, sizes (B,) u32 bytes).
    """
    assert isinstance(length, int), "batched compress needs a static length"
    assert words.dtype in (_U32, _I32)
    B = words.shape[0]
    is_f32 = float_type == C.FLOAT_TYPE_FLOAT32
    Lw = words.shape[1] * (1 if is_f32 else 2)
    assert Lw % C.DEFAULT_BLOCK_SIZE == 0 and Lw > 0
    assert 0 < length <= Lw

    # tail mask (identical across members: static length)
    if is_f32:
        valid = jnp.arange(Lw, dtype=_I32) < length
        wz = jnp.where(valid[None, :], words.astype(_U32), _U32(0))
        exp32, lo32, hi32, hist, fused_cks = jax.vmap(
            lambda p: pf.split_words_pallas_f32(p, with_cksum=use_checksum)
        )(wz)
        total = pf.split_total_words_f32(Lw)
    else:
        idx2 = jnp.arange(Lw // 2, dtype=_I32)
        full = idx2 < (length >> 1)
        half = idx2 == (length >> 1)
        tailmask = _U32(0xFFFF) if (length & 1) else _U32(0)
        w32 = words.astype(_U32)
        wz = jnp.where(
            full[None, :],
            w32,
            jnp.where(half[None, :], w32 & tailmask, _U32(0)),
        )
        exp32, nc32, hist, fused_cks = jax.vmap(
            lambda p: pf.split_words_pallas(
                p, float_type, with_cksum=use_checksum
            )
        )(wz)
        total = pf.split_total_words(Lw)

    exp32 = exp32[:, : Lw // 4].astype(_U32)
    hist = hist.at[:, 0].add(-_U32(total - length))
    pdfs = jax.vmap(
        lambda h: stats.normalize_probs(h, _U32(length), prob_bits)
    )(hist)

    # checksums are fused into the split kernels (zero tail words XOR to
    # identity, so the padded accumulator equals the exact-length one)
    checksums = fused_cks if use_checksum else jnp.zeros(B, _U32)

    F4 = float_archive_u32_bytes(float_type, Lw) // 4
    opt = _U32((float_type & 0xF) | (int(use_checksum) << 4))

    # Per-member ANS buffers + a vmapped stitch DUS into the containers.
    # The alternative (prefill containers, then assemble the embedded
    # archives in place via the cross-member global assembly grid —
    # DIETGPU_ENCODE_BATCHASM=global) measured SLOWER on the v5e (16.6 vs
    # 13.6 ms on 128x512Ki bf16): XLA already elides most of the stitch
    # through buffer aliasing, and the global grid's serialized per-step
    # costs exceed the vmapped per-member launches.
    ans_arcs, ans_sizes = penc.ans_encode_batched_pallas(
        exp32, length, pdfs, prob_bits, use_checksum=False,
    )
    if is_f32:
        lo_len32 = C.round_up(length, 8) >> 1
        hi_len32 = C.round_up(length, 16) >> 2
        plane32 = lo_len32 + hi_len32
        # the embedded-ANS DUS start must fit: jax dynamic_update_slice
        # CLAMPS out-of-range starts and would silently write the archive
        # at the wrong offset (container/tile geometry must agree)
        assert 4 + plane32 + ans_arcs.shape[1] <= F4, (
            "float container too small for the batched ANS buffers: "
            f"{4 + plane32 + ans_arcs.shape[1]} > {F4}"
        )

        def one(ck, lo, hi, ans):
            header = jnp.array(
                [(C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION, length, 0, 0], _U32
            ).at[2].set(opt).at[3].set(ck)
            buf = jnp.zeros(F4, _U32)
            buf = jax.lax.dynamic_update_slice(buf, header, (0,))
            buf = jax.lax.dynamic_update_slice(
                buf, lo[: Lw // 2].astype(_U32), (4,)
            )
            buf = jax.lax.dynamic_update_slice(
                buf, hi[: Lw // 4].astype(_U32), (4 + lo_len32,)
            )
            return jax.lax.dynamic_update_slice(buf, ans, (4 + plane32,))

        bufs = jax.vmap(one)(checksums, lo32, hi32, ans_arcs)
    else:
        plane32 = C.round_up(length, 16) >> 2
        assert 4 + plane32 + ans_arcs.shape[1] <= F4, (
            "float container too small for the batched ANS buffers: "
            f"{4 + plane32 + ans_arcs.shape[1]} > {F4}"
        )

        def one(ck, nc, ans):
            header = jnp.array(
                [(C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION, length, 0, 0], _U32
            ).at[2].set(opt).at[3].set(ck)
            buf = jnp.zeros(F4, _U32)
            buf = jax.lax.dynamic_update_slice(buf, header, (0,))
            buf = jax.lax.dynamic_update_slice(
                buf, nc[: Lw // 4].astype(_U32), (4,)
            )
            return jax.lax.dynamic_update_slice(buf, ans, (4 + plane32,))

        bufs = jax.vmap(one)(checksums, nc32, ans_arcs)

    sizes = _U32(16 + plane32 * 4) + ans_sizes
    return bufs, sizes


def float_decompress_batched_pallas(
    archives: jnp.ndarray,
    float_type: int,
    out_max_words: int,
    prob_bits: int = C.DEFAULT_PROB_BITS,
    static_length: int | None = None,
):
    """Decompress B float archives (equal capacity, ragged actual sizes)
    with ONE fused decode+join grid — the batched analogue of the
    reference's 128-way benchmark scenario (benchmark.py:149-221). vmap of
    the single-archive pipeline serializes the B small grids; this path
    keeps all 128 lanes of every sublane row busy across the whole batch
    via per-row probability tables.

    archives: (B, F4) u32 with F4 = float_archive_u32_bytes(ft, Lw) // 4.
    With `static_length` (every member holds the same, known word count —
    the reference benchmark's shape), all member section offsets become
    static and the prologue lowers to strided slices instead of gathers.
    Returns dict: out32 (B, Lw//2) u16 word-pairs (f16/bf16) or (B, Lw)
    u32 words (f32), size (B,), success (B,).
    """
    assert float_type in (
        C.FLOAT_TYPE_FLOAT16, C.FLOAT_TYPE_BFLOAT16, C.FLOAT_TYPE_FLOAT32
    )
    B, F4 = archives.shape
    Lw = out_max_words
    assert Lw % C.DEFAULT_BLOCK_SIZE == 0 and Lw > 0
    arc = archives.astype(_U32)
    is_f32 = float_type == C.FLOAT_TYPE_FLOAT32

    h = arc[:, :4]
    magic_ok = h[:, 0] == _U32((C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION)
    n = h[:, 1].astype(_I32)
    ft_ok = (h[:, 2] & _U32(0xF)) == _U32(float_type)
    capacity_ok = n <= Lw
    n_eff = jnp.clip(n, 0, Lw)
    f32_hi_off = None
    if static_length is not None:
        ns = min(static_length, Lw)
        if is_f32:
            f32_hi_off = 4 + (C.round_up(ns, 8) >> 1)  # python int
            ans_off = f32_hi_off + (C.round_up(ns, 16) >> 2)
        else:
            ans_off = 4 + (C.round_up(ns, 16) >> 2)  # python int
        static_nb = C.div_up(ns, C.DEFAULT_BLOCK_SIZE)
        capacity_ok = capacity_ok & (n == ns)
    else:
        if is_f32:
            ans_off = (
                4 + (C.round_up(n_eff, 8) >> 1) + (C.round_up(n_eff, 16) >> 2)
            )
        else:
            ans_off = 4 + (C.round_up(n_eff, 16) >> 2)
        static_nb = None

    base_bound = (
        4 + (C.round_up(Lw, 8) >> 1) + (C.round_up(Lw, 16) >> 2)
        if is_f32
        else 4 + (C.round_up(Lw, 16) >> 2)
    )
    res = pdec.ans_decode_batched_pallas(
        arc, prob_bits, Lw, arc_base=ans_off, arc_base_bound=base_bound,
        # f16/bf16 spanning tiles may grow to T=256 rows (the 12 MB
        # tilebuf budget check in the driver still bounds the DMA
        # window): small members at T=128 were issue-bound — the realign
        # copy loop and per-step fixed costs run per sublane row. f32's
        # 3-plane fused kernel stays at 512 blocks (VMEM pressure).
        fuse_float=float_type, block_tile=512 if is_f32 else 1024,
        static_nb=static_nb,
        f32_hi_off=f32_hi_off,
        static_full=static_length is not None and min(static_length, Lw) == Lw,
    )
    size_ok = res["size"].astype(_I32) == n_eff
    return {
        "out32": res["out"],
        "size": n.astype(_U32),
        "success": magic_ok & ft_ok & capacity_ok & res["success"] & size_ok,
    }


def _f32_compress(words, length, static_n, prob_bits, use_checksum):
    """f32 two-plane pipeline (GpuFloatUtils.cuh:181-203 layout)."""
    assert words.dtype in (_U32, _I32)
    Lw = words.shape[0]
    assert Lw % C.DEFAULT_BLOCK_SIZE == 0 and Lw > 0
    n_s = static_n if static_n is not None else length

    valid = jnp.arange(Lw, dtype=_I32) < length
    wz = jnp.where(valid, words.astype(_U32), _U32(0))

    exp32, lo32, hi32, hist, fused_cks = pf.split_words_pallas_f32(
        wz, with_cksum=use_checksum
    )
    exp32 = exp32[: Lw // 4].astype(_U32)
    total = pf.split_total_words_f32(Lw)
    hist = hist.at[0].add(-(jnp.asarray(total, _U32) - length.astype(_U32)))
    pdf = stats.normalize_probs(hist, length.astype(_U32), prob_bits)

    # checksum fused into the split kernel (zero tail words are XOR-inert)
    checksum = fused_cks if use_checksum else _U32(0)

    header = jnp.array([(C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION, 0, 0, 0], _U32)
    header = header.at[1].set(length.astype(_U32))
    header = header.at[2].set(
        _U32((C.FLOAT_TYPE_FLOAT32 & 0xF) | (int(use_checksum) << 4))
    )
    header = header.at[3].set(checksum)

    F4 = float_archive_u32_bytes(C.FLOAT_TYPE_FLOAT32, Lw) // 4
    lo_len32 = C.round_up(n_s, 8) >> 1  # 2*roundUp(n,8) bytes
    hi_len32 = C.round_up(n_s, 16) >> 2
    buf = jnp.zeros(F4, _U32)
    buf = jax.lax.dynamic_update_slice(buf, header, (0,))
    buf = jax.lax.dynamic_update_slice(buf, lo32[: Lw // 2].astype(_U32), (4,))
    hi_off = 4 + lo_len32
    buf = jax.lax.dynamic_update_slice(
        buf, hi32[: Lw // 4].astype(_U32), (jnp.asarray(hi_off, _I32),)
    )
    ans_off = hi_off + hi_len32
    if static_n is not None:
        # in-place embedded-ANS assembly (see the f16/bf16 path)
        buf, ans_size = penc.ans_encode_padded_pallas(
            exp32, static_n, prob_bits, use_checksum=False,
            precomputed_pdf=pdf, return_u32=True,
            container=buf, container_base=ans_off,
        )
    else:
        ans_arc32, ans_size = penc.ans_encode_padded_pallas(
            exp32, length, prob_bits, use_checksum=False,
            precomputed_pdf=pdf, return_u32=True,
        )
        buf = jax.lax.dynamic_update_slice(
            buf, ans_arc32, (jnp.asarray(ans_off, _I32),)
        )
    size = _U32(16) + jnp.asarray((lo_len32 + hi_len32) * 4, _U32) + ans_size
    return buf, size


def _f32_decompress(
    archive32, out_max_words, prob_bits, verify_checksum,
    static_length: int | None = None,
):
    assert archive32.dtype in (_U32, _I32)
    Lw = out_max_words
    assert Lw % C.DEFAULT_BLOCK_SIZE == 0 and Lw > 0
    arc = archive32.astype(_U32)

    h = arc[:4]
    magic_ok = h[0] == _U32((C.FLOAT_MAGIC << 16) | C.FLOAT_VERSION)
    n = h[1].astype(_I32)
    options = h[2]
    ft_ok = (options & _U32(0xF)) == _U32(C.FLOAT_TYPE_FLOAT32)
    has_checksum = (options & _U32(0x10)) != 0
    stored_checksum = h[3]
    capacity_ok = n <= Lw
    if static_length is not None:
        # trace-time word-count contract (see the f16/bf16 driver)
        capacity_ok = capacity_ok & (n == min(static_length, Lw))
    n_eff = jnp.clip(n, 0, Lw)

    lo_len32 = C.round_up(n_eff, 8) >> 1
    hi_len32 = C.round_up(n_eff, 16) >> 2
    base_bound = 4 + (C.round_up(Lw, 8) >> 1) + (C.round_up(Lw, 16) >> 2)

    # fused 3-plane decode+join IN PLACE on the container: the kernel
    # consumes the low-u16/high-u8 raw planes as pipelined inputs and
    # emits finished, tail-masked f32 words — no exponent-plane HBM round
    # trip, no separate join kernel (JoinFloatWriter analogue for the
    # two-plane f32 layout, GpuFloatDecompress.cuh:391-521 +
    # GpuFloatUtils.cuh:181-203)
    with annotate("float.fused_decode_join_f32"):
        res = pdec.ans_decode_padded_pallas(
            arc, prob_bits, Lw, verify_checksum=verify_checksum,
            arc_base=4 + lo_len32 + hi_len32, arc_base_bound=base_bound,
            # T=128: the 3-plane fused kernel's VMEM windows (out
            # (T,128,128) + lo (T,64,128) + hi (T,32,128), double-buffered)
            # exceed physical VMEM at the raw-path default T=512
            fuse_float=C.FLOAT_TYPE_FLOAT32, block_tile=512,
            static_full=static_length is not None and static_length == Lw,
        )
    words = res["out"]
    size_ok = res["size"].astype(_I32) == n_eff

    success = magic_ok & ft_ok & capacity_ok & res["success"] & size_ok
    result = {
        "out32": words,  # u32 f32 raw words
        "size": n.astype(_U32),
        "success": success,
        "checksum_ok": jnp.bool_(True),
    }
    if verify_checksum:
        # fused in-kernel digest (tail words zero-masked): no extra pass
        result["checksum_ok"] = ~has_checksum | (
            res["checksum_digest"] == stored_checksum
        )
    return result
