"""Pallas kernel tests.

Two tiers, mirroring the reference's test strategy (SURVEY.md §4):
  * interpreter-mode roundtrips on CPU — hermetic, always run; they check
    the kernel *logic* (the Mosaic interpreter executes the same jaxpr).
  * real-hardware bit-exactness — opt-in via DIETGPU_TEST_TPU=1 (the driver
    and bench exercise these on the actual chip).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dietgpu_tpu import constants as C
from dietgpu_tpu.ans import encode as enc

ON_TPU = bool(os.environ.get("DIETGPU_TEST_TPU"))


@pytest.fixture()
def interpret_pallas(monkeypatch):
    """Force pallas_call interpret mode and clear build caches."""
    if ON_TPU:
        yield
        return
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    import dietgpu_tpu.ans.pallas_decode as pdec
    import dietgpu_tpu.ans.pallas_encode as penc
    import dietgpu_tpu.ans.pallas_hist as phist
    import dietgpu_tpu.floatcodec.pallas_float as pf

    monkeypatch.setattr(pl, "pallas_call", patched)
    for mod in (pdec, penc, phist, pf):
        for name in dir(mod):
            obj = getattr(mod, name)
            if hasattr(obj, "cache_clear"):
                obj.cache_clear()
    yield
    for mod in (pdec, penc, phist, pf):
        for name in dir(mod):
            obj = getattr(mod, name)
            if hasattr(obj, "cache_clear"):
                obj.cache_clear()


def _expo_bytes(rng, n, lam=20):
    return np.minimum(rng.exponential(lam, n), 255).astype(np.uint8)


@pytest.mark.parametrize("n", [100, 4096, 12000])
def test_pallas_ans_roundtrip_interpret(interpret_pallas, rng, n):
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc

    data = _expo_bytes(rng, n)
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n] = data
    dj = jnp.asarray(padded)

    arc_x, size_x = enc.ans_encode_padded(dj, n, 10, False)
    arc_p, size_p = penc.ans_encode_padded_pallas(dj, n, 10, False)
    assert int(size_x) == int(size_p)
    sx = int(size_x)
    assert np.array_equal(np.asarray(arc_x)[:sx], np.asarray(arc_p)[:sx])

    r = pdec.ans_decode_padded_pallas(arc_p, 10, L, False)
    out = np.asarray(r["out"])
    assert bool(r["success"])
    assert int(r["size"]) == n
    assert np.array_equal(out[:n], data)
    assert not out[n:].any()


@pytest.mark.parametrize("pb", [9, 11])
def test_pallas_ans_roundtrip_interpret_pb(interpret_pallas, rng, pb):
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc

    n = 12000
    data = _expo_bytes(rng, n, 30)
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n] = data
    dj = jnp.asarray(padded)

    arc_x, size_x = enc.ans_encode_padded(dj, n, pb, False)
    arc_p, size_p = penc.ans_encode_padded_pallas(dj, n, pb, False)
    sx = int(size_x)
    assert sx == int(size_p)
    assert np.array_equal(np.asarray(arc_x)[:sx], np.asarray(arc_p)[:sx])
    r = pdec.ans_decode_padded_pallas(arc_p, pb, L, False)
    assert bool(r["success"])
    assert np.array_equal(np.asarray(r["out"])[:n], data)


@pytest.mark.slow
def test_pallas_ans_multitile_interpret(interpret_pallas, rng):
    """3-tile grid at block_tile=32: exercises the cross-tile DMA boundary,
    the assembly spill rows, and dense-decode tile geometry (VERDICT #7)."""
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc

    n = 70 * C.DEFAULT_BLOCK_SIZE + 129  # 71 blocks -> NBp=96, 3 tiles
    data = _expo_bytes(rng, n, 25)
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n] = data
    dj = jnp.asarray(padded)

    arc_x, size_x = enc.ans_encode_padded(dj, n, 10, False)
    arc_p, size_p = penc.ans_encode_padded_pallas(dj, n, 10, False, block_tile=32)
    sx = int(size_x)
    assert sx == int(size_p)
    assert np.array_equal(np.asarray(arc_x)[:sx], np.asarray(arc_p)[:sx])
    r = pdec.ans_decode_padded_pallas(arc_p, 10, L, False, block_tile=32)
    assert bool(r["success"])
    out = np.asarray(r["out"])
    assert np.array_equal(out[:n], data)
    assert not out[n:].any()


@pytest.mark.parametrize("n", [1, 1000, 530000])
def test_pallas_histogram_interpret(interpret_pallas, rng, n):
    from dietgpu_tpu.ans import pallas_hist as ph

    buf = C.round_up(n, 4)
    data = np.zeros(buf, np.uint8)
    data[:n] = _expo_bytes(rng, n)
    data[n:] = 0xAB  # garbage tail: the kernel must mask it
    d32 = jnp.asarray(
        data.view("<u4") if buf % 4 == 0 else data[: buf - buf % 4].view("<u4")
    )
    got = np.asarray(ph.histogram_u8_pallas(d32, n))
    want = np.bincount(data[:n], minlength=256)
    assert np.array_equal(got, want)


def test_pallas_float_roundtrip_interpret(interpret_pallas, rng):
    from dietgpu_tpu.floatcodec import codec as fcodec
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = 5000
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    x = rng.standard_normal(Lw).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16)
    w[n:] = 0
    wj = jnp.asarray(w)

    arc_x, size_x = fcodec.float_compress_padded(
        wj, n, C.FLOAT_TYPE_BFLOAT16, 10, False
    )
    arc_p, size_p = pfc.float_compress_padded_pallas(
        wj, n, C.FLOAT_TYPE_BFLOAT16, 10, False
    )
    sx = int(size_x)
    assert sx == int(size_p)
    assert np.array_equal(
        np.asarray(arc_x)[:sx], np.asarray(arc_p).view(np.uint8)[:sx]
    )

    r = pfc.float_decompress_padded_pallas(
        arc_p, C.FLOAT_TYPE_BFLOAT16, Lw, 10, False
    )
    assert bool(r["success"])
    pairs = np.asarray(r["out32"])
    got = np.zeros(Lw, np.uint16)
    got[0::2] = pairs & 0xFFFF
    got[1::2] = pairs >> 16
    assert np.array_equal(got[:n], w[:n])


@pytest.mark.skipif(not ON_TPU, reason="real-TPU test (DIETGPU_TEST_TPU=1)")
@pytest.mark.parametrize("pb", [9, 10, 11])
def test_pallas_ans_tpu_bitexact(rng, pb):
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc

    n = 1 << 20
    data = _expo_bytes(rng, n, 40)
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n] = data
    dj = jnp.asarray(padded)
    arc_x, size_x = jax.jit(
        lambda d: enc.ans_encode_padded(d, n, pb, False)
    )(dj)
    arc_p, size_p = jax.jit(
        lambda d: penc.ans_encode_padded_pallas(d, n, pb, False)
    )(dj)
    sx = int(size_x)
    assert sx == int(size_p)
    assert np.array_equal(np.asarray(arc_x)[:sx], np.asarray(arc_p)[:sx])
    r = jax.jit(lambda a: pdec.ans_decode_padded_pallas(a, pb, L, False))(arc_p)
    assert bool(r["success"])
    assert np.array_equal(np.asarray(r["out"])[:n], data)


def test_pallas_encode_overflow_interpret(interpret_pallas):
    """Adversarial weight-1 block at pb=11 must flag SIZE_OVERFLOW_BIT and
    keep the staging stores in bounds (VERDICT #4)."""
    from dietgpu_tpu.ans import pallas_encode as penc

    zeros = np.zeros(16 * C.DEFAULT_BLOCK_SIZE, np.uint8)
    rare = np.tile(np.arange(1, 256, dtype=np.uint8), 17)[: C.DEFAULT_BLOCK_SIZE]
    data = np.concatenate([zeros, rare])
    arc, size = penc.ans_encode_padded_pallas(
        jnp.asarray(data), data.size, 11, False
    )
    assert int(size) & C.SIZE_OVERFLOW_BIT


@pytest.mark.parametrize(
    "ft,n",
    [
        (2, 4095),
        (1, 6001),
        pytest.param(3, 4097, marks=pytest.mark.slow),
        pytest.param(3, 8192, marks=pytest.mark.slow),
    ],
)  # bf16, f16, f32 (3-plane, slow tier); odd tails
def test_pallas_fused_join_interpret(interpret_pallas, rng, ft, n):
    """Fused decode+join tail masking across float types (JoinFloatWriter
    analogue; f32 runs the 3-plane fused join)."""
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    x = rng.standard_normal(Lw).astype(np.float32)
    if ft == C.FLOAT_TYPE_BFLOAT16:
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
    elif ft == C.FLOAT_TYPE_FLOAT16:
        w = x.astype(np.float16).view(np.uint16)
    else:
        w = x.view(np.uint32).copy()
    w[n:] = 0
    arc, size = pfc.float_compress_padded_pallas(jnp.asarray(w), n, ft, 10, False)
    r = pfc.float_decompress_padded_pallas(arc, ft, Lw, 10, False)
    assert bool(r["success"])
    if ft == C.FLOAT_TYPE_FLOAT32:
        got = np.asarray(r["out32"])
    else:
        pairs = np.asarray(r["out32"])
        got = np.zeros(Lw, np.uint16)
        got[0::2] = pairs & 0xFFFF
        got[1::2] = pairs >> 16
    assert np.array_equal(got[:n], w[:n])
    assert not got[n:].any()


@pytest.mark.slow
def test_pallas_full_tiles_interpret(interpret_pallas, rng):
    """static_length == capacity drops the activity masking (full-tiles
    kernel variants, both directions): the unmasked hot loops must stay
    bit-exact vs the masked path — same decoded words, same archive bytes,
    working fused checksum."""
    import os as _os

    from dietgpu_tpu.ans import pallas_encode as penc
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    ft = C.FLOAT_TYPE_BFLOAT16
    n = 32 * C.DEFAULT_BLOCK_SIZE  # NBp == NB for both kernels
    x = rng.standard_normal(n).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16)
    pairs = jnp.asarray(w.view(np.uint32).copy())

    arc, size = pfc.float_compress_padded_pallas(pairs, n, ft, 10, True)
    # masked encode must produce a byte-identical archive
    _os.environ["DIETGPU_ENCODE_FULLTILES"] = "off"
    penc._build_encode_call.cache_clear()
    try:
        arc_m, size_m = pfc.float_compress_padded_pallas(
            pairs, n, ft, 10, True
        )
    finally:
        del _os.environ["DIETGPU_ENCODE_FULLTILES"]
        penc._build_encode_call.cache_clear()
    assert int(size) == int(size_m)
    assert np.array_equal(np.asarray(arc), np.asarray(arc_m))

    r = pfc.float_decompress_padded_pallas(
        arc, ft, n, 10, verify_checksum=True, static_length=n
    )
    assert bool(r["success"]) and bool(r["checksum_ok"])
    pairs_out = np.asarray(r["out32"])
    got = np.zeros(n, np.uint16)
    got[0::2] = pairs_out & 0xFFFF
    got[1::2] = pairs_out >> 16
    assert np.array_equal(got, w)

    # a lying static_length (smaller archive than claimed) must fail
    # success without crashing
    n2 = n - C.DEFAULT_BLOCK_SIZE
    w2 = w.copy()
    w2[n2:] = 0
    arc2, _ = pfc.float_compress_padded_pallas(
        jnp.asarray(w2.view(np.uint32).copy()), n2, ft, 10, False
    )
    arc2 = jnp.zeros(arc.shape[0], arc2.dtype).at[: arc2.shape[0]].set(arc2)
    r2 = pfc.float_decompress_padded_pallas(
        arc2, ft, n, 10, False, static_length=n
    )
    assert not bool(r2["success"])


@pytest.mark.slow
def test_pallas_batched_ans_decode_interpret(interpret_pallas, rng):
    """One-grid multi-archive decode (per-row tables) matches per-member
    decode, with ragged member sizes and per-member probability tables."""
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc

    B = 3
    out_max = 3 * C.DEFAULT_BLOCK_SIZE
    lens = [out_max, 5000, 1]  # full, ragged, tiny
    F4 = penc.archive_buffer_bytes_pallas(out_max) // 4
    arcs = []
    datas = []
    for m, ln in enumerate(lens):
        # different distributions => genuinely different tables per member
        data = _expo_bytes(rng, ln, lam=5 * (m + 1))
        datas.append(data)
        d = np.zeros(C.round_up(ln, C.DEFAULT_BLOCK_SIZE), np.uint8)
        d[:ln] = data
        arc32, _ = penc.ans_encode_padded_pallas(
            jnp.asarray(d.view(np.uint32)), ln, 10, return_u32=True
        )
        buf = np.zeros(F4, np.uint32)
        a = np.asarray(arc32)
        buf[: a.shape[0]] = a
        arcs.append(buf)
    batch = jnp.asarray(np.stack(arcs))

    res = pdec.ans_decode_batched_pallas(batch, 10, out_max)
    assert np.asarray(res["success"]).all()
    sizes = np.asarray(res["size"])
    out = np.asarray(res["out"]).view(np.uint8).reshape(B, out_max)
    for m, ln in enumerate(lens):
        assert sizes[m] == ln
        assert np.array_equal(out[m, :ln], datas[m])
        # single-archive path agrees bit-for-bit
        single = pdec.ans_decode_padded_pallas(
            jnp.asarray(arcs[m]), 10, out_max, return_u32=True
        )
        assert np.array_equal(
            np.asarray(single["out"]).view(np.uint8)[:ln], datas[m]
        )


@pytest.mark.slow
def test_pallas_batched_spanning_tiles_interpret(interpret_pallas, rng):
    """Small members force tiles to SPAN members (enlarged DMA window):
    8 members x 2 blocks, ragged, distinct tables — one tile covers all."""
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc

    B = 16
    out_max = 8 * C.DEFAULT_BLOCK_SIZE  # NBp_min=8 < BPR*Tcap => spanning
    lens = [out_max, 8000, 4096, 4097, 1, 100, out_max, 5000] * 2
    F4 = penc.archive_buffer_bytes_pallas(out_max) // 4
    arcs, datas = [], []
    for m, ln in enumerate(lens):
        data = _expo_bytes(rng, ln, lam=3 * (m + 1))
        datas.append(data)
        d = np.zeros(C.round_up(ln, C.DEFAULT_BLOCK_SIZE), np.uint8)
        d[:ln] = data
        arc32, _ = penc.ans_encode_padded_pallas(
            jnp.asarray(d.view(np.uint32)), ln, 10, return_u32=True
        )
        buf = np.zeros(F4, np.uint32)
        a = np.asarray(arc32)
        buf[: a.shape[0]] = a
        arcs.append(buf)
    batch = jnp.asarray(np.stack(arcs))

    res = pdec.ans_decode_batched_pallas(batch, 10, out_max)
    assert np.asarray(res["success"]).all()
    out = np.asarray(res["out"]).view(np.uint8).reshape(B, out_max)
    for m, ln in enumerate(lens):
        assert np.asarray(res["size"])[m] == ln
        assert np.array_equal(out[m, :ln], datas[m]), f"member {m}"


def _words_of(x, ft):
    if ft == C.FLOAT_TYPE_BFLOAT16:
        return (x.view(np.uint32) >> 16).astype(np.uint16)
    if ft == C.FLOAT_TYPE_FLOAT16:
        return x.astype(np.float16).view(np.uint16)
    return x.view(np.uint32).copy()


def _unpack_out32(out32_row, ft, Lw):
    if ft == C.FLOAT_TYPE_FLOAT32:
        return out32_row
    got = np.zeros(Lw, np.uint16)
    got[0::2] = out32_row & 0xFFFF
    got[1::2] = out32_row >> 16
    return got


@pytest.mark.slow
@pytest.mark.parametrize("ft", [1, 2, 3])
def test_pallas_batched_float_decode_interpret(interpret_pallas, rng, ft):
    """Batched fused decode+join equals the single-archive fused path
    (f32 runs the batched 3-plane join)."""
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    B = 3
    Lw = 2 * C.DEFAULT_BLOCK_SIZE
    lens = [Lw, Lw - 1237, 17]
    F4 = pfc.float_archive_u32_bytes(ft, Lw) // 4
    arcs = []
    raws = []
    for ln in lens:
        x = rng.standard_normal(Lw).astype(np.float32)
        w = _words_of(x, ft)
        w[ln:] = 0
        raws.append(w)
        arc, _ = pfc.float_compress_padded_pallas(jnp.asarray(w), ln, ft, 10, False)
        arcs.append(np.asarray(arc)[:F4])
    batch = jnp.asarray(np.stack(arcs))

    res = pfc.float_decompress_batched_pallas(batch, ft, Lw)
    assert np.asarray(res["success"]).all()
    out = np.asarray(res["out32"])
    for m, ln in enumerate(lens):
        got = _unpack_out32(out[m], ft, Lw)
        assert np.array_equal(got[:ln], raws[m][:ln]), f"member {m}"
        assert not got[ln:].any()

    # static-geometry fast path (equal known lengths): decode members 0..1
    # re-encoded at one length; offsets all static => strided-slice prologue
    ln = lens[1]
    arcs2 = []
    for m in range(2):
        w = raws[m].copy()
        w[ln:] = 0
        a, _ = pfc.float_compress_padded_pallas(jnp.asarray(w), ln, ft, 10, False)
        arcs2.append(np.asarray(a)[:F4])
    res2 = pfc.float_decompress_batched_pallas(
        jnp.asarray(np.stack(arcs2)), ft, Lw, static_length=ln
    )
    assert np.asarray(res2["success"]).all()
    out2 = np.asarray(res2["out32"])
    for m in range(2):
        got = _unpack_out32(out2[m], ft, Lw)
        assert np.array_equal(got[:ln], np.where(np.arange(Lw) < ln, raws[m], 0)[:ln])


@pytest.mark.skipif(not ON_TPU, reason="real-TPU test (DIETGPU_TEST_TPU=1)")
@pytest.mark.parametrize("ft", [1, 2, 3])
def test_pallas_float_tpu_bitexact(rng, ft):
    """Hardware float-codec roundtrip + archive parity vs the XLA path
    (promotes experiments/validate_float.py into the suite)."""
    from dietgpu_tpu.floatcodec import codec as fcodec
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    n = 1_000_000
    Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    x = rng.standard_normal(Lw).astype(np.float32)
    if ft == C.FLOAT_TYPE_BFLOAT16:
        w = (x.view(np.uint32) >> 16).astype(np.uint16)
    elif ft == C.FLOAT_TYPE_FLOAT16:
        w = x.astype(np.float16).view(np.uint16)
    else:
        w = x.view(np.uint32).copy()
    w[n:] = 0
    if ft == C.FLOAT_TYPE_FLOAT32:
        wj = jnp.asarray(w)
    else:
        wj = jnp.asarray(w.view(np.uint32))
    arc_x, size_x = jax.jit(
        lambda v: fcodec.float_compress_padded(
            jnp.asarray(w), n, ft, 10, False
        )
    )(wj)
    arc_p, size_p = jax.jit(
        lambda v: pfc.float_compress_padded_pallas(v, n, ft, 10, False)
    )(wj)
    sx = int(size_x)
    assert sx == int(size_p)
    assert np.array_equal(
        np.asarray(arc_x)[:sx], np.asarray(arc_p).view(np.uint8)[:sx]
    )
    r = jax.jit(
        lambda a: pfc.float_decompress_padded_pallas(a, ft, Lw, 10, False)
    )(arc_p)
    assert bool(r["success"])
    out32 = np.asarray(r["out32"])
    if ft == C.FLOAT_TYPE_FLOAT32:
        assert np.array_equal(out32[:n], w[:n])
    else:
        got = np.zeros(Lw, np.uint16)
        got[0::2] = out32 & 0xFFFF
        got[1::2] = out32 >> 16
        assert np.array_equal(got[:n], w[:n])


@pytest.mark.skipif(not ON_TPU, reason="real-TPU test (DIETGPU_TEST_TPU=1)")
def test_pallas_ans_tpu_mixed_compressibility(rng):
    """Mixed incompressible/constant/skewed regions in one buffer stress the
    decoder's stream-window page spread on hardware (promotes
    experiments/validate_decode.py's 'mixed' case)."""
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc

    mix = np.concatenate(
        [
            rng.integers(0, 256, 300_000),
            np.zeros(300_000, np.int64),
            rng.integers(0, 64, 300_000),
        ]
    ).astype(np.uint8)
    n = mix.size
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n] = mix
    dj = jnp.asarray(padded)
    arc, size = jax.jit(
        lambda d: penc.ans_encode_padded_pallas(d, n, 10, False)
    )(dj)
    r = jax.jit(lambda a: pdec.ans_decode_padded_pallas(a, 10, L, False))(arc)
    assert bool(r["success"])
    assert np.array_equal(np.asarray(r["out"])[:n], mix)


@pytest.mark.slow
def test_pallas_batched_ans_encode_interpret(interpret_pallas, rng):
    """One-grid batched encode (per-row tables, member-spanning tiles)
    produces byte-identical archives to the single-tensor pallas path and
    the oracle, for members with genuinely different tables."""
    from dietgpu_tpu.ans import pallas_encode as penc
    from dietgpu_tpu.ref import ans_ref

    B = 3
    L = 2 * C.DEFAULT_BLOCK_SIZE
    n = L  # static equal lengths (the batched benchmark shape)
    datas = [
        _expo_bytes(rng, n, lam=4 * (m + 1)) for m in range(B)
    ]
    d32 = jnp.asarray(
        np.stack([d.view(np.uint32) for d in datas])
    )
    pdfs = jnp.asarray(
        np.stack(
            [
                np.asarray(
                    ans_ref.normalize_probs(
                        ans_ref.histogram_u8(d), n, 10
                    )
                )
                for d in datas
            ]
        ).astype(np.uint32)
    )
    arcs, sizes = penc.ans_encode_batched_pallas(d32, n, pdfs, 10)
    arcs = np.asarray(arcs)
    sizes = np.asarray(sizes)
    for m, data in enumerate(datas):
        oracle = ans_ref.ans_encode(data, prob_bits=10)
        assert sizes[m] == oracle.size, m
        assert np.array_equal(
            arcs[m].view(np.uint8)[: oracle.size], oracle
        ), m


@pytest.mark.slow
def test_pallas_batched_float_encode_interpret(interpret_pallas, rng):
    """Batched float compress (one stage-1 grid) emits byte-identical
    archives to the single-tensor pipeline; batched decode roundtrips."""
    from dietgpu_tpu.floatcodec import pallas_codec as pfc
    from dietgpu_tpu.ref import float_ref

    B = 3
    nw = 2 * C.DEFAULT_BLOCK_SIZE  # words per member (static, equal)
    ft = C.FLOAT_TYPE_BFLOAT16
    words = []
    for m in range(B):
        x = rng.standard_normal(nw).astype(np.float32) * (m + 1)
        words.append((x.view(np.uint32) >> 16).astype(np.uint16))
    pairs = jnp.asarray(np.stack([w.view(np.uint32) for w in words]))

    arcs, sizes = pfc.float_compress_batched_pallas(pairs, nw, ft, 10)
    arcs_h = np.asarray(arcs)
    sizes_h = np.asarray(sizes)
    for m in range(B):
        oracle = float_ref.float_compress(words[m], ft, prob_bits=10)
        assert sizes_h[m] == oracle.size, m
        assert np.array_equal(
            arcs_h[m].view(np.uint8)[: oracle.size], oracle
        ), m
        single, s1 = pfc.float_compress_padded_pallas(
            jnp.asarray(words[m].view(np.uint32)), nw, ft, 10
        )
        assert int(s1) == sizes_h[m]
        assert np.array_equal(np.asarray(single), arcs_h[m][: single.shape[0]])

    res = pfc.float_decompress_batched_pallas(
        jnp.asarray(arcs_h), ft, nw, 10, static_length=nw
    )
    assert np.asarray(res["success"]).all()
    out = np.asarray(res["out32"]).view(np.uint16).reshape(B, nw)
    for m in range(B):
        assert np.array_equal(out[m], words[m]), m


@pytest.mark.slow
def test_pallas_batched_f32_encode_interpret(interpret_pallas, rng):
    """Batched f32 compress: two-plane layout, one stage-1 grid."""
    from dietgpu_tpu.floatcodec import pallas_codec as pfc
    from dietgpu_tpu.ref import float_ref

    B = 2
    nw = C.DEFAULT_BLOCK_SIZE
    ft = C.FLOAT_TYPE_FLOAT32
    words = [
        (rng.standard_normal(nw) * (m + 1)).astype(np.float32).view(np.uint32)
        for m in range(B)
    ]
    arcs, sizes = pfc.float_compress_batched_pallas(
        jnp.asarray(np.stack(words)), nw, ft, 10
    )
    arcs_h = np.asarray(arcs)
    for m in range(B):
        oracle = float_ref.float_compress(words[m], ft, prob_bits=10)
        assert int(np.asarray(sizes)[m]) == oracle.size, m
        assert np.array_equal(
            arcs_h[m].view(np.uint8)[: oracle.size], oracle
        ), m


@pytest.mark.slow
def test_api_routes_pallas_backend_interpret(interpret_pallas, rng, monkeypatch):
    """The 10-op batch API must ride the Pallas pipelines when the backend
    is pallas (TPU): float + raw-ANS compress/decompress roundtrip through
    api.* with DIETTPU_BACKEND=pallas, archives byte-identical to the XLA
    backend's."""
    monkeypatch.setenv("DIETTPU_BACKEND", "pallas")
    from dietgpu_tpu import api

    # float path (bf16 + f32), ragged batch
    t0 = jnp.asarray(
        (rng.standard_normal(5000).astype(np.float32).view(np.uint32) >> 16)
        .astype(np.uint16)
    ).view(jnp.bfloat16)
    t1 = jnp.asarray(rng.standard_normal(123).astype(np.float32)).astype(
        jnp.bfloat16
    )
    comp, sizes, _ = api.compress_data(True, [t0, t1])
    sizes_h = np.asarray(sizes)
    rows = [comp[i, : sizes_h[i]] for i in range(2)]
    outs, status, out_sizes, _ = api.decompress_data(
        True, rows, [jnp.zeros_like(t0), jnp.zeros_like(t1)]
    )
    assert np.asarray(status).all()
    assert np.array_equal(np.asarray(outs[0]), np.asarray(t0))
    assert np.array_equal(np.asarray(outs[1]), np.asarray(t1))

    # archives byte-identical to the XLA backend
    monkeypatch.setenv("DIETTPU_BACKEND", "xla")
    comp_x, sizes_x, _ = api.compress_data(True, [t0, t1])
    sx = np.asarray(sizes_x)
    assert np.array_equal(sx, sizes_h)
    for i in range(2):
        assert np.array_equal(
            np.asarray(comp[i, : sizes_h[i]]), np.asarray(comp_x[i, : sx[i]])
        )

    # raw ANS path through the pallas backend
    monkeypatch.setenv("DIETTPU_BACKEND", "pallas")
    b0 = jnp.asarray(_expo_bytes(rng, 6000))
    arcs = api.compress_data_simple(False, [b0])
    outs = api.decompress_data_simple(False, arcs)
    assert np.array_equal(np.asarray(outs[0]), np.asarray(b0))


@pytest.mark.slow
def test_api_onegrid_uniform_batch_interpret(interpret_pallas, rng, monkeypatch):
    """Uniform-length batches ride the ONE-GRID batched kernels through the
    public API (compress_data + the _simple decode tier), with archives
    byte-identical to the XLA backend — the reference's 128-way batched
    scenario (benchmark.py:149-221) on the TPU path."""
    monkeypatch.setenv("DIETTPU_BACKEND", "pallas")
    from dietgpu_tpu import api

    B, n = 3, 5000  # uniform, non-block-aligned (tail handling)
    ts = [
        jnp.asarray(
            (rng.standard_normal(n).astype(np.float32).view(np.uint32) >> 16)
            .astype(np.uint16)
        ).view(jnp.bfloat16)
        for _ in range(B)
    ]
    comp, sizes, _ = api.compress_data(True, ts)
    sizes_h = np.asarray(sizes)

    monkeypatch.setenv("DIETTPU_BACKEND", "xla")
    comp_x, sizes_x, _ = api.compress_data(True, ts)
    sx = np.asarray(sizes_x)
    assert np.array_equal(sizes_h, sx)
    for i in range(B):
        assert np.array_equal(
            np.asarray(comp[i, : sizes_h[i]]), np.asarray(comp_x[i, : sx[i]])
        ), i

    # one-grid decode through the _simple tier (exact static sizes)
    monkeypatch.setenv("DIETTPU_BACKEND", "pallas")
    arcs = [comp[i, : sizes_h[i]] for i in range(B)]
    outs = api.decompress_data_simple(True, arcs)
    for i in range(B):
        assert outs[i].dtype == jnp.bfloat16
        assert np.array_equal(
            np.asarray(outs[i]).view(np.uint16),
            np.asarray(ts[i]).view(np.uint16),
        ), i

    # raw ANS uniform batch: one-grid encode + one-grid _simple decode
    bs = [jnp.asarray(_expo_bytes(rng, 6000)) for _ in range(B)]
    arcs2 = api.compress_data_simple(False, bs)
    outs2 = api.decompress_data_simple(False, arcs2)
    for i in range(B):
        assert np.array_equal(np.asarray(outs2[i]), np.asarray(bs[i])), i


@pytest.mark.slow
def test_pallas_float_fused_checksum_interpret(interpret_pallas, rng):
    """The split-kernel-fused XOR checksum must be bit-identical to the
    oracle's (archives byte-equal under use_checksum=True for all three
    float types), and the decode-side verify must accept it."""
    from dietgpu_tpu.ans import layout as ans_layout
    from dietgpu_tpu.floatcodec import pallas_codec as pfc
    from dietgpu_tpu.ref import float_ref

    for ft, n in (
        (C.FLOAT_TYPE_BFLOAT16, 5000),
        (C.FLOAT_TYPE_FLOAT16, 4097),
        (C.FLOAT_TYPE_FLOAT32, 4099),
    ):
        Lw = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
        if ft == C.FLOAT_TYPE_FLOAT32:
            words = rng.standard_normal(n).astype(np.float32).view(np.uint32)
            padded = np.zeros(Lw, np.uint32)
            padded[:n] = words
            inp = jnp.asarray(padded)
        else:
            words = (
                rng.standard_normal(n).astype(np.float32).view(np.uint32)
                >> 16
            ).astype(np.uint16)
            padded = np.zeros(Lw, np.uint16)
            padded[:n] = words
            inp = jnp.asarray(
                padded.view(np.uint32) if Lw % 2 == 0 else padded
            )
        buf32, size = pfc.float_compress_padded_pallas(
            inp, n, ft, 10, use_checksum=True
        )
        size_h = int(np.asarray(size))
        got = np.asarray(
            ans_layout.u32_to_u8le(buf32.astype(jnp.uint32))
        )[:size_h]
        oracle = float_ref.float_compress(
            words, ft, prob_bits=10, use_checksum=True
        )
        assert oracle.size == size_h, ft
        assert np.array_equal(got, oracle), ft

        r = pfc.float_decompress_padded_pallas(
            buf32, ft, Lw, 10, verify_checksum=True
        )
        assert bool(np.asarray(r["success"]))
        assert bool(np.asarray(r["checksum_ok"]))


@pytest.mark.slow
def test_pallas_ans_fused_checksum_interpret(interpret_pallas, rng):
    """use_checksum=True on the raw-ANS Pallas path rides the histogram
    kernel (fused XOR accumulator) — archives must stay bit-equal to the
    checksummed oracle, and the fused (hist, checksum) pair must match
    numpy exactly."""
    from dietgpu_tpu.ans import layout as ans_layout
    from dietgpu_tpu.ans import pallas_encode as pe
    from dietgpu_tpu.ans import pallas_hist as ph
    from dietgpu_tpu.ref import ans_ref

    n = 3 * C.DEFAULT_BLOCK_SIZE + 123
    data = _expo_bytes(rng, n)
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n] = data

    d32 = ans_layout.u8_to_u32le(jnp.asarray(padded)).astype(jnp.int32)
    h, c = ph.histogram_u8_pallas(d32, n, with_checksum=True)
    assert np.array_equal(np.asarray(h), np.bincount(data, minlength=256))
    assert int(np.asarray(c)) == int(np.bitwise_xor.reduce(data))

    ref_arc = np.asarray(
        ans_ref.ans_encode(data, prob_bits=10, use_checksum=True)
    )
    arc, size = pe.ans_encode_padded_pallas(
        jnp.asarray(padded), n, prob_bits=10, use_checksum=True
    )
    size_h = int(np.asarray(size)) & 0x7FFFFFFF
    assert size_h == ref_arc.size
    assert np.array_equal(np.asarray(arc)[:size_h], ref_arc)


@pytest.mark.slow
@pytest.mark.parametrize("G", [1, 2])
def test_pallas_encode_flush_group_interpret(interpret_pallas, rng, G,
                                             monkeypatch):
    """The flush-group knob (DIETGPU_ENCODE_FLUSH_GROUP) changes only the
    kernel's flush cadence — archives are bit-identical to the oracle for
    every G (G=4 is the default exercised by the rest of the suite)."""
    from dietgpu_tpu.ans import pallas_encode as pe
    from dietgpu_tpu.ref import ans_ref

    monkeypatch.setenv("DIETGPU_ENCODE_FLUSH_GROUP", str(G))
    pe._build_encode_call.cache_clear()
    n = 5 * C.DEFAULT_BLOCK_SIZE + 7
    data = _expo_bytes(rng, n)
    data[: n // 3] = rng.integers(0, 256, n // 3, dtype=np.uint8)
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n] = data
    ref_arc = np.asarray(ans_ref.ans_encode(data, prob_bits=10))
    arc, size = pe.ans_encode_padded_pallas(jnp.asarray(padded), n)
    size_h = int(np.asarray(size)) & 0x7FFFFFFF
    assert size_h == ref_arc.size
    assert np.array_equal(np.asarray(arc)[:size_h], ref_arc)
    pe._build_encode_call.cache_clear()


@pytest.mark.slow
@pytest.mark.parametrize("pb", [9, 10, 11])
def test_pallas_encode_divmode_f32_interpret(interpret_pallas, rng, pb,
                                             monkeypatch):
    """DIETGPU_ENCODE_DIVMODE=f32 (reciprocal division + one two-sided
    correction, exactness proof in stats.div_rcp_f32_bits) produces
    archives bit-identical to the oracle at every probBits — including
    skewed data whose pdf hits the extreme magic/reciprocal constants."""
    from dietgpu_tpu.ans import pallas_encode as pe
    from dietgpu_tpu.ref import ans_ref

    monkeypatch.setenv("DIETGPU_ENCODE_DIVMODE", "f32")
    pe._build_encode_call.cache_clear()
    n = 3 * C.DEFAULT_BLOCK_SIZE + 11
    data = _expo_bytes(rng, n)
    # a uniform stretch (flat pdf) and a near-constant stretch (pdf near
    # 2^pb, tiny pdf for the rare symbols) stress both reciprocal extremes
    data[: n // 4] = rng.integers(0, 256, n // 4, dtype=np.uint8)
    data[-n // 4 :] = 7
    data[-n // 4 :: 97] = 201
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n] = data
    ref_arc = np.asarray(ans_ref.ans_encode(data, prob_bits=pb))
    arc, size = pe.ans_encode_padded_pallas(
        jnp.asarray(padded), n, prob_bits=pb
    )
    size_h = int(np.asarray(size)) & 0x7FFFFFFF
    assert size_h == ref_arc.size
    assert np.array_equal(np.asarray(arc)[:size_h], ref_arc)
    pe._build_encode_call.cache_clear()


@pytest.mark.slow
def test_shard_codec_pallas_backend_interpret(interpret_pallas, rng,
                                              monkeypatch):
    """The shard_map data-parallel codec rides the Pallas kernels when the
    backend routes there (TPU platforms); archives stay bit-equal to the
    oracle across the mesh."""
    from dietgpu_tpu.parallel import make_mesh, shard_compress, shard_decompress
    from dietgpu_tpu.parallel import sharding as sharding_mod
    from dietgpu_tpu.ref import ans_ref

    monkeypatch.setenv("DIETTPU_BACKEND", "pallas")
    sharding_mod._sharded_encode.cache_clear()
    sharding_mod._sharded_decode.cache_clear()

    n_dev, L = 8, C.DEFAULT_BLOCK_SIZE
    mesh = make_mesh(n_dev)
    data = _expo_bytes(rng, n_dev * L).reshape(n_dev, L)
    lengths = np.full(n_dev, L, np.int32)
    arcs, sizes = shard_compress(
        mesh, jnp.asarray(data), jnp.asarray(lengths)
    )
    arcs_h = np.asarray(arcs)
    for d in range(n_dev):
        oracle = ans_ref.ans_encode(data[d], prob_bits=C.DEFAULT_PROB_BITS)
        assert np.array_equal(arcs_h[d, : oracle.size], oracle), d
    outs, out_sizes, ok = shard_decompress(
        mesh, arcs, jnp.asarray(lengths), L
    )
    assert np.asarray(ok).all()
    assert np.array_equal(np.asarray(outs)[:, :L], data)

    sharding_mod._sharded_encode.cache_clear()
    sharding_mod._sharded_decode.cache_clear()


# ---- round-4 gather-mode knobs -----------------------------------------
# The DEFAULT arms (decode rank-LUT + PERGROUP refill; encode quartet
# fetch + butterfly scatter with FLUSHSTACK off) are exercised by every
# test above. These pin
# the legacy arms, the measured-loser knob arms (stacked refill / stacked
# flush — kept as documented evidence), and the rank-LUT's adversarial
# corner (zero-pdf cumsum ties, which is why the table stores
# NONZERO-symbol ranks — see build_rank_tables).


@pytest.mark.parametrize(
    "knobs",
    [
        # legacy arms
        {
            "DIETGPU_DECODE_LUT": "two",
            "DIETGPU_DECODE_REFILL2": "pergroup",
            "DIETGPU_ENCODE_DATAMODE": "perstep",
            "DIETGPU_ENCODE_FLUSHSTACK": "off",
        },
        # measured-loser knob arms (non-default kernel branches)
        {
            "DIETGPU_DECODE_REFILL2": "stacked",
            "DIETGPU_ENCODE_FLUSHSTACK": "on",
        },
        # round-5 pipelined-bounds arms (page-loop bounds computed one
        # refill/flush ahead; carried-scalar kernel branches)
        {
            "DIETGPU_DECODE_REFILL2": "pipelined",
            "DIETGPU_ENCODE_FLUSHPIPE": "on",
        },
        # round-5 session-B2: the pre-butterfly rank binary-search scatter
        # (the default became the gather-free butterfly network)
        {
            "DIETGPU_ENCODE_SCATTER": "search",
        },
    ],
    ids=["legacy", "stacked", "pipelined", "search-scatter"],
)
def test_pallas_legacy_gather_modes_interpret(
    interpret_pallas, rng, monkeypatch, knobs
):
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc
    from dietgpu_tpu.ref import ans_ref

    for k, v in knobs.items():
        monkeypatch.setenv(k, v)
    n = C.DEFAULT_BLOCK_SIZE + 1234
    data = _expo_bytes(rng, n)
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    padded = np.zeros(L, np.uint8)
    padded[:n] = data
    oracle = ans_ref.ans_encode(data, prob_bits=10)
    arc, size = penc.ans_encode_padded_pallas(jnp.asarray(padded), n, 10)
    assert int(size) == oracle.size
    assert np.array_equal(np.asarray(arc)[: oracle.size], oracle)
    r = pdec.ans_decode_padded_pallas(jnp.asarray(oracle), 10, L)
    assert bool(r["success"]) and int(r["size"]) == n
    assert np.array_equal(np.asarray(r["out"])[:n], data)


@pytest.mark.parametrize("pb", [9, 11])
@pytest.mark.slow
def test_pallas_rank_lut_pb_interpret(interpret_pallas, rng, pb):
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ref import ans_ref

    n = C.DEFAULT_BLOCK_SIZE + 99
    data = _expo_bytes(rng, n)
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    oracle = ans_ref.ans_encode(data, prob_bits=pb)
    r = pdec.ans_decode_padded_pallas(jnp.asarray(oracle), pb, L)
    assert bool(r["success"]) and int(r["size"]) == n
    assert np.array_equal(np.asarray(r["out"])[:n], data)


def test_pallas_rank_lut_sparse_tables_interpret(interpret_pallas, rng):
    """Sparse pdfs (most symbols zero) maximize cumsum ties — the case
    where a raw-symbol delta table would overflow its 3-bit fields."""
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ref import ans_ref

    n = C.DEFAULT_BLOCK_SIZE + 500
    L = C.round_up(n, C.DEFAULT_BLOCK_SIZE)
    for data in (
        np.full(n, 7, np.uint8),  # single-symbol table: pdf[7] = 2^pb
        rng.choice(np.array([0, 255], np.uint8), size=n),  # two far apart
    ):
        oracle = ans_ref.ans_encode(data, prob_bits=10)
        r = pdec.ans_decode_padded_pallas(jnp.asarray(oracle), 10, L)
        assert bool(r["success"]) and int(r["size"]) == n
        assert np.array_equal(np.asarray(r["out"])[:n], data)


@pytest.mark.slow
def test_pallas_batched_global_assembly_interpret(
    interpret_pallas, rng, monkeypatch
):
    """DIETGPU_ENCODE_BATCHASM=global: one cross-member assembly grid with
    per-member seed rows (measured slower on v5e; kept as evidence) must
    stay byte-identical to the vmapped per-member default."""
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    B = 3
    Lw = 2 * C.DEFAULT_BLOCK_SIZE
    ln = Lw - 777
    x = rng.standard_normal((B, Lw)).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16)
    w[:, ln:] = 0
    wj = jnp.asarray(np.ascontiguousarray(w).view(np.uint32))
    base, base_sz = pfc.float_compress_batched_pallas(wj, ln, 2, 10, False)
    monkeypatch.setenv("DIETGPU_ENCODE_BATCHASM", "global")
    glob, glob_sz = pfc.float_compress_batched_pallas(wj, ln, 2, 10, False)
    assert np.array_equal(np.asarray(base_sz), np.asarray(glob_sz))
    assert np.array_equal(np.asarray(base), np.asarray(glob))


# ---- round-5 TPU-gated batched one-grid bit-exactness (VERDICT r4 #8) --
# The batched grids' hardware correctness previously rested on bench
# asserts alone; these run them on the chip under DIETGPU_TEST_TPU=1.


@pytest.mark.skipif(not ON_TPU, reason="real-TPU test (DIETGPU_TEST_TPU=1)")
def test_pallas_batched_float_tpu_bitexact(rng):
    """Hardware: the one-grid batched float compress emits byte-identical
    archives to the single-tensor Pallas pipeline for every member, and
    the one-grid batched fused decode roundtrips them bit-exactly."""
    from dietgpu_tpu.floatcodec import pallas_codec as pfc

    B = 8
    nw = 64 * 1024
    Lw = C.round_up(nw, C.DEFAULT_BLOCK_SIZE)
    ft = C.FLOAT_TYPE_BFLOAT16
    x = rng.standard_normal((B, Lw)).astype(np.float32)
    w = (x.view(np.uint32) >> 16).astype(np.uint16)
    w[:, nw:] = 0
    wj = jnp.asarray(np.ascontiguousarray(w).view(np.uint32))

    arcs, sizes = jax.jit(
        lambda d: pfc.float_compress_batched_pallas(d, nw, ft, 10, False)
    )(wj)
    single = jax.jit(
        lambda d: pfc.float_compress_padded_pallas(d, nw, ft, 10, False)
    )
    arcs_h = np.asarray(arcs)
    for m in range(B):
        a1, s1 = single(wj[m])
        assert int(s1) == int(sizes[m]), m
        s = int(s1)
        assert np.array_equal(
            arcs_h[m].view(np.uint8)[:s], np.asarray(a1).view(np.uint8)[:s]
        ), m

    r = jax.jit(
        lambda a: pfc.float_decompress_batched_pallas(
            a, ft, Lw, 10, static_length=nw
        )
    )(arcs)
    assert bool(np.asarray(r["success"]).all())
    got = np.asarray(r["out32"]).view(np.uint16)[:, :nw]
    assert np.array_equal(got, w[:, :nw])


@pytest.mark.skipif(not ON_TPU, reason="real-TPU test (DIETGPU_TEST_TPU=1)")
def test_pallas_batched_ans_tpu_bitexact(rng):
    """Hardware: one-grid batched raw-ANS encode matches the single-tensor
    Pallas archives per member (different tables per member), and the
    one-grid batched decode returns the exact bytes."""
    from dietgpu_tpu.ans import pallas_decode as pdec
    from dietgpu_tpu.ans import pallas_encode as penc
    from dietgpu_tpu.ans import stats

    B = 6
    L = 32 * C.DEFAULT_BLOCK_SIZE
    n = L
    datas = np.stack(
        [_expo_bytes(rng, n, lam=6 * (m + 1)) for m in range(B)]
    )
    d32 = jnp.asarray(np.ascontiguousarray(datas).view(np.uint32))
    from dietgpu_tpu.ans import pallas_hist as ph

    # per-member tables from per-member histograms
    pdfs = []
    hist_jit = jax.jit(lambda d: ph.histogram_u8_pallas(d, d.shape[0] * 4))
    for m in range(B):
        hm = hist_jit(d32[m])
        pdfs.append(
            jax.jit(
                lambda h: stats.normalize_probs(h, jnp.uint32(n), 10)
            )(hm)
        )
    pdfs = jnp.stack(pdfs)
    arcs, sizes = jax.jit(
        lambda d, p: penc.ans_encode_batched_pallas(d, n, p, 10)
    )(d32, pdfs)
    arcs_h = np.asarray(arcs)
    single = jax.jit(
        lambda d, p: penc.ans_encode_padded_pallas(
            d, n, 10, precomputed_pdf=p
        )
    )
    for m in range(B):
        a1, s1 = single(d32[m], pdfs[m])
        assert int(s1) == int(sizes[m]), m
        s = int(s1)
        assert np.array_equal(
            arcs_h[m].view(np.uint8)[:s], np.asarray(a1).view(np.uint8)[:s]
        ), m

    r = jax.jit(
        lambda a: pdec.ans_decode_batched_pallas(a, 10, L, static_nb=L // C.DEFAULT_BLOCK_SIZE)
    )(arcs)
    assert bool(np.asarray(r["success"]).all())
    got = np.asarray(r["out"]).view(np.uint8)[:, :n]
    assert np.array_equal(got, datas)


@pytest.mark.skipif(not ON_TPU, reason="real-TPU test (DIETGPU_TEST_TPU=1)")
def test_shard_codec_tpu_1dev(rng):
    """Hardware: the shard-codec Pallas path on a 1-device TPU mesh —
    compress/decompress through shard_map against the oracle."""
    import jax.sharding as jsh

    from dietgpu_tpu.parallel import sharding as sharding_mod
    from dietgpu_tpu.parallel.sharding import shard_compress, shard_decompress
    from dietgpu_tpu.ref import ans_ref

    sharding_mod._sharded_encode.cache_clear()
    sharding_mod._sharded_decode.cache_clear()
    mesh = jsh.Mesh(np.array(jax.devices()[:1]), ("dp",))
    L = 4 * C.DEFAULT_BLOCK_SIZE
    data = _expo_bytes(rng, L).reshape(1, L)
    lengths = np.full(1, L, np.int32)
    arcs, sizes = shard_compress(mesh, jnp.asarray(data), jnp.asarray(lengths))
    oracle = ans_ref.ans_encode(data[0], prob_bits=C.DEFAULT_PROB_BITS)
    assert np.array_equal(np.asarray(arcs)[0, : oracle.size], oracle)
    outs, out_sizes, ok = shard_decompress(
        mesh, arcs, jnp.asarray(lengths), L
    )
    assert bool(np.asarray(ok).all())
    assert np.array_equal(np.asarray(outs)[:, :L], data)
    sharding_mod._sharded_encode.cache_clear()
    sharding_mod._sharded_decode.cache_clear()
