"""Compressed collectives: trade VPU cycles for ICI/DCN bandwidth.

The DietGPU raison d'être (reference README.md:68-72) realized TPU-natively:
before an all-gather / all-to-all of bf16/f16/f32 gradient shards, each chip
float-compresses its shard; only the compressed payload crosses the
interconnect; receivers decompress. On TPU backends the u32-native Pallas
codec pipeline runs under shard_map for every dtype; elsewhere the XLA
codec (bit-identical archives) serves as reference/fallback.

Because XLA collectives need static shapes, two exchange strategies exist:

  * fixed budget (`compressed_all_gather` / `compressed_all_to_all`): a
    caller-tuned per-shard byte budget (default 0.75x raw); if any shard
    overflows, the whole collective transparently falls back to a raw
    exchange via lax.cond, preserving exactness on adversarial inputs.
  * two-phase size exchange (`compressed_all_gather_auto`): phase 1
    compresses and exchanges only the sizes; the host reads the psum'd max,
    buckets it (1/16-of-raw granularity, so compile caching holds), and
    phase 2 moves exactly that many wire bytes. The SURVEY §5 "two-phase
    size exchange" — wire bytes track the data's real compressibility.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import backend as backend_mod
from .. import constants as C
from ..floatcodec import codec as float_codec_mod
from ..floatcodec import pallas_codec as pallas_codec_mod

_U32 = jnp.uint32
_WORD_DTYPE = {2: jnp.uint16, 4: jnp.uint32}


def _float_type_of(dtype) -> int:
    return {
        "float16": C.FLOAT_TYPE_FLOAT16,
        "bfloat16": C.FLOAT_TYPE_BFLOAT16,
        "float32": C.FLOAT_TYPE_FLOAT32,
    }[jnp.dtype(dtype).name]


def default_budget_bytes(shard_words: int, word_size: int) -> int:
    """Default per-shard exchange budget: 0.75x raw, 16-byte aligned."""
    return C.round_up(int(shard_words * word_size * 0.75) + 4096, 16)


def _codec(ft: int, word: int, Lw: int, n_words: int, prob_bits: int, use_pallas: bool):
    """Shard codec closure pair for one config.

    compress(padded_words) -> (payload_array, size_bytes); decompress(buf)
    -> (Lw,) words. Payload/buf are u32 on the Pallas path (unit 4) and u8
    on the XLA path (unit 1).
    """
    if use_pallas:
        F4 = pallas_codec_mod.float_archive_u32_bytes(ft, Lw) // 4

        def compress(padded):
            if word == 2:
                inp = jax.lax.bitcast_convert_type(
                    padded.reshape(Lw // 2, 2), _U32
                ).reshape(-1)
            else:
                inp = padded.astype(_U32)
            return pallas_codec_mod.float_compress_padded_pallas(
                inp, n_words, ft, prob_bits, False
            )

        def decompress(buf32):
            r = pallas_codec_mod.float_decompress_padded_pallas(
                buf32, ft, Lw, prob_bits, False,
                static_length=n_words if isinstance(n_words, int) else None,
            )
            out32 = r["out32"]
            if word == 2:
                return jax.lax.bitcast_convert_type(
                    out32.reshape(-1, 1), jnp.uint16
                ).reshape(-1)
            return out32

        return compress, decompress, 4, F4

    F = float_codec_mod.float_archive_buffer_bytes(ft, Lw)

    def compress(padded):
        return float_codec_mod.float_compress_padded(
            padded, n_words, ft, prob_bits, False
        )

    def decompress(buf):
        r = float_codec_mod.float_decompress_padded(
            buf, ft, Lw, prob_bits, False
        )
        return r["out"]

    return compress, decompress, 1, F


@functools.lru_cache(maxsize=None)
def _build_all_gather(
    mesh: Mesh,
    axis: str,
    shard_words: int,
    dtype_name: str,
    budget: int,
    prob_bits: int,
):
    dtype = jnp.dtype(dtype_name)
    ft = _float_type_of(dtype)
    word = dtype.itemsize
    wd = _WORD_DTYPE[word]
    Lw = C.round_up(shard_words, C.DEFAULT_BLOCK_SIZE)
    n_dev = mesh.devices.size

    use_pallas = backend_mod.default_backend() == "pallas"
    compress, decompress, unit, F = _codec(
        ft, word, Lw, shard_words, prob_bits, use_pallas
    )
    bunits = C.round_up(budget, unit) // unit
    pdt = _U32 if unit == 4 else jnp.uint8

    def local(x):
        # x: (1, shard_words) local shard
        words = jax.lax.bitcast_convert_type(x[0], wd)
        padded = jnp.zeros(Lw, wd).at[:shard_words].set(words)
        arc, size = compress(padded)
        fits = size <= _U32(budget)

        def compressed_path(_):
            arcp = jnp.concatenate([arc, jnp.zeros(bunits, pdt)])
            payload = jax.lax.dynamic_slice(arcp, (0,), (bunits,))
            gathered = jax.lax.all_gather(payload, axis)  # (n_dev, bunits)

            def decode_one(a):
                buf = jnp.zeros(max(F // unit, bunits), pdt).at[:bunits].set(a)
                return decompress(buf)[:shard_words]

            return jax.vmap(decode_one)(gathered)

        def raw_path(_):
            return jax.lax.all_gather(words, axis)

        # a single overflow anywhere forces the raw fallback everywhere so
        # every chip takes the same branch
        all_fit = jax.lax.psum(fits.astype(jnp.int32), axis) == n_dev
        out_words = jax.lax.cond(all_fit, compressed_path, raw_path, None)
        out = jax.lax.bitcast_convert_type(out_words, dtype)
        return out.reshape(1, n_dev * shard_words), all_fit[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis)),
        check_vma=False,
    )
    return jax.jit(f)


def compressed_all_gather(
    x: jax.Array,
    mesh: Mesh,
    axis: str = "dp",
    budget_bytes: int | None = None,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """All-gather x (n_dev, shard_words) along the mesh axis with on-the-fly
    float compression.

    Returns (full (n_dev, n_dev*shard_words) — every row the full gathered
    tensor, rows sharded across devices — and used_compression (n_dev,) bool).
    """
    n_dev, shard_words = x.shape
    assert n_dev == mesh.devices.size
    word = x.dtype.itemsize
    if budget_bytes is None:
        budget_bytes = default_budget_bytes(shard_words, word)
    fn = _build_all_gather(
        mesh, axis, shard_words, jnp.dtype(x.dtype).name, budget_bytes, prob_bits
    )
    x = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    return fn(x)


# ---------------------------------------------------------------------------
# two-phase size exchange (SURVEY §5): wire bytes track the real ratio
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _build_ag_phase1(
    mesh: Mesh, axis: str, shard_words: int, dtype_name: str, prob_bits: int
):
    dtype = jnp.dtype(dtype_name)
    ft = _float_type_of(dtype)
    word = dtype.itemsize
    wd = _WORD_DTYPE[word]
    Lw = C.round_up(shard_words, C.DEFAULT_BLOCK_SIZE)
    use_pallas = backend_mod.default_backend() == "pallas"
    compress, _, unit, F = _codec(ft, word, Lw, shard_words, prob_bits, use_pallas)

    def local(x):
        words = jax.lax.bitcast_convert_type(x[0], wd)
        padded = jnp.zeros(Lw, wd).at[:shard_words].set(words)
        arc, size = compress(padded)
        # size exchange: one u32 per device rides the interconnect
        max_size = jax.lax.pmax(size, axis)
        return arc[None], max_size[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis)),
        check_vma=False,
    )
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _build_ag_phase2(
    mesh: Mesh,
    axis: str,
    shard_words: int,
    dtype_name: str,
    budget: int,
    prob_bits: int,
):
    dtype = jnp.dtype(dtype_name)
    ft = _float_type_of(dtype)
    word = dtype.itemsize
    Lw = C.round_up(shard_words, C.DEFAULT_BLOCK_SIZE)
    use_pallas = backend_mod.default_backend() == "pallas"
    _, decompress, unit, F = _codec(ft, word, Lw, shard_words, prob_bits, use_pallas)
    bunits = C.round_up(budget, unit) // unit
    pdt = _U32 if unit == 4 else jnp.uint8

    def local(arcs):
        payload = jax.lax.dynamic_slice(arcs[0], (0,), (bunits,))
        gathered = jax.lax.all_gather(payload, axis)

        def decode_one(a):
            buf = jnp.zeros(max(F // unit, bunits), pdt).at[:bunits].set(a)
            return decompress(buf)[:shard_words]

        out_words = jax.vmap(decode_one)(gathered)
        out = jax.lax.bitcast_convert_type(out_words, dtype)
        n_dev = mesh.devices.size
        return out.reshape(1, n_dev * shard_words)

    f = shard_map(
        local, mesh=mesh, in_specs=(P(axis, None),), out_specs=P(axis, None),
        check_vma=False,
    )
    return jax.jit(f)


def compressed_all_gather_auto(
    x: jax.Array,
    mesh: Mesh,
    axis: str = "dp",
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Two-phase compressed all-gather: compress once, exchange sizes (one
    u32 per device), then move exactly the bucketed max compressed size per
    shard over the interconnect. Never falls back to raw — the wire budget
    is derived from the actual data.

    Returns (full (n_dev, n_dev*shard_words), wire_bytes_per_shard int).
    """
    n_dev, shard_words = x.shape
    assert n_dev == mesh.devices.size
    word = x.dtype.itemsize
    dtype_name = jnp.dtype(x.dtype).name
    x = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    arcs, max_sizes = _build_ag_phase1(
        mesh, axis, shard_words, dtype_name, prob_bits
    )(x)
    # host sync on ONE scalar: the psum'd max compressed size
    max_size = int(jax.device_get(max_sizes[0]))
    # bucket to 1/16 of raw (16B-aligned) so phase-2 compiles are cached
    bucket = max(C.round_up(shard_words * word // 16, 16), 4096)
    budget = C.round_up(max_size, bucket)
    out = _build_ag_phase2(
        mesh, axis, shard_words, dtype_name, budget, prob_bits
    )(arcs)
    return out, budget


@functools.lru_cache(maxsize=None)
def _build_all_to_all(
    mesh: Mesh,
    axis: str,
    chunk_words: int,
    dtype_name: str,
    budget: int,
    prob_bits: int,
):
    dtype = jnp.dtype(dtype_name)
    ft = _float_type_of(dtype)
    word = dtype.itemsize
    wd = _WORD_DTYPE[word]
    Lw = C.round_up(chunk_words, C.DEFAULT_BLOCK_SIZE)
    n_dev = mesh.devices.size
    exchange = _chunk_exchange(
        ft, word, Lw, chunk_words, prob_bits, budget, axis, n_dev
    )

    def local(x):
        # x: (1, n_dev, chunk_words); chunk d goes to device d
        chunks = jax.lax.bitcast_convert_type(x[0], wd)  # (n_dev, chunk)
        out_words, all_fit = exchange(chunks)
        out = jax.lax.bitcast_convert_type(out_words, dtype)
        return out[None], all_fit[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None),),
        out_specs=(P(axis, None, None), P(axis)),
        check_vma=False,
    )
    return jax.jit(f)


def _chunk_exchange(ft, word, Lw, chunk_words, prob_bits, budget, axis, n_dev):
    """Shared local body of the all-to-all-shaped collectives.

    Returns exchange(chunks) -> (recv_words, all_fit): compress each
    (n_dev, chunk_words) raw-word chunk, vote on the byte budget across the
    mesh, move compressed bytes with lax.all_to_all (or the raw words when
    any chunk overflows), and decompress on the receiver."""
    wd = _WORD_DTYPE[word]
    use_pallas = backend_mod.default_backend() == "pallas"
    compress, decompress, unit, F = _codec(
        ft, word, Lw, chunk_words, prob_bits, use_pallas
    )
    bunits = C.round_up(budget, unit) // unit
    pdt = _U32 if unit == 4 else jnp.uint8

    def exchange(chunks):
        def enc_one(c):
            padded = jnp.zeros(Lw, wd).at[:chunk_words].set(c)
            arc, size = compress(padded)
            arcp = jnp.concatenate([arc, jnp.zeros(bunits, pdt)])
            return jax.lax.dynamic_slice(arcp, (0,), (bunits,)), size

        arcs, sizes = jax.vmap(enc_one)(chunks)  # (n_dev, bunits), (n_dev,)
        fits = (sizes <= _U32(budget)).all()
        all_fit = jax.lax.psum(fits.astype(jnp.int32), axis) == n_dev

        def compressed_path(_):
            recv = jax.lax.all_to_all(
                arcs, axis, split_axis=0, concat_axis=0, tiled=False
            )  # (n_dev, bunits): chunk from each peer

            def dec_one(a):
                buf = jnp.zeros(max(F // unit, bunits), pdt).at[:bunits].set(a)
                return decompress(buf)[:chunk_words]

            return jax.vmap(dec_one)(recv)

        def raw_path(_):
            return jax.lax.all_to_all(
                chunks, axis, split_axis=0, concat_axis=0, tiled=False
            )

        out_words = jax.lax.cond(all_fit, compressed_path, raw_path, None)
        return out_words, all_fit

    return exchange


def compressed_all_to_all(
    x: jax.Array,
    mesh: Mesh,
    axis: str = "dp",
    budget_bytes: int | None = None,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """All-to-all of x (n_dev, n_dev, chunk_words): device s sends x[s, d]
    to device d. Returns ((n_dev, n_dev, chunk_words), used_compression)."""
    n_dev, n_dev2, chunk_words = x.shape
    assert n_dev == n_dev2 == mesh.devices.size
    word = x.dtype.itemsize
    if budget_bytes is None:
        budget_bytes = default_budget_bytes(chunk_words, word)
    fn = _build_all_to_all(
        mesh, axis, chunk_words, jnp.dtype(x.dtype).name, budget_bytes, prob_bits
    )
    x = jax.device_put(x, NamedSharding(mesh, P(axis, None, None)))
    return fn(x)


@functools.lru_cache(maxsize=None)
def _build_ppermute(
    mesh: Mesh,
    axis: str,
    shard_words: int,
    dtype_name: str,
    budget: int,
    prob_bits: int,
    perm: tuple,
):
    dtype = jnp.dtype(dtype_name)
    ft = _float_type_of(dtype)
    word = dtype.itemsize
    wd = _WORD_DTYPE[word]
    Lw = C.round_up(shard_words, C.DEFAULT_BLOCK_SIZE)
    n_dev = mesh.devices.size

    use_pallas = backend_mod.default_backend() == "pallas"
    compress, decompress, unit, F = _codec(
        ft, word, Lw, shard_words, prob_bits, use_pallas
    )
    bunits = C.round_up(budget, unit) // unit
    pdt = _U32 if unit == 4 else jnp.uint8
    perm_list = list(perm)

    def local(x):
        words = jax.lax.bitcast_convert_type(x[0], wd)
        padded = jnp.zeros(Lw, wd).at[:shard_words].set(words)
        arc, size = compress(padded)
        fits = size <= _U32(budget)
        # devices with no inbound edge receive zeros — mask their output
        valid = jax.lax.ppermute(
            jnp.ones((1,), jnp.int32), axis, perm_list
        )[0] == 1

        def compressed_path(_):
            arcp = jnp.concatenate([arc, jnp.zeros(bunits, pdt)])
            payload = jax.lax.dynamic_slice(arcp, (0,), (bunits,))
            recv = jax.lax.ppermute(payload, axis, perm_list)
            buf = jnp.zeros(max(F // unit, bunits), pdt).at[:bunits].set(recv)
            return decompress(buf)[:shard_words]

        def raw_path(_):
            return jax.lax.ppermute(words, axis, perm_list)

        # any sender overflowing the budget forces the raw wire everywhere
        # so every chip takes the same branch
        all_fit = jax.lax.psum(fits.astype(jnp.int32), axis) == n_dev
        out_words = jax.lax.cond(all_fit, compressed_path, raw_path, None)
        out_words = jnp.where(valid, out_words, jnp.zeros_like(out_words))
        out = jax.lax.bitcast_convert_type(out_words, dtype)
        return out[None], all_fit[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis)),
        check_vma=False,
    )
    return jax.jit(f)


def compressed_ppermute(
    x: jax.Array,
    mesh: Mesh,
    perm: list[tuple[int, int]] | None = None,
    axis: str = "dp",
    budget_bytes: int | None = None,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Point-to-point shard exchange (lax.ppermute) with on-the-fly float
    compression — the pipeline-parallel / halo-exchange member of the
    collective family: stage s forwards its activations (or boundary halo)
    to stage perm[s] as compressed bytes.

    Args:
      x: (n_dev, shard_words) — row s is device s's outgoing shard.
      perm: (src, dst) pairs as for jax.lax.ppermute; each src/dst at most
        once. Default: the +1 ring shift (pipeline forwarding).

    Returns ((n_dev, shard_words) — row d is what device d received, zeros
    where no edge targets d — and used_compression (n_dev,) bool; any
    sender overflowing the byte budget flips the whole exchange to raw).
    """
    n_dev, shard_words = x.shape
    assert n_dev == mesh.devices.size
    if perm is None:
        perm = [(s, (s + 1) % n_dev) for s in range(n_dev)]
    word = x.dtype.itemsize
    if budget_bytes is None:
        budget_bytes = default_budget_bytes(shard_words, word)
    fn = _build_ppermute(
        mesh, axis, shard_words, jnp.dtype(x.dtype).name, budget_bytes,
        prob_bits, tuple((int(s), int(d)) for s, d in perm),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    return fn(x)


@functools.lru_cache(maxsize=None)
def _build_reduce_scatter(
    mesh: Mesh,
    axis: str,
    chunk_words: int,
    dtype_name: str,
    budget: int,
    prob_bits: int,
):
    dtype = jnp.dtype(dtype_name)
    ft = _float_type_of(dtype)
    word = dtype.itemsize
    wd = _WORD_DTYPE[word]
    Lw = C.round_up(chunk_words, C.DEFAULT_BLOCK_SIZE)
    n_dev = mesh.devices.size
    exchange = _chunk_exchange(
        ft, word, Lw, chunk_words, prob_bits, budget, axis, n_dev
    )

    def local(x):
        # x: (1, V) — this device's addend; chunk d belongs to device d
        chunks = jax.lax.bitcast_convert_type(
            x[0].reshape(n_dev, chunk_words), wd
        )
        recv_words, all_fit = exchange(chunks)
        # one flat f32 sum of the received chunks (MORE accurate than a
        # ring's per-hop native-dtype adds)
        vals = jax.lax.bitcast_convert_type(recv_words, dtype)
        out = jnp.sum(vals.astype(jnp.float32), axis=0).astype(dtype)
        return out[None], all_fit[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis)),
        check_vma=False,
    )
    return jax.jit(f)


def compressed_reduce_scatter(
    x: jax.Array,
    mesh: Mesh,
    axis: str = "dp",
    budget_bytes: int | None = None,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """Reduce-scatter with on-the-fly float compression: device d receives
    sum_s x[s, d*chunk:(d+1)*chunk] (accumulated in f32, emitted in x.dtype).

    Beyond-reference capability: the reference lists an NCCL-like fused
    all-reduce as future work (README.md:103-104); here the compressed
    all-to-all exchange plus a one-shot f32 tree sum realizes its
    reduce-scatter half (and `compressed_all_reduce` the whole op).

    Args:
      x: (n_dev, V) addends, V divisible by n_dev; dtype f16/bf16/f32.

    Returns ((n_dev, V // n_dev) reduced shards — row d on device d — and
    used_compression (n_dev,) bool; falls back to a raw exchange whenever
    any chunk overflows the byte budget).
    """
    n_dev, V = x.shape
    assert n_dev == mesh.devices.size and V % n_dev == 0
    chunk_words = V // n_dev
    word = x.dtype.itemsize
    if budget_bytes is None:
        budget_bytes = default_budget_bytes(chunk_words, word)
    fn = _build_reduce_scatter(
        mesh, axis, chunk_words, jnp.dtype(x.dtype).name, budget_bytes,
        prob_bits,
    )
    x = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    return fn(x)


def compressed_all_reduce(
    x: jax.Array,
    mesh: Mesh,
    axis: str = "dp",
    budget_bytes: int | None = None,
    prob_bits: int = C.DEFAULT_PROB_BITS,
):
    """All-reduce with compression on BOTH wire phases: compressed
    reduce-scatter (all-to-all exchange + f32 tree sum), then compressed
    all-gather of the reduced shards. The realized form of the reference's
    planned NCCL-like all-reduce (README.md:103-104).

    Args:
      x: (n_dev, V) addends, V divisible by n_dev; dtype f16/bf16/f32.

    Returns ((n_dev, V) — every row the full reduced tensor, rows sharded
    across devices — and used_compression (n_dev,) bool: True where both
    phases moved compressed bytes).
    """
    shards, used_rs = compressed_reduce_scatter(
        x, mesh, axis, budget_bytes, prob_bits
    )
    full, used_ag = compressed_all_gather(
        shards, mesh, axis, budget_bytes, prob_bits
    )
    return full, used_rs & used_ag
