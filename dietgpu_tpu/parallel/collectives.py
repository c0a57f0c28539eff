"""Compressed collectives: trade VPU cycles for ICI/DCN bandwidth.

The DietGPU raison d'être (reference README.md:68-72) realized TPU-natively:
before an all-gather / all-to-all of bf16 (or f16/f32) gradient shards, each
chip float-compresses its shard; only `budget` bytes per shard cross the
interconnect (plus a size vector); receivers decompress. Because XLA
collectives need static shapes, the exchange buffer is a caller-tuned budget
(default 0.75x raw for bf16 N(0,1)-like data). If any shard overflows the
budget, the whole collective transparently falls back to gathering raw data
(a lax.cond branch), preserving exactness for adversarial inputs.
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

    use_pallas = backend_mod.default_backend() == "pallas" and word == 2
    budget4 = C.round_up(budget, 4) // 4

    def local(x):
        # x: (1, shard_words) local shard
        words = jax.lax.bitcast_convert_type(x[0], wd)
        padded = jnp.zeros(Lw, wd).at[:shard_words].set(words)
        if use_pallas:
            # u32-native Pallas pipeline; the exchange rides in u32 words
            arc32, size = pallas_codec_mod.float_compress_padded_pallas(
                padded, shard_words, ft, prob_bits, False
            )
        else:
            arc, size = float_codec_mod.float_compress_padded(
                padded, shard_words, ft, prob_bits, False
            )
        fits = size <= _U32(budget)

        def compressed_path(_):
            if use_pallas:
                arcp = jnp.concatenate([arc32, jnp.zeros(budget4, _U32)])
                payload = jax.lax.dynamic_slice(arcp, (0,), (budget4,))
                gathered = jax.lax.all_gather(payload, axis)

                def decode_one(a):
                    F4 = (
                        pallas_codec_mod.float_archive_u32_bytes(ft, Lw) // 4
                    )
                    buf = jnp.zeros(max(F4, budget4), _U32).at[:budget4].set(a)
                    r = pallas_codec_mod.float_decompress_padded_pallas(
                        buf, ft, Lw, prob_bits, False
                    )
                    pairs = r["out32"]
                    wout = jax.lax.bitcast_convert_type(
                        pairs.reshape(-1, 1), jnp.uint16
                    ).reshape(-1)
                    return wout[:shard_words]

                return jax.vmap(decode_one)(gathered)

            # archive buffer may be smaller than the budget for tiny shards
            arcp = jnp.concatenate([arc, jnp.zeros(budget, jnp.uint8)])
            payload = jax.lax.dynamic_slice(arcp, (0,), (budget,))
            # exchange: compressed bytes + sizes ride the interconnect
            gathered = jax.lax.all_gather(payload, axis)  # (n_dev, budget)
            sizes = jax.lax.all_gather(size, axis)  # (n_dev,)

            def decode_one(a):
                F = float_codec_mod.float_archive_buffer_bytes(ft, Lw)
                buf = jnp.zeros(max(F, budget), jnp.uint8).at[:budget].set(a)
                r = float_codec_mod.float_decompress_padded(
                    buf, ft, Lw, prob_bits, False
                )
                return r["out"][:shard_words]

            del sizes  # sizes validate/debug; decode is self-describing
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

    def local(x):
        # x: (1, n_dev, chunk_words); chunk d goes to device d
        chunks = jax.lax.bitcast_convert_type(x[0], wd)  # (n_dev, chunk)

        def enc_one(c):
            padded = jnp.zeros(Lw, wd).at[:chunk_words].set(c)
            arc, size = float_codec_mod.float_compress_padded(
                padded, chunk_words, ft, prob_bits, False
            )
            arcp = jnp.concatenate([arc, jnp.zeros(budget, jnp.uint8)])
            return jax.lax.dynamic_slice(arcp, (0,), (budget,)), size

        arcs, sizes = jax.vmap(enc_one)(chunks)  # (n_dev, budget), (n_dev,)
        fits = (sizes <= _U32(budget)).all()
        all_fit = jax.lax.psum(fits.astype(jnp.int32), axis) == n_dev

        def compressed_path(_):
            recv = jax.lax.all_to_all(
                arcs, axis, split_axis=0, concat_axis=0, tiled=False
            )  # (n_dev, budget): chunk from each peer

            def dec_one(a):
                F = float_codec_mod.float_archive_buffer_bytes(ft, Lw)
                buf = jnp.zeros(max(F, budget), jnp.uint8).at[:budget].set(a)
                r = float_codec_mod.float_decompress_padded(
                    buf, ft, Lw, prob_bits, False
                )
                return r["out"][:chunk_words]

            return jax.vmap(dec_one)(recv)

        def raw_path(_):
            return jax.lax.all_to_all(
                chunks, axis, split_axis=0, concat_axis=0, tiled=False
            )

        out_words = jax.lax.cond(all_fit, compressed_path, raw_path, None)
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
