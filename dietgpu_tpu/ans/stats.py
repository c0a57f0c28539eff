"""Symbol statistics: histogram and exact probability quantization (JAX).

Bit-exact JAX twin of :func:`dietgpu_tpu.ref.ans_ref.normalize_probs`
(reference: GpuANSStatistics.cuh:179-367). All quirks preserved — see the
NumPy oracle's docstring.
"""

import jax
import jax.numpy as jnp

from .. import constants as C

_U32 = jnp.uint32
_I32 = jnp.int32


def histogram_u8(data: jnp.ndarray, length) -> jnp.ndarray:
    """256-bin histogram of data[:length] (1-D u8) as u32."""
    n = data.shape[0]
    valid = jnp.arange(n, dtype=_I32) < jnp.asarray(length, _I32)
    ones = valid.astype(_U32)
    return jnp.zeros(C.NUM_SYMBOLS, _U32).at[data.astype(_I32)].add(ones)


def normalize_probs(hist: jnp.ndarray, total, prob_bits: int) -> jnp.ndarray:
    """Quantize histogram to weights summing to exactly 2^prob_bits (u32)."""
    K = 1 << prob_bits
    total = jnp.asarray(total, _U32)
    counts_f = hist.astype(jnp.float32)
    ratio = counts_f / total.astype(jnp.float32)
    q = (jnp.float32(K) * ratio).astype(_U32)
    q = jnp.where((hist > 0) & (q == 0), _U32(1), q)

    diff = _I32(K) - q.sum().astype(_I32)
    sym = jnp.arange(C.NUM_SYMBOLS, dtype=_I32)

    # Deficit branch: +1 per symbol-value pass (GpuANSStatistics.cuh:258-273)
    dpos = jnp.maximum(diff, 0)
    q_def = q + (dpos // C.NUM_SYMBOLS).astype(_U32) + (
        sym < (dpos % C.NUM_SYMBOLS)
    ).astype(_U32)

    # Excess branch: -1 from the smallest >1 weights, in the fixed descending
    # order of the packed key (q<<16)|sym (GpuANSStatistics.cuh:274-315).
    # Keys are UNIQUE (sym field), so the descending order is rank[i] =
    # #{j: key_j > key_i}; sorting/permuting 256 values rides comparison
    # matrices and masked sums (3 wide (256,256) ops) instead of XLA
    # argsort + gather + scatter, whose tiny-op dispatch chains cost ~0.4
    # ms on the TPU (the whole normalize was 0.82 ms of a 12.7 ms encode).
    key = (q.astype(_I32) << 16) | sym
    rank = jnp.sum((key[None, :] > key[:, None]).astype(_I32), axis=1)
    ranks = jnp.arange(C.NUM_SYMBOLS, dtype=_I32)
    onehot = rank[:, None] == ranks[None, :]  # [i, r]: symbol i at rank r
    vals0 = jnp.sum(
        jnp.where(onehot, q.astype(_I32)[:, None], 0), axis=0
    )
    need0 = jnp.maximum(-diff, 0)

    def cond(carry):
        _, need = carry
        return need > 0

    def body(carry):
        vals, need = carry
        gt1 = (vals > 1).sum().astype(_I32)
        itr = jnp.minimum(need, gt1)
        dec = (ranks >= gt1 - itr) & (ranks < gt1)
        return vals - dec.astype(_I32), need - itr

    vals, _ = jax.lax.while_loop(cond, body, (vals0, need0))
    # q_exc[i] = vals[rank[i]] — same masked-sum trick, no scatter
    q_exc = jnp.sum(jnp.where(onehot, vals[None, :], 0), axis=1).astype(_U32)

    q = jnp.where(diff > 0, q_def, jnp.where(diff < 0, q_exc, q))
    return jnp.where(total == 0, jnp.zeros_like(q), q)


def div_magic_u32(pdf: jnp.ndarray):
    """(magic, shift) constant-division pairs, all-u32 arithmetic.

    magic = floor(2^32 * (2^shift - pdf) / pdf) + 1 computed via two-step long
    division in 16-bit chunks (no u64 on TPU). Reference values:
    GpuANSStatistics.cuh:345-358.
    """
    p = jnp.maximum(pdf.astype(_U32), _U32(1))
    shift = (_U32(32) - jax.lax.clz(jnp.maximum(p, _U32(1)) - _U32(1))).astype(_U32)
    a = (_U32(1) << shift) - p  # < pdf <= 2^11
    q1 = (a << 16) // p
    r1 = (a << 16) - q1 * p
    q2 = (r1 << 16) // p
    magic = (q1 << 16) + q2 + _U32(1)
    return magic, shift


def div_rcp_f32_bits(pdf: jnp.ndarray) -> jnp.ndarray:
    """f32 bit pattern of the round-to-nearest reciprocal 1/pdf (u32).

    Exact-division alternative to the reference's magic-number pairs for
    the encode kernel: with rcp correctly rounded to nearest, the quotient
    estimate q0 = trunc(f32(state1) * rcp) satisfies |q0 - state1/pdf| <
    0.75 for every state1 < pdf * 2^(31-probBits) (probBits >= 9), because
    the true quotient is < 2^22 and the three rounding steps contribute
    relative error <= 3 * 2^-24 — so one two-sided +-1 correction against
    mod0 = state1 - q0*pdf recovers the exact floor quotient.

    Computed in pure u32 math (no u64, no trust in the backend's f32
    divide): for non-power-of-2 pdf the significand is
    s = round(2^(24+j)/pdf) with j = floor(log2 pdf) — tie-free since
    2^(25+j) = (2s+1)*pdf would force pdf to be a power of two — via
    16-bit long division. pdf == 0 (absent symbol) maps to 0.0f; such
    lanes are dead and their states are masked by the activity bit.
    """
    p = pdf.astype(_U32)
    pc = jnp.maximum(p, _U32(1))
    j = _U32(31) - jax.lax.clz(pc)  # floor(log2(pdf))
    is_pow2 = (pc & (pc - _U32(1))) == 0
    # s = floor((2^(25+j) + pdf) / (2*pdf)); numerator split as
    # 2^(9+j) * 2^16 + pdf (pdf < 2^12 so every limb fits u32)
    d = pc << 1
    hi = _U32(1) << (j + _U32(9))
    qh = hi // d
    rh = hi - qh * d
    s = (qh << 16) + ((rh << 16) + pc) // d
    bits_np2 = ((_U32(126) - j) << 23) | (s - (_U32(1) << 23))
    bits_p2 = (_U32(127) - j) << 23
    bits = jnp.where(is_pow2, bits_p2, bits_np2)
    return jnp.where(p == 0, _U32(0), bits)


def umulhi_u32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High 32 bits of the u32 x u32 product via 16-bit limbs (no u64)."""
    al = a & _U32(0xFFFF)
    ah = a >> _U32(16)
    bl = b & _U32(0xFFFF)
    bh = b >> _U32(16)
    lo = al * bl
    m1 = ah * bl
    m2 = al * bh
    t = (lo >> _U32(16)) + (m1 & _U32(0xFFFF)) + (m2 & _U32(0xFFFF))
    return ah * bh + (m1 >> _U32(16)) + (m2 >> _U32(16)) + (t >> _U32(16))


def build_encode_table(pdf: jnp.ndarray):
    """Pack the encode lookup into two u32 arrays.

    e1 = (shift << 24) | (pdf << 12) | cdf   (pdf, cdf <= 2^11; shift <= 11)
    e2 = magic
    """
    pdf = pdf.astype(_U32)
    cdf = jnp.concatenate([jnp.zeros(1, _U32), jnp.cumsum(pdf)[:-1]])
    magic, shift = div_magic_u32(pdf)
    e1 = (shift << _U32(24)) | (pdf << _U32(12)) | cdf
    return e1, magic
