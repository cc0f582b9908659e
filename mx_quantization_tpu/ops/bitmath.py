"""Exact fp32 bit manipulation primitives.

XLA backends (CPU here, and TPU generally) run fp32 arithmetic with
FTZ/DAZ — subnormals flush to zero — while the reference's torch-CPU oracle
preserves them.  Every operation that must be bit-exact against the reference
is therefore done on the integer bit pattern, mirroring the reference CUDA
scalar kernels (/root/reference/microxscaling/mx/cpp/common.cuh:137-245:
get_sign / get_biased_exponent / get_trailing_mantissa / construct_float).

All functions operate elementwise on float32 arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# python int, NOT jnp.int32: a module-level device constant would
# initialize the XLA backend at import time, breaking multi-host users
# who must call jax.distributed.initialize() before any backend use
_SIGN_MASK = -2147483648  # 0x80000000
_EXP_MASK = 0x7F800000
_MANT_MASK = 0x007FFFFF
_IMPLICIT_ONE = 0x00800000


def f32_bits(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


def bits_f32(b: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(b.astype(jnp.int32), jnp.float32)


def decompose(x: jax.Array):
    """-> (sign_bit int32, exp_field int32, mantissa int32)."""
    b = f32_bits(x)
    sign = b & _SIGN_MASK
    e = (b >> 23) & 0xFF
    m = b & _MANT_MASK
    return sign, e, m


def floor_log2_int(x: jax.Array) -> jax.Array:
    """Exact floor(log2(|x|)) as int32 for finite nonzero x (subnormals
    included); returns a large-negative sentinel (-150) for x == 0."""
    _, e, m = decompose(x)
    normal = e > 0
    # subnormal value = m * 2^-149; floor_log2 = bitlength(m) - 1 - 149
    sub_log2 = (31 - jax.lax.clz(jnp.maximum(m, 1))) - 149
    return jnp.where(normal, e - 127, jnp.where(m == 0, -150, sub_log2))


def _rne_rshift(m: jax.Array, s: jax.Array) -> jax.Array:
    """Round-to-nearest-even right shift of nonnegative int32 m by s>=1
    (s <= 26)."""
    s = jnp.minimum(s, 26)
    q = jax.lax.shift_right_logical(m, jnp.minimum(s, 31))
    rem = m - jax.lax.shift_left(q, jnp.minimum(s, 31))
    half = jax.lax.shift_left(jnp.ones_like(m), jnp.minimum(s - 1, 31))
    round_up = (rem > half) | ((rem == half) & ((q & 1) == 1))
    return q + round_up.astype(m.dtype)


def scalbn(x: jax.Array, e: jax.Array) -> jax.Array:
    """Exact x * 2**e for fp32, preserving subnormals on both sides.

    Overflow -> +-Inf; underflow below 2^-149 rounds RNE (matching what an
    fp32 multiply by an exact power of two would do).  NaN/Inf pass through.
    """
    x = x.astype(jnp.float32)
    e = jnp.asarray(e, jnp.int32)
    sign, E, M = decompose(x)
    nan_inf = E == 255
    zero = (E == 0) & (M == 0)

    m_full = jnp.where(E > 0, M | _IMPLICIT_ONE, M)
    ex = jnp.where(E > 0, E - 127, -126)
    # normalize so bit 23 is the leading one
    lz = jax.lax.clz(jnp.maximum(m_full, 1)) - 8
    m_n = jax.lax.shift_left(m_full, jnp.clip(lz, 0, 31))
    e_n = ex - lz

    e2 = e_n + e
    overflow = e2 > 127
    # normal result
    normal_bits = sign | jax.lax.shift_left(
        jnp.clip(e2 + 127, 1, 254), 23) | (m_n & _MANT_MASK)
    # subnormal result: value = m_n * 2^(e2-23) = m_sub * 2^-149
    sub_shift = -126 - e2
    m_sub = _rne_rshift(m_n, jnp.maximum(sub_shift, 1))
    sub_bits = sign | m_sub

    out_bits = jnp.where(e2 >= -126, normal_bits, sub_bits)
    out_bits = jnp.where(overflow, sign | _EXP_MASK, out_bits)
    out_bits = jnp.where(zero, sign, out_bits)
    out = bits_f32(out_bits)
    return jnp.where(nan_inf, x, out)


def max_abs_bits(x: jax.Array, axis, keepdims: bool = True) -> jax.Array:
    """Exact max(|x|) along axis as int32 bit patterns.

    For nonnegative finite fp32, the IEEE bit pattern is monotonic in value,
    so an integer max gives the exact float max without DAZ interference.
    NaNs map to large bit patterns (> Inf) and naturally dominate, matching
    torch.max's NaN propagation.
    """
    b = f32_bits(x) & 0x7FFFFFFF
    if isinstance(axis, (list, tuple)):
        for ax in sorted([a % x.ndim for a in axis], reverse=True):
            b = jnp.max(b, axis=ax, keepdims=keepdims)
    elif axis is None:
        b = jnp.max(b)
    else:
        b = jnp.max(b, axis=axis, keepdims=keepdims)
    return b


def bits_floor_log2(b: jax.Array) -> jax.Array:
    """floor(log2(value)) for nonnegative value given as bit pattern int32;
    -150 sentinel for zero."""
    e = (b >> 23) & 0xFF
    m = b & _MANT_MASK
    sub_log2 = (31 - jax.lax.clz(jnp.maximum(m, 1))) - 149
    return jnp.where(e > 0, e - 127, jnp.where(m == 0, -150, sub_log2))
