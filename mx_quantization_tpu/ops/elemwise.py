"""Elementwise (scalar-format) fake quantization in pure JAX.

Reproduces the numerics of the reference's elementwise quantizer
(/root/reference/microxscaling/mx/elemwise_ops.py:92-277 and the bit-exact CUDA
scalar quantizer mx/cpp/quantize.cuh:88-155) with XLA-friendly code:

  * ``floor(log2(|x|))`` is computed exactly with ``jnp.frexp`` (equivalent to
    the CUDA kernel's biased-exponent bit extraction) instead of a float log.
  * powers of two are applied with ``jnp.ldexp`` — exact by construction,
    unlike a transcendental ``exp2`` which may be off by an ulp.
  * All branches are data-parallel ``where``s — no data-dependent control flow,
    so everything fuses into surrounding ops under ``jit``.

All functions are shape-polymorphic value functions; autograd wiring
(straight-through / quantized backward) lives in the nn ops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..formats import (
    FormatLike,
    format_params,
    _max_norm,
    _min_norm,
)


from .bitmath import (
    _IMPLICIT_ONE,
    _MANT_MASK,
    bits_f32,
    decompose,
    f32_bits,
    floor_log2_int,
    scalbn,
)


def pow2(e: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Exact 2**e for integer-valued e (normal fp32 range)."""
    return scalbn(jnp.ones((), dtype), e)


def _round_shift(m: jax.Array, s: jax.Array, round: str) -> jax.Array:
    """Rounded right-shift of the nonnegative 24-bit significand m by s >= 1.

    Implements the three reference rounding modes on the integer mantissa —
    the exact analogue of shift_right_round_mantissa in the reference CUDA
    kernel (cpp/quantize.cuh:31-56):
      nearest : round half away from zero
      floor   : truncate
      even    : round half to even
    """
    s = jnp.minimum(s, 27)  # beyond this everything rounds to 0 (m < 2^24)
    sc = jnp.minimum(s, 31)
    q = jax.lax.shift_right_logical(m, sc)
    if round == "floor":
        return q
    half = jax.lax.shift_left(jnp.ones_like(m), jnp.minimum(s - 1, 31))
    rem = m - jax.lax.shift_left(q, sc)
    if round == "nearest":
        return q + (rem >= half).astype(m.dtype)
    if round == "even":
        up = (rem > half) | ((rem == half) & ((q & 1) == 1))
        return q + up.astype(m.dtype)
    raise ValueError(f"Unrecognized round method {round!r}")


def quantize_elemwise_core(
    A: jax.Array,
    bits: int,
    exp_bits: int,
    max_norm: float,
    round: str = "nearest",
    saturate_normals: bool = False,
    allow_denorm: bool = True,
    flag: bool = False,
) -> jax.Array:
    """Quantize to a float/int grid with ``bits`` mantissa bits (incl. sign +
    implicit one) and ``exp_bits`` exponent bits (0 => fixed-point int grid).

    Semantics contract (reference elemwise_ops.py:92-180 / cpp/quantize.cuh:
    88-155):
      - private exponent = floor(log2(|A|)), clipped at the format's minimum
        normal exponent (denorms below that lose mantissa bits through the
        scaling).
      - mantissa rounded to the grid 2**(private_exp - (bits-2)).
      - overflow: clamp to +-max_norm if ``saturate_normals`` or int format,
        else map to +-Inf.
      - Inf/NaN pass through; zeros map to +0.

    Implemented entirely in integer bit arithmetic (see bitmath.py) so it is
    exact — fp32 subnormals included — on FTZ/DAZ backends (XLA CPU/TPU).
    """
    A = jnp.asarray(A, jnp.float32)
    sign_bits, E, M = decompose(A)
    nan_inf = E == 255
    zero = (E == 0) & (M == 0)
    negative = sign_bits < 0

    m_full = jnp.where(E > 0, M | _IMPLICIT_ONE, M)
    ex = jnp.where(E > 0, E - 127, -126)  # |A| = m_full * 2^(ex-23)
    flog2 = floor_log2_int(A)

    if exp_bits != 0:
        min_exp = -(2 ** (exp_bits - 1)) + 2
        private_exp = jnp.maximum(jnp.where(zero, 0, flog2), min_exp)
        spacing = private_exp - (bits - 2)
    else:
        spacing = jnp.full(A.shape, -(bits - 2), jnp.int32)
    shift = spacing - (ex - 23)  # scaled magnitude = m_full / 2^shift

    # shift >= 1: integer rounding; shift <= 0: exact power-of-two upscale.
    q_int = _round_shift(m_full, jnp.maximum(shift, 1), round)
    q_right = q_int.astype(jnp.float32)  # < 2^25, exact
    q_left = scalbn(m_full.astype(jnp.float32), -shift)
    qf = jnp.where(shift >= 1, q_right, q_left)

    if flag:
        # predict_phase: values rounded to zero from nonzero input become
        # +-1e-4 on the scaled grid (elemwise_ops.py:79-86).
        qf = jnp.where((qf == 0) & ~zero, jnp.float32(1e-4), qf)

    mag = scalbn(qf, spacing)
    out = jnp.where(negative, -mag, mag)

    # Saturation via select, not min/max — hardware min/max flushes subnormal
    # operands under DAZ, a where() select preserves the bits.
    mx = jnp.float32(max_norm)
    over = jnp.abs(out) > mx
    if saturate_normals or exp_bits == 0:
        out = jnp.where(over, jnp.where(negative, -mx, mx), out)
    else:
        out = jnp.where(over, jnp.where(negative, -jnp.inf, jnp.inf), out)

    if not allow_denorm and exp_bits > 0:
        # flush inputs below the format's min normal (reference
        # elemwise_ops.py:137-141); sign is preserved by the 0*A there.
        emin = 2 - 2 ** (exp_bits - 1)
        flush = (flog2 < emin) & ~zero
        out = jnp.where(flush, jnp.where(negative, -0.0, 0.0), out)

    out = jnp.where(zero, 0.0, out)      # reference maps -0 -> +0
    out = jnp.where(nan_inf, A, out)
    return out


def quantize_elemwise(
    A: jax.Array,
    elem_format: FormatLike,
    round: str = "nearest",
    saturate_normals: bool = False,
    allow_denorm: bool = True,
    predict_phase: bool = False,
) -> jax.Array:
    """Quantize to a named element format (reference _quantize_elemwise)."""
    if elem_format is None:
        return A
    ebits, mbits, _, max_norm, _ = format_params(elem_format)
    return quantize_elemwise_core(
        A, mbits, ebits, max_norm, round=round,
        saturate_normals=saturate_normals, allow_denorm=allow_denorm,
        flag=predict_phase)


def quantize_bfloat(A: jax.Array, bfloat: int, round: str = "nearest",
                    allow_denorm: bool = True) -> jax.Array:
    """Quantize to bfloatX (1 sign + 8 exp + (X-9) mantissa bits)."""
    if bfloat == 0 or bfloat == 32:
        return A
    max_norm = _max_norm(8, bfloat - 7)
    return quantize_elemwise_core(A, bits=bfloat - 7, exp_bits=8,
                                  max_norm=max_norm, round=round,
                                  allow_denorm=allow_denorm)


def quantize_fp(A: jax.Array, fp: int, round: str = "nearest",
                allow_denorm: bool = True) -> jax.Array:
    """Quantize to fpX (1 sign + 5 exp + (X-6) mantissa bits)."""
    if fp == 0:
        return A
    mantissa_bits = fp - 6
    max_norm = _max_norm(5, mantissa_bits + 2)
    return quantize_elemwise_core(A, bits=mantissa_bits + 2, exp_bits=5,
                                  max_norm=max_norm, round=round,
                                  allow_denorm=allow_denorm)


def quantize_elemwise_op(A: jax.Array, mx_specs, round: Optional[str] = None
                         ) -> jax.Array:
    """Spec-driven elementwise quantization (reference quantize_elemwise_op).

    The bfloat16/RNE case lowers to a native bf16 round-trip cast — on TPU
    that is a vector-unit op that XLA folds into neighboring computation.

    Sparse arrays: a ``jax.experimental.sparse`` BCOO/BCSR input has its
    stored values quantized and its indices kept (the reference quantizes
    torch sparse-COO values, elemwise_ops.py:112-118; its re-assembly bug
    at :176-177 — an undefined ``output`` name — is not replicated).
    """
    if mx_specs is None:
        return A
    if hasattr(A, "data") and hasattr(A, "indices") and not isinstance(
            A, jax.Array):  # jax.experimental.sparse BCOO/BCSR
        qdata = quantize_elemwise_op(A.data, mx_specs, round=round)
        return A.__class__((qdata,) + A._bufs[1:], shape=A.shape)
    if round is None:
        round = mx_specs.round

    if mx_specs.bfloat == 16 and round == "even" and mx_specs.bfloat_subnorms:
        return A.astype(jnp.bfloat16).astype(A.dtype)

    if mx_specs.bfloat > 0 and mx_specs.fp > 0:
        raise ValueError("Cannot set both bfloat and fp in mx_specs")
    if mx_specs.bfloat > 9:
        return quantize_bfloat(A, mx_specs.bfloat, round=round,
                               allow_denorm=mx_specs.bfloat_subnorms)
    if mx_specs.fp > 6:
        return quantize_fp(A, mx_specs.fp, round=round,
                           allow_denorm=mx_specs.bfloat_subnorms)
    return A
