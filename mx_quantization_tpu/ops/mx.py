"""MX (block floating point, shared-exponent) quantization in pure JAX.

Value-semantics parity with the reference block quantizer
(/root/reference/microxscaling/mx/mx_ops.py:49-341):

  * per-block shared exponent = floor(log2(max|block|)), exact via frexp
  * shared exponent offset by the element format's emax, then clamped to the
    scale range: overflow -> NaN (poisons the block, matching
    cpp/shared_exp.cuh:9-22), underflow -> -(2**(scale_bits-1)-1)
  * elements scaled into the block frame, elementwise-quantized with
    saturation, scaled back.

Layout design (TPU-first): instead of the reference's unsqueeze/pad/view
dance, a single axis is padded to a multiple of block_size and reshaped to
(..., n_blocks, block_size, ...).  Under jit, XLA folds the pad+reshape into
the surrounding computation; for the hot path see ops/kernels/ which fuses
quantization into the matmul prologue.

In addition to fake-quant (`quantize_mx`), `mx_encode`/`mx_decode` produce the
packed representation (int8 mantissa + int8 block exponent) used by the Pallas
kernels and by serving-time weight storage.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..formats import FP32_EXPONENT_BIAS, FormatLike, format_params
from .bitmath import bits_floor_log2, max_abs_bits, scalbn
from .elemwise import floor_log2_int, pow2, quantize_elemwise_core

Axis = Union[int, Sequence[int]]


def _single_axis(axes: Axis, ndim: int) -> int:
    if isinstance(axes, (list, tuple)):
        assert len(axes) == 1, (
            "TPU MX quantizer supports a single shared axis (the reference "
            "only ever uses one; see mx_ops.py:212 custom path assertion)")
        axes = axes[0]
    return axes % ndim


def block_view(A: jax.Array, axis: int, block_size: int):
    """Pad ``axis`` to a multiple of block_size and split it into
    (n_blocks, block_size).  Returns (blocked, orig_len)."""
    axis = axis % A.ndim
    n = A.shape[axis]
    if block_size <= 0:
        block_size = n
    pad = (-n) % block_size
    if pad:
        widths = [(0, 0)] * A.ndim
        widths[axis] = (0, pad)
        A = jnp.pad(A, widths)
    nb = (n + pad) // block_size
    shape = A.shape[:axis] + (nb, block_size) + A.shape[axis + 1:]
    return A.reshape(shape), n


def unblock_view(A: jax.Array, axis: int, orig_len: int) -> jax.Array:
    """Inverse of block_view: merge (n_blocks, block) and drop padding."""
    axis = axis % (A.ndim - 1)
    shape = A.shape[:axis] + (A.shape[axis] * A.shape[axis + 1],) + A.shape[axis + 2:]
    A = A.reshape(shape)
    if shape[axis] != orig_len:
        A = jax.lax.slice_in_dim(A, 0, orig_len, axis=axis)
    return A


def _shared_exp_bits(A: jax.Array, method: str, axes) -> jax.Array:
    """Shared-exponent magnitude bits: exact max(|A|) (or |A| for "none") as
    int32 IEEE bit patterns — FTZ/DAZ-immune (see bitmath.max_abs_bits)."""
    if method == "max":
        return max_abs_bits(A, axes)
    if method == "none":
        from .bitmath import f32_bits
        return f32_bits(A) & 0x7FFFFFFF
    raise ValueError(f"Unrecognized shared exponent method {method!r}")


def shared_exponents(A: jax.Array, method: str = "max",
                     axes: Optional[Sequence[int]] = None,
                     ebits: int = 0) -> jax.Array:
    """Per-block shared exponents as float (NaN marks overflow/NaN input).

    Matches reference _shared_exponents (mx_ops.py:49-99): zeros map to the
    fp32 minimum-normal exponent (-126); NaN/Inf magnitudes yield NaN / +128.
    """
    mb = _shared_exp_bits(A, method, axes)
    exp = bits_floor_log2(mb).astype(jnp.float32)
    exp = jnp.where(mb == 0, jnp.float32(-(FP32_EXPONENT_BIAS - 1)), exp)
    # NaN magnitude -> NaN exponent; Inf -> +Inf (log2 semantics)
    exp = jnp.where(mb > 0x7F800000, jnp.float32(jnp.nan), exp)
    exp = jnp.where(mb == 0x7F800000, jnp.float32(jnp.inf), exp)

    if ebits > 0:
        emax = 2 ** (ebits - 1) - 1
        exp = jnp.where(exp > emax, jnp.float32(jnp.nan), exp)
        exp = jnp.where(exp < -emax, jnp.float32(-emax), exp)
    return exp


def pow2_f(e: jax.Array) -> jax.Array:
    """Exact 2**e for float e holding small integers; NaN propagates."""
    finite = jnp.isfinite(e)
    p = pow2(jnp.where(finite, e, 0).astype(jnp.int32))
    return jnp.where(finite, p, e)


def quantize_mx(
    A: jax.Array,
    scale_bits: int,
    elem_format: FormatLike,
    axes: Axis,
    block_size: int = 0,
    shared_exp_method: str = "max",
    round: str = "nearest",
    flush_fp32_subnorms: bool = False,
    predict_phase: bool = False,
) -> jax.Array:
    """Fake-quantize A to an MX format along one axis (reference _quantize_mx)."""
    if elem_format is None:
        return A
    assert scale_bits > 0

    axis = _single_axis(axes, A.ndim)
    ebits, mbits, emax, max_norm, _ = format_params(elem_format)

    Ab, orig_len = block_view(A, axis, block_size)
    block_axis = axis + 1  # the inner (block) dimension after splitting

    mb = _shared_exp_bits(Ab, shared_exp_method, [block_axis])
    shared_exp = bits_floor_log2(mb)
    shared_exp = jnp.where(mb == 0, -(FP32_EXPONENT_BIAS - 1), shared_exp)
    bad_scale = mb >= 0x7F800000  # Inf/NaN block max -> NaN block

    if flush_fp32_subnorms:
        # zero out blocks whose max is fp32-subnormal (mx_ops.py:282-283);
        # use a select, not a multiply, to stay FTZ-safe.
        Ab = jnp.where(shared_exp > -FP32_EXPONENT_BIAS, Ab,
                       jnp.zeros_like(Ab))

    shared_exp = shared_exp - emax
    scale_emax = 2 ** (scale_bits - 1) - 1
    bad_scale = bad_scale | (shared_exp > scale_emax)  # overflow -> NaN block
    shared_exp = jnp.clip(shared_exp, -scale_emax, scale_emax)

    Ab = scalbn(Ab, -jnp.broadcast_to(shared_exp, Ab.shape))
    Ab = quantize_elemwise_core(
        Ab, mbits, ebits, max_norm, round=round,
        allow_denorm=True, saturate_normals=True, flag=predict_phase)
    Ab = scalbn(Ab, jnp.broadcast_to(shared_exp, Ab.shape))
    Ab = jnp.where(jnp.broadcast_to(bad_scale, Ab.shape),
                   jnp.float32(jnp.nan), Ab)

    return unblock_view(Ab, axis, orig_len)


def quantize_mx_op(
    A: jax.Array,
    mx_specs,
    elem_format: FormatLike = None,
    block_size: Optional[int] = None,
    axes: Axis = None,
    round: str = "nearest",
    predict_phase: bool = False,
) -> jax.Array:
    """Spec-driven MX quantization (reference quantize_mx_op, mx_ops.py:309)."""
    if elem_format is None:
        return A
    if block_size is None:
        block_size = mx_specs.block_size
    scale_bits = mx_specs.effective_scale_bits()
    return quantize_mx(
        A, scale_bits, elem_format, axes=axes, block_size=block_size,
        shared_exp_method=mx_specs.shared_exp_method, round=round,
        flush_fp32_subnorms=mx_specs.mx_flush_fp32_subnorms,
        predict_phase=predict_phase)


# ----------------------------------------------------------------------
# Packed MX representation (TPU-native storage / kernel feed format)
# ----------------------------------------------------------------------
class MxPacked(NamedTuple):
    """Packed MX tensor along the last axis.

    mantissa : int8, same shape as the (padded) source; for intX formats the
               value grid point is mantissa / 2**(mbits-2) * 2**exp.
    exp      : int8 per-block shared exponent (after emax offset and scale
               clamping); NaN-marked overflow blocks are encoded as +127
               sentinel and expanded back to NaN on decode.
    orig_len : unpadded length of the last axis.
    """
    mantissa: jax.Array
    exp: jax.Array
    orig_len: int
    elem_format: str
    block_size: int


_EXP_NAN_SENTINEL = 127


def mx_encode(A: jax.Array, elem_format: FormatLike, block_size: int,
              scale_bits: int = 8, round: str = "nearest",
              flush_fp32_subnorms: bool = False) -> MxPacked:
    """Encode A (last axis blocked) into int8 mantissas + int8 block exps.

    Only int formats are packable to int8 mantissas (int8/int4/int2); float
    element formats store bf16-exact grid points and are served via fake-quant.
    """
    fmt = elem_format if isinstance(elem_format, str) else elem_format
    ebits, mbits, emax, max_norm, _ = format_params(fmt)
    assert ebits == 0, "packed encoding supports int element formats"

    axis = A.ndim - 1
    Ab, orig_len = block_view(A, axis, block_size)

    mb = _shared_exp_bits(Ab, "max", [axis + 1])
    shared_exp = bits_floor_log2(mb)
    shared_exp = jnp.where(mb == 0, -(FP32_EXPONENT_BIAS - 1), shared_exp)
    overflow = mb >= 0x7F800000
    if flush_fp32_subnorms:
        Ab = jnp.where(shared_exp > -FP32_EXPONENT_BIAS, Ab,
                       jnp.zeros_like(Ab))
    shared_exp = shared_exp - emax
    scale_emax = 2 ** (scale_bits - 1) - 1
    overflow = overflow | (shared_exp > scale_emax)
    shared_exp = jnp.clip(shared_exp, -scale_emax, scale_emax)

    scaled = scalbn(Ab, jnp.broadcast_to(-shared_exp, Ab.shape))
    q = quantize_elemwise_core(scaled, mbits, 0, max_norm, round=round,
                               saturate_normals=True)
    mant = jnp.round(q * (2 ** (mbits - 2))).astype(jnp.int8)

    exp_i8 = jnp.where(overflow, _EXP_NAN_SENTINEL, shared_exp)
    exp_i8 = jnp.squeeze(exp_i8, axis=-1).astype(jnp.int8)
    name = fmt if isinstance(fmt, str) else fmt.name
    return MxPacked(mant, exp_i8, orig_len, name, block_size)


def mx_decode(p: MxPacked, dtype=jnp.float32) -> jax.Array:
    """Decode MxPacked back to dense values (exactly representable in bf16)."""
    ebits, mbits, emax, _, _ = format_params(p.elem_format)
    exp = p.exp.astype(jnp.int32)[..., None]
    val = p.mantissa.astype(dtype) * jnp.asarray(2.0 ** -(mbits - 2), dtype)
    scale = pow2(exp, dtype)
    out = val * scale
    out = jnp.where(exp == _EXP_NAN_SENTINEL, jnp.asarray(jnp.nan, dtype), out)
    return unblock_view(out, out.ndim - 2, p.orig_len)
