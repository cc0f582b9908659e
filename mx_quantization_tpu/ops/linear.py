"""Differentiable MX-quantized matmul family: linear / matmul / bmm.

Reproduces the reference's per-operand quantization-axis contract
(/root/reference/microxscaling/mx/linear.py:19-206, matmul.py:19-208,
bmm.py) using ``jax.custom_vjp``:

  forward   : operands elementwise-quantized (bfloat), MX-quantized along the
              contraction axis, matmul, output elementwise-quantized
  backward  : per the reference "madtile" scheme — grad_weight quantizes input
              and grad_output along the reduction (batch) axis, grad_input
              quantizes weight along axis 0 and grad_output along the output
              axis.  quantize_backprop=False strips all backward quantization.

TPU precision note: MXINT8/4/2 grid points are exactly representable in
bfloat16 (<= 7 explicit mantissa bits + shared power-of-two scale), so the
quantized matmul is lowered as a *single-pass bf16 MXU matmul with fp32
accumulation* — bit-identical products, full MXU throughput.  This replaces
the reference's fp32 cuBLAS call + set_matmul_precision downcast context
(matmul_precision.py:38-55).  Float element formats keep fp32 HIGHEST.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .elemwise import quantize_elemwise_op
from .fastquant import (bf_fast, fused_eligible, quantize_mx_fast,
                        quantize_mx_serving)
from .mx import quantize_mx_op
from ..specs import mx_assert_test

_INT_FMTS = ("int8", "int4", "int2")


def mx_dot(a: jax.Array, b: jax.Array, fmt_a, fmt_b,
           dimension_numbers=None) -> jax.Array:
    """Contraction with precision chosen from element formats.

    For int element formats both operands are exact in bf16 -> single-pass
    MXU.  Otherwise fp32 HIGHEST (6-pass) to preserve fp32-grade products.
    """
    int_path = fmt_a in _INT_FMTS and fmt_b in _INT_FMTS
    if int_path:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    if dimension_numbers is None:
        out = jnp.matmul(a, b, precision=precision,
                         preferred_element_type=jnp.float32)
    else:
        out = jax.lax.dot_general(a, b, dimension_numbers,
                                  precision=precision,
                                  preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


# ======================================================================
# linear: out = x @ w.T + b,  w: (out_features, in_features)
# ======================================================================
@partial(jax.custom_vjp, nondiff_argnums=(3,))
def mx_linear(x, w, b, mx_specs):
    out, _ = _linear_fwd(x, w, b, mx_specs)
    return out


def _linear_fwd(x, w, b, specs):
    if fused_eligible(specs, specs.a_elem_format, specs.w_elem_format):
        return _linear_fwd_fast(x, w, b, specs)
    bf_x = quantize_elemwise_op(x, specs, round=specs.round_output)
    bf_w = quantize_elemwise_op(w, specs, round=specs.round_weight)
    bf_b = None if b is None else quantize_elemwise_op(
        b, specs, round=specs.round_weight)

    qx = quantize_mx_op(bf_x, specs, elem_format=specs.a_elem_format,
                        axes=[-1], round=specs.round_mx_output)
    if specs.prequantized_weights:
        qw = bf_w  # already on the MX grid (idempotent to requantize)
    else:
        qw = quantize_mx_op(bf_w, specs, elem_format=specs.w_elem_format,
                            axes=[-1], round=specs.round_mx_output)

    # x: (..., in) @ w.T: (in, out)
    out = mx_dot(qx, qw.T, specs.a_elem_format, specs.w_elem_format)
    out = quantize_elemwise_op(out, specs, round=specs.round_output)
    if bf_b is not None:
        out = quantize_elemwise_op(out + bf_b, specs,
                                   round=specs.round_output)

    saved_x, saved_w = (bf_x, bf_w) if specs.quantize_backprop else (x, w)
    return out, (saved_x, saved_w, b is not None)


def _linear_fwd_fast(x, w, b, specs):
    """Serving fast path: XLA-fused float-domain quantization + bf16 MXU
    matmul (see ops/fastquant.py).  Same contract as the emulation path for
    the int-format operating points."""
    bs = specs.block_size
    sb = specs.effective_scale_bits()
    fl = specs.mx_flush_fp32_subnorms
    if specs.prequantized_activations:
        # a producer-side fused kernel (ln_modulate_quantize_pallas) already
        # put x on the MX grid along -1; re-quantizing is idempotent — skip
        qx = bf_fast(x, specs).astype(jnp.bfloat16)
    else:
        # the bfloat elementwise round rides inside the quantize
        qx = quantize_mx_serving(x, specs.a_elem_format, bs, sb, axis=-1,
                                 flush=fl, bfloat=specs.bfloat)
    if specs.prequantized_weights:
        qw = w.astype(jnp.bfloat16)  # already on the MX grid
    else:
        qw = quantize_mx_fast(bf_fast(w, specs), specs.w_elem_format, bs,
                              sb, axis=-1, flush=fl)
    out = jnp.matmul(qx, qw.T, preferred_element_type=jnp.float32)
    out = bf_fast(out, specs)
    if b is not None:
        out = bf_fast(out + bf_fast(b, specs), specs)
    saved_x, saved_w = (bf_fast(x, specs), bf_fast(w, specs)) \
        if specs.quantize_backprop else (x, w)
    return out, (saved_x, saved_w, b is not None)


def _linear_bwd(specs, res, g):
    x, w, has_bias = res
    bspecs = specs.backwards()
    out_dim, in_dim = w.shape

    g = quantize_elemwise_op(g, bspecs, round=bspecs.round_grad_input)

    # ---- grad_weight: quantize along the contraction (batch/token) axis
    qex_x = quantize_mx_op(x, bspecs, elem_format=bspecs.a_elem_format_bp,
                           axes=[-2], round=bspecs.round_mx_input_grad_weight)
    qex_g = quantize_mx_op(g, bspecs, elem_format=bspecs.a_elem_format_bp_ex,
                           axes=[-2],
                           round=bspecs.round_mx_grad_output_grad_weight)
    qex_g2 = qex_g.reshape(-1, out_dim)
    qex_x2 = qex_x.reshape(-1, in_dim)
    grad_w = mx_dot(qex_g2.T, qex_x2, bspecs.a_elem_format_bp_ex,
                    bspecs.a_elem_format_bp)
    grad_w = quantize_elemwise_op(grad_w, bspecs,
                                  round=bspecs.round_grad_weight)

    # ---- grad_input: weight quantized along out_features (axis 0)
    qos_w = quantize_mx_op(w, bspecs, elem_format=bspecs.w_elem_format_bp,
                           axes=[0], round=bspecs.round_mx_weight_grad_input)
    qos_g = quantize_mx_op(g, bspecs, elem_format=bspecs.a_elem_format_bp_os,
                           axes=[-1],
                           round=bspecs.round_mx_grad_output_grad_input)
    grad_x = mx_dot(qos_g, qos_w, bspecs.a_elem_format_bp_os,
                    bspecs.w_elem_format_bp)
    grad_x = quantize_elemwise_op(grad_x, bspecs,
                                  round=bspecs.round_grad_input)

    if has_bias:
        grad_b = g.reshape(-1, out_dim).sum(0)
        grad_b = quantize_elemwise_op(grad_b, bspecs,
                                      round=bspecs.round_grad_weight)
    else:
        grad_b = None
    return grad_x, grad_w, grad_b


mx_linear.defvjp(_linear_fwd, _linear_bwd)


def linear(x, w, b=None, mx_specs=None):
    """Public linear op.  mx_specs=None -> plain fp linear (reference
    linear.py:209-224 fallthrough)."""
    mx_assert_test(mx_specs)
    if mx_specs is None:
        out = jnp.matmul(x, w.T, precision=jax.lax.Precision.HIGHEST)
        return out if b is None else out + b
    return mx_linear(x, w, b, mx_specs)


# ======================================================================
# matmul: general (batched) a @ b with per-operand a/w format choice
# ======================================================================
@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mx_matmul(a, b, mx_specs, mode_config="aa"):
    out, _ = _matmul_fwd(a, b, mx_specs, mode_config)
    return out


def _fmt(specs, which):
    return specs.a_elem_format if which == "a" else specs.w_elem_format


def _fmt_bp(specs, which):
    return specs.a_elem_format_bp if which == "a" else specs.w_elem_format_bp


def _matmul_fwd(a, b, specs, mode_config):
    assert mode_config in ("aa", "aw", "wa")
    fmt1 = _fmt(specs, mode_config[0])
    fmt2 = _fmt(specs, mode_config[1])

    if fused_eligible(specs, fmt1, fmt2):
        return _matmul_fwd_fast(a, b, specs, fmt1, fmt2)

    bf_a = quantize_elemwise_op(a, specs, round=specs.round_output)
    bf_b = quantize_elemwise_op(b, specs, round=specs.round_output)

    qa = quantize_mx_op(bf_a, specs, elem_format=fmt1, axes=[-1],
                        round=specs.round_mx_output)
    qb = quantize_mx_op(bf_b, specs, elem_format=fmt2, axes=[-2],
                        round=specs.round_mx_output)

    out = mx_dot(qa, qb, fmt1, fmt2)
    out = quantize_elemwise_op(out, specs, round=specs.round_output)

    saved = (bf_a, bf_b) if specs.quantize_backprop else (a, b)
    return out, saved


def _matmul_fwd_fast(a, b, specs, fmt1, fmt2):
    bs = specs.block_size
    sb = specs.effective_scale_bits()
    fl = specs.mx_flush_fp32_subnorms
    qa = quantize_mx_serving(a, fmt1, bs, sb, axis=-1, flush=fl,
                             bfloat=specs.bfloat)
    qb = quantize_mx_fast(bf_fast(b, specs), fmt2, bs, sb, axis=-2,
                          flush=fl)
    out = jnp.matmul(qa, qb, preferred_element_type=jnp.float32)
    out = bf_fast(out, specs)
    saved = (bf_fast(a, specs), bf_fast(b, specs)) \
        if specs.quantize_backprop else (a, b)
    return out, saved


def _matmul_bwd(specs, mode_config, res, g):
    a, b = res
    bspecs = specs.backwards()
    fmt1 = _fmt_bp(bspecs, mode_config[0])
    fmt2 = _fmt_bp(bspecs, mode_config[1])

    g = quantize_elemwise_op(g, bspecs, round=bspecs.round_grad_input)

    qa = quantize_mx_op(a, bspecs, elem_format=fmt1, axes=[-2],
                        round=bspecs.round_mx_input_grad_input)
    qb = quantize_mx_op(b, bspecs, elem_format=fmt2, axes=[-1],
                        round=bspecs.round_mx_input_grad_input)
    qg1 = quantize_mx_op(g, bspecs, elem_format=bspecs.a_elem_format_bp_os,
                         axes=[-1],
                         round=bspecs.round_mx_grad_output_grad_input)
    qg2 = quantize_mx_op(g, bspecs, elem_format=bspecs.a_elem_format_bp_os,
                         axes=[-2],
                         round=bspecs.round_mx_grad_output_grad_input)

    grad_a = mx_dot(qg1, jnp.swapaxes(qb, -1, -2),
                    bspecs.a_elem_format_bp_os, fmt2)
    grad_b = mx_dot(jnp.swapaxes(qa, -1, -2), qg2, fmt1,
                    bspecs.a_elem_format_bp_os)

    grad_a = quantize_elemwise_op(grad_a, bspecs,
                                  round=bspecs.round_grad_input)
    grad_b = quantize_elemwise_op(grad_b, bspecs,
                                  round=bspecs.round_grad_input)

    # 2D b against ND a (reference matmul.py:25-28 shape contract): reduce
    # the broadcasted batch dims of grad_b.
    if grad_b.ndim > b.ndim:
        grad_b = grad_b.reshape((-1,) + b.shape).sum(0)
    if grad_a.ndim > a.ndim:
        grad_a = grad_a.reshape((-1,) + a.shape).sum(0)
    return grad_a, grad_b


mx_matmul.defvjp(_matmul_fwd, _matmul_bwd)


def matmul(a, b, bias=None, mx_specs=None, mode_config="aa"):
    """Public matmul (reference matmul.py:211-222).  bias follows addmm."""
    mx_assert_test(mx_specs)
    if mx_specs is None:
        out = jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        return out if bias is None else out + bias
    out = mx_matmul(a, b, mx_specs, mode_config)
    if bias is not None:
        bf_bias = quantize_elemwise_op(bias, mx_specs,
                                       round=mx_specs.round_weight)
        out = quantize_elemwise_op(out + bf_bias, mx_specs,
                                   round=mx_specs.round_output)
    return out


def bmm(a, b, mx_specs=None):
    """Batched matmul; both operands use a_elem_format (reference bmm.py:40-53)."""
    mx_assert_test(mx_specs)
    if mx_specs is None:
        return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    return mx_matmul(a, b, mx_specs, "aa")
