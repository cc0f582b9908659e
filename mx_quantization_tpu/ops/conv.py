"""MX-quantized N-D convolution via lax.conv_general_dilated.

Reference semantics (/root/reference/microxscaling/mx/convolution.py:110-312):
  forward : input and weight MX-quantized along the in_channels axis (axis 1
            in NCHW / OIHW), bias added inside the conv, output elementwise-
            quantized.
  backward: grad_weight quantizes input + grad_output along the batch axis;
            grad_input quantizes weight along out_channels (axis 0) and
            grad_output along channels (axis 1); both elementwise-quantized.

On TPU the grads are expressed with lax transposed/dilated convolutions,
which XLA maps onto the MXU directly (no explicit im2col).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .elemwise import quantize_elemwise_op
from .mx import quantize_mx_op

IntOrTuple = Union[int, Sequence[int]]


def _tup(v: IntOrTuple, n: int) -> Tuple[int, ...]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


def _dim_numbers(num_spatial: int):
    # NCHW / OIHW convention to match the reference layouts.
    spatial = "".join(chr(ord("0") + i) for i in range(num_spatial))
    lhs = "NC" + spatial
    rhs = "OI" + spatial
    out = "NC" + spatial
    return jax.lax.conv_dimension_numbers((0,) * (2 + num_spatial),
                                          (0,) * (2 + num_spatial),
                                          (lhs, rhs, out))


def _conv(x, w, stride, padding, dilation, groups, precision="highest"):
    n_sp = x.ndim - 2
    dn = _dim_numbers(n_sp)
    pad = [(p, p) for p in _tup(padding, n_sp)]
    prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=_tup(stride, n_sp), padding=pad,
        rhs_dilation=_tup(dilation, n_sp), dimension_numbers=dn,
        feature_group_count=groups,
        precision=prec,
        preferred_element_type=jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def mx_conv(x, w, b, stride, padding, dilation, groups, mx_specs):
    out, _ = _conv_fwd(x, w, b, stride, padding, dilation, groups, mx_specs)
    return out


def _conv_fwd(x, w, b, stride, padding, dilation, groups, specs):
    bf_x = quantize_elemwise_op(x, specs, round=specs.round_output)
    bf_w = quantize_elemwise_op(w, specs, round=specs.round_weight)
    bf_b = None if b is None else quantize_elemwise_op(
        b, specs, round=specs.round_weight)

    qx = quantize_mx_op(bf_x, specs, elem_format=specs.a_elem_format,
                        axes=[1], round=specs.round_mx_output)
    qw = quantize_mx_op(bf_w, specs, elem_format=specs.w_elem_format,
                        axes=[1], round=specs.round_mx_output)

    out = _conv(qx, qw, stride, padding, dilation, groups)
    if bf_b is not None:
        out = out + bf_b.reshape((1, -1) + (1,) * (out.ndim - 2))
    out = quantize_elemwise_op(out, specs, round=specs.round_output)

    saved = (bf_x, bf_w) if specs.quantize_backprop else (x, w)
    return out, saved + (b is not None,)


def _conv_bwd(stride, padding, dilation, groups, specs, res, g):
    x, w, has_bias = res
    bspecs = specs.backwards()
    n_sp = x.ndim - 2

    g = quantize_elemwise_op(g, bspecs, round=bspecs.round_grad_input)

    # ---- grad_weight: quantize along the batch axis
    qex_x = quantize_mx_op(x, bspecs, elem_format=bspecs.a_elem_format,
                           axes=[0])
    qex_g = quantize_mx_op(g, bspecs, elem_format=bspecs.a_elem_format,
                           axes=[0])
    _, w_vjp = jax.vjp(
        lambda w_: _conv(qex_x, w_, stride, padding, dilation, groups), w)
    grad_w, = w_vjp(qex_g)
    grad_w = quantize_elemwise_op(grad_w, bspecs,
                                  round=bspecs.round_grad_weight)

    # ---- grad_input: weight quantized along out_channels, grad along channels
    qod_w = quantize_mx_op(w, bspecs, elem_format=bspecs.w_elem_format,
                           axes=[0])
    qod_g = quantize_mx_op(g, bspecs, elem_format=bspecs.a_elem_format,
                           axes=[1])
    _, x_vjp = jax.vjp(
        lambda x_: _conv(x_, qod_w, stride, padding, dilation, groups), x)
    grad_x, = x_vjp(qod_g)
    grad_x = quantize_elemwise_op(grad_x, bspecs,
                                  round=bspecs.round_grad_input)

    if has_bias:
        sum_axes = [0] + list(range(2, g.ndim))
        grad_b = g.sum(sum_axes)
        grad_b = quantize_elemwise_op(grad_b, bspecs,
                                      round=bspecs.round_grad_weight)
    else:
        grad_b = None
    return grad_x, grad_w, grad_b


mx_conv.defvjp(_conv_fwd, _conv_bwd)


def conv2d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs=None, precision="highest"):
    """2D convolution, NCHW/OIHW layout (reference conv2d).

    precision: "highest" (fp32-grade, the parity default) or "default"
    (single-pass bf16 MXU — the serving choice for unquantized convs)."""
    if mx_specs is None:
        if precision == "default":
            x = x.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
        out = _conv(x, w, stride, padding, dilation, groups, precision)
        if b is not None:
            out = out + b.reshape((1, -1) + (1,) * (out.ndim - 2))
        return out
    return mx_conv(x, w, b, stride, padding, dilation, groups, mx_specs)


conv1d = conv2d  # layout-generic: spatial rank comes from the input
conv3d = conv2d
