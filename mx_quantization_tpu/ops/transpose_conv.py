"""MX-quantized 2D transposed convolution.

Reference: microxscaling/mx/transpose_convolution.py:18-302 — forward
quantizes input and weight along the channel axes and runs conv_transpose;
backward mirrors the conv backward contract.  Implemented via the gradient
identity: conv_transpose(x, w) = vjp of conv wrt its input.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .conv import _conv, _tup
from .elemwise import quantize_elemwise_op
from .mx import quantize_mx_op


def _conv_transpose(x, w, stride, padding, groups):
    """x: (N, Cin, H, W), w: (Cin, Cout/groups, kh, kw) (torch layout)."""
    n_sp = x.ndim - 2
    strides = _tup(stride, n_sp)
    pads = _tup(padding, n_sp)
    N = x.shape[0]
    cin = w.shape[0]
    cout = w.shape[1] * groups
    out_spatial = tuple((x.shape[2 + i] - 1) * strides[i] -
                        2 * pads[i] + w.shape[2 + i]
                        for i in range(n_sp))
    out_shape = (N, cout) + out_spatial
    # conv_transpose(x, w) == input-vjp of the conv g: (N, Cout, H', W') ->
    # (N, Cin, H, W) whose OIHW weight is exactly torch's transpose-conv
    # layout (Cin, Cout/groups, kh, kw): O = Cin, I = Cout/groups — this
    # holds for grouped convs too (torch ConvTranspose2d groups contract,
    # reference transpose_convolution.py:18).
    w_conv = w
    zeros = jnp.zeros(out_shape, x.dtype)
    _, vjp = jax.vjp(lambda o: _conv(o, w_conv, stride, padding, 1, groups),
                     zeros)
    (out,) = vjp(x)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def mx_conv_transpose2d(x, w, b, stride, padding, groups, mx_specs):
    out, _ = _ct_fwd(x, w, b, stride, padding, groups, mx_specs)
    return out


def _ct_fwd(x, w, b, stride, padding, groups, specs):
    bf_x = quantize_elemwise_op(x, specs, round=specs.round_output)
    bf_w = quantize_elemwise_op(w, specs, round=specs.round_weight)
    bf_b = None if b is None else quantize_elemwise_op(
        b, specs, round=specs.round_weight)
    # input quantized along channels (axis 1); weight along Cin (axis 0 in
    # torch's (Cin, Cout, kh, kw) transpose-conv layout) — the contraction
    # axis, mirroring conv's in_channels contract.
    qx = quantize_mx_op(bf_x, specs, elem_format=specs.a_elem_format,
                        axes=[1], round=specs.round_mx_output)
    qw = quantize_mx_op(bf_w, specs, elem_format=specs.w_elem_format,
                        axes=[0], round=specs.round_mx_output)
    out = _conv_transpose(qx, qw, stride, padding, groups)
    if bf_b is not None:
        out = out + bf_b.reshape((1, -1) + (1,) * (out.ndim - 2))
    out = quantize_elemwise_op(out, specs, round=specs.round_output)
    saved = (bf_x, bf_w) if specs.quantize_backprop else (x, w)
    return out, saved + (b is not None,)


def _ct_bwd(stride, padding, groups, specs, res, g):
    x, w, has_bias = res
    bspecs = specs.backwards()
    g = quantize_elemwise_op(g, bspecs, round=bspecs.round_grad_input)
    qx = quantize_mx_op(x, bspecs, elem_format=bspecs.a_elem_format, axes=[0])
    qg = quantize_mx_op(g, bspecs, elem_format=bspecs.a_elem_format, axes=[0])
    _, w_vjp = jax.vjp(
        lambda w_: _conv_transpose(qx, w_, stride, padding, groups), w)
    grad_w, = w_vjp(qg)
    grad_w = quantize_elemwise_op(grad_w, bspecs,
                                  round=bspecs.round_grad_weight)

    qw = quantize_mx_op(w, bspecs, elem_format=bspecs.w_elem_format, axes=[1])
    qg2 = quantize_mx_op(g, bspecs, elem_format=bspecs.a_elem_format,
                         axes=[1])
    _, x_vjp = jax.vjp(
        lambda x_: _conv_transpose(x_, qw, stride, padding, groups), x)
    grad_x, = x_vjp(qg2)
    grad_x = quantize_elemwise_op(grad_x, bspecs,
                                  round=bspecs.round_grad_input)

    if has_bias:
        grad_b = g.sum([0] + list(range(2, g.ndim)))
        grad_b = quantize_elemwise_op(grad_b, bspecs,
                                      round=bspecs.round_grad_weight)
    else:
        grad_b = None
    return grad_x, grad_w, grad_b


mx_conv_transpose2d.defvjp(_ct_fwd, _ct_bwd)


def conv_transpose2d(x, w, b=None, stride=1, padding=0, groups=1,
                     mx_specs=None):
    if mx_specs is None:
        out = _conv_transpose(x, w, stride, padding, groups)
        if b is not None:
            out = out + b.reshape((1, -1) + (1,) * (out.ndim - 2))
        return out
    return mx_conv_transpose2d(x, w, b, stride, padding, groups, mx_specs)
