"""Quantized normalization layers (LayerNorm / RMSNorm / GroupNorm).

Reference semantics: /root/reference/microxscaling/mx/norm_utils.py:25-258,
layernorm.py:17-210, groupnorm.py — the mean/var/rsqrt chain runs step-by-step
through vector ops, each re-quantized to the elementwise format; backward uses
the three-term norm gradient with the reference's DeepSpeed-style LN variant.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .vector import (vec_add, vec_div, vec_mul, vec_quantize, vec_recip,
                     vec_reduce_mean, vec_reduce_sum, vec_sqrt, vec_sub)
from ..specs import mx_assert_test


def _norm_forward(x, axis, weight, bias, eps, specs):
    """Shared mean/var chain (reference _norm_forward, norm_utils.py:25-115).

    weight/bias must already be elementwise-quantized; returns
    (output, x_shift, x_norm, x_std_inv, x_mean, x_vare).
    """
    x_mean = vec_reduce_mean(x, axis, keepdims=True, mx_specs=specs)
    x_shift = vec_sub(x, x_mean, specs)
    x_var = vec_reduce_mean(vec_mul(x_shift, x_shift, specs), axis,
                            keepdims=True, mx_specs=specs)
    x_vare = vec_add(x_var, eps, specs)
    x_std = vec_sqrt(x_vare, specs)
    x_std_inv = vec_recip(x_std, specs)
    x_norm = vec_mul(x_shift, x_std_inv, specs)
    out = vec_add(vec_mul(weight, x_norm, specs), bias, specs)
    return out, x_shift, x_norm, x_std_inv, x_mean, x_vare


def _norm_backward_LN(g, axis, weight, x_norm, x_vare, specs):
    """LN input gradient (reference _norm_backward_LN, norm_utils.py:187-258)."""
    dx_norm = vec_mul(g, weight, specs)
    x_std = vec_sqrt(x_vare, specs)
    x_std_inv = vec_div(1.0, x_std, specs)
    dx_shift = vec_mul(dx_norm, x_std_inv, specs)

    t = vec_mul(dx_norm, x_norm, specs)
    t = vec_mul(t, x_std, specs)
    t = vec_reduce_mean(t, axis, keepdims=True, mx_specs=specs)
    x_vare_inv = vec_div(1.0, x_vare, specs)
    t = vec_mul(t, x_vare_inv, specs)
    dx_shift2 = vec_mul(-t, x_norm, specs)

    dx = vec_add(dx_shift, dx_shift2, specs)
    dx_mean = vec_reduce_mean(dx, axis, keepdims=True, mx_specs=specs)
    return vec_add(dx, -dx_mean, specs)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mx_layer_norm(x, weight, bias, eps, mx_specs):
    out, _ = _ln_fwd(x, weight, bias, eps, mx_specs)
    return out


def _ln_fwd(x, weight, bias, eps, specs):
    qx = vec_quantize(x, specs)
    bf_w = vec_quantize(weight, specs)
    bf_b = vec_quantize(bias, specs)
    out, _, x_norm, _, _, x_vare = _norm_forward(qx, -1, bf_w, bf_b, eps,
                                                 specs)
    saved_w = bf_w if specs.quantize_backprop else weight
    return out, (x_norm, x_vare, saved_w)


def _ln_bwd(eps, specs, res, g):
    x_norm, x_vare, weight = res
    b = specs.backwards()
    sum_axes = list(range(g.ndim - 1))
    g = vec_quantize(g, b)
    grad_b = vec_reduce_sum(g, sum_axes, mx_specs=b)
    grad_w = vec_reduce_sum(vec_mul(g, x_norm, b), sum_axes, mx_specs=b)
    grad_x = _norm_backward_LN(g, -1, weight, x_norm, x_vare, b)
    return grad_x, grad_w, grad_b


mx_layer_norm.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x, weight, bias, eps=1e-12, mx_specs=None):
    mx_assert_test(mx_specs)
    if mx_specs is None:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + eps)
        if weight is not None:
            out = out * weight
        if bias is not None:
            out = out + bias
        return out
    return mx_layer_norm(x, weight, bias, eps, mx_specs)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mx_rms_norm(x, weight, bias, eps, mx_specs):
    out, _ = _rms_fwd(x, weight, bias, eps, mx_specs)
    return out


def _rms_fwd(x, weight, bias, eps, specs):
    qx = vec_quantize(x, specs)
    x2 = vec_mul(qx, qx, specs)
    x_ms = vec_reduce_mean(x2, -1, keepdims=True, mx_specs=specs)
    x_mse = vec_add(x_ms, eps, specs)
    x_rms = vec_sqrt(x_mse, specs)
    x_rms_inv = vec_recip(x_rms, specs)
    x_norm = vec_mul(qx, x_rms_inv, specs)
    bf_w = vec_quantize(weight, specs)
    bf_b = vec_quantize(bias, specs)
    out = vec_add(vec_mul(bf_w, x_norm, specs), bf_b, specs)
    saved_w = bf_w if specs.quantize_backprop else weight
    return out, (x_norm, x_rms_inv, saved_w)


def _rms_bwd(eps, specs, res, g):
    x_norm, x_rms_inv, weight = res
    b = specs.backwards()
    sum_axes = list(range(g.ndim - 1))
    g = vec_quantize(g, b)
    grad_b = vec_reduce_sum(g, sum_axes, mx_specs=b)
    grad_w = vec_reduce_sum(vec_mul(g, x_norm, b), sum_axes, mx_specs=b)

    dx_norm = vec_mul(g, weight, b)
    dx1 = vec_mul(dx_norm, x_rms_inv, b)
    dx_norm2 = vec_reduce_mean(vec_mul(dx1, x_norm, b), -1, keepdims=True,
                               mx_specs=b)
    dx_norm3 = vec_mul(x_norm, dx_norm2, b)
    grad_x = vec_sub(dx1, dx_norm3)
    return grad_x, grad_w, grad_b


mx_rms_norm.defvjp(_rms_fwd, _rms_bwd)


def rms_norm(x, weight, bias, eps=1e-12, mx_specs=None):
    mx_assert_test(mx_specs)
    if mx_specs is None:
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        out = x * jax.lax.rsqrt(ms + eps)
        if weight is not None:
            out = out * weight
        if bias is not None:
            out = out + bias
        return out
    return mx_rms_norm(x, weight, bias, eps, mx_specs)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def mx_group_norm(x, weight, bias, num_groups, eps, mx_specs):
    out, _ = _gn_fwd(x, weight, bias, num_groups, eps, mx_specs)
    return out


def _gn_fwd(x, weight, bias, num_groups, eps, specs):
    """GroupNorm over (N, C, *spatial): normalize within each group of
    channels + all spatial dims (reference groupnorm.py via _norm_forward
    with groups)."""
    N, C = x.shape[0], x.shape[1]
    assert C % num_groups == 0
    spatial = x.shape[2:]
    qx = vec_quantize(x, specs)
    xg = qx.reshape((N, num_groups, C // num_groups) + spatial)
    axes = list(range(2, xg.ndim))
    x_mean = vec_reduce_mean(xg, axes, keepdims=True, mx_specs=specs)
    x_shift = vec_sub(xg, x_mean, specs)
    x_var = vec_reduce_mean(vec_mul(x_shift, x_shift, specs), axes,
                            keepdims=True, mx_specs=specs)
    x_vare = vec_add(x_var, eps, specs)
    x_std_inv = vec_recip(vec_sqrt(x_vare, specs), specs)
    x_norm = vec_mul(x_shift, x_std_inv, specs).reshape(x.shape)
    bf_w = vec_quantize(weight, specs).reshape((1, C) + (1,) * len(spatial))
    bf_b = vec_quantize(bias, specs).reshape((1, C) + (1,) * len(spatial))
    out = vec_add(vec_mul(bf_w, x_norm, specs), bf_b, specs)
    saved_w = bf_w if specs.quantize_backprop else weight
    return out, (x_shift, x_std_inv, x_norm, saved_w)


def _gn_bwd(num_groups, eps, specs, res, g):
    x_shift, x_std_inv, x_norm, weight = res
    b = specs.backwards()
    N, C = g.shape[0], g.shape[1]
    spatial = g.shape[2:]
    sum_axes = [0] + list(range(2, g.ndim))
    g = vec_quantize(g, b)
    grad_b = vec_reduce_sum(g, sum_axes, mx_specs=b)
    grad_w = vec_reduce_sum(vec_mul(g, x_norm, b), sum_axes, mx_specs=b)

    w = jnp.reshape(weight, (1, C) + (1,) * len(spatial))
    dx_norm = vec_mul(g, w, b)
    dx_norm = dx_norm.reshape((N, num_groups, C // num_groups) + spatial)
    axes = list(range(2, dx_norm.ndim))
    dx_shift = vec_mul(dx_norm, x_std_inv, b)
    dx_mean = vec_reduce_mean(-dx_shift, axes, keepdims=True, mx_specs=b)
    dx_std = vec_reduce_mean(vec_mul(dx_norm, x_shift, b), axes,
                             keepdims=True, mx_specs=b)
    x_vare_inv = vec_mul(x_std_inv, x_std_inv, b)
    dx_std = vec_mul(vec_mul(dx_std, x_vare_inv, b), x_std_inv, b)
    dx_shift2 = vec_mul(-dx_std, x_shift, b)
    dx = vec_add(vec_add(dx_shift, dx_shift2, b), dx_mean, b)
    return dx.reshape(g.shape), grad_w, grad_b


mx_group_norm.defvjp(_gn_fwd, _gn_bwd)


def group_norm(x, weight, bias, num_groups=32, eps=1e-5, mx_specs=None):
    mx_assert_test(mx_specs)
    if mx_specs is None:
        N, C = x.shape[0], x.shape[1]
        spatial = x.shape[2:]
        xg = x.reshape((N, num_groups, C // num_groups) + spatial)
        axes = tuple(range(2, xg.ndim))
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        out = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        shape = (1, C) + (1,) * len(spatial)
        if weight is not None:
            out = out * weight.reshape(shape)
        if bias is not None:
            out = out + bias.reshape(shape)
        return out
    return mx_group_norm(x, weight, bias, num_groups, eps, mx_specs)
