"""Quantized BatchNorm (1d/2d/3d) with running statistics.

Reference: microxscaling/mx/batchnorm.py:16-239 via norm_utils._norm_forward /
_norm_backward — normalization over (batch, *spatial) per channel, each step
through quantized vector ops; in training mode batch stats update the running
mean/var with momentum, in eval mode running stats are used.

Functional API: state (running_mean, running_var) is passed in and the
updated state is returned — the JAX-native replacement for mutable buffers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .vector import (vec_add, vec_mul, vec_quantize, vec_recip,
                     vec_reduce_mean, vec_reduce_sum, vec_sqrt, vec_sub)


class BatchNormState(NamedTuple):
    running_mean: jax.Array
    running_var: jax.Array


def init_batchnorm_state(num_features: int) -> BatchNormState:
    return BatchNormState(jnp.zeros((num_features,)),
                          jnp.ones((num_features,)))


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _bn_train(x, weight, bias, batch_stats, eps, axes, specs):
    out, _ = _bn_fwd(x, weight, bias, batch_stats, eps, axes, specs)
    return out


def _bn_fwd(x, weight, bias, batch_stats, eps, axes, specs):
    mean, var = batch_stats
    shape = [1] * x.ndim
    shape[1] = x.shape[1]
    x_mean = mean.reshape(shape)
    x_shift = vec_sub(x, x_mean, specs)
    x_vare = vec_add(var.reshape(shape), eps, specs)
    x_std_inv = vec_recip(vec_sqrt(x_vare, specs), specs)
    x_norm = vec_mul(x_shift, x_std_inv, specs)
    w = weight.reshape(shape)
    b = bias.reshape(shape)
    out = vec_add(vec_mul(w, x_norm, specs), b, specs)
    return out, (x_shift, x_std_inv, x_norm, weight)


# custom_vjp returns grads for (x, weight, bias, batch_stats)
def _bn_bwd(eps, axes, specs, res, g):
    x_shift, x_std_inv, x_norm, weight = res
    b = specs.backwards()
    g = vec_quantize(g, b)
    shape = [1] * g.ndim
    shape[1] = g.shape[1]
    grad_b = vec_reduce_sum(g, axes, mx_specs=b)
    grad_w = vec_reduce_sum(vec_mul(g, x_norm, b), axes, mx_specs=b)

    dx_norm = vec_mul(g, weight.reshape(shape), b)
    dx_shift = vec_mul(dx_norm, x_std_inv, b)
    dx_mean = vec_reduce_mean(-dx_shift, axes, keepdims=True, mx_specs=b)
    dx_std = vec_reduce_mean(vec_mul(dx_norm, x_shift, b), axes,
                             keepdims=True, mx_specs=b)
    x_vare_inv = vec_mul(x_std_inv, x_std_inv, b)
    dx_std = vec_mul(vec_mul(dx_std, x_vare_inv, b), x_std_inv, b)
    dx_shift2 = vec_mul(-dx_std, x_shift, b)
    dx = vec_add(vec_add(dx_shift, dx_shift2, b), dx_mean, b)
    return dx, grad_w, grad_b, (None, None)


_bn_train.defvjp(_bn_fwd, _bn_bwd)


def batch_norm(
    x: jax.Array,
    state: BatchNormState,
    weight: jax.Array,
    bias: jax.Array,
    training: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
    mx_specs=None,
) -> Tuple[jax.Array, BatchNormState]:
    """BatchNormNd over (N, C, *spatial).  Returns (out, new_state)."""
    axes = [0] + list(range(2, x.ndim))
    if mx_specs is None:
        if training:
            mean = x.mean(axis=axes)
            var = x.var(axis=axes)
        else:
            mean, var = state.running_mean, state.running_var
        shape = [1] * x.ndim
        shape[1] = x.shape[1]
        out = (x - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + eps)
        out = out * weight.reshape(shape) + bias.reshape(shape)
    else:
        q = vec_quantize(x, mx_specs)
        if training:
            mean = vec_reduce_mean(q, axes, mx_specs=mx_specs)
            diff = vec_sub(q, mean.reshape([1, -1] + [1] * (x.ndim - 2)),
                           mx_specs)
            var = vec_reduce_mean(vec_mul(diff, diff, mx_specs), axes,
                                  mx_specs=mx_specs)
        else:
            mean, var = state.running_mean, state.running_var
        bf_w = vec_quantize(weight, mx_specs)
        bf_b = vec_quantize(bias, mx_specs)
        out = _bn_train(q, bf_w, bf_b, (mean, var), eps, tuple(axes),
                        mx_specs)

    if training:
        n = 1.0
        for ax in axes:
            n *= x.shape[ax]
        unbiased = var * (n / max(n - 1.0, 1.0))
        new_state = BatchNormState(
            (1 - momentum) * state.running_mean + momentum * mean,
            (1 - momentum) * state.running_var + momentum * unbiased)
    else:
        new_state = state
    return out, new_state
