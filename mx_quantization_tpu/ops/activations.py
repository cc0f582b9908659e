"""Quantized activations as vector-op chains.

Reference semantics: /root/reference/microxscaling/mx/activations.py —
GELU via sigmoid approximation with bf16-exact constants (activations.py
GELUFunction docstring), SiLU as x*sigmoid(x), ReLU/Tanh/Sigmoid as quantized
compositions.  Backward formulas follow the reference chains.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .vector import (vec_add, vec_exp, vec_mul, vec_quantize, vec_recip,
                     vec_sub, vec_tanh)

# bf16-exact constants (reference activations.py GELUFunction docstring)
GELU_C1 = 1.703125       # ~1.702
GELU_C3 = 0.044677734    # ~0.044715
GELU_SCALE = 1.59375     # ~1.5958
GELU_DSCALE = 0.21386719  # ~0.21406859 = 3 * 1.5958 * 0.044715


def _sigmoid_chain(x, specs, round=None):
    phi = vec_exp(-x, specs, round=round)
    phi = vec_add(phi, 1.0, specs, round=round)
    return vec_recip(phi, specs, round=round)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def mx_gelu(x, mx_specs, first_order=False):
    out, _ = _gelu_fwd(x, mx_specs, first_order)
    return out


def _gelu_fwd(x, specs, first_order):
    q = vec_quantize(x, specs)
    if first_order:
        si = vec_mul(GELU_C1, q, specs)
    else:
        si = vec_mul(q, q, specs)
        si = vec_mul(si, q, specs)
        si = vec_mul(GELU_C3, si, specs)
        si = vec_add(si, q, specs)
        si = vec_mul(GELU_SCALE, si, specs)
    phi = _sigmoid_chain(si, specs)
    out = vec_mul(q, phi, specs)
    saved = (q if specs.quantize_backprop else x, phi)
    return out, saved


def _gelu_bwd(specs, first_order, res, g):
    x, phi = res
    b = specs.backwards()
    g = vec_quantize(g, b)
    dphi = vec_sub(1.0, phi, b)
    dphi = vec_mul(phi, dphi, b)
    if first_order:
        dphi = vec_mul(GELU_C1, dphi, b)
    else:
        dy = vec_mul(x, x, b)
        dy = vec_mul(GELU_DSCALE, dy, b)
        dy = vec_add(GELU_SCALE, dy, b)
        dphi = vec_mul(dy, dphi, b)
    x_dphi = vec_mul(x, dphi, b)
    grad_gelu = vec_add(phi, x_dphi, b)
    return (vec_mul(grad_gelu, g, b),)


mx_gelu.defvjp(_gelu_fwd, _gelu_bwd)


def gelu(x, mx_specs=None, first_order_gelu=False):
    if mx_specs is None:
        return jax.nn.gelu(x, approximate=False)
    return mx_gelu(x, mx_specs, first_order_gelu)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def mx_silu(x, mx_specs):
    out, _ = _silu_fwd(x, mx_specs)
    return out


def _silu_fwd(x, specs):
    q = vec_quantize(x, specs)
    sig = _sigmoid_chain(q, specs)
    out = vec_mul(q, sig, specs)
    return out, (out, sig)


def _silu_bwd(specs, res, g):
    y, sig = res
    b = specs.backwards()
    g = vec_quantize(g, b)
    t = vec_sub(1.0, sig, b)
    t = vec_mul(y, t, b)
    gs = vec_add(sig, t, b)
    return (vec_mul(gs, g, b),)


mx_silu.defvjp(_silu_fwd, _silu_bwd)


def silu(x, mx_specs=None):
    if mx_specs is None:
        return jax.nn.silu(x)
    return mx_silu(x, mx_specs)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def mx_relu(x, mx_specs):
    out, _ = _relu_fwd(x, mx_specs)
    return out


def _relu_fwd(x, specs):
    q = vec_quantize(x, specs)
    out = vec_quantize(jnp.maximum(q, 0), specs)
    return out, (out > 0,)


def _relu_bwd(specs, res, g):
    mask, = res
    b = specs.backwards()
    g = vec_quantize(g, b)
    return (jnp.where(mask, g, jnp.zeros_like(g)),)


mx_relu.defvjp(_relu_fwd, _relu_bwd)


def relu(x, mx_specs=None):
    if mx_specs is None:
        return jax.nn.relu(x)
    return mx_relu(x, mx_specs)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def mx_sigmoid(x, mx_specs):
    out, _ = _sigmoid_fwd(x, mx_specs)
    return out


def _sigmoid_fwd(x, specs):
    q = vec_quantize(x, specs)
    out = _sigmoid_chain(q, specs)
    return out, (out,)


def _sigmoid_bwd(specs, res, g):
    y, = res
    b = specs.backwards()
    g = vec_quantize(g, b)
    t = vec_sub(1.0, y, b)
    t = vec_mul(y, t, b)
    return (vec_mul(t, g, b),)


mx_sigmoid.defvjp(_sigmoid_fwd, _sigmoid_bwd)


def sigmoid(x, mx_specs=None):
    if mx_specs is None:
        return jax.nn.sigmoid(x)
    return mx_sigmoid(x, mx_specs)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def mx_tanh(x, mx_specs):
    out, _ = _tanh_fwd(x, mx_specs)
    return out


def _tanh_fwd(x, specs):
    q = vec_quantize(x, specs)
    out = vec_tanh(q, specs)
    return out, (out,)


def _tanh_bwd(specs, res, g):
    y, = res
    b = specs.backwards()
    g = vec_quantize(g, b)
    t = vec_mul(y, y, b)
    t = vec_sub(1.0, t, b)
    return (vec_mul(t, g, b),)


mx_tanh.defvjp(_tanh_fwd, _tanh_bwd)


def tanh(x, mx_specs=None):
    if mx_specs is None:
        return jnp.tanh(x)
    return mx_tanh(x, mx_specs)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def mx_relu6(x, mx_specs):
    """min(max(x, 0), 6); grad passes where 0 < out < 6 (reference
    ReLU6Function, activations.py:340-378 — input is not pre-quantized,
    the clamp only masks)."""
    out, _ = _relu6_fwd(x, mx_specs)
    return out


def _relu6_fwd(x, specs):
    out = vec_quantize(jnp.clip(x, 0.0, 6.0), specs)
    return out, ((out > 0) & (out < 6),)


def _relu6_bwd(specs, res, g):
    mask, = res
    b = specs.backwards()
    return (vec_quantize(jnp.where(mask, g, jnp.zeros_like(g)), b),)


mx_relu6.defvjp(_relu6_fwd, _relu6_bwd)


def relu6(x, mx_specs=None):
    if mx_specs is None:
        return jnp.clip(x, 0.0, 6.0)
    return mx_relu6(x, mx_specs)


# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def mx_leaky_relu(x, negative_slope, mx_specs):
    """x if x > 0 else slope*x on the quantized input; grad is g where
    out > 0 else slope*g (reference LeakyReLUFunction,
    activations.py:383-413)."""
    out, _ = _leaky_fwd(x, negative_slope, mx_specs)
    return out


def _leaky_fwd(x, slope, specs):
    q = vec_quantize(x, specs)
    out = vec_quantize(jnp.where(q > 0, q, slope * q), specs)
    return out, (out > 0,)


def _leaky_bwd(slope, specs, res, g):
    mask, = res
    b = specs.backwards()
    g = vec_quantize(g, b)
    return (jnp.where(mask, g, vec_mul(g, slope, b)),)


mx_leaky_relu.defvjp(_leaky_fwd, _leaky_bwd)


def leaky_relu(x, negative_slope=0.01, mx_specs=None):
    if mx_specs is None:
        return jnp.where(x > 0, x, negative_slope * x)
    return mx_leaky_relu(x, negative_slope, mx_specs)
