"""Differentiable "SIMD" elementwise ops with quantized forward/backward.

Reference: microxscaling/mx/simd_ops.py:39-556 — add/sub/mul/div/split/
square/sqrt/exp/log/reduce_sum/reduce_mean/norm as autograd Functions whose
every intermediate is re-quantized to the elementwise format, with
broadcast-aware gradient reduction (_broadcast_gradient, simd_ops.py:39-76).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .vector import (vec_add, vec_div, vec_mul, vec_quantize, vec_recip,
                     vec_reduce_mean, vec_reduce_sum, vec_sqrt, vec_sub)


def _reduce_broadcast_grad(g, shape):
    """Sum g over broadcasted axes so it matches ``shape`` (reference
    _broadcast_gradient)."""
    if g.shape == tuple(shape):
        return g
    extra = g.ndim - len(shape)
    if extra > 0:
        g = g.sum(axis=tuple(range(extra)))
    axes = tuple(i for i, (gs, s) in enumerate(zip(g.shape, shape))
                 if s == 1 and gs != 1)
    if axes:
        g = g.sum(axis=axes, keepdims=True)
    return g.reshape(shape)


def _binary(op_fwd, grad_a, grad_b):
    @partial(jax.custom_vjp, nondiff_argnums=(2,))
    def f(a, b, specs):
        out, _ = fwd(a, b, specs)
        return out

    def fwd(a, b, specs):
        qa = vec_quantize(a, specs)
        qb = vec_quantize(b, specs)
        out = op_fwd(qa, qb, specs)
        return out, (qa, qb, jnp.shape(a), jnp.shape(b))

    def bwd(specs, res, g):
        qa, qb, sa, sb = res
        b = specs.backwards()
        g = vec_quantize(g, b)
        ga = grad_a(g, qa, qb, b)
        gb = grad_b(g, qa, qb, b)
        return (_reduce_broadcast_grad(ga, sa),
                _reduce_broadcast_grad(gb, sb))

    f.defvjp(fwd, bwd)
    return f


simd_add = _binary(lambda a, b, s: vec_add(a, b, s),
                   lambda g, a, b, s: g,
                   lambda g, a, b, s: g)
simd_sub = _binary(lambda a, b, s: vec_sub(a, b, s),
                   lambda g, a, b, s: g,
                   lambda g, a, b, s: -g)
simd_mul = _binary(lambda a, b, s: vec_mul(a, b, s),
                   lambda g, a, b, s: vec_mul(g, b, s),
                   lambda g, a, b, s: vec_mul(g, a, s))
simd_div = _binary(lambda a, b, s: vec_div(a, b, s),
                   lambda g, a, b, s: vec_div(g, b, s),
                   lambda g, a, b, s: vec_mul(
                       -g, vec_div(vec_div(a, b, s), b, s), s))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def simd_square(x, specs):
    return vec_mul(vec_quantize(x, specs), vec_quantize(x, specs), specs)


def _square_fwd(x, specs):
    q = vec_quantize(x, specs)
    return vec_mul(q, q, specs), (q,)


def _square_bwd(specs, res, g):
    q, = res
    b = specs.backwards()
    return (vec_mul(vec_mul(vec_quantize(g, b), 2.0, b), q, b),)


simd_square.defvjp(_square_fwd, _square_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def simd_sqrt(x, specs):
    return vec_sqrt(vec_quantize(x, specs), specs)


def _sqrt_fwd(x, specs):
    out = vec_sqrt(vec_quantize(x, specs), specs)
    return out, (out,)


def _sqrt_bwd(specs, res, g):
    out, = res
    b = specs.backwards()
    g = vec_quantize(g, b)
    return (vec_div(vec_mul(g, 0.5, b), out, b),)


simd_sqrt.defvjp(_sqrt_fwd, _sqrt_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def simd_exp(x, specs):
    from .vector import vec_exp
    return vec_exp(vec_quantize(x, specs), specs)


def _exp_fwd(x, specs):
    from .vector import vec_exp
    out = vec_exp(vec_quantize(x, specs), specs)
    return out, (out,)


def _exp_bwd(specs, res, g):
    out, = res
    b = specs.backwards()
    return (vec_mul(vec_quantize(g, b), out, b),)


simd_exp.defvjp(_exp_fwd, _exp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def simd_log(x, specs):
    q = vec_quantize(x, specs)
    return vec_quantize(jnp.log(q), specs)


def _log_fwd(x, specs):
    q = vec_quantize(x, specs)
    return vec_quantize(jnp.log(q), specs), (q,)


def _log_bwd(specs, res, g):
    q, = res
    b = specs.backwards()
    return (vec_div(vec_quantize(g, b), q, b),)


simd_log.defvjp(_log_fwd, _log_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def simd_reduce_sum(x, axis, keepdims, specs):
    return vec_reduce_sum(vec_quantize(x, specs), axis, keepdims=keepdims,
                          mx_specs=specs)


def _rsum_fwd(x, axis, keepdims, specs):
    out = vec_reduce_sum(vec_quantize(x, specs), axis, keepdims=keepdims,
                         mx_specs=specs)
    return out, (jnp.shape(x),)


def _rsum_bwd(axis, keepdims, specs, res, g):
    shape, = res
    b = specs.backwards()
    g = vec_quantize(g, b)
    if not keepdims:
        axes = axis if isinstance(axis, (list, tuple)) else [axis]
        for ax in sorted(a % len(shape) for a in axes):
            g = jnp.expand_dims(g, ax)
    return (jnp.broadcast_to(g, shape),)


simd_reduce_sum.defvjp(_rsum_fwd, _rsum_bwd)


def simd_reduce_mean(x, axis, keepdims=False, mx_specs=None):
    axes = axis if isinstance(axis, (list, tuple)) else [axis]
    denom = 1.0
    for ax in axes:
        denom *= x.shape[ax]
    s = simd_reduce_sum(x, axis, keepdims, mx_specs)
    return vec_div(s, denom, mx_specs)


def simd_norm(x, mx_specs=None):
    """L2 norm over the full tensor, quantized chain."""
    sq = simd_square(x, mx_specs)
    s = simd_reduce_sum(sq, list(range(x.ndim)), False, mx_specs)
    return simd_sqrt(s, mx_specs)


def simd_split(x, mx_specs=None):
    """x -> (x, x); backward sums the two branch grads through the
    quantized add (reference SIMDSplit, simd_ops.py:262-282)."""
    if mx_specs is None:
        return x, x
    return _simd_split(x, mx_specs)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _simd_split(x, specs):
    return x, x


def _split_fwd(x, specs):
    return (x, x), ()


def _split_bwd(specs, res, gs):
    g1, g2 = gs
    b = specs.backwards()
    return (vec_add(vec_quantize(g1, b), vec_quantize(g2, b), b),)


_simd_split.defvjp(_split_fwd, _split_bwd)
