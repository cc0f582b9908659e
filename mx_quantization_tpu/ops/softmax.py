"""Quantized softmax as a chain of vector-unit ops.

Reference semantics (/root/reference/microxscaling/mx/softmax.py:18-99):
max-subtract -> exp (or 2^x when softmax_exp2) -> sum -> divide, with every
intermediate re-quantized to the elementwise format; backward includes the
ln(2) correction for the exp2 variant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .vector import (LN_2_BF16, vec_div, vec_exp, vec_exp2, vec_mul,
                     vec_quantize, vec_reduce_sum, vec_sub)
from ..specs import mx_assert_test


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def mx_softmax(x, dim, mx_specs):
    out, _ = _softmax_fwd(x, dim, mx_specs)
    return out


def _softmax_fwd(x, dim, specs):
    dim = dim % x.ndim
    x = vec_quantize(x, specs)
    max_data = jnp.max(x, axis=dim, keepdims=True)
    x = vec_sub(x, max_data, specs, round=specs.round)
    if specs.softmax_exp2:
        out = vec_exp2(x, specs, round=specs.round)
    else:
        out = vec_exp(x, specs, round=specs.round)
    s = vec_reduce_sum(out, dim, keepdims=True, mx_specs=specs,
                       round=specs.round)
    out = vec_div(out, s, specs, round=specs.round)
    return out, out


def _softmax_bwd(dim, specs, out, g):
    bspecs = specs.backwards()
    g = vec_quantize(g, bspecs, round=bspecs.round)
    gi = vec_mul(g, out, bspecs, round=bspecs.round)
    gi = vec_reduce_sum(gi, dim, keepdims=True, mx_specs=bspecs,
                        round=bspecs.round)
    gi = vec_sub(g, gi, bspecs, round=bspecs.round)
    gi = vec_mul(out, gi, bspecs, round=bspecs.round)
    if specs.softmax_exp2:
        gi = vec_mul(gi, LN_2_BF16, bspecs, round=bspecs.round)
    return (gi,)


mx_softmax.defvjp(_softmax_fwd, _softmax_bwd)


def softmax(x, dim=-1, mx_specs=None):
    mx_assert_test(mx_specs)
    if mx_specs is None:
        return jax.nn.softmax(x, axis=dim)
    return mx_softmax(x, dim % x.ndim, mx_specs)
