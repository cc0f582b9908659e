"""Standalone differentiable quantize wrappers.

Reference: microxscaling/mx/quantize.py:14-48 — quantize_bfloat applies the
elementwise quantizer on BOTH the forward and backward pass.
"""

from __future__ import annotations

from functools import partial

import jax

from .elemwise import quantize_elemwise_op
from .mx import quantize_mx_op


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def quantize_bfloat_grad(x, mx_specs):
    """Forward AND backward bfloat quantization (reference QuantizeBfloat)."""
    return quantize_elemwise_op(x, mx_specs)


def _qb_fwd(x, specs):
    return quantize_elemwise_op(x, specs), None


def _qb_bwd(specs, _, g):
    b = specs.backwards()
    return (quantize_elemwise_op(g, b),)


quantize_bfloat_grad.defvjp(_qb_fwd, _qb_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def quantize_mx_ste(x, mx_specs, elem_format, axis):
    """MX fake-quant with a straight-through gradient."""
    return quantize_mx_op(x, mx_specs, elem_format=elem_format, axes=[axis])


def _qm_fwd(x, specs, fmt, axis):
    return quantize_mx_op(x, specs, elem_format=fmt, axes=[axis]), None


def _qm_bwd(specs, fmt, axis, _, g):
    return (g,)


quantize_mx_ste.defvjp(_qm_fwd, _qm_bwd)
