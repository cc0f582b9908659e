"""Quantized vector ("SIMD/VPU") ops.

Each op computes in fp32 and re-quantizes its result to the elementwise
(bfloat/fp) format from the specs — mirroring the reference's vec_* library
(/root/reference/microxscaling/mx/vector_ops.py:38-130), whose purpose is to
emulate a vector unit with limited-precision registers.  On TPU these all run
on the VPU and XLA fuses the chains.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .elemwise import quantize_elemwise_op

LN_2_EXACT = 0.69314718056
LOG2_E_BF16 = 1.4453125   # 1 + 2**-2 + 2**-3 + 2**-4 + 2**-7
LN_2_BF16 = 0.69140625    # ln(2) rounded to bfloat16


def vec_quantize(x, mx_specs=None, round=None):
    return quantize_elemwise_op(x, mx_specs, round=round)


def vec_add(a, b, mx_specs=None, round=None):
    return quantize_elemwise_op(a + b, mx_specs, round=round)


def vec_sub(a, b, mx_specs=None, round=None):
    return quantize_elemwise_op(a - b, mx_specs, round=round)


def vec_mul(a, b, mx_specs=None, round=None):
    return quantize_elemwise_op(a * b, mx_specs, round=round)


def vec_div(a, b, mx_specs=None, round=None):
    if mx_specs is not None and mx_specs.vec_use_recip:
        rb = vec_recip(b, mx_specs, round=round)
        return vec_mul(a, rb, mx_specs, round=round)
    return quantize_elemwise_op(a / b, mx_specs, round=round)


def vec_exp(x, mx_specs=None, round=None):
    if mx_specs is not None and mx_specs.vec_use_exp2:
        phi = quantize_elemwise_op(LOG2_E_BF16 * x, mx_specs, round=round)
        return vec_exp2(phi, mx_specs, round=round)
    return quantize_elemwise_op(jnp.exp(x), mx_specs, round=round)


def vec_exp2(x, mx_specs=None, round=None):
    return quantize_elemwise_op(jnp.exp2(x), mx_specs, round=round)


def vec_recip(x, mx_specs=None, round=None):
    return quantize_elemwise_op(1.0 / x, mx_specs, round=round)


def vec_sqrt(x, mx_specs=None, round=None):
    return quantize_elemwise_op(jnp.sqrt(x), mx_specs, round=round)


def vec_tanh(x, mx_specs=None, round=None):
    return quantize_elemwise_op(jnp.tanh(x), mx_specs, round=round)


def vec_reduce_sum(x, axis, keepdims=False, mx_specs=None, round=None):
    axis = tuple(axis) if isinstance(axis, (list, tuple)) else axis
    return quantize_elemwise_op(jnp.sum(x, axis=axis, keepdims=keepdims),
                                mx_specs, round=round)


def vec_reduce_mean(x, axis, keepdims=False, mx_specs=None, round=None):
    axes = list(axis) if isinstance(axis, (list, tuple)) else [axis]
    denom = float(np.prod([x.shape[i] for i in axes]))
    s = vec_reduce_sum(x, axes, keepdims=keepdims, mx_specs=mx_specs,
                       round=round)
    return vec_div(s, denom, mx_specs, round=round)
