"""Ambient quantization context — the explicit-API replacement for the
reference's global monkey-patching (mx_mapping.inject_pyt_ops,
mx_mapping.py:41-57).

The reference rewrites torch.* dict entries so downstream code silently
quantizes.  Here the equivalent convenience is an ambient specs context: ops
called with ``mx_specs=None`` inside ``with quantized(specs):`` pick up the
context specs.  The wrapper surface mirrors the reference's MODULE_MAPPING
+ FUNCTION_MAPPING union (mx_mapping.py:68-122): linear/matmul/addmm/bmm,
convs + transpose conv, norms, softmax, the activation set, pooling,
simd arithmetic/reductions/split, and quantize.  Explicit per-call specs always win; models in this repo pass
specs explicitly (the recommended style), so this exists for quick
experiments and for porting code written against the reference's implicit
style.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

from .specs import MxSpecs

_state = threading.local()


def current_specs() -> Optional[MxSpecs]:
    return getattr(_state, "specs", None)


@contextlib.contextmanager
def quantized(specs: MxSpecs):
    prev = current_specs()
    _state.specs = specs
    try:
        yield
    finally:
        _state.specs = prev


def resolve(mx_specs: Optional[MxSpecs]) -> Optional[MxSpecs]:
    """Per-call specs if given, else the ambient context specs."""
    return mx_specs if mx_specs is not None else current_specs()


def linear(x, w, b=None, mx_specs=None):
    from .ops.linear import linear as _linear
    return _linear(x, w, b, mx_specs=resolve(mx_specs))


def matmul(a, b, bias=None, mx_specs=None, mode_config="aa"):
    from .ops.linear import matmul as _matmul
    return _matmul(a, b, bias, mx_specs=resolve(mx_specs),
                   mode_config=mode_config)


def softmax(x, dim=-1, mx_specs=None):
    from .ops.softmax import softmax as _softmax
    return _softmax(x, dim, mx_specs=resolve(mx_specs))


def gelu(x, mx_specs=None, first_order_gelu=False):
    from .ops.activations import gelu as _gelu
    return _gelu(x, mx_specs=resolve(mx_specs),
                 first_order_gelu=first_order_gelu)


def relu(x, mx_specs=None):
    from .ops.activations import relu as _f
    return _f(x, mx_specs=resolve(mx_specs))


def relu6(x, mx_specs=None):
    from .ops.activations import relu6 as _f
    return _f(x, mx_specs=resolve(mx_specs))


def leaky_relu(x, negative_slope=0.01, mx_specs=None):
    from .ops.activations import leaky_relu as _f
    return _f(x, negative_slope, mx_specs=resolve(mx_specs))


def sigmoid(x, mx_specs=None):
    from .ops.activations import sigmoid as _f
    return _f(x, mx_specs=resolve(mx_specs))


def silu(x, mx_specs=None):
    from .ops.activations import silu as _f
    return _f(x, mx_specs=resolve(mx_specs))


def tanh(x, mx_specs=None):
    from .ops.activations import tanh as _f
    return _f(x, mx_specs=resolve(mx_specs))


def bmm(a, b, mx_specs=None):
    from .ops.linear import bmm as _f
    return _f(a, b, mx_specs=resolve(mx_specs))


def addmm(bias, a, b, mx_specs=None):
    """torch.addmm analogue (reference addmm_mx, mx_mapping.py:60-65)."""
    from .ops.linear import matmul as _f
    return _f(a, b, bias, mx_specs=resolve(mx_specs))


def conv1d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs=None):
    from .ops.conv import conv1d as _f
    return _f(x, w, b, stride, padding, dilation, groups,
              mx_specs=resolve(mx_specs))


def conv2d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs=None):
    from .ops.conv import conv2d as _f
    return _f(x, w, b, stride, padding, dilation, groups,
              mx_specs=resolve(mx_specs))


def conv3d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1,
           mx_specs=None):
    from .ops.conv import conv3d as _f
    return _f(x, w, b, stride, padding, dilation, groups,
              mx_specs=resolve(mx_specs))


def conv_transpose2d(x, w, b=None, stride=1, padding=0, groups=1,
                     mx_specs=None):
    from .ops.transpose_conv import conv_transpose2d as _f
    return _f(x, w, b, stride, padding, groups, mx_specs=resolve(mx_specs))


def layer_norm(x, weight, bias, eps=1e-12, mx_specs=None):
    from .ops.norms import layer_norm as _f
    return _f(x, weight, bias, eps, mx_specs=resolve(mx_specs))


def rms_norm(x, weight, bias, eps=1e-12, mx_specs=None):
    from .ops.norms import rms_norm as _f
    return _f(x, weight, bias, eps, mx_specs=resolve(mx_specs))


def group_norm(x, weight, bias, num_groups=32, eps=1e-5, mx_specs=None):
    from .ops.norms import group_norm as _f
    return _f(x, weight, bias, num_groups, eps, mx_specs=resolve(mx_specs))


def batch_norm(x, state, weight, bias, training=False, momentum=0.1,
               eps=1e-5, mx_specs=None):
    from .ops.batchnorm import batch_norm as _f
    return _f(x, state, weight, bias, training=training, momentum=momentum,
              eps=eps, mx_specs=resolve(mx_specs))


def adaptive_avg_pool2d(x, output_size, mx_specs=None):
    from .ops.pooling import adaptive_avg_pool2d as _f
    return _f(x, output_size, mx_specs=resolve(mx_specs))


def add(a, b, mx_specs=None):
    from .ops.simd import simd_add
    s = resolve(mx_specs)
    return a + b if s is None else simd_add(a, b, s)


def sub(a, b, mx_specs=None):
    from .ops.simd import simd_sub
    s = resolve(mx_specs)
    return a - b if s is None else simd_sub(a, b, s)


def mul(a, b, mx_specs=None):
    from .ops.simd import simd_mul
    s = resolve(mx_specs)
    return a * b if s is None else simd_mul(a, b, s)


def div(a, b, mx_specs=None):
    from .ops.simd import simd_div
    s = resolve(mx_specs)
    return a / b if s is None else simd_div(a, b, s)


def exp(x, mx_specs=None):
    import jax.numpy as jnp
    from .ops.simd import simd_exp
    s = resolve(mx_specs)
    return jnp.exp(x) if s is None else simd_exp(x, s)


def log(x, mx_specs=None):
    import jax.numpy as jnp
    from .ops.simd import simd_log
    s = resolve(mx_specs)
    return jnp.log(x) if s is None else simd_log(x, s)


def square(x, mx_specs=None):
    import jax.numpy as jnp
    from .ops.simd import simd_square
    s = resolve(mx_specs)
    return jnp.square(x) if s is None else simd_square(x, s)


def sum(x, axis, keepdims=False, mx_specs=None):  # noqa: A001
    import jax.numpy as jnp
    from .ops.simd import simd_reduce_sum
    s = resolve(mx_specs)
    if s is None:
        return jnp.sum(x, axis=axis, keepdims=keepdims)
    return simd_reduce_sum(x, axis, keepdims, s)


def mean(x, axis, keepdims=False, mx_specs=None):
    import jax.numpy as jnp
    from .ops.simd import simd_reduce_mean
    s = resolve(mx_specs)
    if s is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    return simd_reduce_mean(x, axis, keepdims, s)


def norm(x, mx_specs=None):
    import jax.numpy as jnp
    from .ops.simd import simd_norm
    s = resolve(mx_specs)
    return jnp.linalg.norm(x) if s is None else simd_norm(x, s)


def split(x, mx_specs=None):
    from .ops.simd import simd_split
    return simd_split(x, resolve(mx_specs))


def quantize(x, mx_specs=None):
    from .ops.vector import vec_quantize
    s = resolve(mx_specs)
    return x if s is None else vec_quantize(x, s)
