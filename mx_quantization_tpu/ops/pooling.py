"""Quantized adaptive average pooling.

Reference: microxscaling/mx/adaptive_avg_pooling.py:20-146 — output cell
(i, j) averages the input window [floor(i*H/oh) : ceil((i+1)*H/oh)] x
[floor(j*W/ow) : ceil((j+1)*W/ow)], with the forward mean and backward
scatter both quantized to the elementwise format.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .vector import vec_div, vec_quantize, vec_reduce_sum


def _window_bounds(in_size: int, out_size: int):
    starts = [math.floor(i * in_size / out_size) for i in range(out_size)]
    ends = [math.ceil((i + 1) * in_size / out_size) for i in range(out_size)]
    return starts, ends


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def mx_adaptive_avg_pool2d(x, output_size, mx_specs):
    out, _ = _pool_fwd(x, output_size, mx_specs)
    return out


def _pool_fwd(x, output_size, specs):
    oh, ow = (output_size if isinstance(output_size, (tuple, list))
              else (output_size, output_size))
    N, C, H, W = x.shape
    q = vec_quantize(x, specs)
    hs, he = _window_bounds(H, oh)
    ws, we = _window_bounds(W, ow)
    rows = []
    for i in range(oh):
        cols = []
        for j in range(ow):
            win = q[:, :, hs[i]:he[i], ws[j]:we[j]]
            s = vec_reduce_sum(win, [2, 3], keepdims=False, mx_specs=specs)
            cols.append(vec_div(s, float((he[i] - hs[i]) * (we[j] - ws[j])),
                                specs))
        rows.append(jnp.stack(cols, axis=-1))
    out = jnp.stack(rows, axis=-2)
    return out, ((N, C, H, W),)


def _pool_bwd(output_size, specs, res, g):
    (N, C, H, W), = res
    oh, ow = (output_size if isinstance(output_size, (tuple, list))
              else (output_size, output_size))
    b = specs.backwards()
    g = vec_quantize(g, b)
    hs, he = _window_bounds(H, oh)
    ws, we = _window_bounds(W, ow)
    gx = jnp.zeros((N, C, H, W), g.dtype)
    for i in range(oh):
        for j in range(ow):
            area = float((he[i] - hs[i]) * (we[j] - ws[j]))
            gx = gx.at[:, :, hs[i]:he[i], ws[j]:we[j]].add(
                (g[:, :, i, j] / area)[:, :, None, None])
    return (vec_quantize(gx, b),)


mx_adaptive_avg_pool2d.defvjp(_pool_fwd, _pool_bwd)


def adaptive_avg_pool2d(x, output_size, mx_specs=None):
    if mx_specs is None:
        oh, ow = (output_size if isinstance(output_size, (tuple, list))
                  else (output_size, output_size))
        H, W = x.shape[-2:]
        if H % oh == 0 and W % ow == 0:
            x = x.reshape(x.shape[:-2] + (oh, H // oh, ow, W // ow))
            return x.mean(axis=(-3, -1))
        return mx_adaptive_avg_pool2d(x, output_size, _NOQ)
    return mx_adaptive_avg_pool2d(x, output_size, mx_specs)


from ..specs import MxSpecs as _MxSpecs  # noqa: E402
_NOQ = _MxSpecs().finalize()
