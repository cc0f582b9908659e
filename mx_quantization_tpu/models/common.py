"""Minimal functional module utilities for the model zoo.

Models are plain pytrees of jnp arrays + static config dataclasses; forward
passes are pure functions (params, x) -> y.  This keeps every model trivially
jit-able, shard-able with NamedSharding, and loadable from torch checkpoints
without a framework dependency — the TPU-native replacement for the
reference's nn.Module surgery (apply_quantization_to_deit / set_config).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal init (+-2 std), matching timm's trunc_normal_."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def linear_init(key, in_f, out_f, bias=True, std=None, dtype=jnp.float32):
    """Kaiming-uniform default like torch.nn.Linear; params stored as
    (out_f, in_f) to match torch layout for checkpoint conversion."""
    kw, kb = jax.random.split(key)
    if std is None:
        bound = 1.0 / math.sqrt(in_f)
        w = jax.random.uniform(kw, (out_f, in_f), dtype, -bound, bound)
    else:
        w = trunc_normal(kw, (out_f, in_f), std, dtype)
    p = {"weight": w}
    if bias:
        bound = 1.0 / math.sqrt(in_f)
        p["bias"] = jax.random.uniform(kb, (out_f,), dtype, -bound, bound)
    return p


def zeros_linear(in_f, out_f, bias=True, dtype=jnp.float32):
    p = {"weight": jnp.zeros((out_f, in_f), dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_f,), dtype)
    return p


def ln_init(dim, dtype=jnp.float32, affine=True):
    if not affine:
        return {}
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def conv_init(key, in_ch, out_ch, kh, kw, bias=True, dtype=jnp.float32):
    kkey, bkey = jax.random.split(key)
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {"weight": jax.random.uniform(kkey, (out_ch, in_ch, kh, kw), dtype,
                                      -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound)
    return p


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
