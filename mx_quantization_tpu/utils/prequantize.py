"""Offline weight pre-quantization (serving optimization).

Equivalent of the reference's per-module Linear.prequantize_weights
(microxscaling/mx/linear.py:276-304), applied as one pytree pass: every
linear weight that the quantized forward would MX-quantize along its input
axis is snapped to the MX grid once, and the specs gain
``prequantized_weights=True`` so the per-step forward skips it.

MX quantization is idempotent, so a prequantized model is numerically
IDENTICAL to the on-the-fly path — it just stops re-paying the weight
quantization every step (weights dominate the quantize work in the linears).
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.fastquant import quantize_mx_fast
from ..ops.mx import quantize_mx
from ..specs import MxSpecs

# weights consumed by quantized `linear(...)` calls in the model zoo
_LINEAR_WEIGHT_RE = re.compile(
    r"(qkv|proj|fc1|fc2|to_q|to_k|to_v|to_out|adaLN|linear)\.weight$")


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return ".".join(parts)


def prequantize_weights(params, specs: MxSpecs,
                        pattern: re.Pattern = _LINEAR_WEIGHT_RE
                        ) -> Tuple[dict, MxSpecs]:
    """Snap matching weights to the MX grid; returns (params', specs')."""
    fmt = specs.w_elem_format
    assert fmt is not None, "no weight format configured"
    bs = specs.block_size
    sb = specs.effective_scale_bits()

    def q(path, x):
        if x.ndim >= 2 and pattern.search(_path_str(path)):
            if specs.custom_tpu == "fused":
                return quantize_mx_fast(x, fmt, bs, sb, axis=-1,
                                        out_dtype=jnp.float32)
            return quantize_mx(
                x, sb, fmt, axes=[-1], block_size=bs,
                shared_exp_method=specs.shared_exp_method,
                round=specs.round_mx_output or "nearest",
                flush_fp32_subnorms=specs.mx_flush_fp32_subnorms)
        return x

    new_params = jax.tree_util.tree_map_with_path(q, params)
    return new_params, specs.replace(prequantized_weights=True)
