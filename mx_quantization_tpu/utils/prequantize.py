"""Offline weight pre-quantization (serving optimization).

Equivalent of the reference's per-module Linear.prequantize_weights
(microxscaling/mx/linear.py:276-304), applied as one pytree pass: every
linear weight that the quantized forward would MX-quantize along its input
axis is snapped to the MX grid once, and the specs gain
``prequantized_weights=True`` so the per-step forward skips it.

MX quantization is idempotent, so a prequantized model is numerically
IDENTICAL to the on-the-fly path — it just stops re-paying the weight
quantization every step (weights dominate the quantize work in the linears).
Weights the models consume UNquantized (DiT block adaLN modulation,
models/dit.py; PixArt AdaLayerNormSingle projection, models/pixart.py) are
excluded — snapping them would silently quantize ops the on-the-fly path
runs at full precision.  (The pass matches by name; it assumes matched
weights feed quantized ``linear(...)`` calls, which holds for every model
in this repo at mx_quant=True.)

``serve_dtype=jnp.bfloat16`` additionally fixes the STORAGE dtype for
serving: MX grid points with <= 8 significant mantissa bits (every int and
fp4/6/8 element format) are exactly representable in bfloat16, so the
quantized weights are stored bf16 — the per-step f32->bf16 converts of the
full weight stacks disappear (measured ~3.7 ms/step on DiT-XL/2) and their
HBM reads halve.  Remaining unquantized ``*.weight`` matrices (adaLN
modulation, timestep MLPs, patch embed) are cast to bf16 too: their outputs
are already truncated to the bf16 activation dtype by the serving forward,
so this only moves the rounding inside the matmul (NOT bit-exact vs f32
storage — leave serve_dtype unset for parity testing).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..formats import format_params
from ..ops.fastquant import quantize_mx_fast
from ..ops.mx import quantize_mx
from ..specs import MxSpecs

# weights consumed by quantized `linear(...)` calls in the model zoo
_LINEAR_WEIGHT_RE = re.compile(
    r"(qkv|proj|fc1|fc2|to_q|to_k|to_v|to_out|adaLN|linear)\.weight$")

# matched by the pattern above but consumed UNquantized by the forwards:
# DiT block adaLN (final_layer.adaLN IS quantized — models/dit.py),
# PixArt AdaLayerNormSingle t6 projection and patch-embed conv
# (models/pixart.py)
_UNQUANTIZED_RE = re.compile(
    r"(?<!final_layer\.)adaLN\.weight$|adaln_single\.linear\.weight$"
    r"|pos_embed\.proj\.weight$")


def bf16_exact(elem_format) -> bool:
    """True if every point of the format's MX grid is exactly representable
    in bfloat16 (<= 8 significant mantissa bits; bf16 and f32 share the
    exponent range, so any finite f32 grid point stays finite)."""
    return format_params(elem_format).mbits <= 9  # mbits incl. sign+implicit


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return ".".join(parts)


def prequantize_weights(params, specs: MxSpecs,
                        pattern: re.Pattern = _LINEAR_WEIGHT_RE,
                        serve_dtype: Optional[jnp.dtype] = None,
                        ) -> Tuple[dict, MxSpecs]:
    """Snap matching weights to the MX grid; returns (params', specs')."""
    fmt = specs.w_elem_format
    assert fmt is not None, "no weight format configured"
    bs = specs.block_size
    sb = specs.effective_scale_bits()
    q_dtype = jnp.float32
    if serve_dtype is not None and bf16_exact(fmt):
        q_dtype = serve_dtype

    def q(path, x):
        p = _path_str(path)
        if x.ndim >= 2 and pattern.search(p) and not _UNQUANTIZED_RE.search(p):
            if specs.custom_tpu == "fused":
                from ..ops.fastquant import bf_fast
                return quantize_mx_fast(bf_fast(x, specs), fmt, bs, sb,
                                        axis=-1, out_dtype=q_dtype,
                                        flush=specs.mx_flush_fp32_subnorms)
            return quantize_mx(
                x, sb, fmt, axes=[-1], block_size=bs,
                shared_exp_method=specs.shared_exp_method,
                round=specs.round_mx_output or "nearest",
                flush_fp32_subnorms=specs.mx_flush_fp32_subnorms
            ).astype(q_dtype)
        if (serve_dtype is not None and x.ndim >= 2
                and p.endswith(".weight")):
            return x.astype(serve_dtype)  # unquantized matmul weights
        return x

    new_params = jax.tree_util.tree_map_with_path(q, params)
    return new_params, specs.replace(prequantized_weights=True)
