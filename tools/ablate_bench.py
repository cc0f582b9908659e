"""Ablation benchmark: which part of the quantized DiT step costs what.

Times DiT-XL/2 step variants on the real chip: fp32-HIGHEST, plain bf16,
MX-linears-only, +predictor, +topk, full pipeline.  Uses the same chained
dispatch + scalar fetch methodology as bench.py.
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import bench_sampling_loop  # noqa: E402
from mx_quantization_tpu import finalize_mx_specs  # noqa: E402
from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,  # noqa: E402
                                        dit_forward_with_cfg, init_dit)
from mx_quantization_tpu.utils.prequantize import prequantize_weights  # noqa: E402


def main():
    # the EXACT reference DiT operating point (bfloat=16)
    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, bfloat=16, quantize_backprop=False,
        custom_tpu="fused"))

    cfg = DiT_models["DiT-XL/2"](input_size=32)
    params = init_dit(jax.random.key(0), cfg)
    q_params, q_specs = prequantize_weights(params, specs)

    B = 8
    x = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
    t = jnp.full((2 * B,), 500.0)
    y = jnp.concatenate([jnp.arange(B) % 1000,
                         jnp.full((B,), 1000)]).astype(jnp.int32)

    variants = {
        "fp32_highest": (params, DiTQuantConfig(mx_quant=False)),
        "mx_dense_attention": (q_params, DiTQuantConfig(
            mx_specs=q_specs, mx_quant=True, top_k=False)),
        "mx_true_topk": (q_params, DiTQuantConfig(
            mx_specs=q_specs, mx_quant=True, top_k=True, k=154,
            ex_pred=False)),
        "mx_expred_topk_full": (q_params, DiTQuantConfig(
            mx_specs=q_specs, mx_quant=True, top_k=True, k=154,
            ex_pred=True, pred_mode="ex_pred", exclude_blocks=(27,))),
        "mx_twostep_topk": (q_params, DiTQuantConfig(
            mx_specs=q_specs, mx_quant=True, top_k=True, k=154,
            ex_pred=True, pred_mode="two_step_leading_ones",
            exclude_blocks=(27,))),
    }

    results = {}
    for name, (p, qcfg) in variants.items():
        def f(p_, x_, t_, y_, qcfg=qcfg):
            return dit_forward_with_cfg(p_, x_, t_, y_, cfg, qcfg, 4.0)
        dt = bench_sampling_loop(f, p, x, t, y, n0=1, n1=5, reps=2)
        results[name] = round(dt * 1e3, 2)
        print(f"{name}: {dt*1e3:.1f} ms/step", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
