"""Profile one quantized DiT-XL/2 sampling step on the TPU and print the
per-op time breakdown from the device trace.

Usage: python tools/profile_step.py [--fp] [--steps N]
"""

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--contract", default="exact",
                    choices=["exact", "serving"])
    ap.add_argument("--trace-dir", default="/tmp/mx_step_trace")
    args = ap.parse_args()

    from mx_quantization_tpu import finalize_mx_specs
    from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                            dit_forward_with_cfg, init_dit)
    from mx_quantization_tpu.utils.prequantize import prequantize_weights

    from mx_quantization_tpu.workloads.dit import dit_mx_specs
    specs = dit_mx_specs("fused")  # the EXACT bench operating point
    cfg = DiT_models["DiT-XL/2"](input_size=32)
    params = init_dit(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, specs,
                                          serve_dtype=jnp.bfloat16)

    B = args.batch
    x = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
    t = jnp.full((2 * B,), 500.0)
    y = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                        ).astype(jnp.int32)

    if args.fp:
        qcfg = DiTQuantConfig(mx_quant=False)
        p = params
    else:
        qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                              k=154, ex_pred=True, pred_mode="ex_pred",
                              exclude_blocks=(27,), topk_key_bits=8,
                              contract=args.contract,
                              activation_dtype="bfloat16")
        p = q_params

    @jax.jit
    def step(p, x, t, y):
        out = dit_forward_with_cfg(p, x, t, y, cfg, qcfg, cfg_scale=4.0)
        return x - 0.01 * out[:, :4]

    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    o = step(p, x, t, y)
    _ = np.asarray(fetch(o))  # compile + warm

    os.system(f"rm -rf {args.trace_dir}")
    jax.profiler.start_trace(args.trace_dir)
    o = x
    for _ in range(args.steps):
        o = step(p, o, t, y)
    _ = np.asarray(fetch(o))
    jax.profiler.stop_trace()

    from mx_quantization_tpu.utils.profiling import parse_trace
    items = parse_trace(args.trace_dir, top=45)
    print(f"top ops (us, over {args.steps} steps):")
    for name, dur in items.items():
        print(f"{dur/args.steps:12.0f}  {name[:110]}")


if __name__ == "__main__":
    main()
