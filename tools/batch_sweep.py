"""Sweep serving batch size at the current kernel operating point.

Writes results to /tmp/batch_sweep.log as they come.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

LOG = open("/tmp/batch_sweep.log", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n")


def main():
    from bench import bench_sampling_loop
    from mx_quantization_tpu import finalize_mx_specs
    from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                            dit_forward_with_cfg, init_dit)
    from mx_quantization_tpu.utils.prequantize import prequantize_weights

    from mx_quantization_tpu.workloads.dit import dit_mx_specs
    specs = dit_mx_specs("fused")  # exact operating point (bfloat=16)
    cfg = DiT_models["DiT-XL/2"](input_size=32)
    params = init_dit(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, specs,
                                          serve_dtype=jnp.bfloat16)
    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                          k=154, ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=(27,), topk_key_bits=8,
                          contract=os.environ.get("CONTRACT", "exact"),
                          activation_dtype="bfloat16")

    def f(params, x, t, y):
        return dit_forward_with_cfg(params, x, t, y, cfg, qcfg,
                                    cfg_scale=4.0)

    for B in [int(b) for b in (os.environ.get("BATCHES") or
                               "32,48,64,96").split(",")]:
        log(f"B={B}: compiling/warming...")
        x = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
        t = jnp.full((2 * B,), 500.0)
        y = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                            ).astype(jnp.int32)
        tm = bench_sampling_loop(f, q_params, x, t, y)
        log(f"B={B}: {tm*1e3:7.1f}ms/step -> {B/(tm*100):.4f} imgs/sec/chip")


if __name__ == "__main__":
    main()
