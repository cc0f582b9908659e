"""Benchmark: DiT-XL/2 MXINT8 + top-k sampling throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

The measured workload is the reference's DiT operating point
(run_dit.sh:16-28): DiT-XL/2 at 256x256 latents (32x32x4), MXINT8
weight+activation quantization, exp-sign top-k attention with k=154,
block 27 excluded, CFG batch doubling — one full denoising forward per step.

vs_baseline is the speedup over the UNQUANTIZED fp32/bf16 DiT-XL/2 forward on
the same chip (the reference publishes no absolute numbers — BASELINE.md —
so the in-framework fp baseline is the comparison anchor).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the first XL/2 compile is minutes; reruns are
# instant.
os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def _bench(fn, args, iters=8, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from mx_quantization_tpu import finalize_mx_specs
    from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                            dit_forward_with_cfg, init_dit)

    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, bfloat=0, quantize_backprop=False))

    cfg = DiT_models["DiT-XL/2"](input_size=32)
    params = init_dit(jax.random.key(0), cfg)

    B = 8  # images per forward (CFG doubles internally: 2*B model batch)
    x = jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
    t = jnp.full((2 * B,), 500.0)
    y = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                        ).astype(jnp.int32)

    qcfg_mx = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                             k=154, ex_pred=True, pred_mode="ex_pred",
                             exclude_blocks=(27,))
    qcfg_fp = DiTQuantConfig(mx_quant=False)

    def fwd(qcfg):
        def f(params, x, t, y):
            return dit_forward_with_cfg(params, x, t, y, cfg, qcfg,
                                        cfg_scale=4.0)
        return jax.jit(f)

    t_mx = _bench(fwd(qcfg_mx), (params, x, t, y))
    t_fp = _bench(fwd(qcfg_fp), (params, x, t, y))

    steps = 100  # reference sampling protocol: 100 denoise steps
    imgs_per_sec = B / (t_mx * steps)
    print(json.dumps({
        "metric": "DiT-XL/2 256x256 MXINT8+topk(k=154) sampling throughput",
        "value": round(imgs_per_sec, 4),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(t_fp / t_mx, 4),
    }))


if __name__ == "__main__":
    main()
