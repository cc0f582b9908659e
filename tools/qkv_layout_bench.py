"""A/B the qkv projection layout at the DiT-XL/2 serving point:
qkv_layout="fused" (one matmul + in-kernel transposes) vs "split_t"
(q/k emitted pre-transposed from a split projection — no transposes,
no relayout)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
import jax.numpy as jnp
os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import bench_sampling_loop
from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                        dit_forward_with_cfg, init_dit)
from mx_quantization_tpu.utils.prequantize import prequantize_weights
from mx_quantization_tpu.workloads.dit import dit_mx_specs

specs = dit_mx_specs("fused")
cfg = DiT_models["DiT-XL/2"](input_size=32)
params = init_dit(jax.random.key(0), cfg)
q_params, specs = prequantize_weights(params, specs,
                                      serve_dtype=jnp.bfloat16)
B = 32
x = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
t = jnp.full((2 * B,), 500.0)
y = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                    ).astype(jnp.int32)

for contract in ("serving", "exact"):
    for layout in ("fused", "split_t"):
        qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                              k=154, ex_pred=True, pred_mode="ex_pred",
                              exclude_blocks=(27,), topk_key_bits=8,
                              contract=contract, qkv_layout=layout,
                              activation_dtype="bfloat16")

        def f(p, x, t, y, qc=qcfg):
            return dit_forward_with_cfg(p, x, t, y, cfg, qc, cfg_scale=4.0)

        tm = bench_sampling_loop(f, q_params, x, t, y)
        print(f"{contract}/{layout}: {tm*1e3:.1f} ms/step -> "
              f"{B/(tm*100):.4f} imgs/sec/chip", flush=True)
