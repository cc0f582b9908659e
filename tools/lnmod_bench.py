"""In-run A/B: fuse_ln_modulate at the serving tier (bfloat=16).

Round-1 measured the fused LN+modulate+quantize kernel SLOWER at the
then-current step (1.827 -> 1.784, bfloat=0 gate): XLA fuses LN/modulate
into the residual elementwise passes, so the kernel mainly added in-VMEM
transposes.  Round 5 extended the kernel to the bfloat=16 operating
point (in-kernel bf16 rounding) — at the serving tier the candidate
saving is the standalone qkv-input and fc1-input activation-quantize
kernel passes it absorbs.  This tool re-measures the decision in one
process (the only trustworthy comparison through the tunnel).
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

import dataclasses

from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                        dit_forward_with_cfg, init_dit)
from mx_quantization_tpu.utils.prequantize import prequantize_weights
from mx_quantization_tpu.workloads.dit import dit_mx_specs


@jax.jit
def fetch(x):
    return jnp.sum(x.astype(jnp.float32))


def main():
    specs = dit_mx_specs("fused")
    cfg = DiT_models["DiT-XL/2"](input_size=32)
    params = init_dit(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, specs,
                                          serve_dtype=jnp.bfloat16)
    B = 32
    xx = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
    tt = jnp.full((2 * B,), 500.0)
    yy = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                         ).astype(jnp.int32)
    base = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                          k=154, ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=(27,), topk_key_bits=8,
                          activation_dtype="bfloat16", contract="serving")

    def timed_step(qc):
        @jax.jit
        def step(p, x):
            out = dit_forward_with_cfg(p, x, tt, yy, cfg, qc,
                                       cfg_scale=4.0)
            return x - 0.01 * out[:, :4]

        o = step(q_params, xx)
        _ = np.asarray(fetch(o))

        def run(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = xx
                for _ in range(n):
                    o = step(q_params, o)
                _ = np.asarray(fetch(o))
                best = min(best, time.perf_counter() - t0)
            return best
        return (run(7) - run(1)) / 6

    for name, qc in [("fuse_lnmod=False", base),
                     ("fuse_lnmod=True",
                      dataclasses.replace(base, fuse_ln_modulate=True)),
                     ("fuse_lnmod=False (re)", base)]:
        t = timed_step(qc)
        print(f"{name}: {t*1e3:.2f} ms/step -> {B/(t*100):.4f} imgs/sec "
              "@100 steps", flush=True)


if __name__ == "__main__":
    main()
