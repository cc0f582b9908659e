"""Probe: host-chained dispatch vs on-device chunked fori_loop sampling.

Validates the bench timing methodology: if per-dispatch overhead through
the axon tunnel were significant, wrapping C model steps in one jitted
``lax.fori_loop`` would amortize it C-fold and per-step time would drop.

MEASURED (B=32, key_bits=8 operating point): chunk=1 232.3 ms/step,
chunk=2 230.1, chunk=4 229.2 — i.e. dispatch overhead is ~1% and the
host-chained bench numbers are real device time.  (A 100-step whole-model
in-graph loop once faulted the TPU worker; chunks <= 4 are safe.)

Usage: python tools/loop_bench.py [--chunks 1,2,4,8] [--batch 32]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="1,2,4,8")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from mx_quantization_tpu import finalize_mx_specs
    from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                            dit_forward_with_cfg, init_dit)
    from mx_quantization_tpu.utils.prequantize import prequantize_weights

    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, bfloat=0, quantize_backprop=False,
        custom_tpu="fused"))
    cfg = DiT_models["DiT-XL/2"](input_size=32)
    params = init_dit(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, specs)

    B = args.batch
    x = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
    t = jnp.full((2 * B,), 500.0)
    y = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                        ).astype(jnp.int32)

    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                          k=154, ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=(27,), topk_key_bits=8,
                          activation_dtype="bfloat16")

    def one_step(params, x, t, y):
        out = dit_forward_with_cfg(params, x, t, y, cfg, qcfg, cfg_scale=4.0)
        return x - 0.01 * out[:, :4]

    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    for chunk in [int(c) for c in args.chunks.split(",")]:

        @jax.jit
        def chunk_step(params, x, t, y, chunk=chunk):
            if chunk == 1:
                return one_step(params, x, t, y)
            return jax.lax.fori_loop(
                0, chunk, lambda i, o: one_step(params, o, t, y), x)

        t0 = time.perf_counter()
        _ = np.asarray(fetch(chunk_step(q_params, x, t, y)))
        print(f"chunk={chunk}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)

        # chained dispatches of the chunk, differenced chain lengths
        def timed(n):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                o = x
                for _ in range(n):
                    o = chunk_step(q_params, o, t, y)
                _ = np.asarray(fetch(o))
                best = min(best, time.perf_counter() - t0)
            return best

        n1 = max(2, 8 // chunk)
        per_dispatch = (timed(n1) - timed(1)) / (n1 - 1)
        per_step = per_dispatch / chunk
        print(f"chunk={chunk}: {per_dispatch*1e3:.1f} ms/dispatch, "
              f"{per_step*1e3:.1f} ms/step, "
              f"{B/(per_step*100):.3f} imgs/sec @100 steps", flush=True)


if __name__ == "__main__":
    main()
