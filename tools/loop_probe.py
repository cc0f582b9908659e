"""Probe in-graph multi-step sampling loops (lax.fori_loop over the model).

dispatch_probe.py showed each jitted execution carries ~170ms of tunnel
latency that does not pipeline across host-chained dispatches (device-busy
57ms/step vs 227ms wall at B=32).  Running n model steps inside ONE
execution amortizes that latency.  A previous attempt at a giant in-graph
loop crashed the TPU worker, so this probes n = 4 -> 16 -> 100 in order,
logging to /tmp/loop_probe.log as it goes.
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

LOG = open("/tmp/loop_probe.log", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n")


def main():
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
    q_params, specs = prequantize_weights(params, specs,
                                          serve_dtype=jnp.bfloat16)

    B = 32
    x = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
    t = jnp.full((2 * B,), 500.0)
    y = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                        ).astype(jnp.int32)
    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                          k=154, ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=(27,), topk_key_bits=8,
                          activation_dtype="bfloat16")

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop_step(p, x, t, y, n):
        def body(_, o):
            out = dit_forward_with_cfg(p, o, t, y, cfg, qcfg, cfg_scale=4.0)
            return o - 0.01 * out[:, :4]
        return jax.lax.fori_loop(0, n, body, x)

    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    for n in (4, 16, 100):
        t0 = time.perf_counter()
        _ = np.asarray(fetch(loop_step(q_params, x, t, y, n)))
        log(f"fori n={n}: warm(compile+run)={time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _ = np.asarray(fetch(loop_step(q_params, x, t, y, n)))
            best = min(best, time.perf_counter() - t0)
        log(f"fori n={n}: total={best*1e3:8.1f}ms ({best/n*1e3:6.1f}ms/step)")


if __name__ == "__main__":
    main()
