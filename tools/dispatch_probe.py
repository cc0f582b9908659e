"""Probe host/tunnel dispatch overhead of the bench loop.

The batch-32 device trace shows ~57ms device-busy per model step, but
bench.py measures ~226ms wall per step.  This probe times host-chained
dispatch at several chain lengths, with and without the profiler active,
and an unroll-4-inside-one-jit variant, to locate the gap.
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


LOG = open("/tmp/dispatch_probe.log", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--step4", action="store_true",
                    help="also compile+time the unroll-4-in-one-jit variant")
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

    @jax.jit
    def step(p, x, t, y):
        out = dit_forward_with_cfg(p, x, t, y, cfg, qcfg, cfg_scale=4.0)
        return x - 0.01 * out[:, :4]

    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    t0 = time.perf_counter()
    _ = np.asarray(fetch(step(q_params, x, t, y)))
    log(f"warm(compile): {time.perf_counter()-t0:.1f}s")

    def chain(n):
        t0 = time.perf_counter()
        o = x
        disp = []
        for _ in range(n):
            t1 = time.perf_counter()
            o = step(q_params, o, t, y)
            disp.append(time.perf_counter() - t1)
        t2 = time.perf_counter()
        _ = np.asarray(fetch(o))
        t3 = time.perf_counter()
        return t3 - t0, t2 - t0, disp

    for n in (1, 2, 4, 8):
        tot, dtot, disp = chain(n)
        log(f"plain n={n}: total={tot*1e3:7.1f}ms dispatch={dtot*1e3:7.1f}ms"
            f" per-disp={[f'{d*1e3:.0f}' for d in disp]}")

    # repeat with the profiler active (trace discarded)
    jax.profiler.start_trace("/tmp/mx_dispatch_trace")
    for n in (1, 4):
        tot, dtot, disp = chain(n)
        log(f"traced n={n}: total={tot*1e3:7.1f}ms dispatch={dtot*1e3:7.1f}ms")
    jax.profiler.stop_trace()

    if not args.step4:
        return

    # unroll-4 inside one jit
    @jax.jit
    def step4(p, x, t, y):
        o = x
        for _ in range(4):
            o = o - 0.01 * dit_forward_with_cfg(p, o, t, y, cfg, qcfg,
                                                cfg_scale=4.0)[:, :4]
        return o

    t0 = time.perf_counter()
    _ = np.asarray(fetch(step4(q_params, x, t, y)))
    log(f"step4 warm(compile): {time.perf_counter()-t0:.1f}s")
    for n in (1, 2):
        t0 = time.perf_counter()
        o = x
        for _ in range(n):
            o = step4(q_params, o, t, y)
        _ = np.asarray(fetch(o))
        tot = time.perf_counter() - t0
        log(f"step4 n={n}: total={tot*1e3:7.1f}ms "
            f"({tot/(4*n)*1e3:.1f}ms/model-step)")


if __name__ == "__main__":
    main()
