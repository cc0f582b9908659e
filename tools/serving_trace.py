"""Trace the serving engine step to locate its overhead vs the driver step.

The static-batch driver step measures 183 ms at B=32 (bench.py); the
serving engine step ~215 ms (tools/serving_bench.py). This probe traces a
few steady-state engine steps (all slots active, no refills, no drains)
and prints the leaf-event breakdown so the gap can be attributed.

Usage: python tools/serving_trace.py [--slots 32] [--steps 6]
"""

import argparse
import os
import shutil
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
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--trace-dir", default="/tmp/serving_trace")
    args = ap.parse_args()

    from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                            dit_forward, init_dit)
    from mx_quantization_tpu.serving import DiffusionServer, Request
    from mx_quantization_tpu.utils.prequantize import prequantize_weights
    from mx_quantization_tpu.utils.profiling import parse_trace
    from mx_quantization_tpu.workloads.dit import dit_mx_specs

    specs = dit_mx_specs("fused")
    cfg = DiT_models["DiT-XL/2"](input_size=32)
    params = init_dit(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, specs,
                                          serve_dtype=jnp.bfloat16)
    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True, k=154,
                          pred_mode="ex_pred", exclude_blocks=(27,),
                          topk_key_bits=8, activation_dtype="bfloat16")

    def model_fn(p, lat, t, y):
        return dit_forward(p, lat, t, y, cfg, qcfg)

    srv = DiffusionServer(model_fn, (4, 32, 32), num_steps=100,
                          slots=args.slots, null_condition=1000,
                          cfg_scale=4.0, params=q_params)
    for i in range(args.slots):
        srv.submit(Request(i, i % 1000))
    # fill + warm (compile): a few steps, all slots stay active (100-step
    # schedule, we run far fewer)
    for _ in range(3):
        srv.step()
    np.asarray(srv._pending[0])  # sync

    # steady state timing, host-side
    t0 = time.perf_counter()
    for _ in range(args.steps):
        srv.step()
    np.asarray(srv._pending[0])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"engine step wall: {dt*1e3:.1f} ms/step", flush=True)

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        srv.step()
    np.asarray(srv._pending[0])
    jax.profiler.stop_trace()

    items = parse_trace(args.trace_dir, top=40)
    total = sum(items.values())
    print(f"device-busy total {total/args.steps/1e3:.1f} ms/step "
          f"over {args.steps} steps")
    for name, us in list(items.items())[:40]:
        print(f"  {us/args.steps/1e3:8.2f} ms/step  {name}")


if __name__ == "__main__":
    main()
