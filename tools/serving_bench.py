"""Continuous-batching serving throughput on the real chip.

Measures the DiffusionServer end to end at the reference operating points:
  --model dit     quantized DiT-XL/2, DDPM 100 steps (run_dit.sh)
  --model pixart  quantized PixArt-alpha 256, MXINT8 + self_k=77
                  two_step_leading_ones, DPM-Solver++ 20 steps
                  (run_pixart_alpha.sh:31-42)
with a request stream larger than the slot pool, reporting steady-state
imgs/sec and per-request latency percentiles.  The slot state is
device-resident with donated buffers; the host fetches a (slots,) mask per
step plus finished latents only.  --contract serving selects the relaxed
attention-kernel tier.

Usage: python tools/serving_bench.py [--model dit|pixart] [--slots 32]
           [--steps N] [--reqs 64] [--contract exact|serving]
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
    ap.add_argument("--model", choices=["dit", "pixart"], default="dit",
                    help="dit: DiT-XL/2 DDPM 100 steps (run_dit.sh point); "
                    "pixart: PixArt-alpha 256 MXINT8 self_k=77 "
                    "two_step_leading_ones, DPM-Solver++ 20 steps "
                    "(run_pixart_alpha.sh:31-42 point)")
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--reqs", type=int, default=64)
    ap.add_argument("--contract", choices=["exact", "serving"],
                    default="exact")
    ap.add_argument("--arrival", choices=["burst", "staggered"],
                    default="burst",
                    help="staggered: submit one request per engine step at "
                    "~80%% utilization — the continuous-batching case "
                    "(a static-batch server would queue each request until "
                    "the next batch boundary)")
    args = ap.parse_args()

    from mx_quantization_tpu.serving import DiffusionServer, Request
    from mx_quantization_tpu.utils.prequantize import prequantize_weights

    if args.model == "dit":
        from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                                dit_forward, init_dit)
        from mx_quantization_tpu.workloads.dit import dit_mx_specs

        args.steps = args.steps or 100
        specs = dit_mx_specs("fused")
        cfg = DiT_models["DiT-XL/2"](input_size=32)
        params = init_dit(jax.random.key(0), cfg)
        q_params, specs = prequantize_weights(params, specs,
                                              serve_dtype=jnp.bfloat16)
        qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                              k=154, pred_mode="ex_pred",
                              exclude_blocks=(27,), topk_key_bits=8,
                              contract=args.contract,
                              activation_dtype="bfloat16")

        def model_fn(p, lat, t, y):
            return dit_forward(p, lat, t, y, cfg, qcfg)

        srv = DiffusionServer(model_fn, (4, 32, 32), num_steps=args.steps,
                              slots=args.slots, null_condition=1000,
                              cfg_scale=4.0, params=q_params)

        def make_request(rid, i):
            return Request(rid, i % 1000)
    else:
        from mx_quantization_tpu.models import (PixArtConfig,
                                                PixArtQuantConfig,
                                                init_pixart, pixart_forward)
        from mx_quantization_tpu.workloads.pixart import pixart_mx_specs

        # the EXACT reference operating point (run_pixart_alpha.sh:31-42):
        # MXINT8, self-attention top-k k=77, two_step_leading_ones
        # predictor, 20 DPM-Solver++ steps, CFG 4.5, T5 len 120
        args.steps = args.steps or 20
        specs = pixart_mx_specs("fused")
        cfg = PixArtConfig()           # alpha-256: 28 layers, d=1152
        params = init_pixart(jax.random.key(0), cfg)
        q_params, specs = prequantize_weights(params, specs,
                                              serve_dtype=jnp.bfloat16)
        qcfg = PixArtQuantConfig(mx_specs=specs, mx_quant=True,
                                 self_top_k=True, self_k=77, ex_pred=True,
                                 pred_mode="two_step_leading_ones",
                                 topk_key_bits=8, contract=args.contract,
                                 activation_dtype="bfloat16")
        L = 120
        rng = np.random.RandomState(0)
        null_cond = {"embeds": rng.randn(L, cfg.caption_channels
                                         ).astype(np.float32) * 0.02,
                     "mask": np.ones((L,), np.float32)}

        def model_fn(p, lat, t, cond):
            return pixart_forward(p, lat, cond["embeds"], t, cfg, qcfg,
                                  encoder_attention_mask=cond["mask"])

        srv = DiffusionServer(model_fn, (4, 32, 32), num_steps=args.steps,
                              slots=args.slots, solver="dpm++",
                              cfg_scale=4.5, params=q_params,
                              null_condition=null_cond)

        def make_request(rid, i):
            r = np.random.RandomState(1000 + i)
            return Request(rid, {
                "embeds": r.randn(L, cfg.caption_channels
                                  ).astype(np.float32) * 0.02,
                "mask": np.ones((L,), np.float32)})

    # warm: one full drain of a slot-pool's worth
    for i in range(args.slots):
        srv.submit(make_request(i, i))
    srv.run_until_drained()
    srv._results.clear()

    t0 = time.perf_counter()
    if args.arrival == "burst":
        for i in range(args.reqs):
            srv.submit(make_request(10000 + i, i))
        res = srv.run_until_drained()
    else:
        # staggered: one request every ~steps/(0.8*slots) engine steps so
        # the pool sits at ~80% occupancy — each request starts on the
        # next engine step instead of waiting for a batch boundary
        period = max(1, round(args.steps / (0.8 * args.slots)))
        sub = 0
        step_n = 0
        while sub < args.reqs or srv._host_busy.any() or \
                srv._pending is not None:
            if sub < args.reqs and step_n % period == 0:
                srv.submit(make_request(10000 + sub, sub))
                sub += 1
            srv.step()
            step_n += 1
        res = srv._results
    dt = time.perf_counter() - t0
    lats = np.array([r.latency_s for r in res.values()])
    waits = np.array([r.queue_wait_s for r in res.values()])
    print(f"model={args.model} contract={args.contract} "
          f"slots={args.slots} steps={args.steps} reqs={args.reqs} "
          f"arrival={args.arrival}: {len(res)/dt:.3f} imgs/sec  "
          f"latency(from submit) p50={np.percentile(lats,50):.1f}s "
          f"p95={np.percentile(lats,95):.1f}s  "
          f"queue-wait p50={np.percentile(waits,50):.1f}s "
          f"p95={np.percentile(waits,95):.1f}s wall={dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
