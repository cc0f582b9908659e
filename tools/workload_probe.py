"""Throughput probe for the DeiT and PixArt-alpha quantized paths on one
TPU chip, at the reference operating points (run_deit.sh:14-52,
run_pixart_alpha.sh:31-42).  Prints imgs/sec for each.
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

from mx_quantization_tpu import finalize_mx_specs
from mx_quantization_tpu.models import (PixArtConfig, PixArtQuantConfig,
                                        VitQuantConfig, init_pixart,
                                        init_vit, pixart_forward,
                                        vit_forward)
from mx_quantization_tpu.models.vit import VIT_CONFIGS
from mx_quantization_tpu.utils.prequantize import prequantize_weights

# the EXACT reference operating points: DeiT uses bfloat=32 (the fp32
# identity), PixArt bfloat=32 + mx_flush_fp32_subnorms=True
SPECS = finalize_mx_specs(dict(
    w_elem_format="int8", a_elem_format="int8", scale_bits=8, block_size=32,
    bfloat=32, quantize_backprop=False, custom_tpu="fused"))
PIXART_SPECS = SPECS.replace(mx_flush_fp32_subnorms=True)


def timed_steps(step, args0, feed, n0=1, n1=6, reps=2):
    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    o = step(*args0)
    _ = np.asarray(fetch(o))

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = args0[feed]
            for _ in range(n):
                a = list(args0)
                a[feed] = o
                o = step(*a)
            _ = np.asarray(fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n1) - run(n0)) / (n1 - n0)


def deit_probe(model="deit_small_patch16_224", k=60, B=100,
               pred_mode="ex_pred", contract="exact"):
    cfg = VIT_CONFIGS[model]
    params = init_vit(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, SPECS)
    qcfg = VitQuantConfig(mx_specs=specs, mx_quant=True, top_k=True, k=k,
                          approx_flag=True, pred_mode=pred_mode,
                          contract=contract)
    x = jax.random.normal(jax.random.key(1), (B, 3, 224, 224))

    @jax.jit
    def step(p, x):
        logits = vit_forward(p, x, cfg, qcfg)
        # feed a fresh image batch derived from logits (dependency chain)
        return x * 0.999 + logits.mean() * 1e-6

    t = timed_steps(step, (q_params, x), feed=1)
    print(f"DeiT {model} (k={k}, {pred_mode}, B={B}): {t*1e3:.1f} ms/batch"
          f" -> {B/t:.1f} imgs/sec", flush=True)
    return B / t


def pixart_probe(B=8, steps=20, contract="exact"):
    cfg = PixArtConfig()  # alpha 256: 28 layers, d=1152, heads=16, sample 32
    params = init_pixart(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, PIXART_SPECS)
    qcfg = PixArtQuantConfig(mx_specs=specs, mx_quant=True,
                             self_top_k=True, self_k=77,
                             cross_top_k=True, cross_k=60,
                             pred_mode="two_step_leading_ones",
                             exclude_blocks=(27,))
    x = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
    enc = jax.random.normal(jax.random.key(2), (2 * B, 120, cfg.caption_channels)) * 0.02
    t_ = jnp.full((2 * B,), 500.0)
    mask = jnp.ones((2 * B, 120))

    # two_step_leading_ones is the reference alpha operating point
    # (run_pixart_alpha.sh:31-42); both modes are kernel-eligible
    for pred_mode in ("two_step_leading_ones", "ex_pred"):
        qc = PixArtQuantConfig(mx_specs=specs, mx_quant=True,
                               self_top_k=True, self_k=77,
                               cross_top_k=True, cross_k=60,
                               pred_mode=pred_mode, exclude_blocks=(27,),
                               topk_key_bits=8, contract=contract,
                               activation_dtype="bfloat16")

        @jax.jit
        def step(p, x, enc, t_):
            out = pixart_forward(p, x, enc, t_, cfg, qc,
                                 encoder_attention_mask=mask)
            return x - 0.01 * out[:, :4]

        t = timed_steps(step, (q_params, x, enc, t_), feed=1)
        print(f"PixArt-a 256 ({pred_mode}, B={B} CFG-doubled): "
              f"{t*1e3:.1f} ms/step -> {B/(t*steps):.3f} imgs/sec "
              f"@{steps} DPM steps", flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser("workload throughput probe")
    ap.add_argument("--contract", default="exact",
                    choices=["exact", "serving"],
                    help="attention-kernel tier (mirrors the workload "
                         "CLIs' --contract flag)")
    pa = ap.parse_args()
    # reference run_deit.sh:14-52 operating points
    deit_probe(model="deit_tiny_patch16_224", k=80, contract=pa.contract)
    deit_probe(contract=pa.contract)
    deit_probe(model="deit_base_patch16_224", k=30,
               pred_mode="two_step_leading_ones", contract=pa.contract)
    pixart_probe(contract=pa.contract)


def dit512_probe(B=4):
    """DiT-XL/2 at 512x512 (N=1024 tokens): the query-tiled kernel path."""
    from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                            dit_forward_with_cfg, init_dit)
    cfg = DiT_models["DiT-XL/2"](input_size=64)
    params = init_dit(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, SPECS.replace(bfloat=16))
    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True, k=154,
                          ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=(27,), topk_key_bits=8,
                          activation_dtype="bfloat16")
    x = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 64, 64))
    t_ = jnp.full((2 * B,), 500.0)
    y = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                        ).astype(jnp.int32)

    @jax.jit
    def step(p, x, t_, y):
        out = dit_forward_with_cfg(p, x, t_, y, cfg, qcfg, cfg_scale=4.0)
        return x - 0.01 * out[:, :4]

    t = timed_steps(step, (q_params, x, t_, y), feed=1)
    print(f"DiT-XL/2 512 (k=154, B={B} CFG-doubled): {t*1e3:.1f} ms/step -> "
          f"{B/(t*100):.4f} imgs/sec @100 steps", flush=True)


def pixart1024_probe(B=1, steps=20):
    """PixArt-alpha at 1024px (sample 128 -> N=4096 latent tokens): the
    query-tiled kernel at its S cap, plus micro-conditioning."""
    cfg = PixArtConfig(sample_size=128)
    params = init_pixart(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, PIXART_SPECS)
    qc = PixArtQuantConfig(mx_specs=specs, mx_quant=True,
                           self_top_k=True, self_k=77,
                           cross_top_k=True, cross_k=60,
                           pred_mode="two_step_leading_ones",
                           exclude_blocks=(27,), topk_key_bits=8,
                           activation_dtype="bfloat16")
    x = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 128, 128))
    enc = jax.random.normal(jax.random.key(2),
                            (2 * B, 120, cfg.caption_channels)) * 0.02
    t_ = jnp.full((2 * B,), 500.0)
    mask = jnp.ones((2 * B, 120))

    @jax.jit
    def step(p, x, enc, t_):
        out = pixart_forward(p, x, enc, t_, cfg, qc,
                             encoder_attention_mask=mask)
        return x - 0.01 * out[:, :4]

    t = timed_steps(step, (q_params, x, enc, t_), feed=1)
    print(f"PixArt-a 1024 (two_step, B={B} CFG-doubled): "
          f"{t*1e3:.1f} ms/step -> {B/(t*steps):.3f} imgs/sec "
          f"@{steps} DPM steps", flush=True)
