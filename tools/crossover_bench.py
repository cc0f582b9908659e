"""Dense-bf16 crossover: MX+top-k (serving tier) vs dense bf16 at
N in {256, 1024, 4096} (round-4 verdict missing #3).

At N=256 pruning 154-of-256 keys saves almost nothing, so vs_bf16_dense
< 1 there says little about the capability's value.  The regime where
top-k should pay is long N, where the dense alternative materializes the
full N x N score matrix per head (the reference does exactly this —
/root/reference/workloads/DiT/models.py:216-217 dense scatter); this
tool measures the same honest protocol as bench.py's vs_bf16_dense
(identical model, dense bf16 attention + bf16 linears, no quantization)
at the three sequence lengths:

  DiT-XL/2 256^2   -> N=256   (B=32 CFG-doubled, the bench operating point)
  DiT-XL/2 512^2   -> N=1024  (B=4)
  PixArt-a 1024^2  -> N=4096  (B=1, micro-conditioning, masked cross-attn)

Prints one line per point: ms/step for serving-tier quantized vs dense
bf16 and the ratio (>1 means MX+top-k is FASTER than dense bf16).
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

import dataclasses

from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                        PixArtConfig, PixArtQuantConfig,
                                        dit_forward_with_cfg, init_dit,
                                        init_pixart, pixart_forward)
from mx_quantization_tpu.utils.prequantize import prequantize_weights
from mx_quantization_tpu.workloads.dit import dit_mx_specs
from mx_quantization_tpu.workloads.pixart import pixart_mx_specs


@jax.jit
def _fetch(x):
    return jnp.sum(x.astype(jnp.float32))


def timed_chain(step, p, x, n0=1, n1=5, reps=3):
    o = step(p, x)
    _ = np.asarray(_fetch(o))

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = x
            for _ in range(n):
                o = step(p, o)
            _ = np.asarray(_fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n1) - run(n0)) / (n1 - n0)


def dit_point(image_size: int, B: int):
    latent = image_size // 8
    cfg = DiT_models["DiT-XL/2"](input_size=latent)
    specs = dit_mx_specs("fused")
    params = init_dit(jax.random.key(0), cfg)
    q_params, qspecs = prequantize_weights(params, specs,
                                           serve_dtype=jnp.bfloat16)
    bf16_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    qcfg = DiTQuantConfig(mx_specs=qspecs, mx_quant=True, top_k=True,
                          k=154, ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=(27,), topk_key_bits=8,
                          activation_dtype="bfloat16", contract="serving")
    dcfg = DiTQuantConfig(mx_quant=False, activation_dtype="bfloat16")

    x = 0.1 * jax.random.normal(jax.random.key(1),
                                (2 * B, 4, latent, latent))
    t = jnp.full((2 * B,), 500.0)
    y = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                        ).astype(jnp.int32)

    def make(qc, p):
        @jax.jit
        def step(p, x):
            out = dit_forward_with_cfg(p, x, t, y, cfg, qc, cfg_scale=4.0)
            return x - 0.01 * out[:, :4]
        return step

    t_q = timed_chain(make(qcfg, q_params), q_params, x)
    t_d = timed_chain(make(dcfg, bf16_params), bf16_params, x)
    n_tok = latent * latent // 4
    print(f"DiT-XL/2 {image_size}^2 (N={n_tok}, B={B}): serving "
          f"{t_q*1e3:.1f} ms/step vs dense-bf16 {t_d*1e3:.1f} ms/step "
          f"-> vs_bf16_dense {t_d/t_q:.3f}", flush=True)
    return t_d / t_q


def pixart_point(image_size: int, B: int):
    sample = image_size // 8
    cfg = PixArtConfig(sample_size=sample)
    specs = pixart_mx_specs("fused")
    params = init_pixart(jax.random.key(0), cfg)
    q_params, qspecs = prequantize_weights(params, specs,
                                           serve_dtype=jnp.bfloat16)
    bf16_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    qcfg = PixArtQuantConfig(mx_specs=qspecs, mx_quant=True,
                             self_top_k=True, self_k=77,
                             cross_top_k=True, cross_k=60,
                             pred_mode="two_step_leading_ones",
                             exclude_blocks=(27,), topk_key_bits=8,
                             activation_dtype="bfloat16",
                             contract="serving")
    dcfg = PixArtQuantConfig(mx_quant=False, activation_dtype="bfloat16")

    x = 0.1 * jax.random.normal(jax.random.key(1),
                                (2 * B, 4, sample, sample))
    enc = jax.random.normal(jax.random.key(2),
                            (2 * B, 120, cfg.caption_channels)) * 0.02
    t_ = jnp.full((2 * B,), 500.0)
    mask = jnp.ones((2 * B, 120))

    def make(qc):
        @jax.jit
        def step(p, x):
            out = pixart_forward(p, x, enc, t_, cfg, qc,
                                 encoder_attention_mask=mask)
            return x - 0.01 * out[:, :4]
        return step

    t_q = timed_chain(make(qcfg), q_params, x)
    t_d = timed_chain(make(dcfg), bf16_params, x)
    n_tok = (sample // cfg.patch_size) ** 2
    print(f"PixArt-a {image_size}^2 (N={n_tok}, B={B}): serving "
          f"{t_q*1e3:.1f} ms/step vs dense-bf16 {t_d*1e3:.1f} ms/step "
          f"-> vs_bf16_dense {t_d/t_q:.3f}", flush=True)
    return t_d / t_q


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", nargs="*",
                    default=["dit256", "dit512", "pixart1024"])
    args = ap.parse_args()
    if "dit256" in args.points:
        dit_point(256, 32)
    if "dit512" in args.points:
        dit_point(512, 4)
    if "pixart1024" in args.points:
        pixart_point(1024, 1)
