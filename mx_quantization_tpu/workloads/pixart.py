"""PixArt-alpha / PixArt-Sigma text-to-image inference workload.

Re-implements the reference alpha pipeline
(workloads/PixArt/scripts/text_local_inference_alpha.py:39-254) TPU-first;
``--variant sigma`` selects the Sigma operating point
(text_local_inference_sigma.py:44-130 — same MX transformer at 1024/2K
resolution, 300-token T5 captions, no micro-conditioning):

  Phase 1: T5 text encoding — done OFFLINE exactly like the reference (it
  encodes all prompts, caches embeds, then frees the T5, alpha:86-103).
  Here the cache is an .npz of (embeds, attention_mask); a helper encodes
  with a local transformers T5 checkpoint when available.

  Phase 2: MX PixArt transformer + DPM-Solver++ 20-step sampling + VAE
  decode, with self/cross top-k pruning configured per the reference's
  set_config cascade.
"""

from __future__ import annotations

import argparse
import json
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import DPMSolverMultistep
from ..models.pixart import (PixArtConfig, PixArtQuantConfig, init_pixart,
                             pixart_forward)
from ..predictors.elsa import create_structured_orthogonal_matrix
from ..specs import MxSpecs, finalize_mx_specs as _finalize


def pixart_mx_specs(custom_tpu: str = "fused") -> MxSpecs:
    """The PixArt-alpha workload's EXACT hardcoded specs (reference
    text_local_inference_alpha.py:108-124): MXINT8 w/a, scale 8, block 32,
    bfloat=32 (the fp32 grid — identity), **mx_flush_fp32_subnorms=True**,
    inference only."""
    return _finalize(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        shared_exp_method="max", block_size=32, bfloat=32, fp=0,
        round="nearest", mx_flush_fp32_subnorms=True,
        quantize_backprop=False, custom_tpu=custom_tpu))


def encode_prompts_t5(prompts: List[str], t5_path: str, max_length: int = 120,
                      backend: str = "jax", quantize: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """T5 prompt encoding with a local checkpoint (reference alpha:86-99).

    backend="jax" (default): the IN-FRAMEWORK encoder (models/t5.py) runs
    on the accelerator, optionally MXINT8-quantized (``quantize=True`` —
    the TPU-native analogue of the reference's 8-bit bitsandbytes T5).
    backend="torch": the original CPU transformers path.
    Returns (embeds (N, L, d_model), mask (N, L))."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(t5_path)
    inputs = tok(prompts, max_length=max_length, padding="max_length",
                 truncation=True, return_tensors="np")
    ids = inputs["input_ids"].astype(np.int64)
    mask = inputs["attention_mask"].astype(np.int32)

    if backend == "torch":
        import torch
        from transformers import T5EncoderModel
        enc = T5EncoderModel.from_pretrained(t5_path)
        enc.eval()
        with torch.no_grad():
            out = enc(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask))
        return (out.last_hidden_state.numpy().astype(np.float32), mask)

    import glob
    import os

    import jax
    import jax.numpy as jnp

    from ..models.t5 import T5_CONFIGS, T5Config, load_t5_checkpoint, \
        t5_encode

    # checkpoint file inside the HF-style folder
    cands = (glob.glob(os.path.join(t5_path, "*.safetensors")) +
             glob.glob(os.path.join(t5_path, "pytorch_model*.bin")))
    if not cands:
        raise FileNotFoundError(f"no T5 weights under {t5_path}")
    # infer the config from the embedding width
    import json
    cfg_file = os.path.join(t5_path, "config.json")
    if os.path.exists(cfg_file):
        hf = json.load(open(cfg_file))
        t5c = T5Config(
            vocab_size=hf.get("vocab_size", 32128),
            d_model=hf.get("d_model", 4096), d_kv=hf.get("d_kv", 64),
            d_ff=hf.get("d_ff", 10240),
            num_layers=hf.get("num_layers", 24),
            num_heads=hf.get("num_heads", 64),
            relative_attention_num_buckets=hf.get(
                "relative_attention_num_buckets", 32),
            relative_attention_max_distance=hf.get(
                "relative_attention_max_distance", 128))
    else:
        t5c = T5_CONFIGS["t5-v1_1-xxl"]
    params = jax.tree.map(jnp.asarray, load_t5_checkpoint(cands[0], t5c))
    specs = pixart_mx_specs("fused") if quantize else None
    out = t5_encode(params, jnp.asarray(ids), jnp.asarray(mask), t5c,
                    mx_specs=specs)
    return np.asarray(out, np.float32), mask


def sample_pixart(params, cfg: PixArtConfig, qcfg: PixArtQuantConfig,
                  prompt_embeds: jax.Array, prompt_mask: jax.Array,
                  null_embeds: jax.Array, key,
                  num_steps: int = 20, guidance_scale: float = 4.5,
                  orthogonal_matrix=None) -> jax.Array:
    """Generate latents for a batch of prompts with CFG (alpha:201-210)."""
    n = prompt_embeds.shape[0]
    latent = cfg.sample_size
    solver = DPMSolverMultistep()

    null = jnp.broadcast_to(null_embeds, prompt_embeds.shape)
    # CFG doubling: cond batch then null batch, ONE model call per step
    ctx2 = jnp.concatenate([prompt_embeds, null], axis=0)
    mask2 = jnp.concatenate(
        [prompt_mask, jnp.ones_like(prompt_mask)], axis=0)

    # ONE jitted CFG step with the timestep TRACED (two jits when
    # exclude_timesteps partitions the schedule) — the driver compiles
    # once and reuses it for all num_steps solver steps.
    excluded = set(qcfg.exclude_timesteps)

    # params/context are EXPLICIT jit arguments (closing over them would
    # bake the full weight set into the compiled HLO as constants)
    def make_step(is_excluded: bool):
        tsi = next(iter(excluded)) if is_excluded else None

        @jax.jit
        def cfg_eps(params, x, t, ctx2, mask2):
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            out = pixart_forward(params, x2, ctx2, t2, cfg, qcfg,
                                 encoder_attention_mask=mask2,
                                 timestep_idx=tsi,
                                 orthogonal_matrix=orthogonal_matrix)
            eps2 = out[:, : cfg.in_channels]  # drop learned-variance chans
            eps_c, eps_u = jnp.split(eps2, 2, axis=0)
            return eps_u + guidance_scale * (eps_c - eps_u)
        return cfg_eps

    step_inc = make_step(False)
    step_exc = make_step(True) if excluded else None

    x = jax.random.normal(key, (n, cfg.in_channels, latent, latent))
    ts = solver.timesteps(num_steps)
    prev_x0 = None
    prev_t = None
    for si, t_idx in enumerate(ts):
        t = jnp.full((n,), float(t_idx))
        step = step_exc if si in excluded else step_inc
        eps = step(params, x, t, ctx2, mask2)

        a, sg = solver.alpha_t[t_idx], solver.sigma_t[t_idx]
        x0 = (x - sg * eps) / a
        s_t = int(ts[si + 1]) if si + 1 < len(ts) else 0
        lam_s, lam_t = solver.lambda_t[t_idx], solver.lambda_t[s_t]
        h = lam_t - lam_s
        a_s, sg_s = solver.alpha_t[s_t], solver.sigma_t[s_t]
        if prev_x0 is None:
            x = (sg_s / sg) * x - a_s * jnp.expm1(-h) * x0
        else:
            h_prev = solver.lambda_t[t_idx] - solver.lambda_t[prev_t]
            r = h_prev / h if h != 0 else 1.0
            d = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * prev_x0
            x = (sg_s / sg) * x - a_s * jnp.expm1(-h) * d
        prev_x0, prev_t = x0, t_idx
    return x


def build_argparser():
    p = argparse.ArgumentParser("PixArt-alpha / PixArt-Sigma MX inference")
    p.add_argument("--variant", default="alpha", choices=["alpha", "sigma"],
                   help="alpha: 120-token T5, micro-conds at 1024px; "
                        "sigma: 300-token T5, no micro-conds "
                        "(text_local_inference_sigma.py)")
    p.add_argument("--max-token-length", type=int, default=None,
                   help="T5 caption length (default: 120 alpha / 300 sigma)")
    p.add_argument("--transformer-ckpt", default=None)
    p.add_argument("--prompt-embeds", default=None,
                   help=".npz with embeds/mask/null_embeds (offline T5)")
    p.add_argument("--t5-path", default=None)
    p.add_argument("--prompts", nargs="*", default=["an astronaut riding a horse"])
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--num-layers", type=int, default=28)
    p.add_argument("--num-heads", type=int, default=16)
    p.add_argument("--head-dim", type=int, default=72)
    p.add_argument("--caption-channels", type=int, default=4096)
    p.add_argument("--num-steps", type=int, default=20)
    p.add_argument("--guidance-scale", type=float, default=4.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="pixart_samples.npz")
    p.add_argument("--vae", default=None)
    p.add_argument("--mx-quant", action="store_true")
    p.add_argument("--self-top-k", action="store_true")
    p.add_argument("--self-k", type=int, default=77)
    p.add_argument("--cross-top-k", action="store_true")
    p.add_argument("--cross-k", type=int, default=20)
    p.add_argument("--no-ex-pred", action="store_true")
    p.add_argument("--pred-mode", default="two_step_leading_ones")
    p.add_argument("--exclude-blocks", type=int, nargs="*", default=[27])
    p.add_argument("--engine", default="fused", choices=["fused", "ref"])
    p.add_argument("--contract", default="exact",
                   choices=["exact", "serving"],
                   help="serving = relaxed fused-kernel attention tier "
                        "(tie-inclusive selection, bf16 attn probs; "
                        "divergence-bounded by tools/contract_trajectory "
                        "--family pixart)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    # Sigma: no micro-conditioning at any resolution; alpha: diffusers
    # default (on at sample_size 128 == 1024px)
    cfg = PixArtConfig(sample_size=args.image_size // 8,
                       num_layers=args.num_layers,
                       num_attention_heads=args.num_heads,
                       attention_head_dim=args.head_dim,
                       caption_channels=args.caption_channels,
                       micro_conds=False if args.variant == "sigma" else None)
    tok_len = args.max_token_length or (300 if args.variant == "sigma"
                                        else 120)
    specs = pixart_mx_specs(args.engine) if args.mx_quant else None
    qcfg = PixArtQuantConfig(
        mx_specs=specs, mx_quant=args.mx_quant,
        self_top_k=args.self_top_k, self_k=args.self_k,
        cross_top_k=args.cross_top_k, cross_k=args.cross_k,
        ex_pred=not args.no_ex_pred, pred_mode=args.pred_mode,
        exclude_blocks=tuple(args.exclude_blocks),
        contract=args.contract)

    if args.prompt_embeds:
        z = np.load(args.prompt_embeds)
        embeds, mask = z["embeds"], z["mask"]
        null = z.get("null_embeds", np.zeros_like(embeds[:1]))
    elif args.t5_path:
        embeds, mask = encode_prompts_t5(args.prompts, args.t5_path, tok_len)
        null, _ = encode_prompts_t5([""], args.t5_path, tok_len)
    else:
        print("WARNING: no prompt embeds/T5 — synthetic embeds (smoke test)")
        rng = np.random.RandomState(0)
        embeds = rng.randn(len(args.prompts), tok_len,
                           cfg.caption_channels).astype(np.float32)
        mask = np.ones((len(args.prompts), tok_len), np.int32)
        null = rng.randn(1, tok_len, cfg.caption_channels).astype(np.float32)

    if args.transformer_ckpt:
        if args.transformer_ckpt.endswith((".safetensors", ".bin", ".pth",
                                           ".pt")):
            from ..utils.checkpoint import load_pixart_checkpoint
            params = jax.tree.map(jnp.asarray, load_pixart_checkpoint(
                args.transformer_ckpt, cfg.num_layers))
        else:
            from ..utils.checkpoint import load_params
            params = jax.tree.map(jnp.asarray,
                                  load_params(args.transformer_ckpt))
    else:
        print("WARNING: no --transformer-ckpt — random init (smoke test)")
        params = init_pixart(jax.random.key(0), cfg)

    om = None
    if args.pred_mode == "ELSA":
        om = jnp.asarray(
            create_structured_orthogonal_matrix(cfg.attention_head_dim))

    t0 = time.time()
    lat = sample_pixart(params, cfg, qcfg, jnp.asarray(embeds),
                        jnp.asarray(mask), jnp.asarray(null),
                        jax.random.key(args.seed), args.num_steps,
                        args.guidance_scale, om)
    lat = np.asarray(lat)
    print(f"sampled {lat.shape} in {time.time()-t0:.1f}s")

    if args.vae:
        from ..models.vae import decode_latents, load_vae_checkpoint
        vae = load_vae_checkpoint(args.vae)
        imgs = np.asarray(decode_latents(vae, jnp.asarray(lat)))
        np.savez(args.out, samples=imgs, latents=lat)
    else:
        np.savez(args.out, latents=lat)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
