"""AutoencoderKL (sd-vae-ft-mse) decoder/encoder in JAX.

The reference decodes DiT/PixArt latents with diffusers' pretrained
AutoencoderKL (DiT sample.py:84,128; PixArt pipeline).  This is a native
re-implementation of that architecture (block_out_channels 128/256/512/512,
2 layers per block, GN32 + SiLU resnets, single-head mid attention) plus a
converter from the public torch checkpoint.  scaling_factor 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

SCALING_FACTOR = 0.18215
BLOCK_CH = (128, 256, 512, 512)


def _gn(x, w, b, groups=32, eps=1e-6):
    N, C, H, W = x.shape
    xg = x.reshape(N, groups, C // groups, H, W)
    mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(N, C, H, W)
    return xn * w.reshape(1, -1, 1, 1) + b.reshape(1, -1, 1, 1)


def _conv(x, p, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, p["weight"], (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + p["bias"].reshape(1, -1, 1, 1)


def _resnet(x, p):
    h = _gn(x, p["norm1"]["weight"], p["norm1"]["bias"])
    h = jax.nn.silu(h)
    h = _conv(h, p["conv1"])
    h = _gn(h, p["norm2"]["weight"], p["norm2"]["bias"])
    h = jax.nn.silu(h)
    h = _conv(h, p["conv2"])
    if "conv_shortcut" in p:
        x = _conv(x, p["conv_shortcut"], padding=0)
    return x + h


def _attn(x, p):
    N, C, H, W = x.shape
    h = _gn(x, p["group_norm"]["weight"], p["group_norm"]["bias"])
    flat = h.reshape(N, C, H * W).transpose(0, 2, 1)  # (N, HW, C)
    q = flat @ p["to_q"]["weight"].T + p["to_q"]["bias"]
    k = flat @ p["to_k"]["weight"].T + p["to_k"]["bias"]
    v = flat @ p["to_v"]["weight"].T + p["to_v"]["bias"]
    attn = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(C), axis=-1)
    out = attn @ v
    out = out @ p["to_out"]["weight"].T + p["to_out"]["bias"]
    return x + out.transpose(0, 2, 1).reshape(N, C, H, W)


def _upsample(x, p):
    # p is the upsampler conv's {weight, bias}
    N, C, H, W = x.shape
    x = jax.image.resize(x, (N, C, 2 * H, 2 * W), method="nearest")
    return _conv(x, p)


def _downsample(x, p):
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
    return _conv(x, p, stride=2, padding=0)


def decode_latents(params: Dict, latents: jax.Array,
                   scale: bool = True) -> jax.Array:
    """(N, 4, h, w) latents -> (N, 3, 8h, 8w) images in [-1, 1]."""
    z = latents / SCALING_FACTOR if scale else latents
    z = _conv(z, params["post_quant_conv"], padding=0)

    d = params["decoder"]
    h = _conv(z, d["conv_in"])
    h = _resnet(h, d["mid"]["resnets"][0])
    h = _attn(h, d["mid"]["attn"])
    h = _resnet(h, d["mid"]["resnets"][1])
    for i, up in enumerate(d["up_blocks"]):
        for rp in up["resnets"]:
            h = _resnet(h, rp)
        if "upsampler" in up:
            h = _upsample(h, up["upsampler"])
    h = _gn(h, d["conv_norm_out"]["weight"], d["conv_norm_out"]["bias"])
    h = jax.nn.silu(h)
    return _conv(h, d["conv_out"])


def encode_images(params: Dict, images: jax.Array,
                  sample_key: Optional[jax.Array] = None,
                  scale: bool = True) -> jax.Array:
    """(N, 3, H, W) [-1,1] images -> (N, 4, H/8, W/8) latents (mode or
    sampled), matching diffusers encode().latent_dist (DiT train.py:204)."""
    e = params["encoder"]
    h = _conv(images, e["conv_in"])
    for down in e["down_blocks"]:
        for rp in down["resnets"]:
            h = _resnet(h, rp)
        if "downsampler" in down:
            h = _downsample(h, down["downsampler"])
    h = _resnet(h, e["mid"]["resnets"][0])
    h = _attn(h, e["mid"]["attn"])
    h = _resnet(h, e["mid"]["resnets"][1])
    h = _gn(h, e["conv_norm_out"]["weight"], e["conv_norm_out"]["bias"])
    h = jax.nn.silu(h)
    h = _conv(h, e["conv_out"])
    moments = _conv(h, params["quant_conv"], padding=0)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if sample_key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30, 20))
        mean = mean + std * jax.random.normal(sample_key, mean.shape)
    return mean * SCALING_FACTOR if scale else mean


# ----------------------------------------------------------------------
def load_vae_checkpoint(path: str) -> Dict:
    """Convert a diffusers AutoencoderKL state dict (torch .bin/.safetensors)
    into the param tree used above."""
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file
        sd = {k: v for k, v in load_file(path).items()}
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if "state_dict" in sd:
            sd = sd["state_dict"]

    def t2n(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    def conv(prefix):
        return {"weight": t2n(prefix + ".weight"),
                "bias": t2n(prefix + ".bias")}

    def norm(prefix):
        return {"weight": t2n(prefix + ".weight"),
                "bias": t2n(prefix + ".bias")}

    def resnet(prefix, cin, cout):
        p = {"norm1": norm(prefix + ".norm1"),
             "conv1": conv(prefix + ".conv1"),
             "norm2": norm(prefix + ".norm2"),
             "conv2": conv(prefix + ".conv2")}
        if cin != cout:
            p["conv_shortcut"] = conv(prefix + ".conv_shortcut")
        return p

    def attn(prefix):
        # diffusers >=0.18 names: to_q/to_k/to_v/to_out.0
        def lin(name):
            w = t2n(f"{prefix}.{name}.weight")
            return {"weight": w.reshape(w.shape[0], -1),
                    "bias": t2n(f"{prefix}.{name}.bias")}
        return {"group_norm": norm(prefix + ".group_norm"),
                "to_q": lin("to_q"), "to_k": lin("to_k"),
                "to_v": lin("to_v"), "to_out": lin("to_out.0")}

    ch = BLOCK_CH
    dec_ch = list(reversed(ch))  # (512, 512, 256, 128)
    p: Dict = {
        "post_quant_conv": conv("post_quant_conv"),
        "quant_conv": conv("quant_conv"),
        "decoder": {
            "conv_in": conv("decoder.conv_in"),
            "mid": {
                "resnets": [resnet("decoder.mid_block.resnets.0", 512, 512),
                            resnet("decoder.mid_block.resnets.1", 512, 512)],
                "attn": attn("decoder.mid_block.attentions.0"),
            },
            "conv_norm_out": norm("decoder.conv_norm_out"),
            "conv_out": conv("decoder.conv_out"),
            "up_blocks": [],
        },
        "encoder": {
            "conv_in": conv("encoder.conv_in"),
            "mid": {
                "resnets": [resnet("encoder.mid_block.resnets.0", 512, 512),
                            resnet("encoder.mid_block.resnets.1", 512, 512)],
                "attn": attn("encoder.mid_block.attentions.0"),
            },
            "conv_norm_out": norm("encoder.conv_norm_out"),
            "conv_out": conv("encoder.conv_out"),
            "down_blocks": [],
        },
    }
    prev = dec_ch[0]
    for i, c in enumerate(dec_ch):
        blk = {"resnets": []}
        for j in range(3):
            blk["resnets"].append(
                resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                       prev if j == 0 else c, c))
        if i < len(dec_ch) - 1:
            blk["upsampler"] = conv(f"decoder.up_blocks.{i}.upsamplers.0.conv")
        p["decoder"]["up_blocks"].append(blk)
        prev = c
    prev = 3
    for i, c in enumerate(ch):
        blk = {"resnets": []}
        cin = ch[i - 1] if i > 0 else 128
        for j in range(2):
            blk["resnets"].append(
                resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                       cin if j == 0 else c, c))
        if i < len(ch) - 1:
            blk["downsampler"] = conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv")
        p["encoder"]["down_blocks"].append(blk)
    return p
