"""CLIP (ViT image tower + causal text transformer) in JAX — the
TPU-native replacement for the torch CLIP the CLIPScore path shelled to
(round-2 verdict missing #5; reference PixArt/evaluation/clip_score.py
uses torchmetrics' clip-vit-large-patch14).

Mirrors transformers' CLIPModel semantics exactly
(transformers/models/clip/modeling_clip.py):
  * vision: conv patch embed (no bias) + class embedding + learned
    positions -> pre_layrnorm (sic) -> encoder -> pooled = CLS ->
    post_layernorm -> visual_projection (no bias)
  * text: token + learned position embeddings -> encoder with CAUSAL mask
    (plus the padding mask) -> final_layer_norm -> pooled at the eot token
    (argmax of ids for the legacy eos_token_id==2 configs, first-eos
    otherwise) -> text_projection (no bias)
  * encoder layer: pre-LN residual attention (scale d^-1/2) + pre-LN MLP
    with quick_gelu (x * sigmoid(1.702 x)) — the ViT-L/14 activation
  * LN eps 1e-5

Linears run through ops.linear, so the towers can be MX-quantized with an
``mx_specs`` (the TPU analogue of running the scorer quantized).
Value-validated against transformers' CLIPModel (tests/test_clip.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linear


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    # vision tower
    image_size: int = 224
    patch_size: int = 14
    v_hidden: int = 1024
    v_layers: int = 24
    v_heads: int = 16
    v_mlp: int = 4096
    # text tower
    vocab_size: int = 49408
    max_positions: int = 77
    t_hidden: int = 768
    t_layers: int = 12
    t_heads: int = 12
    t_mlp: int = 3072
    projection_dim: int = 768
    eos_token_id: int = 2        # legacy configs: pooled at argmax(ids)
    eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_CONFIGS = {
    "clip-vit-large-patch14": ClipConfig(),
}

# CLIPProcessor normalization constants (openai/clip-vit-large-patch14)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _encoder_layer(p, x, heads, eps, mask=None, mx_specs=None):
    B, N, C = x.shape
    D = C // heads

    h = _ln(x, p["ln1"]["weight"], p["ln1"]["bias"], eps)
    q = linear(h, p["q"]["weight"], p["q"]["bias"], mx_specs=mx_specs)
    k = linear(h, p["k"]["weight"], p["k"]["bias"], mx_specs=mx_specs)
    v = linear(h, p["v"]["weight"], p["v"]["bias"], mx_specs=mx_specs)
    q = q.reshape(B, N, heads, D).transpose(0, 2, 1, 3) * (D ** -0.5)
    k = k.reshape(B, N, heads, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, N, heads, D).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   precision=jax.lax.Precision.HIGHEST)
    if mask is not None:
        s = s + mask
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", a, v,
                   precision=jax.lax.Precision.HIGHEST)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
    x = x + linear(o, p["out"]["weight"], p["out"]["bias"],
                   mx_specs=mx_specs)

    h = _ln(x, p["ln2"]["weight"], p["ln2"]["bias"], eps)
    h = linear(h, p["fc1"]["weight"], p["fc1"]["bias"], mx_specs=mx_specs)
    h = _quick_gelu(h)
    h = linear(h, p["fc2"]["weight"], p["fc2"]["bias"], mx_specs=mx_specs)
    return x + h


def clip_image_embed(params: Dict, pixel_values: jax.Array,
                     cfg: ClipConfig, mx_specs=None) -> jax.Array:
    """(B, 3, H, W) normalized pixels -> (B, projection_dim) image embeds
    (CLIPVisionTransformer + visual_projection)."""
    vp = params["vision"]
    B = pixel_values.shape[0]
    x = jax.lax.conv_general_dilated(
        pixel_values, vp["patch_embedding"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID")
    x = x.reshape(B, cfg.v_hidden, -1).transpose(0, 2, 1)  # (B, N, C)
    cls = jnp.broadcast_to(vp["class_embedding"], (B, 1, cfg.v_hidden))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["position_embedding"]
    x = _ln(x, vp["pre_ln"]["weight"], vp["pre_ln"]["bias"], cfg.eps)
    for lp in vp["layers"]:
        x = _encoder_layer(lp, x, cfg.v_heads, cfg.eps, mx_specs=mx_specs)
    pooled = x[:, 0]
    pooled = _ln(pooled, vp["post_ln"]["weight"], vp["post_ln"]["bias"],
                 cfg.eps)
    return linear(pooled, params["visual_projection"], None,
                  mx_specs=mx_specs)


def clip_text_embed(params: Dict, input_ids: jax.Array, cfg: ClipConfig,
                    attention_mask: Optional[jax.Array] = None,
                    mx_specs=None) -> jax.Array:
    """(B, L) token ids -> (B, projection_dim) text embeds
    (CLIPTextTransformer + text_projection; causal + padding masks)."""
    tp = params["text"]
    B, L = input_ids.shape
    x = tp["token_embedding"][input_ids] + tp["position_embedding"][:L]

    neg = jnp.finfo(jnp.float32).min
    causal = jnp.where(
        jnp.arange(L)[:, None] >= jnp.arange(L)[None, :], 0.0, neg
    )[None, None]
    mask = causal
    if attention_mask is not None:
        pad = jnp.where(attention_mask.astype(bool), 0.0, neg
                        )[:, None, None, :]
        mask = causal + pad
    for lp in tp["layers"]:
        x = _encoder_layer(lp, x, cfg.t_heads, cfg.eps, mask=mask,
                           mx_specs=mx_specs)
    x = _ln(x, tp["final_ln"]["weight"], tp["final_ln"]["bias"], cfg.eps)
    if cfg.eos_token_id == 2:
        # legacy configs: eot is the highest token id in each sequence
        pos = jnp.argmax(input_ids, axis=-1)
    else:
        pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(B), pos]
    return linear(pooled, params["text_projection"], None,
                  mx_specs=mx_specs)


def preprocess_images(images: np.ndarray, cfg: ClipConfig) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, 3, 224, 224) f32 normalized pixels
    (CLIPProcessor: bicubic resize of the short side to 224, center crop,
    rescale 1/255, normalize)."""
    import jax.image as jimage
    n, h, w, _ = images.shape
    size = cfg.image_size
    if h <= w:
        nh, nw = size, max(size, int(round(w * size / h)))
    else:
        nh, nw = max(size, int(round(h * size / w))), size
    x = jnp.asarray(images, jnp.float32) / 255.0
    x = jimage.resize(x, (n, nh, nw, 3), method="bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top:top + size, left:left + size]
    x = (x - IMAGE_MEAN) / IMAGE_STD
    return np.asarray(x.transpose(0, 3, 1, 2), np.float32)


# ----------------------------------------------------------------------
def init_clip(key: jax.Array, cfg: ClipConfig) -> Dict:
    ks = iter(jax.random.split(key, 16 + 16 * (cfg.v_layers + cfg.t_layers)))

    def lin(i, o, s=0.02):
        return {"weight": s * jax.random.normal(next(ks), (o, i)),
                "bias": jnp.zeros((o,))}

    def lnp(d):
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    def layer(c, m):
        return {"ln1": lnp(c), "q": lin(c, c), "k": lin(c, c),
                "v": lin(c, c), "out": lin(c, c), "ln2": lnp(c),
                "fc1": lin(c, m), "fc2": lin(m, c)}

    return {
        "vision": {
            "patch_embedding": 0.02 * jax.random.normal(
                next(ks), (cfg.v_hidden, 3, cfg.patch_size, cfg.patch_size)),
            "class_embedding": 0.02 * jax.random.normal(
                next(ks), (cfg.v_hidden,)),
            "position_embedding": 0.02 * jax.random.normal(
                next(ks), (cfg.num_patches + 1, cfg.v_hidden)),
            "pre_ln": lnp(cfg.v_hidden), "post_ln": lnp(cfg.v_hidden),
            "layers": [layer(cfg.v_hidden, cfg.v_mlp)
                       for _ in range(cfg.v_layers)],
        },
        "text": {
            "token_embedding": 0.02 * jax.random.normal(
                next(ks), (cfg.vocab_size, cfg.t_hidden)),
            "position_embedding": 0.02 * jax.random.normal(
                next(ks), (cfg.max_positions, cfg.t_hidden)),
            "final_ln": lnp(cfg.t_hidden),
            "layers": [layer(cfg.t_hidden, cfg.t_mlp)
                       for _ in range(cfg.t_layers)],
        },
        "visual_projection": 0.02 * jax.random.normal(
            next(ks), (cfg.projection_dim, cfg.v_hidden)),
        "text_projection": 0.02 * jax.random.normal(
            next(ks), (cfg.projection_dim, cfg.t_hidden)),
    }


def load_clip_checkpoint(path_or_sd, cfg: ClipConfig) -> Dict:
    """Convert a transformers CLIPModel state dict (clip-vit-large-patch14
    naming) into our param tree."""
    if isinstance(path_or_sd, dict):
        sd = path_or_sd
    elif str(path_or_sd).endswith(".safetensors"):
        from safetensors.torch import load_file
        sd = load_file(path_or_sd)
    else:
        import torch
        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)

    def t2n(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    def lin(pre):
        return {"weight": t2n(pre + ".weight"), "bias": t2n(pre + ".bias")}

    def layers(pre, n):
        out = []
        for i in range(n):
            lp = f"{pre}.encoder.layers.{i}."
            out.append({
                "ln1": lin(lp + "layer_norm1"),
                "q": lin(lp + "self_attn.q_proj"),
                "k": lin(lp + "self_attn.k_proj"),
                "v": lin(lp + "self_attn.v_proj"),
                "out": lin(lp + "self_attn.out_proj"),
                "ln2": lin(lp + "layer_norm2"),
                "fc1": lin(lp + "mlp.fc1"),
                "fc2": lin(lp + "mlp.fc2"),
            })
        return out

    return {
        "vision": {
            "patch_embedding": t2n(
                "vision_model.embeddings.patch_embedding.weight"),
            "class_embedding": t2n(
                "vision_model.embeddings.class_embedding"),
            "position_embedding": t2n(
                "vision_model.embeddings.position_embedding.weight"),
            "pre_ln": lin("vision_model.pre_layrnorm"),
            "post_ln": lin("vision_model.post_layernorm"),
            "layers": layers("vision_model", cfg.v_layers),
        },
        "text": {
            "token_embedding": t2n(
                "text_model.embeddings.token_embedding.weight"),
            "position_embedding": t2n(
                "text_model.embeddings.position_embedding.weight"),
            "final_ln": lin("text_model.final_layer_norm"),
            "layers": layers("text_model", cfg.t_layers),
        },
        "visual_projection": t2n("visual_projection.weight"),
        "text_projection": t2n("text_projection.weight"),
    }


def config_from_hf(hf_config) -> ClipConfig:
    """ClipConfig from a transformers CLIPConfig (any variant)."""
    t, v = hf_config.text_config, hf_config.vision_config
    return ClipConfig(
        image_size=v.image_size, patch_size=v.patch_size,
        v_hidden=v.hidden_size, v_layers=v.num_hidden_layers,
        v_heads=v.num_attention_heads, v_mlp=v.intermediate_size,
        vocab_size=t.vocab_size, max_positions=t.max_position_embeddings,
        t_hidden=t.hidden_size, t_layers=t.num_hidden_layers,
        t_heads=t.num_attention_heads, t_mlp=t.intermediate_size,
        projection_dim=hf_config.projection_dim,
        eos_token_id=t.eos_token_id)


def load_clip_from_pretrained(model_path: str):
    """(ClipConfig, params) from a local dir, sharded checkpoint, or hub
    id: transformers materializes weights + config for ANY CLIP variant
    (torch CPU, one-time), then the state dict converts through
    load_clip_checkpoint.  Direct single-file loads should use
    load_clip_checkpoint with an explicit ClipConfig instead."""
    from transformers import CLIPModel

    m = CLIPModel.from_pretrained(model_path)
    cfg = config_from_hf(m.config)
    params = load_clip_checkpoint(
        {k: v for k, v in m.state_dict().items()}, cfg)
    return cfg, params
