"""Extended DeiT model zoo: DeiT-III (LayerScale ViT), CaiT, ResMLP.

Capability-parity with the reference's model files (workloads/deit/
models_v2.py = DeiT-III, cait_models.py, resmlp_models.py) — registered
architectures the quantized attention/MLP machinery plugs into.  Only the
deit_{tiny,small,base} variants are exercised by the reference's runs
(run_deit.sh); these exist so every checkpoint family the reference can load
has a home here.

All matmul-bearing layers route through the MX op library; quantization
plans reuse VitQuantConfig.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..attention import TopKAttentionConfig, topk_attention
from ..ops import conv2d, layer_norm, linear
from ..specs import MxSpecs
from .common import Params, conv_init, linear_init, ln_init, trunc_normal
from .stacked import run_blocks, stack_blocks
from .vit import VitConfig, VitQuantConfig, vit_attention, vit_mlp


# ----------------------------------------------------------------------
# DeiT-III: ViT + LayerScale (models_v2.py Layer_scale_init_Block)
# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Deit3Config(VitConfig):
    init_scale: float = 1e-4


def init_deit3(key: jax.Array, cfg: Deit3Config) -> Params:
    from .vit import init_vit
    p = init_vit(key, cfg)
    d = cfg.embed_dim

    def add_ls(bp):
        bp = dict(bp)
        bp["gamma_1"] = jnp.full((d,), cfg.init_scale)
        bp["gamma_2"] = jnp.full((d,), cfg.init_scale)
        return bp

    p["blocks"] = jax.tree.map(lambda x: x, p["blocks"])
    # stacked tree: add stacked gammas
    depth = cfg.depth
    p["blocks"]["gamma_1"] = jnp.full((depth, d), cfg.init_scale)
    p["blocks"]["gamma_2"] = jnp.full((depth, d), cfg.init_scale)
    return p


def deit3_forward(params: Params, x: jax.Array, cfg: Deit3Config,
                  qcfg: VitQuantConfig, orthogonal_matrix=None) -> jax.Array:
    B = x.shape[0]
    pe = params["patch_embed"]
    specs = qcfg.mx_specs if qcfg.mx_quant else None
    x = conv2d(x, pe["weight"], pe.get("bias"), stride=cfg.patch_size,
               mx_specs=specs)
    x = x.reshape(B, cfg.embed_dim, -1).transpose(0, 2, 1)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"]

    def body(bp, attn_cfg, x):
        mxs = qcfg.mx_specs if attn_cfg.mx_quant else None
        h = layer_norm(x, bp["norm1"]["weight"], bp["norm1"]["bias"],
                       eps=cfg.eps, mx_specs=None)
        x = x + bp["gamma_1"] * vit_attention(bp["attn"], h, cfg,
                                              qcfg.mx_specs, attn_cfg,
                                              orthogonal_matrix)
        h = layer_norm(x, bp["norm2"]["weight"], bp["norm2"]["bias"],
                       eps=cfg.eps, mx_specs=None)
        return x + bp["gamma_2"] * vit_mlp(bp["mlp"], h, mxs)

    cfgs = [qcfg.block_attn_cfg(i, cfg.depth) for i in range(cfg.depth)]
    x = run_blocks(params["blocks"], cfgs, body, x)
    x = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"],
                   eps=cfg.eps, mx_specs=None)
    return linear(x[:, 0], params["head"]["weight"],
                  params["head"].get("bias"))


DEIT3_CONFIGS = {
    "deit3_small_patch16_224": Deit3Config(embed_dim=384, depth=12,
                                           num_heads=6),
    "deit3_medium_patch16_224": Deit3Config(embed_dim=512, depth=12,
                                            num_heads=8),
    "deit3_base_patch16_224": Deit3Config(embed_dim=768, depth=12,
                                          num_heads=12),
    "deit3_large_patch16_224": Deit3Config(embed_dim=1024, depth=24,
                                           num_heads=16),
}


# ----------------------------------------------------------------------
# ResMLP (resmlp_models.py): affine norms + cross-patch linear + layerscale
# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ResMlpConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 384
    depth: int = 12
    init_scale: float = 1e-4

    @property
    def num_patches(self):
        return (self.img_size // self.patch_size) ** 2


def init_resmlp(key: jax.Array, cfg: ResMlpConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 3)
    d, n = cfg.embed_dim, cfg.num_patches
    p: Params = {
        "patch_embed": conv_init(keys[0], cfg.in_chans, d, cfg.patch_size,
                                 cfg.patch_size),
        "head": linear_init(keys[1], d, cfg.num_classes),
        "norm": {"alpha": jnp.ones((d,)), "beta": jnp.zeros((d,))},
    }
    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(keys[2 + i], 3)
        blocks.append({
            "affine1": {"alpha": jnp.ones((d,)), "beta": jnp.zeros((d,))},
            "cross_patch": linear_init(bk[0], n, n),
            "gamma_1": jnp.full((d,), cfg.init_scale),
            "affine2": {"alpha": jnp.ones((d,)), "beta": jnp.zeros((d,))},
            "mlp": {"fc1": linear_init(bk[1], d, 4 * d),
                    "fc2": linear_init(bk[2], 4 * d, d)},
            "gamma_2": jnp.full((d,), cfg.init_scale),
        })
    p["blocks"] = stack_blocks(blocks)
    return p


def resmlp_forward(params: Params, x: jax.Array, cfg: ResMlpConfig,
                   mx_specs: Optional[MxSpecs] = None) -> jax.Array:
    B = x.shape[0]
    pe = params["patch_embed"]
    x = conv2d(x, pe["weight"], pe.get("bias"), stride=cfg.patch_size,
               mx_specs=mx_specs)
    x = x.reshape(B, cfg.embed_dim, -1).transpose(0, 2, 1)  # (B, N, D)

    def affine(a, x):
        return a["alpha"] * x + a["beta"]

    def body(bp, _, x):
        h = affine(bp["affine1"], x)
        h = jnp.swapaxes(
            linear(jnp.swapaxes(h, 1, 2), bp["cross_patch"]["weight"],
                   bp["cross_patch"].get("bias"), mx_specs=mx_specs), 1, 2)
        x = x + bp["gamma_1"] * h
        h = affine(bp["affine2"], x)
        h = linear(h, bp["mlp"]["fc1"]["weight"], bp["mlp"]["fc1"].get("bias"),
                   mx_specs=mx_specs)
        h = jax.nn.gelu(h, approximate=False)
        h = linear(h, bp["mlp"]["fc2"]["weight"], bp["mlp"]["fc2"].get("bias"),
                   mx_specs=mx_specs)
        return x + bp["gamma_2"] * h

    x = run_blocks(params["blocks"], [0] * cfg.depth, body, x)
    x = affine(params["norm"], x).mean(axis=1)
    return linear(x, params["head"]["weight"], params["head"].get("bias"))


# ----------------------------------------------------------------------
# CaiT (cait_models.py): talking-heads SA blocks + class-attention blocks
# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class CaitConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 192
    depth: int = 24
    depth_token_only: int = 2
    num_heads: int = 4
    mlp_ratio: float = 4.0
    init_scale: float = 1e-5
    eps: float = 1e-6

    @property
    def num_patches(self):
        return (self.img_size // self.patch_size) ** 2

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads


def init_cait(key: jax.Array, cfg: CaitConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + cfg.depth_token_only + 5)
    d = cfg.embed_dim
    hidden = int(d * cfg.mlp_ratio)
    p: Params = {
        "patch_embed": conv_init(keys[0], cfg.in_chans, d, cfg.patch_size,
                                 cfg.patch_size),
        "cls_token": trunc_normal(keys[1], (1, 1, d)),
        "pos_embed": trunc_normal(keys[2], (1, cfg.num_patches, d)),
        "norm": ln_init(d),
        "head": linear_init(keys[3], d, cfg.num_classes),
    }
    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(keys[4 + i], 6)
        blocks.append({
            "norm1": ln_init(d),
            "attn": {"qkv": linear_init(bk[0], d, 3 * d),
                     "proj": linear_init(bk[1], d, d),
                     "proj_l": linear_init(bk[2], cfg.num_heads,
                                           cfg.num_heads),
                     "proj_w": linear_init(bk[3], cfg.num_heads,
                                           cfg.num_heads)},
            "gamma_1": jnp.full((d,), cfg.init_scale),
            "norm2": ln_init(d),
            "mlp": {"fc1": linear_init(bk[4], d, hidden),
                    "fc2": linear_init(bk[5], hidden, d)},
            "gamma_2": jnp.full((d,), cfg.init_scale),
        })
    p["blocks"] = stack_blocks(blocks)
    ca_blocks = []
    for i in range(cfg.depth_token_only):
        bk = jax.random.split(keys[4 + cfg.depth + i], 6)
        ca_blocks.append({
            "norm1": ln_init(d),
            "attn": {"q": linear_init(bk[0], d, d),
                     "k": linear_init(bk[1], d, d),
                     "v": linear_init(bk[2], d, d),
                     "proj": linear_init(bk[3], d, d)},
            "gamma_1": jnp.full((d,), cfg.init_scale),
            "norm2": ln_init(d),
            "mlp": {"fc1": linear_init(bk[4], d, hidden),
                    "fc2": linear_init(bk[5], hidden, d)},
            "gamma_2": jnp.full((d,), cfg.init_scale),
        })
    p["blocks_token_only"] = stack_blocks(ca_blocks)
    return p


def _talking_heads_attention(p, x, cfg: CaitConfig, specs):
    """CaiT Attention_talking_head (cait_models.py): head-mixing projections
    around the softmax."""
    B, N, C = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    qkv = linear(x, p["qkv"]["weight"], p["qkv"].get("bias"), mx_specs=specs)
    qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * (D ** -0.5), qkv[1], qkv[2]
    from ..ops import matmul as mx_matmul_op
    s = mx_matmul_op(q, jnp.swapaxes(k, -1, -2), mx_specs=specs,
                     mode_config="aa")
    # proj_l: mix heads pre-softmax (B, H, N, N) -> einsum over H
    s = jnp.einsum("bhnm,gh->bgnm", s, p["proj_l"]["weight"]) + \
        p["proj_l"]["bias"][None, :, None, None]
    s = jax.nn.softmax(s, axis=-1)
    s = jnp.einsum("bhnm,gh->bgnm", s, p["proj_w"]["weight"]) + \
        p["proj_w"]["bias"][None, :, None, None]
    out = mx_matmul_op(s, v, mx_specs=specs, mode_config="aa")
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    return linear(out, p["proj"]["weight"], p["proj"].get("bias"),
                  mx_specs=specs)


def _class_attention(p, x, cls, cfg: CaitConfig, specs):
    """CaiT Class_Attention: query = cls token only."""
    B, N, C = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    u = jnp.concatenate([cls, x], axis=1)
    q = linear(cls, p["q"]["weight"], p["q"].get("bias"), mx_specs=specs)
    k = linear(u, p["k"]["weight"], p["k"].get("bias"), mx_specs=specs)
    v = linear(u, p["v"]["weight"], p["v"].get("bias"), mx_specs=specs)
    q = q.reshape(B, 1, H, D).transpose(0, 2, 1, 3) * (D ** -0.5)
    k = k.reshape(B, N + 1, H, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, N + 1, H, D).transpose(0, 2, 1, 3)
    s = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", s, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)
    return linear(out, p["proj"]["weight"], p["proj"].get("bias"),
                  mx_specs=specs)


def cait_forward(params: Params, x: jax.Array, cfg: CaitConfig,
                 mx_specs: Optional[MxSpecs] = None) -> jax.Array:
    B = x.shape[0]
    pe = params["patch_embed"]
    x = conv2d(x, pe["weight"], pe.get("bias"), stride=cfg.patch_size,
               mx_specs=mx_specs)
    x = x.reshape(B, cfg.embed_dim, -1).transpose(0, 2, 1)
    x = x + params["pos_embed"]

    def body(bp, _, x):
        h = layer_norm(x, bp["norm1"]["weight"], bp["norm1"]["bias"],
                       eps=cfg.eps)
        x = x + bp["gamma_1"] * _talking_heads_attention(bp["attn"], h, cfg,
                                                         mx_specs)
        h = layer_norm(x, bp["norm2"]["weight"], bp["norm2"]["bias"],
                       eps=cfg.eps)
        h = linear(h, bp["mlp"]["fc1"]["weight"], bp["mlp"]["fc1"].get("bias"),
                   mx_specs=mx_specs)
        h = jax.nn.gelu(h, approximate=False)
        h = linear(h, bp["mlp"]["fc2"]["weight"], bp["mlp"]["fc2"].get("bias"),
                   mx_specs=mx_specs)
        return x + bp["gamma_2"] * h

    x = run_blocks(params["blocks"], [0] * cfg.depth, body, x)

    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim))
    for i in range(cfg.depth_token_only):
        bp = jax.tree.map(lambda a: a[i], params["blocks_token_only"])
        h = layer_norm(jnp.concatenate([cls, x], 1), bp["norm1"]["weight"],
                       bp["norm1"]["bias"], eps=cfg.eps)
        ca = _class_attention(bp["attn"], h[:, 1:], h[:, :1], cfg, mx_specs)
        cls = cls + bp["gamma_1"] * ca
        h = layer_norm(cls, bp["norm2"]["weight"], bp["norm2"]["bias"],
                       eps=cfg.eps)
        h = linear(h, bp["mlp"]["fc1"]["weight"], bp["mlp"]["fc1"].get("bias"),
                   mx_specs=mx_specs)
        h = jax.nn.gelu(h, approximate=False)
        h = linear(h, bp["mlp"]["fc2"]["weight"], bp["mlp"]["fc2"].get("bias"),
                   mx_specs=mx_specs)
        cls = cls + bp["gamma_2"] * h

    cls = layer_norm(cls, params["norm"]["weight"], params["norm"]["bias"],
                     eps=cfg.eps)
    return linear(cls[:, 0], params["head"]["weight"],
                  params["head"].get("bias"))


CAIT_CONFIGS = {
    "cait_XXS24_224": CaitConfig(embed_dim=192, depth=24, num_heads=4),
    "cait_XS24_224": CaitConfig(embed_dim=288, depth=24, num_heads=6),
    "cait_S24_224": CaitConfig(embed_dim=384, depth=24, num_heads=8),
}

RESMLP_CONFIGS = {
    "resmlp_12": ResMlpConfig(embed_dim=384, depth=12),
    "resmlp_24": ResMlpConfig(embed_dim=384, depth=24, init_scale=1e-5),
    "resmlp_36": ResMlpConfig(embed_dim=384, depth=36, init_scale=1e-6),
}


# ----------------------------------------------------------------------
# PatchConvNet (patchconvnet_models.py): conv-stem trunk of residual
# column blocks + attention-pooling classifier
# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class PatchConvNetConfig:
    img_size: int = 224
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 384
    depth: int = 12
    init_scale: float = 1e-6
    eps: float = 1e-6


def init_patchconvnet(key: jax.Array, cfg: PatchConvNetConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 8)
    d = cfg.embed_dim
    # conv stem: 4 stride-2 3x3 convs (stem downsamples 16x)
    stem_ch = [d // 8, d // 4, d // 2, d]
    stem = []
    cin = cfg.in_chans
    for i, cout in enumerate(stem_ch):
        stem.append(conv_init(jax.random.split(keys[0], 4)[i], cin, cout,
                              3, 3))
        cin = cout
    p: Params = {"stem": stem,
                 "cls_token": trunc_normal(keys[1], (1, 1, d))}
    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(keys[2 + i], 3)
        blocks.append({
            "norm1": ln_init(d),
            # column block: 1x1 conv -> 3x3 depthwise -> squeeze-excite-free
            # 1x1 conv (kept as linear pair + depthwise here)
            "conv1": linear_init(bk[0], d, d),
            "dw": conv_init(bk[1], 1, d, 3, 3),  # depthwise (groups=d)
            "conv2": linear_init(bk[2], d, d),
            "gamma": jnp.full((d,), cfg.init_scale),
        })
    p["blocks"] = stack_blocks(blocks)
    ak = jax.random.split(keys[-1], 4)
    p["attn_pool"] = {"q": linear_init(ak[0], d, d),
                      "k": linear_init(ak[1], d, d),
                      "v": linear_init(ak[2], d, d),
                      "proj": linear_init(ak[3], d, d)}
    p["norm_pool"] = ln_init(d)
    p["gamma_pool"] = jnp.full((d,), cfg.init_scale)
    p["norm"] = ln_init(d)
    p["head"] = linear_init(keys[-2], d, cfg.num_classes)
    return p


def patchconvnet_forward(params: Params, x: jax.Array,
                         cfg: PatchConvNetConfig,
                         mx_specs: Optional[MxSpecs] = None) -> jax.Array:
    B = x.shape[0]
    d = cfg.embed_dim
    h = x
    for sp in params["stem"]:
        h = conv2d(h, sp["weight"], sp.get("bias"), stride=2, padding=1,
                   mx_specs=mx_specs)
        h = jax.nn.gelu(h, approximate=False)
    N = h.shape[2] * h.shape[3]
    side = h.shape[2]
    tokens = h.reshape(B, d, N).transpose(0, 2, 1)  # (B, N, d)

    def body(bp, _, t):
        hh = layer_norm(t, bp["norm1"]["weight"], bp["norm1"]["bias"],
                        eps=cfg.eps)
        hh = linear(hh, bp["conv1"]["weight"], bp["conv1"].get("bias"),
                    mx_specs=mx_specs)
        hh = jax.nn.gelu(hh, approximate=False)
        # depthwise 3x3 on the spatial grid
        grid = hh.transpose(0, 2, 1).reshape(B, d, side, side)
        grid = conv2d(grid, bp["dw"]["weight"], bp["dw"].get("bias"),
                      padding=1, groups=d, mx_specs=None)
        hh = grid.reshape(B, d, N).transpose(0, 2, 1)
        hh = jax.nn.gelu(hh, approximate=False)
        hh = linear(hh, bp["conv2"]["weight"], bp["conv2"].get("bias"),
                    mx_specs=mx_specs)
        return t + bp["gamma"] * hh

    tokens = run_blocks(params["blocks"], [0] * cfg.depth, body, tokens)

    # attention pooling with a class token (single head)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, d))
    u = jnp.concatenate([cls, tokens], axis=1)
    u = layer_norm(u, params["norm_pool"]["weight"],
                   params["norm_pool"]["bias"], eps=cfg.eps)
    ap = params["attn_pool"]
    q = linear(u[:, :1], ap["q"]["weight"], ap["q"].get("bias"),
               mx_specs=mx_specs)
    kk = linear(u, ap["k"]["weight"], ap["k"].get("bias"), mx_specs=mx_specs)
    vv = linear(u, ap["v"]["weight"], ap["v"].get("bias"), mx_specs=mx_specs)
    attn = jax.nn.softmax(q @ jnp.swapaxes(kk, -1, -2) * d ** -0.5, axis=-1)
    pooled = attn @ vv
    pooled = linear(pooled, ap["proj"]["weight"], ap["proj"].get("bias"),
                    mx_specs=mx_specs)
    cls = cls + params["gamma_pool"] * pooled
    cls = layer_norm(cls, params["norm"]["weight"], params["norm"]["bias"],
                     eps=cfg.eps)
    return linear(cls[:, 0], params["head"]["weight"],
                  params["head"].get("bias"))
