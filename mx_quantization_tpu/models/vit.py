"""DeiT / Vision Transformer family with MX quantization + top-k attention.

TPU-native re-implementation of the reference's quantized DeiT workload
(workloads/deit/scripts/main.py:40-318 QuantizedAttention/Mlp/Block +
apply_quantization_to_deit, model defs workloads/deit/models.py):

  * explicit per-block quantization config instead of module surgery —
    ``VitQuantConfig`` reproduces the reference gating rules (block 11 never
    top-k, ``exclude_blocks`` fall back to ``exclude_block_type``).
  * attention/MLP/patch-embed run through the MX op library; norms and
    residuals stay fp32 exactly like the reference (QuantizedBlock keeps the
    original norm1/norm2).

Factories: deit_tiny/small/base_patch16_224 (the three evaluated variants,
run_deit.sh:14-52).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..attention import (TopKAttentionConfig, fused_qkv_eligible,
                         fused_qkv_topk_attention, topk_attention)
from ..ops import conv2d, gelu, layer_norm, linear
from ..ops.fastquant import fused_eligible, gelu_quantize_serving
from ..specs import MxSpecs
from .common import (Params, conv_init, linear_init, ln_init, trunc_normal)
from .stacked import run_blocks, stack_blocks


@dataclasses.dataclass(frozen=True)
class VitConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


@dataclasses.dataclass(frozen=True)
class VitQuantConfig:
    """Per-model quantization plan (reference apply_quantization_to_deit,
    main.py:231-318)."""
    mx_specs: Optional[MxSpecs] = None
    mx_quant: bool = False
    top_k: bool = True
    k: int = 20
    approx_flag: bool = True
    pred_mode: str = "ex_pred"
    exclude_blocks: Tuple[int, ...] = ()
    exclude_block_type: str = "ex_pred"
    last_block_no_topk: bool = True   # block depth-1 always dense
    sparse_impl: str = "dense"
    topk_key_bits: int = 32  # 16 = bf16-precision ranking (serving knob)
    contract: str = "exact"  # "serving" = relaxed fused-kernel tier
    # opt-in GELU->fc2-quantize fusion — measured end-to-end negative at
    # the DiT point (see DiTQuantConfig.fuse_gelu), default off
    fuse_gelu: bool = False

    def block_attn_cfg(self, idx: int, depth: int) -> TopKAttentionConfig:
        if not self.mx_quant or self.mx_specs is None:
            return TopKAttentionConfig(mx_quant=False)
        top_k = self.top_k
        pred_mode = self.pred_mode
        if self.last_block_no_topk and idx == depth - 1:
            top_k = False
            pred_mode = self.exclude_block_type
        elif idx in self.exclude_blocks:
            pred_mode = self.exclude_block_type
        return TopKAttentionConfig(
            mx_quant=True, top_k=top_k, k=self.k,
            approx_flag=self.approx_flag, pred_mode=pred_mode,
            sparse_impl=self.sparse_impl, key_bits=self.topk_key_bits,
            contract=self.contract)


# ----------------------------------------------------------------------
def init_vit(key: jax.Array, cfg: VitConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 8)
    p: Params = {}
    p["patch_embed"] = conv_init(keys[0], cfg.in_chans, cfg.embed_dim,
                                 cfg.patch_size, cfg.patch_size)
    p["cls_token"] = trunc_normal(keys[1], (1, 1, cfg.embed_dim))
    p["pos_embed"] = trunc_normal(keys[2], (1, cfg.num_patches + 1,
                                            cfg.embed_dim))
    hidden = int(cfg.embed_dim * cfg.mlp_ratio)
    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(keys[3 + i], 4)
        blocks.append({
            "norm1": ln_init(cfg.embed_dim),
            "attn": {
                "qkv": linear_init(bk[0], cfg.embed_dim, 3 * cfg.embed_dim,
                                   bias=cfg.qkv_bias),
                "proj": linear_init(bk[1], cfg.embed_dim, cfg.embed_dim),
            },
            "norm2": ln_init(cfg.embed_dim),
            "mlp": {
                "fc1": linear_init(bk[2], cfg.embed_dim, hidden),
                "fc2": linear_init(bk[3], hidden, cfg.embed_dim),
            },
        })
    # stacked leading-depth layout; homogeneous runs lax.scan (stacked.py)
    p["blocks"] = stack_blocks(blocks)
    p["norm"] = ln_init(cfg.embed_dim)
    p["head"] = linear_init(keys[-1], cfg.embed_dim, cfg.num_classes)
    return p


# ----------------------------------------------------------------------
def vit_attention(p: Params, x: jax.Array, cfg: VitConfig,
                  specs: Optional[MxSpecs], attn_cfg: TopKAttentionConfig,
                  orthogonal_matrix=None) -> jax.Array:
    """QuantizedAttention.forward (reference main.py:85-157)."""
    B, N, C = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    mxs = specs if attn_cfg.mx_quant else None
    qkv = linear(x, p["qkv"]["weight"], p["qkv"].get("bias"), mx_specs=mxs)
    scale = D ** -0.5
    if fused_qkv_eligible(mxs, attn_cfg, N):
        # qkv-direct kernel entry: no (3,B,H,N,D) relayouts either side
        out = fused_qkv_topk_attention(qkv, H, scale, mxs, attn_cfg)
    else:
        qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        out, _ = topk_attention(q, k, v, scale, mxs, attn_cfg,
                                orthogonal_matrix=orthogonal_matrix)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    out = linear(out, p["proj"]["weight"], p["proj"].get("bias"), mx_specs=mxs)
    return out


def vit_mlp(p: Params, x: jax.Array, specs: Optional[MxSpecs],
            contract: str = "exact", fuse_gelu: bool = False) -> jax.Array:
    x = linear(x, p["fc1"]["weight"], p["fc1"].get("bias"), mx_specs=specs)
    # serving-tier opt-in: erf-GELU fuses into the fc2-input quantize
    # kernel (same producer fusion as models/dit.py — and the same
    # measured end-to-end negative, so default OFF; see
    # DiTQuantConfig.fuse_gelu)
    if (fuse_gelu and specs is not None and contract == "serving"
            and not specs.quantize_backprop
            and fused_eligible(specs, specs.a_elem_format,
                               specs.w_elem_format)):
        xq = gelu_quantize_serving(x, specs, approximate=False)
        if xq is not None:
            return linear(xq, p["fc2"]["weight"], p["fc2"].get("bias"),
                          mx_specs=specs.replace(
                              prequantized_activations=True))
    x = jax.nn.gelu(x, approximate=False)  # reference keeps timm's GELU
    x = linear(x, p["fc2"]["weight"], p["fc2"].get("bias"), mx_specs=specs)
    return x


def vit_forward(params: Params, x: jax.Array, cfg: VitConfig,
                qcfg: VitQuantConfig, orthogonal_matrix=None) -> jax.Array:
    """Full DeiT forward: (B, 3, H, W) images -> (B, num_classes) logits."""
    B = x.shape[0]
    pe = params["patch_embed"]
    # The reference surgery only replaces blocks' attn/ffn
    # (apply_quantization_to_deit, main.py:231-318 touches model.blocks
    # exclusively) — patch embed, norms, and head stay fp32.
    x = conv2d(x, pe["weight"], pe.get("bias"), stride=cfg.patch_size,
               mx_specs=None)
    x = x.reshape(B, cfg.embed_dim, -1).transpose(0, 2, 1)  # (B, N, C)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"]

    def block_body(bp, attn_cfg, x):
        mxs = qcfg.mx_specs if attn_cfg.mx_quant else None
        h = layer_norm(x, bp["norm1"]["weight"], bp["norm1"]["bias"],
                       eps=cfg.eps, mx_specs=None)
        x = x + vit_attention(bp["attn"], h, cfg, qcfg.mx_specs, attn_cfg,
                              orthogonal_matrix)
        h = layer_norm(x, bp["norm2"]["weight"], bp["norm2"]["bias"],
                       eps=cfg.eps, mx_specs=None)
        return x + vit_mlp(bp["mlp"], h, mxs, contract=attn_cfg.contract,
                           fuse_gelu=qcfg.fuse_gelu)

    attn_cfgs = [qcfg.block_attn_cfg(i, cfg.depth) for i in range(cfg.depth)]
    x = run_blocks(params["blocks"], attn_cfgs, block_body, x)

    x = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"],
                   eps=cfg.eps, mx_specs=None)
    cls_out = x[:, 0]
    return linear(cls_out, params["head"]["weight"],
                  params["head"].get("bias"), mx_specs=None)


# ----------------------------------------------------------------------
VIT_CONFIGS = {
    "deit_tiny_patch16_224": VitConfig(embed_dim=192, depth=12, num_heads=3),
    "deit_small_patch16_224": VitConfig(embed_dim=384, depth=12, num_heads=6),
    "deit_base_patch16_224": VitConfig(embed_dim=768, depth=12, num_heads=12),
}


def create_vit(name: str) -> VitConfig:
    return VIT_CONFIGS[name]
