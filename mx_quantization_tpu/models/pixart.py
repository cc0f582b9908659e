"""PixArt-alpha transformer with MX quantization + top-k self/cross attention.

TPU-native re-implementation of the reference's MXPixArtTransformer2DModel
(workloads/PixArt/models/MX_pixart_transformer_2d.py:87-460 and
MX_transformer_block.py:109-859):

  * ada_norm_single conditioning: one AdaLayerNormSingle produces a 6-way
    modulation shared by all blocks; each block adds its own learned
    scale_shift_table (MX_transformer_block.py:333-335, :391-398).
  * per-block: self-attention (attn1) with top-k pruning (self_k), cross
    attention (attn2) over T5 text states with the encoder attention mask
    added as a bias to BOTH true and predicted scores
    (MX_transformer_block.py:794-827), feed-forward with GELU(tanh)
    ("gelu-approximate", the PixArt-alpha config).
  * caption projection: linear/GELU(tanh)/linear from T5 4096 -> inner dim.
  * quantization plan via set_config semantics: exclude_blocks fall back to
    ``exclude_blocks_type`` predictor; exclude_timesteps disables pruning at
    those sampling steps (MX_pixart_transformer_2d.py:197-218).

Blocks are stored stacked and scanned (models/stacked.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..attention import TopKAttentionConfig, topk_attention
from ..ops import conv2d, linear
from ..ops.fastquant import fused_eligible, gelu_quantize_serving
from ..specs import MxSpecs
from .common import Params, linear_init, patch_embed, zeros_linear
from .dit import get_2d_sincos_pos_embed, timestep_embedding
from .stacked import run_blocks, stack_blocks


@dataclasses.dataclass(frozen=True)
class PixArtConfig:
    num_attention_heads: int = 16
    attention_head_dim: int = 72
    in_channels: int = 4
    out_channels: int = 8
    num_layers: int = 28
    cross_attention_dim: int = 1152
    sample_size: int = 32          # 256px alpha model (latent 32x32)
    patch_size: int = 2
    caption_channels: int = 4096   # T5-XXL
    norm_eps: float = 1e-6
    # None -> diffusers default (sample_size==128, i.e. the alpha 1024px
    # model); PixArt-Sigma checkpoints were trained WITHOUT micro-conds at
    # every resolution, so the Sigma driver sets False explicitly
    # (MX_pixart_transformer_2d.py:107,134-139).
    micro_conds: Optional[bool] = None

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim

    @property
    def num_patches(self):
        return (self.sample_size // self.patch_size) ** 2

    @property
    def use_additional_conditions(self):
        if self.micro_conds is not None:
            return self.micro_conds
        return self.sample_size == 128


@dataclasses.dataclass(frozen=True)
class PixArtQuantConfig:
    """set_config semantics (MX_pixart_transformer_2d.py:197-218)."""
    mx_specs: Optional[MxSpecs] = None
    mx_quant: bool = False
    self_top_k: bool = False
    self_k: int = 20
    cross_top_k: bool = False
    cross_k: int = 20
    ex_pred: bool = False
    pred_mode: str = "ex_pred"
    exclude_blocks: Tuple[int, ...] = ()
    exclude_blocks_type: str = "ex_pred"
    exclude_timesteps: Tuple[int, ...] = ()
    sparse_impl: str = "dense"
    # serving knobs (same semantics as DiTQuantConfig): bf16 residual
    # stream + bf16-precision top-k ranking on the fused engine
    topk_key_bits: int = 32
    activation_dtype: str = "float32"
    contract: str = "exact"  # "serving" = relaxed fused-kernel tier
    # opt-in GELU->fc2-quantize fusion — measured end-to-end negative at
    # the DiT point (see DiTQuantConfig.fuse_gelu), default off
    fuse_gelu: bool = False

    def _pred_mode(self, idx):
        return (self.exclude_blocks_type if idx in self.exclude_blocks
                else self.pred_mode)

    def _serving_kw(self):
        return dict(key_bits=self.topk_key_bits,
                    contract=self.contract,
                    out_dtype=("bfloat16"
                               if self.activation_dtype == "bfloat16"
                               else "float32"))

    def self_attn_cfg(self, idx, timestep_idx):
        """Self-attn: excluded block -> top_k off; excluded timestep ->
        dense attention (MXSelfAttention.forward gate,
        MX_transformer_block.py:656)."""
        if not self.mx_quant or self.mx_specs is None:
            return TopKAttentionConfig(mx_quant=False)
        top_k = self.self_top_k and idx not in self.exclude_blocks
        if timestep_idx is not None and timestep_idx in self.exclude_timesteps:
            top_k = False
        return TopKAttentionConfig(
            mx_quant=True, top_k=top_k, k=self.self_k,
            approx_flag=self.ex_pred, pred_mode=self._pred_mode(idx),
            sparse_impl=self.sparse_impl, **self._serving_kw())

    def cross_attn_cfg(self, idx, timestep_idx):
        """Cross-attn: excluded timestep keeps top-k but switches the
        predictor off — true-score top-k (MXCrossAttention.forward gate,
        MX_transformer_block.py:806-835)."""
        if not self.mx_quant or self.mx_specs is None:
            return TopKAttentionConfig(mx_quant=False)
        approx = self.ex_pred and not (
            timestep_idx is not None and
            timestep_idx in self.exclude_timesteps)
        return TopKAttentionConfig(
            mx_quant=True, top_k=self.cross_top_k, k=self.cross_k,
            approx_flag=approx, pred_mode=self._pred_mode(idx),
            sparse_impl=self.sparse_impl, **self._serving_kw())


# ----------------------------------------------------------------------
def init_pixart(key: jax.Array, cfg: PixArtConfig) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 10)
    d = cfg.inner_dim

    def lin(k, i, o):
        return linear_init(k, i, o)

    p: Params = {}
    pk = jax.random.split(keys[0], 4)
    p["pos_embed"] = {
        "proj": {"weight": 0.02 * jax.random.normal(
            pk[0], (d, cfg.in_channels, cfg.patch_size, cfg.patch_size)),
            "bias": jnp.zeros((d,))},
        "pe": jnp.asarray(get_2d_sincos_pos_embed(
            d, cfg.sample_size // cfg.patch_size))[None],
    }
    tk = jax.random.split(keys[1], 3)
    p["adaln_single"] = {
        "emb_mlp0": lin(tk[0], 256, d),
        "emb_mlp2": lin(tk[1], d, d),
        "linear": lin(tk[2], d, 6 * d),
    }
    if cfg.use_additional_conditions:
        # alpha-1024 micro-conditioning: resolution (H,W) + aspect-ratio
        # sinusoidal embeddings, each through its own 2-layer MLP to d//3
        # channels, concatenated (2*d/3 + d/3 = d) and ADDED to the timestep
        # embedding (diffusers PixArtAlphaCombinedTimestepSizeEmbeddings,
        # wired by the reference at MX_pixart_transformer_2d.py:186-189)
        rk = jax.random.split(keys[-3], 4)
        sd = d // 3
        p["adaln_single"]["res_mlp0"] = lin(rk[0], 256, sd)
        p["adaln_single"]["res_mlp2"] = lin(rk[1], sd, sd)
        p["adaln_single"]["ar_mlp0"] = lin(rk[2], 256, sd)
        p["adaln_single"]["ar_mlp2"] = lin(rk[3], sd, sd)
    ck = jax.random.split(keys[2], 2)
    p["caption_projection"] = {
        "linear_1": lin(ck[0], cfg.caption_channels, d),
        "linear_2": lin(ck[1], d, d),
    }
    blocks = []
    for i in range(cfg.num_layers):
        bk = jax.random.split(keys[3 + i], 10)
        blocks.append({
            "scale_shift_table": jax.random.normal(bk[0], (6, d)) / d ** 0.5,
            "attn1": {"to_q": lin(bk[1], d, d), "to_k": lin(bk[2], d, d),
                      "to_v": lin(bk[3], d, d), "to_out": lin(bk[4], d, d)},
            "attn2": {"to_q": lin(bk[5], d, d), "to_k": lin(bk[6], d, d),
                      "to_v": lin(bk[7], d, d), "to_out": lin(bk[8], d, d)},
            "ff": {"fc1": lin(jax.random.split(bk[9])[0], d, 4 * d),
                   "fc2": lin(jax.random.split(bk[9])[1], 4 * d, d)},
        })
    p["blocks"] = stack_blocks(blocks)
    p["scale_shift_table"] = jax.random.normal(keys[-2], (2, d)) / d ** 0.5
    p["proj_out"] = lin(keys[-1], d, cfg.patch_size ** 2 * cfg.out_channels)
    return p


# ----------------------------------------------------------------------
def _ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)  # norm statistics stay fp32 in bf16 serving
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _mha(p, x, kv, cfg: PixArtConfig, specs, attn_cfg, bias=None,
         orthogonal_matrix=None):
    """Shared self/cross attention (MX_transformer_block.py:624-719, 765-859)."""
    B, N, C = x.shape
    H = cfg.num_attention_heads
    D = C // H
    S = kv.shape[1]
    mxs = specs if attn_cfg.mx_quant else None
    q = linear(x, p["to_q"]["weight"], p["to_q"].get("bias"), mx_specs=mxs)
    k = linear(kv, p["to_k"]["weight"], p["to_k"].get("bias"), mx_specs=mxs)
    v = linear(kv, p["to_v"]["weight"], p["to_v"].get("bias"), mx_specs=mxs)
    if attn_cfg.out_dtype == "bfloat16":
        # bf16 serving: halve the relayout copies and kernel reads
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    q = q.reshape(B, N, H, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    out, _ = topk_attention(q, k, v, D ** -0.5, mxs, attn_cfg, bias=bias,
                            orthogonal_matrix=orthogonal_matrix)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    return linear(out, p["to_out"]["weight"], p["to_out"].get("bias"),
                  mx_specs=mxs)


def pixart_block_apply(bp: Params, x: jax.Array, ctx: jax.Array,
                       t6: jax.Array, cfg: PixArtConfig, specs,
                       self_cfg, cross_cfg, bias=None,
                       orthogonal_matrix=None,
                       act_dtype=jnp.float32,
                       fuse_gelu: bool = False) -> jax.Array:
    """One MXBasicTransformerBlock (MX_transformer_block.py:364-485,
    ada_norm_single): adaLN-single modulation + MX self-attn + cross-attn
    (bias added to both true and predicted scores inside topk_attention)
    + MX'd GELU-tanh feed-forward.  Exposed separately so the per-block
    torch goldens (tests/test_pixart_model_golden.py) can drive a single
    block with reference-computed inputs."""
    B = x.shape[0]
    d = cfg.inner_dim
    mxs = specs if self_cfg.mx_quant else None
    mods = (bp["scale_shift_table"][None] +
            t6.reshape(B, 6, d)).astype(act_dtype)
    (shift_msa, scale_msa, gate_msa,
     shift_mlp, scale_mlp, gate_mlp) = [mods[:, i][:, None]
                                        for i in range(6)]
    h = _ln(x, cfg.norm_eps) * (1 + scale_msa) + shift_msa
    x = x + gate_msa * _mha(bp["attn1"], h, h, cfg, specs, self_cfg,
                            orthogonal_matrix=orthogonal_matrix
                            ).astype(act_dtype)
    # PixArt: no norm before cross-attn (MX_transformer_block.py:437-440)
    x = x + _mha(bp["attn2"], x, ctx, cfg, specs, cross_cfg,
                 bias=bias).astype(act_dtype)
    h = _ln(x, cfg.norm_eps) * (1 + scale_mlp) + shift_mlp
    h = linear(h, bp["ff"]["fc1"]["weight"], bp["ff"]["fc1"]["bias"],
               mx_specs=mxs).astype(act_dtype)
    # serving-tier opt-in: GELU fuses into the fc2-input quantize kernel
    # (same producer fusion as models/dit.py — and the same measured
    # end-to-end negative, so default OFF; see DiTQuantConfig.fuse_gelu)
    hq = None
    if (fuse_gelu and mxs is not None and self_cfg.contract == "serving"
            and not mxs.quantize_backprop
            and fused_eligible(mxs, mxs.a_elem_format, mxs.w_elem_format)):
        hq = gelu_quantize_serving(h, mxs, approximate=True)
    if hq is not None:
        h = linear(hq.astype(act_dtype), bp["ff"]["fc2"]["weight"],
                   bp["ff"]["fc2"]["bias"],
                   mx_specs=mxs.replace(prequantized_activations=True)
                   ).astype(act_dtype)
    else:
        h = jax.nn.gelu(h, approximate=True)  # "gelu-approximate"
        h = linear(h, bp["ff"]["fc2"]["weight"], bp["ff"]["fc2"]["bias"],
                   mx_specs=mxs).astype(act_dtype)
    return x + gate_mlp * h


def pixart_forward(params: Params, hidden_states: jax.Array,
                   encoder_hidden_states: jax.Array, timestep: jax.Array,
                   cfg: PixArtConfig, qcfg: PixArtQuantConfig,
                   encoder_attention_mask: Optional[jax.Array] = None,
                   timestep_idx: Optional[int] = None,
                   orthogonal_matrix=None,
                   resolution: Optional[jax.Array] = None,
                   aspect_ratio: Optional[jax.Array] = None) -> jax.Array:
    """(B, C, H, W) latents + (B, S, 4096) T5 states + (B,) timesteps
    -> (B, out_channels, H, W)."""
    B = hidden_states.shape[0]
    d = cfg.inner_dim
    specs = qcfg.mx_specs if qcfg.mx_quant else None

    # encoder mask (B, S) -> additive bias (B, 1, 1, S)
    if encoder_attention_mask is not None and encoder_attention_mask.ndim == 2:
        bias = ((1 - encoder_attention_mask.astype(jnp.float32)) *
                -10000.0)[:, None, None, :]
    else:
        bias = encoder_attention_mask

    pe = params["pos_embed"]
    x = patch_embed(hidden_states, pe["proj"]["weight"],
                    pe["proj"].get("bias"), cfg.patch_size)
    x = x + pe["pe"]

    # AdaLayerNormSingle: sinusoidal t -> mlp -> 6-way modulation
    ada = params["adaln_single"]
    emb = timestep_embedding(timestep, 256)
    emb = linear(emb, ada["emb_mlp0"]["weight"], ada["emb_mlp0"]["bias"])
    emb = jax.nn.silu(emb)
    emb = linear(emb, ada["emb_mlp2"]["weight"], ada["emb_mlp2"]["bias"])
    if cfg.use_additional_conditions:
        if resolution is None:
            # pipeline default: the model's native pixel resolution, square
            px = float(cfg.sample_size * 8)
            resolution = jnp.full((B, 2), px, jnp.float32)
        if aspect_ratio is None:
            aspect_ratio = jnp.ones((B, 1), jnp.float32)

        def size_emb(v, m0, m2):
            # (B, n) scalars -> per-scalar sinusoidal-256 -> MLP -> (B, n*d/3)
            e = timestep_embedding(v.reshape(-1), 256)
            e = linear(e, ada[m0]["weight"], ada[m0]["bias"])
            e = linear(jax.nn.silu(e), ada[m2]["weight"], ada[m2]["bias"])
            return e.reshape(v.shape[0], -1)

        emb = emb + jnp.concatenate(
            [size_emb(resolution, "res_mlp0", "res_mlp2"),
             size_emb(aspect_ratio, "ar_mlp0", "ar_mlp2")], axis=-1)
    t6 = linear(jax.nn.silu(emb), ada["linear"]["weight"],
                ada["linear"]["bias"])  # (B, 6d)

    cp = params["caption_projection"]
    ctx = linear(encoder_hidden_states, cp["linear_1"]["weight"],
                 cp["linear_1"]["bias"])
    ctx = jax.nn.gelu(ctx, approximate=True)
    ctx = linear(ctx, cp["linear_2"]["weight"], cp["linear_2"]["bias"])

    act_dtype = jnp.bfloat16 if qcfg.activation_dtype == "bfloat16" \
        else jnp.float32
    x = x.astype(act_dtype)
    ctx = ctx.astype(act_dtype)

    def block_body(bp, cfgs, x):
        self_cfg, cross_cfg = cfgs
        return pixart_block_apply(bp, x, ctx, t6, cfg, specs, self_cfg,
                                  cross_cfg, bias=bias,
                                  orthogonal_matrix=orthogonal_matrix,
                                  act_dtype=act_dtype,
                                  fuse_gelu=qcfg.fuse_gelu)

    cfgs = [(qcfg.self_attn_cfg(i, timestep_idx),
             qcfg.cross_attn_cfg(i, timestep_idx))
            for i in range(cfg.num_layers)]
    x = run_blocks(params["blocks"], cfgs, block_body, x)

    shift, scale = jnp.split(
        params["scale_shift_table"][None] + emb[:, None], 2, axis=1)
    x = _ln(x, 1e-6) * (1 + scale) + shift
    x = linear(x, params["proj_out"]["weight"], params["proj_out"]["bias"])

    hw = cfg.sample_size // cfg.patch_size
    psz, c_out = cfg.patch_size, cfg.out_channels
    x = x.reshape(B, hw, hw, psz, psz, c_out)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(B, c_out, hw * psz, hw * psz)
