"""T5 v1.1 text encoder in JAX — the TPU-native replacement for the
reference's 8-bit bitsandbytes T5 (text_local_inference_alpha.py:70-103).

The reference encodes PixArt prompts with an int8-quantized T5-XXL on GPU
then frees it; here the encoder is a first-class JAX model so prompt
encoding runs on the TPU in the same process, optionally MX-quantized
(``mx_specs``: the linears run through ops.linear — MXINT8 being the
TPU-native analogue of the reference's bitsandbytes int8).

Architecture (google/t5-v1_1-*): RMSNorm (no bias, eps 1e-6), relative
position bias on layer 0 shared across layers (bidirectional buckets 32,
max distance 128), UNSCALED attention (no 1/sqrt(d)), gated-GELU FFN
(wi_0 * gelu, wi_1 linear, wo), tied input embedding, final RMSNorm.
Validated value-for-value against transformers' T5EncoderModel
(tests/test_t5.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linear


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096          # t5-v1_1-xxl
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


T5_CONFIGS = {
    "t5-v1_1-small": T5Config(d_model=512, d_kv=64, d_ff=1024,
                              num_layers=8, num_heads=6),
    "t5-v1_1-xxl": T5Config(),
}


def _rms_norm(x, w, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def relative_position_bucket(rel_pos, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucket (transformers T5Attention._relative_position_bucket)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _position_bias(p, cfg: T5Config, qlen: int, klen: int):
    ctx = jnp.arange(qlen)[:, None]
    mem = jnp.arange(klen)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    bias = p["rel_bias"][buckets]               # (q, k, H)
    return bias.transpose(2, 0, 1)[None]        # (1, H, q, k)


def t5_encode(params: Dict, input_ids: jax.Array,
              attention_mask: Optional[jax.Array], cfg: T5Config,
              mx_specs=None) -> jax.Array:
    """(B, L) token ids -> (B, L, d_model) final hidden states."""
    B, L = input_ids.shape
    x = params["embed"][input_ids]
    H, dk = cfg.num_heads, cfg.d_kv
    eps = cfg.layer_norm_epsilon

    bias = _position_bias(params, cfg, L, L)
    if attention_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        bias = bias + jnp.where(attention_mask[:, None, None, :] > 0,
                                0.0, neg)

    def lin(h, w):
        return linear(h, w, None, mx_specs=mx_specs)

    for blk in params["blocks"]:
        att = blk["attn"]
        h = _rms_norm(x, att["ln"], eps)
        q = lin(h, att["q"]).reshape(B, L, H, dk).transpose(0, 2, 1, 3)
        k = lin(h, att["k"]).reshape(B, L, H, dk).transpose(0, 2, 1, 3)
        v = lin(h, att["v"]).reshape(B, L, H, dk).transpose(0, 2, 1, 3)
        # T5 attention is UNSCALED (the 1/sqrt(d) is folded into init)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, H * dk)
        x = x + lin(o, att["o"])

        ff = blk["ff"]
        h = _rms_norm(x, ff["ln"], eps)
        g = jax.nn.gelu(lin(h, ff["wi_0"]), approximate=True)
        h = g * lin(h, ff["wi_1"])
        x = x + lin(h, ff["wo"])

    return _rms_norm(x, params["final_ln"], eps)


def init_t5_encoder(key: jax.Array, cfg: T5Config) -> Dict:
    ks = jax.random.split(key, cfg.num_layers + 3)
    d, ff, inner = cfg.d_model, cfg.d_ff, cfg.num_heads * cfg.d_kv

    def w(k, o, i, s=0.02):
        return s * jax.random.normal(k, (o, i), jnp.float32)

    blocks = []
    for li in range(cfg.num_layers):
        bk = jax.random.split(ks[li], 8)
        blocks.append({
            "attn": {"ln": jnp.ones((d,)), "q": w(bk[0], inner, d),
                     "k": w(bk[1], inner, d), "v": w(bk[2], inner, d),
                     "o": w(bk[3], d, inner)},
            "ff": {"ln": jnp.ones((d,)), "wi_0": w(bk[4], ff, d),
                   "wi_1": w(bk[5], ff, d), "wo": w(bk[6], d, ff)},
        })
    return {
        "embed": 0.02 * jax.random.normal(ks[-3], (cfg.vocab_size, d)),
        "rel_bias": 0.02 * jax.random.normal(
            ks[-2], (cfg.relative_attention_num_buckets, cfg.num_heads)),
        "blocks": blocks,
        "final_ln": jnp.ones((d,)),
    }


def load_t5_checkpoint(path_or_sd, cfg: T5Config) -> Dict:
    """Convert a transformers T5EncoderModel state dict (torch .bin/.pt
    path, safetensors path, or an in-memory dict)."""
    if isinstance(path_or_sd, (str,)):
        if path_or_sd.endswith(".safetensors"):
            from safetensors.numpy import load_file
            sd = load_file(path_or_sd)
        else:
            import torch
            sd = torch.load(path_or_sd, map_location="cpu",
                            weights_only=False)
    else:
        sd = path_or_sd

    def t2n(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    def pick(*names):
        for n in names:
            if n in sd:
                return t2n(n)
        raise KeyError(names)

    p: Dict = {
        "embed": pick("shared.weight", "encoder.embed_tokens.weight"),
        "rel_bias": pick(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"),
        "final_ln": pick("encoder.final_layer_norm.weight"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        p["blocks"].append({
            "attn": {
                "ln": t2n(f"{pre}.0.layer_norm.weight"),
                "q": t2n(f"{pre}.0.SelfAttention.q.weight"),
                "k": t2n(f"{pre}.0.SelfAttention.k.weight"),
                "v": t2n(f"{pre}.0.SelfAttention.v.weight"),
                "o": t2n(f"{pre}.0.SelfAttention.o.weight"),
            },
            "ff": {
                "ln": t2n(f"{pre}.1.layer_norm.weight"),
                "wi_0": t2n(f"{pre}.1.DenseReluDense.wi_0.weight"),
                "wi_1": t2n(f"{pre}.1.DenseReluDense.wi_1.weight"),
                "wo": t2n(f"{pre}.1.DenseReluDense.wo.weight"),
            },
        })
    return p
