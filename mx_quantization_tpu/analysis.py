"""Top-k pruning quality analysis tools.

First-class re-implementation of the reference's --anal instrumentation
(/root/reference/funcs/analysis.py:36-191): softmax-mass recall of the
predicted top-k against the true top-k, and unique-coverage statistics.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def total_chosen_k(idx: jax.Array) -> jax.Array:
    """Average number of DISTINCT keys chosen per (batch, head) across all
    query rows (reference total_chosen_k, funcs/analysis.py:56-110).

    idx: (..., N, k) selected indices.  Returns scalar mean unique count.
    """
    *lead, N, K = idx.shape
    flat = idx.reshape((-1, N * K))

    def count_unique(row):
        s = jnp.sort(row)
        return 1 + jnp.sum(s[1:] != s[:-1])

    counts = jax.vmap(count_unique)(flat)
    return jnp.mean(counts.astype(jnp.float32))


def diff_idx_analysis(true_vals: jax.Array, pred_vals: jax.Array) -> jax.Array:
    """Softmax-mass recall: sum of softmax probability captured by the
    predicted indices relative to the true top-k mass (reference
    diff_idx_analysis, funcs/analysis.py:136-157).

    true_vals: softmax probs gathered at the TRUE top-k indices.
    pred_vals: softmax probs gathered at the PREDICTED top-k indices.
    Returns mean over rows of (pred mass / true mass).
    """
    t = jnp.sum(true_vals, axis=-1)
    p = jnp.sum(pred_vals, axis=-1)
    return jnp.mean(p / jnp.maximum(t, 1e-12))


def attention_prediction_quality(true_scores: jax.Array, idx: jax.Array,
                                 k: int) -> Dict[str, float]:
    """One-shot quality report for a predicted index set."""
    post = jax.nn.softmax(true_scores, axis=-1)
    pred_mass = jnp.take_along_axis(post, idx, axis=-1)
    true_top, _ = jax.lax.top_k(post, k)
    return {
        "softmax_recall": float(diff_idx_analysis(true_top, pred_mass)),
        "avg_chosen_k": float(total_chosen_k(idx)),
    }


def init_analysis_files(attn_type: str, anal_dir: str, k: int,
                        approx_flag: bool, pred_mode: str,
                        total_timestep: int) -> Dict[int, Dict[str, str]]:
    """Per-timestep analysis file map (reference init_analysis_files,
    funcs/analysis.py:36-54): {timestep: {idx, vals, diff_idx}} paths under
    <anal_dir>/<attn_type>/<pred_mode|true>/, with the diff_idx files
    created empty like the reference does."""
    sub = pred_mode if approx_flag else "true"
    base = os.path.join(anal_dir, attn_type, sub)
    os.makedirs(base, exist_ok=True)
    files: Dict[int, Dict[str, str]] = {}
    for t in range(total_timestep):
        files[t] = {
            "idx": os.path.join(base, f"top{k}_idx_t{t}.txt"),
            "vals": os.path.join(base, f"top{k}_vals_t{t}.txt"),
            "diff_idx": os.path.join(base, f"top{k}_diff_idx_t{t}.txt"),
        }
        open(files[t]["diff_idx"], "w").close()
    return files


class AnalysisWriter:
    """Per-block/timestep JSONL writer (replaces the reference's per-file
    text dumps, funcs/analysis.py:36-54)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def write(self, record: dict, name: str = "topk_analysis"):
        path = os.path.join(self.out_dir, f"{name}.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")


def mismatch_analysis(true_idx_file: str, pred_idx_file: str,
                      out_file: str = "mismatch_idx.jsonl") -> str:
    """Offline differ of two top-k index dumps: for each record, list the
    true-top-k indices the predictor missed (reference
    funcs/analysis.py:159-191, which diffs per-token text dumps; here the
    dumps are the AnalysisWriter JSONL records with an "idx" list keyed by
    (block, head, token)).  Returns the output path.
    """
    def load(path):
        recs = {}
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                recs[(r.get("block"), r.get("head"), r.get("token"))] = \
                    r["idx"]
        return recs

    true_recs = load(true_idx_file)
    pred_recs = load(pred_idx_file)
    with open(out_file, "w") as f:
        for key, true_idx in true_recs.items():
            pred = set(pred_recs.get(key, ()))
            missed = [i for i in true_idx if i not in pred]
            f.write(json.dumps({"block": key[0], "head": key[1],
                                "token": key[2], "n_missed": len(missed),
                                "missed": missed}) + "\n")
    return out_file


# ----------------------------------------------------------------------
# Run-time instrumentation on real model activations (the reference's
# --anal mode: deit main.py:477-487 wiring + DiT/models.py:202-213, with
# funcs/analysis.py:136-157 as the metric).  The instrumented pass runs the
# model block-by-block (no scan) and, at every quantized attention, scores
# the predictor's top-k selection against the true softmax mass.
# ----------------------------------------------------------------------
def _attn_quality(q, k, scale, specs, attn_cfg, orthogonal_matrix):
    from .attention import predict_scores
    from .ops.linear import matmul

    true_scores = matmul(q, jnp.swapaxes(k, -1, -2), mx_specs=specs,
                         mode_config="aa") * scale
    if attn_cfg.approx_flag:
        sel = predict_scores(q, k, specs, attn_cfg.pred_mode,
                             orthogonal_matrix)
    else:
        sel = true_scores
    _, idx = jax.lax.top_k(sel, attn_cfg.k)
    return attention_prediction_quality(true_scores, idx, attn_cfg.k)


def vit_prediction_analysis(params, x, cfg, qcfg, orthogonal_matrix=None):
    """Per-block predictor quality on real DeiT activations.

    Returns [{block, softmax_recall, avg_chosen_k}] for every block whose
    attention runs top-k (the reference --anal instrumentation,
    workloads/deit/scripts/main.py:101-148 analysis branch)."""
    from .models.vit import vit_attention, vit_mlp
    from .models.stacked import unstack_block
    from .ops.conv import conv2d
    from .ops.norms import layer_norm

    B = x.shape[0]
    specs = qcfg.mx_specs if qcfg.mx_quant else None
    pe = params["patch_embed"]
    x = conv2d(x, pe["weight"], pe.get("bias"), stride=cfg.patch_size,
               mx_specs=specs)
    x = x.reshape(B, cfg.embed_dim, -1).transpose(0, 2, 1)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]

    H, D = cfg.num_heads, cfg.head_dim
    records = []
    for i in range(cfg.depth):
        bp = unstack_block(params["blocks"], i)
        attn_cfg = qcfg.block_attn_cfg(i, cfg.depth)
        mxs = specs if attn_cfg.mx_quant else None
        h = layer_norm(x, bp["norm1"]["weight"], bp["norm1"]["bias"],
                       eps=cfg.eps, mx_specs=None)
        if attn_cfg.mx_quant and attn_cfg.top_k:
            from .ops.linear import linear
            qkv = linear(h, bp["attn"]["qkv"]["weight"],
                         bp["attn"]["qkv"].get("bias"), mx_specs=mxs)
            N = h.shape[1]
            qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
            rec = _attn_quality(qkv[0], qkv[1], D ** -0.5, mxs, attn_cfg,
                                orthogonal_matrix)
            records.append(dict(block=i, **rec))
        x = x + vit_attention(bp["attn"], h, cfg, specs, attn_cfg,
                              orthogonal_matrix)
        h = layer_norm(x, bp["norm2"]["weight"], bp["norm2"]["bias"],
                       eps=cfg.eps, mx_specs=None)
        x = x + vit_mlp(bp["mlp"], h, mxs)
    return records


def dit_prediction_analysis(params, x, t, y, cfg, qcfg, timestep_idx=None,
                            orthogonal_matrix=None):
    """Per-block predictor quality on real DiT activations at one denoise
    step (reference DiT/models.py:202-213 per-timestep --anal wiring).

    x: (B, C, H, W) latents (NOT CFG-doubled), t: (B,) timesteps, y: (B,)
    labels.  Returns [{block, timestep_idx, softmax_recall, avg_chosen_k}].
    """
    from .models.common import patch_embed
    from .models.dit import (_ln, dit_attention, modulate,
                             timestep_embedding)
    from .models.stacked import unstack_block
    from .ops.linear import linear

    B = x.shape[0]
    specs = qcfg.mx_specs if qcfg.mx_quant else None
    pe = params["x_embedder"]
    x = patch_embed(x, pe["weight"], pe.get("bias"), cfg.patch_size,
                    precision="highest")
    x = x + params["pos_embed"]
    te = params["t_embedder"]
    t_emb = timestep_embedding(t, 256)
    t_emb = linear(t_emb, te["mlp0"]["weight"], te["mlp0"]["bias"])
    t_emb = jax.nn.silu(t_emb)
    t_emb = linear(t_emb, te["mlp2"]["weight"], te["mlp2"]["bias"])
    c = t_emb + params["y_embedder"]["table"][y]

    H, D = cfg.num_heads, cfg.head_dim
    records = []
    for i in range(cfg.depth):
        bp = unstack_block(params["blocks"], i)
        attn_cfg = qcfg.block_attn_cfg(i, timestep_idx)
        mxs = specs if attn_cfg.mx_quant else None
        mod = linear(jax.nn.silu(c), bp["adaLN"]["weight"],
                     bp["adaLN"]["bias"])
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
        h = modulate(_ln(x), shift_msa, scale_msa)
        if attn_cfg.mx_quant and attn_cfg.top_k:
            N = h.shape[1]
            qkv = linear(h, bp["attn"]["qkv"]["weight"],
                         bp["attn"]["qkv"].get("bias"), mx_specs=mxs)
            qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
            rec = _attn_quality(qkv[0], qkv[1], D ** -0.5, mxs, attn_cfg,
                                orthogonal_matrix)
            records.append(dict(block=i, timestep_idx=timestep_idx, **rec))
        x = x + gate_msa[:, None] * dit_attention(bp["attn"], h, cfg, specs,
                                                  attn_cfg,
                                                  orthogonal_matrix)
        h = modulate(_ln(x), shift_mlp, scale_mlp)
        h = linear(h, bp["mlp"]["fc1"]["weight"], bp["mlp"]["fc1"]["bias"],
                   mx_specs=mxs)
        h = jax.nn.gelu(h, approximate=True)
        h = linear(h, bp["mlp"]["fc2"]["weight"], bp["mlp"]["fc2"]["bias"],
                   mx_specs=mxs)
        x = x + gate_mlp[:, None] * h
    return records
