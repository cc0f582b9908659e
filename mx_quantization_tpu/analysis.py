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
