"""Checkpoint I/O: torch->JAX conversion for the public DeiT / DiT weights,
plus native pickle/npz persistence for our own param trees.

Replaces the reference's load paths (deit/scripts/main.py:573-650 --resume /
--finetune with pos-embed interpolation; DiT download.py:18-30 "ema" key
extraction; PixArt safetensors load).  torch (CPU) is used only as a file
reader — tensors are converted to numpy immediately.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np


def _t2n(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def _torch_load(path: str):
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


# ----------------------------------------------------------------------
def load_deit_checkpoint(path: str, depth: int = 12,
                         interpolate_pos_embed_to: Optional[int] = None):
    """Convert a public DeiT checkpoint (timm vision_transformer state_dict,
    usually under a 'model' key) into our ViT param tree (models/vit.py).

    interpolate_pos_embed_to: optional new number of patches (bicubic
    pos-embed interpolation, reference main.py:617-630).
    """
    ckpt = _torch_load(path)
    sd = ckpt.get("model", ckpt)

    p: Dict = {
        "patch_embed": {"weight": _t2n(sd["patch_embed.proj.weight"]),
                        "bias": _t2n(sd["patch_embed.proj.bias"])},
        "cls_token": _t2n(sd["cls_token"]),
        "pos_embed": _t2n(sd["pos_embed"]),
        "norm": {"weight": _t2n(sd["norm.weight"]),
                 "bias": _t2n(sd["norm.bias"])},
        "head": {"weight": _t2n(sd["head.weight"]),
                 "bias": _t2n(sd["head.bias"])},
    }
    blocks = []
    for i in range(depth):
        pre = f"blocks.{i}."
        blocks.append({
            "norm1": {"weight": _t2n(sd[pre + "norm1.weight"]),
                      "bias": _t2n(sd[pre + "norm1.bias"])},
            "attn": {"qkv": {"weight": _t2n(sd[pre + "attn.qkv.weight"]),
                             "bias": _t2n(sd[pre + "attn.qkv.bias"])},
                     "proj": {"weight": _t2n(sd[pre + "attn.proj.weight"]),
                              "bias": _t2n(sd[pre + "attn.proj.bias"])}},
            "norm2": {"weight": _t2n(sd[pre + "norm2.weight"]),
                      "bias": _t2n(sd[pre + "norm2.bias"])},
            "mlp": {"fc1": {"weight": _t2n(sd[pre + "mlp.fc1.weight"]),
                            "bias": _t2n(sd[pre + "mlp.fc1.bias"])},
                    "fc2": {"weight": _t2n(sd[pre + "mlp.fc2.weight"]),
                            "bias": _t2n(sd[pre + "mlp.fc2.bias"])}},
        })
    from ..models.stacked import stack_blocks
    p["blocks"] = stack_blocks(blocks)

    if interpolate_pos_embed_to is not None:
        p["pos_embed"] = interpolate_pos_embed(
            p["pos_embed"], interpolate_pos_embed_to)
    return p


def interpolate_pos_embed(pos_embed: np.ndarray, new_num_patches: int
                          ) -> np.ndarray:
    """Bicubic resize of the patch grid portion of a (1, 1+N, D) pos embed
    (reference main.py:617-630)."""
    import jax
    import jax.numpy as jnp
    extra, grid = pos_embed[:, :1], pos_embed[:, 1:]
    n_old = grid.shape[1]
    s_old = int(n_old ** 0.5)
    s_new = int(new_num_patches ** 0.5)
    g = grid.reshape(1, s_old, s_old, -1)
    g = jax.image.resize(jnp.asarray(g), (1, s_new, s_new, g.shape[-1]),
                         method="bicubic")
    g = np.asarray(g).reshape(1, s_new * s_new, -1)
    return np.concatenate([extra, g], axis=1)


# ----------------------------------------------------------------------
def load_dit_checkpoint(path: str, depth: int = 28):
    """Convert a public DiT checkpoint (train-state dict with 'ema'/'model'
    keys, or a bare state_dict — reference download.py:18-30) into our DiT
    param tree (models/dit.py)."""
    ckpt = _torch_load(path)
    if "ema" in ckpt:
        sd = ckpt["ema"]
    elif "model" in ckpt:
        sd = ckpt["model"]
    else:
        sd = ckpt

    p: Dict = {
        "x_embedder": {"weight": _t2n(sd["x_embedder.proj.weight"]),
                       "bias": _t2n(sd["x_embedder.proj.bias"])},
        "pos_embed": _t2n(sd["pos_embed"]),
        "t_embedder": {
            "mlp0": {"weight": _t2n(sd["t_embedder.mlp.0.weight"]),
                     "bias": _t2n(sd["t_embedder.mlp.0.bias"])},
            "mlp2": {"weight": _t2n(sd["t_embedder.mlp.2.weight"]),
                     "bias": _t2n(sd["t_embedder.mlp.2.bias"])}},
        "y_embedder": {
            "table": _t2n(sd["y_embedder.embedding_table.weight"])},
        "final_layer": {
            "adaLN": {
                "weight": _t2n(sd["final_layer.adaLN_modulation.1.weight"]),
                "bias": _t2n(sd["final_layer.adaLN_modulation.1.bias"])},
            "linear": {"weight": _t2n(sd["final_layer.linear.weight"]),
                       "bias": _t2n(sd["final_layer.linear.bias"])}},
    }
    blocks = []
    for i in range(depth):
        pre = f"blocks.{i}."
        blocks.append({
            "attn": {"qkv": {"weight": _t2n(sd[pre + "attn.qkv.weight"]),
                             "bias": _t2n(sd[pre + "attn.qkv.bias"])},
                     "proj": {"weight": _t2n(sd[pre + "attn.proj.weight"]),
                              "bias": _t2n(sd[pre + "attn.proj.bias"])}},
            "mlp": {"fc1": {"weight": _t2n(sd[pre + "mlp.fc1.weight"]),
                            "bias": _t2n(sd[pre + "mlp.fc1.bias"])},
                    "fc2": {"weight": _t2n(sd[pre + "mlp.fc2.weight"]),
                            "bias": _t2n(sd[pre + "mlp.fc2.bias"])}},
            "adaLN": {
                "weight": _t2n(sd[pre + "adaLN_modulation.1.weight"]),
                "bias": _t2n(sd[pre + "adaLN_modulation.1.bias"])},
        })
    from ..models.stacked import stack_blocks
    p["blocks"] = stack_blocks(blocks)
    return p


# ----------------------------------------------------------------------
def save_params(path: str, params) -> None:
    """Persist a param tree (numpy pickle; orbax for sharded trees can layer
    on top later)."""
    import jax
    np_tree = jax.tree.map(lambda x: np.asarray(x), params)
    with open(path, "wb") as f:
        pickle.dump(np_tree, f)


def load_params(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
