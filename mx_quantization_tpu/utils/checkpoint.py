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
    """Load a torch checkpoint, preferring the safe tensor-only
    deserializer.  ``weights_only=True`` refuses arbitrary pickle
    payloads — important because ``download_model`` fetches release
    checkpoints over the network; the canonical DiT/DeiT releases are
    plain tensor state dicts and load fine under it.  Only fall back to
    the permissive loader for local files carrying non-tensor metadata
    (e.g. argparse Namespaces in training checkpoints)."""
    import torch
    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
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


# ----------------------------------------------------------------------
def load_pixart_checkpoint(path: str, num_layers: int = 28):
    """Convert a diffusers PixArtTransformer2DModel state dict (the alpha
    256/512 safetensors the reference loads,
    text_local_inference_alpha.py:150-154) into our PixArt param tree
    (models/pixart.py)."""
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file
        sd = load_file(path)
    else:
        ckpt = _torch_load(path)
        sd = ckpt.get("state_dict", ckpt)

    def t2n2(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    def lin(prefix):
        p = {"weight": t2n2(prefix + ".weight")}
        if prefix + ".bias" in sd:
            p["bias"] = t2n2(prefix + ".bias")
        return p

    p = {
        "pos_embed": {
            "proj": {"weight": t2n2("pos_embed.proj.weight"),
                     "bias": t2n2("pos_embed.proj.bias")},
            # positional table recomputed at init size; diffusers stores it
            # as a buffer only for some variants
        },
        "adaln_single": {
            "emb_mlp0": lin("adaln_single.emb.timestep_embedder.linear_1"),
            "emb_mlp2": lin("adaln_single.emb.timestep_embedder.linear_2"),
            "linear": lin("adaln_single.linear"),
        },
        "caption_projection": {
            "linear_1": lin("caption_projection.linear_1"),
            "linear_2": lin("caption_projection.linear_2"),
        },
        "scale_shift_table": t2n2("scale_shift_table"),
        "proj_out": lin("proj_out"),
    }
    # alpha-1024 micro-conditioning embedders (absent in 256/512 alpha and
    # in all Sigma checkpoints; models/pixart.py size_emb)
    if "adaln_single.emb.resolution_embedder.linear_1.weight" in sd:
        p["adaln_single"]["res_mlp0"] = lin(
            "adaln_single.emb.resolution_embedder.linear_1")
        p["adaln_single"]["res_mlp2"] = lin(
            "adaln_single.emb.resolution_embedder.linear_2")
        p["adaln_single"]["ar_mlp0"] = lin(
            "adaln_single.emb.aspect_ratio_embedder.linear_1")
        p["adaln_single"]["ar_mlp2"] = lin(
            "adaln_single.emb.aspect_ratio_embedder.linear_2")
    blocks = []
    for i in range(num_layers):
        pre = f"transformer_blocks.{i}."
        blocks.append({
            "scale_shift_table": t2n2(pre + "scale_shift_table"),
            "attn1": {"to_q": lin(pre + "attn1.to_q"),
                      "to_k": lin(pre + "attn1.to_k"),
                      "to_v": lin(pre + "attn1.to_v"),
                      "to_out": lin(pre + "attn1.to_out.0")},
            "attn2": {"to_q": lin(pre + "attn2.to_q"),
                      "to_k": lin(pre + "attn2.to_k"),
                      "to_v": lin(pre + "attn2.to_v"),
                      "to_out": lin(pre + "attn2.to_out.0")},
            "ff": {"fc1": lin(pre + "ff.net.0.proj"),
                   "fc2": lin(pre + "ff.net.2")},
        })
    from ..models.stacked import stack_blocks
    p["blocks"] = stack_blocks(blocks)

    # positional table: recompute sincos for the target grid (our forward
    # reads pos_embed["pe"]; diffusers computes it on the fly too)
    from ..models.dit import get_2d_sincos_pos_embed
    d = p["proj_out"]["weight"].shape[1]
    grid = 16  # 256px alpha model (sample_size 32, patch 2); override after
    p["pos_embed"]["pe"] = get_2d_sincos_pos_embed(d, grid)[None]
    return p


# the two public DiT release checkpoints (reference download.py:15)
PRETRAINED_DIT = ("DiT-XL-2-256x256.pt", "DiT-XL-2-512x512.pt")
_DIT_URL = "https://dl.fbaipublicfiles.com/DiT/models/"


def download_model(model_name: str, ckpt_dir: Optional[str] = None) -> str:
    """Download a canonical DiT checkpoint (reference download.py:32-43
    download_model) into ``ckpt_dir`` (default $DIT_CKPT_DIR or
    ./pretrained_models); returns the local path.  Raises OSError with the
    manual-retrieval URL when the environment has no network access."""
    assert model_name in PRETRAINED_DIT, model_name
    ckpt_dir = ckpt_dir or os.environ.get("DIT_CKPT_DIR",
                                          "pretrained_models")
    local = os.path.join(ckpt_dir, model_name)
    if os.path.isfile(local):
        return local
    os.makedirs(ckpt_dir, exist_ok=True)
    url = _DIT_URL + model_name
    import urllib.request
    tmp = local + ".part"
    try:
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, local)
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise OSError(
            f"could not download {url} ({e}); this environment may have no "
            f"network access — fetch it manually into {ckpt_dir}/") from e
    return local


def find_model(model_name_or_path: str, depth: int = 28):
    """Resolve a DiT checkpoint (reference download.py:18-30 find_model).

    Accepts a local file path, or one of the canonical names
    ("DiT-XL-2-256x256.pt" / "DiT-XL-2-512x512.pt") searched in
    $DIT_CKPT_DIR and ./pretrained_models and AUTO-DOWNLOADED from the
    public release URL when absent (download_model); a download failure
    (e.g. no network) raises with the URL for manual retrieval.
    """
    candidates = [model_name_or_path]
    ckpt_dir = os.environ.get("DIT_CKPT_DIR", "pretrained_models")
    candidates.append(os.path.join(ckpt_dir, model_name_or_path))
    for c in candidates:
        if os.path.isfile(c):
            return load_dit_checkpoint(c, depth=depth)
    if model_name_or_path in PRETRAINED_DIT:
        return load_dit_checkpoint(download_model(model_name_or_path),
                                   depth=depth)
    raise FileNotFoundError(
        f"checkpoint {model_name_or_path!r} not found locally; download "
        f"from {_DIT_URL} and place it in {ckpt_dir}/")


# ----------------------------------------------------------------------
def save_sharded(path: str, params) -> None:
    """Save a (possibly mesh-sharded) param tree with orbax — the multi-host
    checkpoint path (each host writes its shards)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_sharded(path: str, template=None):
    """Restore an orbax checkpoint; ``template`` (abstract arrays with
    shardings) re-shards onto the current mesh."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))
