"""CLIPScore (reference PixArt/evaluation/clip_score.py:9-33).

score = 100 * max(0, cos(image_emb, text_emb)), averaged over pairs —
computed here from embeddings so any CLIP implementation can provide them
(transformers' CLIP with local weights, or a converted JAX port).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def clip_score_from_features(image_embs: np.ndarray, text_embs: np.ndarray
                             ) -> float:
    """Mean CLIPScore over aligned (N, D) image/text embedding pairs."""
    i = image_embs / np.linalg.norm(image_embs, axis=-1, keepdims=True)
    t = text_embs / np.linalg.norm(text_embs, axis=-1, keepdims=True)
    cos = np.sum(i * t, axis=-1)
    return float(np.mean(100.0 * np.maximum(cos, 0.0)))


def clip_score_torch(images: np.ndarray, prompts, model_path: str,
                     batch: int = 64) -> float:
    """CLIPScore via a local transformers CLIP checkpoint (CPU torch).

    images: (N, H, W, 3) uint8; prompts: list[str] of the same length.
    Matches torchmetrics' CLIPScore with clip-vit-large-patch14.
    """
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(model_path)
    processor = CLIPProcessor.from_pretrained(model_path)
    model.eval()

    scores = []
    with torch.no_grad():
        for i in range(0, len(images), batch):
            ims = [images[j] for j in range(i, min(i + batch, len(images)))]
            txt = prompts[i:i + batch]
            inputs = processor(text=txt, images=ims, return_tensors="pt",
                               padding=True, truncation=True)
            out = model(**inputs)
            ie = out.image_embeds / out.image_embeds.norm(dim=-1,
                                                          keepdim=True)
            te = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
            cos = (ie * te).sum(-1)
            scores.append(100.0 * torch.clamp(cos, min=0).cpu().numpy())
    return float(np.mean(np.concatenate(scores)))


def clip_score_jax(images: np.ndarray, prompts, model_path: str,
                   batch: int = 64, mx_specs=None) -> float:
    """CLIPScore with BOTH towers running in JAX on the accelerator
    (models/clip.py, value-validated vs transformers in
    tests/test_clip.py).  Only tokenization uses the transformers
    CLIPTokenizer (string BPE — host-side by nature).

    images: (N, H, W, 3) uint8; prompts: list[str] of the same length.
    ``mx_specs``: optionally run the scorer MXINT-quantized.
    """
    import jax.numpy as jnp
    from transformers import CLIPTokenizer

    from ..models.clip import (clip_image_embed, clip_text_embed,
                               load_clip_from_pretrained,
                               preprocess_images)

    # resolves local dirs (incl. sharded checkpoints), hub ids, and any
    # CLIP variant: transformers materializes the weights + config, we
    # convert (models/clip.py)
    cfg, params = load_clip_from_pretrained(model_path)
    tok = CLIPTokenizer.from_pretrained(model_path)

    scores = []
    for i in range(0, len(images), batch):
        ims = images[i:i + batch]
        txt = list(prompts[i:i + batch])
        px = preprocess_images(ims, cfg)
        enc = tok(txt, padding="max_length", truncation=True,
                  max_length=cfg.max_positions, return_tensors="np")
        ie = np.asarray(clip_image_embed(params, jnp.asarray(px), cfg,
                                         mx_specs=mx_specs), np.float32)
        te = np.asarray(clip_text_embed(
            params, jnp.asarray(enc["input_ids"].astype(np.int32)), cfg,
            attention_mask=jnp.asarray(enc["attention_mask"]),
            mx_specs=mx_specs), np.float32)
        scores.append(clip_score_from_features(ie, te) * len(ie))
    return float(sum(scores) / len(images))
