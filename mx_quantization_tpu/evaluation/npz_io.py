"""npz packers (reference DiT/evaluations/to_NPZ.py, PixArt/evaluation/
toNPZ.py:7-40): image folders -> uint8 npz arrays for the evaluator."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def images_to_npz(image_dir: str, out_path: str, size: Optional[int] = 256,
                  limit: Optional[int] = None) -> str:
    """Pack PNG/JPEG files into an (N, H, W, 3) uint8 npz ("arr_0" key,
    matching the ADM evaluator's expected layout)."""
    from PIL import Image
    files = sorted(f for f in os.listdir(image_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if limit:
        files = files[:limit]
    arrs = []
    for f in files:
        img = Image.open(os.path.join(image_dir, f)).convert("RGB")
        if size is not None and img.size != (size, size):
            img = img.resize((size, size), Image.BICUBIC)
        arrs.append(np.asarray(img, np.uint8))
    batch = np.stack(arrs)
    np.savez(out_path, arr_0=batch)
    return out_path


def load_npz_images(path: str) -> np.ndarray:
    with np.load(path) as f:
        key = "arr_0" if "arr_0" in f else list(f.keys())[0]
        return f[key]


def latents_to_images(latents: np.ndarray) -> np.ndarray:
    """(N, C, H, W) [-1, 1]-ish floats -> (N, H, W, C) uint8 (the reference's
    save path: clamp, scale 127.5 + 128, sample.py:130 via save_image)."""
    x = np.transpose(latents, (0, 2, 3, 1))
    x = np.clip(x * 127.5 + 127.5, 0, 255).astype(np.uint8)
    return x


def extract_coco_captions(annotation_json: str, out_txt: str,
                          limit: int = 5000) -> str:
    """Extract COCO val captions to one-prompt-per-line text (reference
    PixArt/evaluation/extract_coco_caption.py; produces the
    coco2017_val5000.txt-style prompt sets)."""
    import json as _json
    with open(annotation_json) as f:
        ann = _json.load(f)
    # one caption per image, ordered by image id
    seen = {}
    for a in ann["annotations"]:
        seen.setdefault(a["image_id"], a["caption"].strip().replace("\n", " "))
    prompts = [seen[i] for i in sorted(seen)][:limit]
    with open(out_txt, "w") as f:
        f.write("\n".join(prompts) + "\n")
    return out_txt
