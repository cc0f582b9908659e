"""InceptionV3 (FID variant) feature extractor in JAX.

JAX port of the pt_inception-2015-12-05 network the ADM evaluator's TF graph
computes (reference workloads/DiT/evaluations/evaluator.py uses its pool_3
and spatial activations; the PixArt FID_score.py the same).  Loads the
public pt_inception torch state dict (pt_inception-2015-12-05-6726825d.pth)
— place it locally and pass its path; this environment has no network
access, so no auto-download.

Outputs:
  pool3   (N, 2048)  - FID features
  spatial (N, 7)     - first 7 channels of the mixed_6/conv map pooled, the
                       ADM "spatial" features used for sFID
  logits  (N, 1008)  - for Inception Score
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv_bn(x, p, stride=1, padding=0):
    pad = padding if isinstance(padding, (tuple, list)) else \
        ((padding, padding), (padding, padding))
    x = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), list(pad),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    # BN folded at load time into scale/bias
    return jax.nn.relu(x * p["scale"].reshape(1, -1, 1, 1) +
                       p["bias"].reshape(1, -1, 1, 1))


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, k, k), (1, 1, s, s), "VALID")


def _avgpool(x, k=3, s=1, pad=1):
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, s, s),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)])
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, s, s),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)])
    return summed / counts


def _inception_a(x, p):
    b1 = _conv_bn(x, p["branch1x1"])
    b5 = _conv_bn(x, p["branch5x5_1"])
    b5 = _conv_bn(b5, p["branch5x5_2"], padding=2)
    b3 = _conv_bn(x, p["branch3x3dbl_1"])
    b3 = _conv_bn(b3, p["branch3x3dbl_2"], padding=1)
    b3 = _conv_bn(b3, p["branch3x3dbl_3"], padding=1)
    bp = _conv_bn(_avgpool(x), p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(x, p):
    b3 = _conv_bn(x, p["branch3x3"], stride=2)
    bd = _conv_bn(x, p["branch3x3dbl_1"])
    bd = _conv_bn(bd, p["branch3x3dbl_2"], padding=1)
    bd = _conv_bn(bd, p["branch3x3dbl_3"], stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(x, p):
    b1 = _conv_bn(x, p["branch1x1"])
    b7 = _conv_bn(x, p["branch7x7_1"])
    b7 = _conv_bn(b7, p["branch7x7_2"], padding=((0, 0), (3, 3)))
    b7 = _conv_bn(b7, p["branch7x7_3"], padding=((3, 3), (0, 0)))
    bd = _conv_bn(x, p["branch7x7dbl_1"])
    bd = _conv_bn(bd, p["branch7x7dbl_2"], padding=((3, 3), (0, 0)))
    bd = _conv_bn(bd, p["branch7x7dbl_3"], padding=((0, 0), (3, 3)))
    bd = _conv_bn(bd, p["branch7x7dbl_4"], padding=((3, 3), (0, 0)))
    bd = _conv_bn(bd, p["branch7x7dbl_5"], padding=((0, 0), (3, 3)))
    bp = _conv_bn(_avgpool(x), p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(x, p):
    b3 = _conv_bn(x, p["branch3x3_1"])
    b3 = _conv_bn(b3, p["branch3x3_2"], stride=2)
    b7 = _conv_bn(x, p["branch7x7x3_1"])
    b7 = _conv_bn(b7, p["branch7x7x3_2"], padding=((0, 0), (3, 3)))
    b7 = _conv_bn(b7, p["branch7x7x3_3"], padding=((3, 3), (0, 0)))
    b7 = _conv_bn(b7, p["branch7x7x3_4"], stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(x, p, pool="avg"):
    b1 = _conv_bn(x, p["branch1x1"])
    b3 = _conv_bn(x, p["branch3x3_1"])
    b3a = _conv_bn(b3, p["branch3x3_2a"], padding=((0, 0), (1, 1)))
    b3b = _conv_bn(b3, p["branch3x3_2b"], padding=((1, 1), (0, 0)))
    b3 = jnp.concatenate([b3a, b3b], axis=1)
    bd = _conv_bn(x, p["branch3x3dbl_1"])
    bd = _conv_bn(bd, p["branch3x3dbl_2"], padding=1)
    bda = _conv_bn(bd, p["branch3x3dbl_3a"], padding=((0, 0), (1, 1)))
    bdb = _conv_bn(bd, p["branch3x3dbl_3b"], padding=((1, 1), (0, 0)))
    bd = jnp.concatenate([bda, bdb], axis=1)
    if pool == "avg":
        bp = _avgpool(x)
    else:  # FID variant: max pool in the final block
        bp = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                   (1, 1, 3, 3), (1, 1, 1, 1),
                                   [(0, 0), (0, 0), (1, 1), (1, 1)])
    bp = _conv_bn(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def inception_features(params: Dict, images: jax.Array
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """images: (N, 3, 299, 299) in [0, 1] -> (pool3, spatial, logits)."""
    x = images * 2.0 - 1.0
    x = _conv_bn(x, params["Conv2d_1a_3x3"], stride=2)
    x = _conv_bn(x, params["Conv2d_2a_3x3"])
    x = _conv_bn(x, params["Conv2d_2b_3x3"], padding=1)
    x = _maxpool(x)
    x = _conv_bn(x, params["Conv2d_3b_1x1"])
    x = _conv_bn(x, params["Conv2d_4a_3x3"])
    x = _maxpool(x)
    x = _inception_a(x, params["Mixed_5b"])
    x = _inception_a(x, params["Mixed_5c"])
    x = _inception_a(x, params["Mixed_5d"])
    x = _inception_b(x, params["Mixed_6a"])
    x = _inception_c(x, params["Mixed_6b"])
    x = _inception_c(x, params["Mixed_6c"])
    x = _inception_c(x, params["Mixed_6d"])
    x = _inception_c(x, params["Mixed_6e"])
    # ADM "spatial" features: first 7 channels of the mixed_6e map, flattened
    # over space (17x17x7 = 2023-dim at 299 input) — evaluator.py sFID input
    sp = x[:, :7]
    spatial = sp.transpose(0, 2, 3, 1).reshape(sp.shape[0], -1)
    x = _inception_d(x, params["Mixed_7a"])
    x = _inception_e(x, params["Mixed_7b"], pool="avg")
    x = _inception_e(x, params["Mixed_7c"], pool="max")
    pool3 = jnp.mean(x, axis=(2, 3))
    logits = pool3 @ params["fc"]["w"].T + params["fc"]["b"]
    return pool3, spatial, jax.nn.softmax(logits, axis=-1)


def load_inception_checkpoint(path: str) -> Dict:
    """Convert the pt_inception torch state dict; BN folded into conv
    scale/bias (inference only)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)

    def t2n(k):
        return sd[k].detach().cpu().numpy().astype(np.float32)

    def conv_bn(prefix, eps=1e-3):
        w = t2n(prefix + ".conv.weight")
        gamma = t2n(prefix + ".bn.weight")
        beta = t2n(prefix + ".bn.bias")
        mean = t2n(prefix + ".bn.running_mean")
        var = t2n(prefix + ".bn.running_var")
        scale = gamma / np.sqrt(var + eps)
        bias = beta - mean * scale
        return {"w": w, "scale": scale, "bias": bias}

    p: Dict = {}
    for name in ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"]:
        p[name] = conv_bn(name)
    for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
        p[name] = {b: conv_bn(f"{name}.{b}") for b in
                   ["branch1x1", "branch5x5_1", "branch5x5_2",
                    "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                    "branch_pool"]}
    p["Mixed_6a"] = {b: conv_bn(f"Mixed_6a.{b}") for b in
                     ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                      "branch3x3dbl_3"]}
    for name in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
        p[name] = {b: conv_bn(f"{name}.{b}") for b in
                   ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                    "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                    "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]}
    p["Mixed_7a"] = {b: conv_bn(f"Mixed_7a.{b}") for b in
                     ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                      "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"]}
    for name in ["Mixed_7b", "Mixed_7c"]:
        p[name] = {b: conv_bn(f"{name}.{b}") for b in
                   ["branch1x1", "branch3x3_1", "branch3x3_2a",
                    "branch3x3_2b", "branch3x3dbl_1", "branch3x3dbl_2",
                    "branch3x3dbl_3a", "branch3x3dbl_3b", "branch_pool"]}
    p["fc"] = {"w": t2n("fc.weight"), "b": t2n("fc.bias")}
    return p


def extract_features_batched(params, images_u8: np.ndarray,
                             batch: int = 64) -> Dict[str, np.ndarray]:
    """(N, H, W, 3) uint8 -> dict of pool3/spatial/pred feature arrays."""
    fn = jax.jit(lambda x: inception_features(params, x))
    pools, spatials, preds = [], [], []
    for i in range(0, len(images_u8), batch):
        chunk = images_u8[i:i + batch].astype(np.float32) / 255.0
        chunk = np.transpose(chunk, (0, 3, 1, 2))
        x = jax.image.resize(jnp.asarray(chunk),
                             (chunk.shape[0], 3, 299, 299), "bilinear")
        p3, sp, pr = fn(x)
        pools.append(np.asarray(p3))
        spatials.append(np.asarray(sp))
        preds.append(np.asarray(pr))
    return {"pool3": np.concatenate(pools),
            "spatial": np.concatenate(spatials),
            "pred": np.concatenate(preds)}
