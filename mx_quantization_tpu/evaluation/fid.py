"""FID / sFID / Inception Score / precision-recall metric math.

Re-implements the reference's ADM evaluator computations
(workloads/DiT/evaluations/evaluator.py:69-362) natively:
  * FID: Frechet distance between Gaussian fits of pool_3 features (:69-118)
  * sFID: same distance over spatial (mixed_6/conv) features
  * Inception Score from softmax predictions (:181-205)
  * improved precision/recall via k-NN radii manifold estimation (:207-362)

All functions operate on feature arrays; any extractor can produce them
(see inception.py for a weights-pluggable extractor).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from scipy import linalg


def compute_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) Gaussian fit of (N, D) features."""
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (evaluator.py:69-118 semantics)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) -
                 2 * np.trace(covmean))


def compute_fid(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    return frechet_distance(*compute_statistics(feats_a),
                            *compute_statistics(feats_b))


def compute_inception_score(preds: np.ndarray, splits: int = 10) -> float:
    """IS from (N, classes) softmax predictions (evaluator.py:181-205)."""
    scores = []
    n = preds.shape[0]
    for i in range(splits):
        part = preds[i * n // splits:(i + 1) * n // splits]
        kl = part * (np.log(part + 1e-10) -
                     np.log(np.mean(part, axis=0, keepdims=True) + 1e-10))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores))


def _knn_radii(feats: np.ndarray, k: int = 3,
               batch: int = 2048) -> np.ndarray:
    """Distance to the k-th nearest neighbor for each row (excluding self)."""
    n = len(feats)
    sq = np.sum(feats ** 2, axis=1)
    radii = np.empty(n, np.float64)
    for i in range(0, n, batch):
        block = feats[i:i + batch]
        d2 = (sq[i:i + batch, None] + sq[None, :] -
              2 * block @ feats.T)
        d2 = np.maximum(d2, 0)
        # k+1 smallest includes the zero self-distance
        idx = np.argpartition(d2, k, axis=1)[:, :k + 1]
        part = np.take_along_axis(d2, idx, axis=1)
        radii[i:i + batch] = np.sqrt(np.sort(part, axis=1)[:, k])
    return radii


def compute_precision_recall(ref_feats: np.ndarray, gen_feats: np.ndarray,
                             k: int = 3, batch: int = 2048
                             ) -> Tuple[float, float]:
    """Improved precision/recall (ManifoldEstimator, evaluator.py:207-362):
    precision = fraction of generated samples inside the ref manifold
    (distance to some ref point <= that point's k-NN radius); recall mirrors
    with roles swapped."""
    ref_radii = _knn_radii(ref_feats, k, batch)
    gen_radii = _knn_radii(gen_feats, k, batch)

    def fraction_covered(points, manifold, radii):
        sq_m = np.sum(manifold ** 2, axis=1)
        covered = np.zeros(len(points), bool)
        for i in range(0, len(points), batch):
            block = points[i:i + batch]
            d2 = (np.sum(block ** 2, axis=1)[:, None] + sq_m[None, :] -
                  2 * block @ manifold.T)
            covered[i:i + batch] = np.any(
                np.sqrt(np.maximum(d2, 0)) <= radii[None, :], axis=1)
        return float(np.mean(covered))

    precision = fraction_covered(gen_feats, ref_feats, ref_radii)
    recall = fraction_covered(ref_feats, gen_feats, gen_radii)
    return precision, recall


def full_report(ref_pool: np.ndarray, gen_pool: np.ndarray,
                ref_spatial=None, gen_spatial=None,
                gen_preds=None) -> Dict[str, float]:
    """The evaluator's printed metric set (evaluator.py:56-62)."""
    out = {"fid": compute_fid(ref_pool, gen_pool)}
    if ref_spatial is not None and gen_spatial is not None:
        out["sfid"] = compute_fid(ref_spatial, gen_spatial)
    if gen_preds is not None:
        out["inception_score"] = compute_inception_score(gen_preds)
    p, r = compute_precision_recall(ref_pool, gen_pool)
    out["precision"], out["recall"] = p, r
    return out
