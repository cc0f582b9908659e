"""Evaluation suite: FID/sFID/IS/precision-recall, CLIPScore, npz packers.

Capability-parity with the reference's ADM TF1 evaluator
(workloads/DiT/evaluations/evaluator.py) and PixArt evaluation/ — the metric
math is implemented natively (numpy/JAX); feature extraction is pluggable
(converted InceptionV3/CLIP weights, or any callable), since the environment
has no network access to fetch the original TF graphs.
"""

from .fid import (compute_fid, compute_inception_score,
                  compute_precision_recall, compute_statistics, frechet_distance)
from .npz_io import images_to_npz, load_npz_images
from .clip_score import clip_score_from_features
