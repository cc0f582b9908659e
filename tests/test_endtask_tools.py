"""Guards for the end-task metric tools (tools/endtask_metrics.py).

The DiT end-task FID compares sampled latents against the TRUE synthetic
training distribution — which is only true if the tool's pattern
construction stays bit-identical to tools/train_debug_dit.py's.  A
silent drift would turn FID_vs_data into noise, so pin it.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_dit_patterns_match_train_debug_construction():
    from endtask_metrics import dit_patterns

    # the literal construction from tools/train_debug_dit.py:69-77
    rng = np.random.RandomState(0)
    rank, classes = 4, 16
    u = rng.randn(classes, rank, 32).astype(np.float32)
    w = rng.randn(classes, 4, rank).astype(np.float32)
    base = np.einsum("cri,crj->crij", u, u)
    patterns = np.einsum("ckr,crij->ckij", w, base)
    patterns /= np.abs(patterns).max(axis=(1, 2, 3), keepdims=True) + 1e-6

    np.testing.assert_array_equal(dit_patterns(), patterns)


def test_frechet_on_jl_projection_separates_distributions():
    """Sanity of the metric pipeline: identical Gaussians score ~0, a
    mean-shifted one scores clearly higher."""
    from mx_quantization_tpu.evaluation.fid import compute_fid

    rng = np.random.RandomState(3)
    proj = np.random.RandomState(1234).randn(4096, 256).astype(
        np.float32) / np.sqrt(256)
    a = rng.randn(512, 4096).astype(np.float32) @ proj
    b = rng.randn(512, 4096).astype(np.float32) @ proj
    c = (rng.randn(512, 4096).astype(np.float32) + 0.5) @ proj
    same = compute_fid(a, b)
    shifted = compute_fid(a, c)
    # finite-sample cov bias makes the same-distribution score large in
    # absolute terms (n=512 samples of 256-dim features) but it CANCELS
    # in comparisons; the 0.5-shift adds ~|mu_d|^2 = 0.25*4096 ~ 1024 on
    # top — require at least half of that separation
    assert shifted > same + 500, (same, shifted)
