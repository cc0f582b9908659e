"""Architecture-equivalence check of the JAX InceptionV3 FID extractor.

evaluation/inception.py is a hand port of the pt_inception-2015-12-05
network (the torch port of the TF FID graph that pytorch-fid and the ADM
evaluator's numbers correspond to).  A silent porting bug there would
corrupt every FID/sFID/IS verdict, so this test builds an INDEPENDENT torch
mirror of the module structure — BasicConv2d(conv+BN eps=1e-3+relu),
InceptionA/B/C/D/E with the FID variants (count_include_pad=False avgpools;
Mixed_7c max-pool branch), 1008-way fc — randomizes its weights AND BN
running stats, saves a state_dict with the exact pt_inception key names,
loads it through load_inception_checkpoint (validating the converter
key-for-key and the BN fold), and compares pool3/spatial/logits values on
random images.  Any wrong padding, stride, branch order, pooling type, or
concat order diverges immediately.

The FID/IS/precision-recall math is separately cross-checked against
independent formulations on synthetic Gaussians (test_fid_math_*).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

pytestmark = pytest.mark.slow  # full 299x299 inception on CPU


class BasicConv2d(nn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = nn.Conv2d(i, o, bias=False, **kw)
        self.bn = nn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(i, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(i, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1,
                                           count_include_pad=False))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = BasicConv2d(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class InceptionC(nn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1,
                                           count_include_pad=False))
        return torch.cat([self.branch1x1(x), b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


class InceptionE(nn.Module):
    def __init__(self, i, pool="avg"):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BasicConv2d(i, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(i, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "avg":
            # FIDInceptionE_1: count_include_pad=False
            bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        else:
            # FIDInceptionE_2: max pool (the pt_inception FID quirk)
            bp = F.max_pool2d(x, 3, 1, 1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TorchFIDInception(nn.Module):
    """Independent mirror of the pt_inception-2015-12-05 module structure
    (same attribute names -> same state_dict keys)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, pool="avg")
        self.Mixed_7c = InceptionE(2048, pool="max")
        self.fc = nn.Linear(2048, 1008)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
            x = getattr(self, name)(x)
        spatial = x[:, :7].permute(0, 2, 3, 1).reshape(x.shape[0], -1)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        pool3 = x.mean(dim=(2, 3))
        logits = self.fc(pool3)
        return pool3, spatial, torch.softmax(logits, dim=-1)


def _randomized_mirror(seed=0):
    torch.manual_seed(seed)
    m = TorchFIDInception().eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
    return m


def test_inception_port_matches_torch_mirror(tmp_path):
    from mx_quantization_tpu.evaluation.inception import (
        inception_features, load_inception_checkpoint)
    m = _randomized_mirror()
    sd_path = tmp_path / "mirror_inception.pth"
    torch.save(m.state_dict(), sd_path)
    params = load_inception_checkpoint(str(sd_path))

    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 3, 299, 299).astype(np.float32)  # [0, 1]
    with torch.no_grad():
        tp, ts, tl = m(torch.tensor(imgs) * 2.0 - 1.0)
    jp, js, jl = jax.jit(lambda x: inception_features(params, x))(
        jnp.asarray(imgs))

    assert jp.shape == (2, 2048) and js.shape == (2, 7 * 17 * 17) \
        and jl.shape == (2, 1008)
    np.testing.assert_allclose(np.asarray(jp), tp.numpy(), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(js), ts.numpy(), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), rtol=2e-3,
                               atol=1e-5)


def test_fid_math_vs_eigenvalue_formulation():
    """trace(sqrtm(S1 S2)) == sum sqrt(eig(S1 S2)) for SPD S1, S2 — an
    independent derivation of the Frechet cross term."""
    from mx_quantization_tpu.evaluation.fid import (compute_statistics,
                                                    frechet_distance)
    rng = np.random.RandomState(1)
    a = rng.randn(500, 16) @ rng.randn(16, 16) + rng.randn(16)
    b = rng.randn(500, 16) @ rng.randn(16, 16) + 2 * rng.randn(16)
    mu1, s1 = compute_statistics(a)
    mu2, s2 = compute_statistics(b)
    got = frechet_distance(mu1, s1, mu2, s2)
    ev = np.linalg.eigvals(s1 @ s2)
    want = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2) -
            2 * np.sum(np.sqrt(np.abs(ev.real))))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # identical distributions -> ~0
    assert abs(frechet_distance(mu1, s1, mu1, s1)) < 1e-6


def test_inception_score_direct():
    """IS == exp(E_x KL(p(y|x) || p(y))), computed directly per split."""
    from mx_quantization_tpu.evaluation.fid import compute_inception_score
    rng = np.random.RandomState(2)
    logits = rng.randn(200, 10)
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    got = compute_inception_score(p, splits=4)
    scores = []
    for i in range(4):
        part = p[i * 50:(i + 1) * 50]
        marg = part.mean(0)
        kl = np.mean([np.sum(row * (np.log(row + 1e-10) -
                                    np.log(marg + 1e-10))) for row in part])
        scores.append(np.exp(kl))
    np.testing.assert_allclose(got, np.mean(scores), rtol=1e-6)


def test_precision_recall_bruteforce():
    """k-NN manifold precision/recall vs an O(n^2) direct evaluation."""
    from mx_quantization_tpu.evaluation.fid import compute_precision_recall
    rng = np.random.RandomState(3)
    ref = rng.randn(80, 8)
    gen = rng.randn(60, 8) + 0.5
    p, r = compute_precision_recall(ref, gen, k=3)

    def radii(f, k):
        d = np.sqrt(((f[:, None] - f[None]) ** 2).sum(-1))
        return np.sort(d, axis=1)[:, k]  # col 0 is the zero self-distance

    rr = radii(ref, 3)
    gr = radii(gen, 3)
    d_gr = np.sqrt(((gen[:, None] - ref[None]) ** 2).sum(-1))
    want_p = np.mean(np.any(d_gr <= rr[None, :], axis=1))
    want_r = np.mean(np.any(d_gr.T <= gr[None, :], axis=1))
    np.testing.assert_allclose(p, want_p, rtol=1e-9)
    np.testing.assert_allclose(r, want_r, rtol=1e-9)
