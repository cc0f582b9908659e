"""Tests for auxiliary components: simd ops, pooling, batchnorm, LSTM,
FID/IS/precision-recall math, analysis tools, samplers, npz IO."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mx_quantization_tpu import finalize_mx_specs

BF16 = finalize_mx_specs(dict(bfloat=16, round="even",
                              a_elem_format="int8"))
NOQ = finalize_mx_specs(dict(bfloat=0), early_exit=False)


def rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_simd_ops_forward_backward():
    from mx_quantization_tpu.ops.simd import (simd_add, simd_div, simd_mul,
                                              simd_norm, simd_reduce_sum,
                                              simd_sqrt, simd_square,
                                              simd_sub)
    a, b = rand(4, 8, seed=1), rand(4, 8, seed=2)
    np.testing.assert_allclose(simd_add(a, b, NOQ), a + b, rtol=1e-6)
    np.testing.assert_allclose(simd_mul(a, b, NOQ), a * b, rtol=1e-6)
    g = jax.grad(lambda x: jnp.sum(simd_mul(x, b, BF16) ** 2))(a)
    assert np.isfinite(np.asarray(g)).all()
    # broadcast gradient reduction
    c = rand(8, seed=3)
    gc = jax.grad(lambda x: jnp.sum(simd_add(a, x, NOQ)))(c)
    np.testing.assert_allclose(gc, np.full(8, 4.0), rtol=1e-6)
    s = simd_reduce_sum(a, [1], False, NOQ)
    np.testing.assert_allclose(s, a.sum(1), rtol=1e-6)
    n = simd_norm(a, NOQ)
    np.testing.assert_allclose(n, jnp.linalg.norm(a), rtol=1e-5)
    np.testing.assert_allclose(simd_sqrt(jnp.abs(a), NOQ),
                               jnp.sqrt(jnp.abs(a)), rtol=1e-6)
    np.testing.assert_allclose(simd_div(a, b, NOQ), a / b, rtol=1e-6)
    np.testing.assert_allclose(simd_square(a, NOQ), a * a, rtol=1e-6)
    np.testing.assert_allclose(simd_sub(a, b, NOQ), a - b, rtol=1e-6)


def test_adaptive_avg_pool2d():
    from mx_quantization_tpu.ops.pooling import adaptive_avg_pool2d
    x = rand(2, 3, 7, 9, seed=4)
    out = adaptive_avg_pool2d(x, (2, 3), mx_specs=NOQ)
    assert out.shape == (2, 3, 2, 3)
    # parity with simple mean when evenly dividing
    x2 = rand(2, 3, 8, 8, seed=5)
    out2 = adaptive_avg_pool2d(x2, 4, mx_specs=NOQ)
    ref = x2.reshape(2, 3, 4, 2, 4, 2).mean(axis=(3, 5))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-5)
    g = jax.grad(lambda t: jnp.sum(
        adaptive_avg_pool2d(t, 2, mx_specs=BF16) ** 2))(x2)
    assert np.isfinite(np.asarray(g)).all()


def test_batch_norm():
    from mx_quantization_tpu.ops.batchnorm import (BatchNormState, batch_norm,
                                                   init_batchnorm_state)
    x = rand(8, 4, 5, 5, seed=6)
    w, b = jnp.ones(4), jnp.zeros(4)
    st = init_batchnorm_state(4)
    out, st2 = batch_norm(x, st, w, b, training=True, mx_specs=None)
    m = np.asarray(out).mean(axis=(0, 2, 3))
    np.testing.assert_allclose(m, np.zeros(4), atol=1e-5)
    assert not np.allclose(st2.running_mean, st.running_mean)
    # eval mode uses running stats
    out_eval, st3 = batch_norm(x, st2, w, b, training=False, mx_specs=None)
    assert st3 is st2
    # quantized path
    out_q, _ = batch_norm(x, st, w, b, training=True, mx_specs=BF16)
    assert np.abs(np.asarray(out_q) - np.asarray(out)).max() < 0.05


def test_lstm():
    from mx_quantization_tpu.ops.rnn import init_lstm, lstm
    p = init_lstm(jax.random.key(0), 16, 32)
    x = rand(5, 3, 16, seed=7)
    ys, (h, c) = lstm(x, p, mx_specs=None)
    assert ys.shape == (5, 3, 32) and h.shape == (3, 32)
    ys_q, _ = lstm(x, p, mx_specs=BF16)
    assert np.abs(np.asarray(ys_q) - np.asarray(ys)).max() < 0.1


def test_fid_math():
    from mx_quantization_tpu.evaluation import (compute_fid,
                                                compute_inception_score,
                                                compute_precision_recall)
    rng = np.random.RandomState(0)
    a = rng.randn(500, 16)
    b = rng.randn(500, 16)
    same = compute_fid(a, a[:499])
    diff = compute_fid(a, b + 3.0)
    assert same < 0.5 and diff > 5.0
    # IS: uniform predictions -> score 1; peaked + diverse -> high
    uniform = np.full((100, 10), 0.1)
    assert abs(compute_inception_score(uniform) - 1.0) < 1e-5
    peaked = np.eye(10)[rng.randint(0, 10, 200)] * 0.91 + 0.01
    assert compute_inception_score(peaked) > 4.0
    p, r = compute_precision_recall(a, a[:400] + 0.01 * rng.randn(400, 16))
    assert p > 0.9 and r > 0.9
    p2, _ = compute_precision_recall(a, b + 10.0)
    assert p2 < 0.1


def test_npz_io_roundtrip(tmp_path):
    from mx_quantization_tpu.evaluation import images_to_npz, load_npz_images
    from mx_quantization_tpu.evaluation.npz_io import latents_to_images
    from PIL import Image
    rng = np.random.RandomState(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
            d / f"{i}.png")
    out = images_to_npz(str(d), str(tmp_path / "x.npz"), size=32)
    arr = load_npz_images(out)
    assert arr.shape == (3, 32, 32, 3) and arr.dtype == np.uint8
    lat = rng.randn(2, 3, 8, 8).astype(np.float32)
    imgs = latents_to_images(lat)
    assert imgs.shape == (2, 8, 8, 3) and imgs.dtype == np.uint8


def test_analysis_tools():
    from mx_quantization_tpu.analysis import (diff_idx_analysis,
                                              total_chosen_k)
    idx = jnp.asarray(np.tile(np.arange(4)[None], (2, 3, 8, 1)))
    avg = total_chosen_k(idx)
    assert float(avg) == 4.0  # every row picks the same 4 keys
    tv = jnp.ones((2, 8, 4)) * 0.2
    pv = jnp.ones((2, 8, 4)) * 0.1
    assert abs(float(diff_idx_analysis(tv, pv)) - 0.5) < 1e-6


def test_ra_sampler():
    from mx_quantization_tpu.data.samplers import ra_sampler_indices
    idx0 = ra_sampler_indices(1000, 0, 2, seed=0)
    idx1 = ra_sampler_indices(1000, 1, 2, seed=0)
    assert idx0.max() < 1000 and len(idx0) == len(idx1)
    # deterministic per seed
    np.testing.assert_array_equal(idx0, ra_sampler_indices(1000, 0, 2, 0))


def test_clip_score_features():
    from mx_quantization_tpu.evaluation import clip_score_from_features
    rng = np.random.RandomState(0)
    e = rng.randn(10, 64)
    assert abs(clip_score_from_features(e, e) - 100.0) < 1e-4
    assert clip_score_from_features(e, -e) == 0.0


def test_orbax_sharded_checkpoint(tmp_path):
    import jax
    from mx_quantization_tpu.utils.checkpoint import load_sharded, save_sharded
    params = {"a": jnp.arange(16.0).reshape(4, 4), "b": {"c": jnp.ones(3)}}
    path = str(tmp_path / "ckpt")
    save_sharded(path, params)
    restored = load_sharded(path)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.asarray(params["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]),
                                  np.asarray(params["b"]["c"]))


def test_group_norm():
    """GroupNorm vs a plain-jnp reference (reference groupnorm.py:16-120)."""
    from mx_quantization_tpu.ops import group_norm
    x = rand(2, 8, 6, 6, seed=60)
    w = 1.0 + 0.1 * rand(8, seed=61)
    b = 0.1 * rand(8, seed=62)
    out = group_norm(x, w, b, num_groups=4, eps=1e-5, mx_specs=None)
    xg = np.asarray(x).reshape(2, 4, 2, 6, 6)
    mean = xg.mean(axis=(2, 3, 4), keepdims=True)
    var = xg.var(axis=(2, 3, 4), keepdims=True)
    ref = ((xg - mean) / np.sqrt(var + 1e-5)).reshape(2, 8, 6, 6)
    ref = ref * np.asarray(w).reshape(1, 8, 1, 1) + \
        np.asarray(b).reshape(1, 8, 1, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
    # quantized path executes and stays close
    q = group_norm(x, w, b, num_groups=4, mx_specs=BF16)
    assert np.abs(np.asarray(q) - ref).max() < 0.1


def test_conv_transpose2d():
    """ConvTranspose2d vs jax.lax.conv_transpose (reference
    transpose_convolution.py:18-302, the VAE decoder op)."""
    from mx_quantization_tpu.ops import conv_transpose2d
    x = rand(2, 4, 5, 5, seed=63)
    w = 0.2 * rand(4, 6, 3, 3, seed=64)  # (in, out, kh, kw) torch layout
    b = 0.1 * rand(6, seed=65)
    out = conv_transpose2d(x, w, b, stride=2, padding=1, mx_specs=None)
    # torch output size: (in-1)*stride - 2*pad + k = 4*2 - 2 + 3 = 9
    assert out.shape == (2, 6, 9, 9)
    # gradient flows
    g = jax.grad(lambda x: jnp.sum(conv_transpose2d(x, w, b, stride=2,
                                                    padding=1) ** 2))(x)
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())
    qout = conv_transpose2d(x, w, b, stride=2, padding=1, mx_specs=BF16)
    assert np.abs(np.asarray(qout) - np.asarray(out)).max() < 0.05


def test_conv_transpose2d_grouped():
    """Grouped ConvTranspose2d vs torch (reference
    transpose_convolution.py supports groups via torch's contract)."""
    import torch
    from mx_quantization_tpu.ops import conv_transpose2d
    rng = np.random.RandomState(66)
    for groups, cin, cout in [(2, 6, 8), (3, 6, 9)]:
        x = rng.randn(2, cin, 5, 5).astype(np.float32)
        w = rng.randn(cin, cout // groups, 3, 3).astype(np.float32)
        b = rng.randn(cout).astype(np.float32)
        want = torch.nn.functional.conv_transpose2d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b),
            stride=2, padding=1, groups=groups).numpy()
        got = np.asarray(conv_transpose2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2,
            padding=1, groups=groups, mx_specs=None))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # quantized + grad paths run
        qout = conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), stride=2, padding=1,
                                groups=groups, mx_specs=BF16)
        assert np.abs(np.asarray(qout) - got).max() < 0.1
        g = jax.grad(lambda xx: jnp.sum(conv_transpose2d(
            xx, jnp.asarray(w), jnp.asarray(b), stride=2, padding=1,
            groups=groups, mx_specs=BF16) ** 2))(jnp.asarray(x))
        assert g.shape == x.shape and bool(jnp.isfinite(g).all())


def test_finite_difference_gradcheck():
    """Finite-difference gradient check of the quantized ops with
    quantization off (reference tests/test_gradcheck.py:26-50 strategy:
    the autograd plumbing must match numerical derivatives)."""
    from mx_quantization_tpu.ops import linear, matmul, softmax

    x = np.random.RandomState(70).randn(4, 8).astype(np.float64)
    w = np.random.RandomState(71).randn(6, 8).astype(np.float64)

    def f_lin(x64):
        out = linear(jnp.asarray(x64, jnp.float32), jnp.asarray(w, jnp.float32),
                     None, mx_specs=NOQ)
        return float(jnp.sum(out ** 2))

    g = jax.grad(lambda x_: jnp.sum(linear(x_, jnp.asarray(w, jnp.float32),
                                           None, mx_specs=NOQ) ** 2))(
        jnp.asarray(x, jnp.float32))
    eps = 1e-3
    for (i, j) in [(0, 0), (1, 3), (3, 7)]:
        xp = x.copy(); xp[i, j] += eps
        xm = x.copy(); xm[i, j] -= eps
        fd = (f_lin(xp) - f_lin(xm)) / (2 * eps)
        assert abs(fd - float(g[i, j])) < 5e-2 * max(1.0, abs(fd)), (i, j)


def test_mx_assert_env_guard(monkeypatch):
    """MX_ASSERT=True makes user-facing MX ops raise when called with
    specs=None (reference specs.py:351-363)."""
    from mx_quantization_tpu import specs as specs_mod
    from mx_quantization_tpu.ops import linear
    x = rand(2, 8, seed=80)
    w = rand(4, 8, seed=81)
    linear(x, w, None, mx_specs=None)  # default mode: fine
    monkeypatch.setattr(specs_mod, "_ASSERT_MODE", "True")
    with pytest.raises(ValueError, match="MX assert"):
        linear(x, w, None, mx_specs=None)
    monkeypatch.setattr(specs_mod, "_ASSERT_MODE", "False")


def test_timestep_samplers():
    """Uniform + loss-second-moment resampler (reference
    diffusion/timestep_sampler.py)."""
    from mx_quantization_tpu.diffusion.timestep_sampler import (
        LossSecondMomentResampler, UniformSampler)
    us = UniformSampler(100)
    t, w = us.sample(jax.random.key(0), 64)
    assert t.shape == (64,) and bool((t >= 0).all()) and bool((t < 100).all())
    assert bool((w == 1.0).all())

    rs = LossSecondMomentResampler(10, history_per_term=3)
    state = rs.init_state()
    # before warm-up: uniform-ish weights
    t, w = rs.sample(jax.random.key(1), 32, state)
    assert t.shape == (32,)
    # feed skewed losses: t=0 large loss, others small
    for seed in range(12):
        tt = jnp.arange(10)
        losses = jnp.where(tt == 0, 10.0, 0.1)
        state = rs.update(state, tt, losses)
    p = rs.weights_from_state(state)
    assert float(p[0]) > float(p[1]) * 5  # importance skew
    t, w = rs.sample(jax.random.key(2), 2048, state)
    frac0 = float(jnp.mean((t == 0).astype(jnp.float32)))
    assert frac0 > 0.3  # t=0 heavily sampled
    assert bool(jnp.isfinite(w).all())


def test_mismatch_analysis(tmp_path):
    """Offline top-k index differ (reference funcs/analysis.py:159-191)."""
    import json
    from mx_quantization_tpu.analysis import mismatch_analysis
    t = tmp_path / "true.jsonl"
    p = tmp_path / "pred.jsonl"
    t.write_text(json.dumps({"block": 0, "head": 0, "token": 0,
                             "idx": [1, 2, 3]}) + "\n")
    p.write_text(json.dumps({"block": 0, "head": 0, "token": 0,
                             "idx": [2, 3, 9]}) + "\n")
    out = mismatch_analysis(str(t), str(p), str(tmp_path / "diff.jsonl"))
    rec = json.loads(open(out).read())
    assert rec["n_missed"] == 1 and rec["missed"] == [1]


def test_pipeline_parallel_matches_sequential():
    """GPipe pipeline over the stacked depth axis == sequential scan
    (new capability; the reference has no PP, SURVEY.md 2.6)."""
    import os
    from mx_quantization_tpu.parallel import MeshPlan, make_mesh
    from mx_quantization_tpu.parallel.pipeline import pipeline_blocks
    from mx_quantization_tpu.models.stacked import stack_blocks

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(MeshPlan(data=2, model=4), devs)

    D, B, F = 8, 8, 16
    rng = np.random.RandomState(3)
    blocks = [{"w": jnp.asarray(rng.randn(F, F).astype(np.float32) * 0.2),
               "b": jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)}
              for _ in range(D)]
    stacked = stack_blocks(blocks)
    x = jnp.asarray(rng.randn(B, F).astype(np.float32))

    def body(bp, x):
        return jnp.tanh(x @ bp["w"] + bp["b"])

    seq = x
    for bl in blocks:
        seq = body(bl, seq)

    out = pipeline_blocks(stacked, body, x, mesh, axis="model", n_micro=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-6, atol=1e-6)


def test_init_analysis_files(tmp_path):
    """Per-timestep analysis file map (reference funcs/analysis.py:36-54)."""
    from mx_quantization_tpu.analysis import init_analysis_files
    files = init_analysis_files("self", str(tmp_path), 80, True, "ex_pred", 3)
    assert set(files) == {0, 1, 2}
    assert files[1]["idx"].endswith("self/ex_pred/top80_idx_t1.txt")
    import os
    assert os.path.exists(files[2]["diff_idx"])
    true_files = init_analysis_files("cross", str(tmp_path), 80, False,
                                     "ex_pred", 1)
    assert "/true/" in true_files[0]["vals"]
