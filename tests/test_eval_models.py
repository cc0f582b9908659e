"""Shape/flow tests for evaluation feature extractors and the VAE with
random weights (real weights are converted from public checkpoints at use
time; no network here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _rand_conv_bn(rng, cin, cout, k):
    return {"w": rng.randn(cout, cin, k, k).astype(np.float32) * 0.05,
            "scale": np.ones(cout, np.float32),
            "bias": np.zeros(cout, np.float32)}


def test_inception_shapes():
    from mx_quantization_tpu.evaluation.inception import inception_features
    rng = np.random.RandomState(0)

    def cb(cin, cout, k):
        return _rand_conv_bn(rng, cin, cout, k)

    p = {
        "Conv2d_1a_3x3": cb(3, 32, 3), "Conv2d_2a_3x3": cb(32, 32, 3),
        "Conv2d_2b_3x3": cb(32, 64, 3), "Conv2d_3b_1x1": cb(64, 80, 1),
        "Conv2d_4a_3x3": cb(80, 192, 3),
    }

    def block_a(cin, pool):
        return {"branch1x1": cb(cin, 64, 1), "branch5x5_1": cb(cin, 48, 1),
                "branch5x5_2": cb(48, 64, 5),
                "branch3x3dbl_1": cb(cin, 64, 1),
                "branch3x3dbl_2": cb(64, 96, 3),
                "branch3x3dbl_3": cb(96, 96, 3),
                "branch_pool": cb(cin, pool, 1)}

    p["Mixed_5b"] = block_a(192, 32)
    p["Mixed_5c"] = block_a(256, 64)
    p["Mixed_5d"] = block_a(288, 64)
    p["Mixed_6a"] = {"branch3x3": cb(288, 384, 3),
                     "branch3x3dbl_1": cb(288, 64, 1),
                     "branch3x3dbl_2": cb(64, 96, 3),
                     "branch3x3dbl_3": cb(96, 96, 3)}

    def block_c(c7):
        def c1x7(cin, cout):
            return {"w": rng.randn(cout, cin, 1, 7).astype(np.float32) * .05,
                    "scale": np.ones(cout, np.float32),
                    "bias": np.zeros(cout, np.float32)}

        def c7x1(cin, cout):
            return {"w": rng.randn(cout, cin, 7, 1).astype(np.float32) * .05,
                    "scale": np.ones(cout, np.float32),
                    "bias": np.zeros(cout, np.float32)}
        return {"branch1x1": cb(768, 192, 1),
                "branch7x7_1": cb(768, c7, 1),
                "branch7x7_2": c1x7(c7, c7),
                "branch7x7_3": c7x1(c7, 192),
                "branch7x7dbl_1": cb(768, c7, 1),
                "branch7x7dbl_2": c7x1(c7, c7),
                "branch7x7dbl_3": c1x7(c7, c7),
                "branch7x7dbl_4": c7x1(c7, c7),
                "branch7x7dbl_5": c1x7(c7, 192),
                "branch_pool": cb(768, 192, 1)}

    for n, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                  ("Mixed_6e", 192)):
        p[n] = block_c(c7)
    p["Mixed_7a"] = {
        "branch3x3_1": cb(768, 192, 1), "branch3x3_2": cb(192, 320, 3),
        "branch7x7x3_1": cb(768, 192, 1),
        "branch7x7x3_2": {"w": rng.randn(192, 192, 1, 7).astype(np.float32) * .05,
                          "scale": np.ones(192, np.float32),
                          "bias": np.zeros(192, np.float32)},
        "branch7x7x3_3": {"w": rng.randn(192, 192, 7, 1).astype(np.float32) * .05,
                          "scale": np.ones(192, np.float32),
                          "bias": np.zeros(192, np.float32)},
        "branch7x7x3_4": cb(192, 192, 3)}

    def block_e(cin):
        def c1x3(cin_, cout):
            return {"w": rng.randn(cout, cin_, 1, 3).astype(np.float32) * .05,
                    "scale": np.ones(cout, np.float32),
                    "bias": np.zeros(cout, np.float32)}

        def c3x1(cin_, cout):
            return {"w": rng.randn(cout, cin_, 3, 1).astype(np.float32) * .05,
                    "scale": np.ones(cout, np.float32),
                    "bias": np.zeros(cout, np.float32)}
        return {"branch1x1": cb(cin, 320, 1), "branch3x3_1": cb(cin, 384, 1),
                "branch3x3_2a": c1x3(384, 384), "branch3x3_2b": c3x1(384, 384),
                "branch3x3dbl_1": cb(cin, 448, 1),
                "branch3x3dbl_2": cb(448, 384, 3),
                "branch3x3dbl_3a": c1x3(384, 384),
                "branch3x3dbl_3b": c3x1(384, 384),
                "branch_pool": cb(cin, 192, 1)}

    p["Mixed_7b"] = block_e(1280)
    p["Mixed_7c"] = block_e(2048)
    p["fc"] = {"w": rng.randn(1008, 2048).astype(np.float32) * 0.01,
               "b": np.zeros(1008, np.float32)}

    x = jnp.asarray(rng.rand(2, 3, 299, 299).astype(np.float32))
    pool3, spatial, preds = inception_features(p, x)
    assert pool3.shape == (2, 2048)
    assert spatial.shape == (2, 17 * 17 * 7)  # ADM sFID feature dim 2023
    assert preds.shape == (2, 1008)
    np.testing.assert_allclose(np.asarray(preds).sum(-1), [1, 1], rtol=1e-4)


def _rand_vae_params(rng):
    def conv(cin, cout, k):
        return {"weight": rng.randn(cout, cin, k, k).astype(np.float32) * .05,
                "bias": np.zeros(cout, np.float32)}

    def norm(c):
        return {"weight": np.ones(c, np.float32),
                "bias": np.zeros(c, np.float32)}

    def resnet(cin, cout):
        p = {"norm1": norm(cin), "conv1": conv(cin, cout, 3),
             "norm2": norm(cout), "conv2": conv(cout, cout, 3)}
        if cin != cout:
            p["conv_shortcut"] = conv(cin, cout, 1)
        return p

    def attn(c):
        def lin(cout):
            return {"weight": rng.randn(cout, c).astype(np.float32) * .05,
                    "bias": np.zeros(cout, np.float32)}
        return {"group_norm": norm(c), "to_q": lin(c), "to_k": lin(c),
                "to_v": lin(c), "to_out": lin(c)}

    ch = [512, 512, 256, 128]
    dec = {"conv_in": conv(4, 512, 3),
           "mid": {"resnets": [resnet(512, 512), resnet(512, 512)],
                   "attn": attn(512)},
           "conv_norm_out": norm(128), "conv_out": conv(128, 3, 3),
           "up_blocks": []}
    prev = 512
    for i, c in enumerate(ch):
        blk = {"resnets": [resnet(prev if j == 0 else c, c)
                           for j in range(3)]}
        if i < 3:
            blk["upsampler"] = conv(c, c, 3)
        dec["up_blocks"].append(blk)
        prev = c
    return {"post_quant_conv": conv(4, 4, 1), "decoder": dec}


def test_vae_decoder_shapes():
    from mx_quantization_tpu.models.vae import decode_latents
    rng = np.random.RandomState(0)
    params = _rand_vae_params(rng)
    z = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    img = decode_latents(params, z)
    assert img.shape == (1, 3, 64, 64)
    assert np.isfinite(np.asarray(img)).all()
