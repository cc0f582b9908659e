"""JAX CLIP towers vs transformers' CLIPModel — value equivalence at debug
scale (the validation technique of tests/test_t5.py /
test_inception_torch_mirror.py: random weights through both
implementations, converter included)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mx_quantization_tpu.models.clip import (ClipConfig, clip_image_embed,
                                             clip_text_embed, init_clip,
                                             load_clip_checkpoint,
                                             preprocess_images)

pytestmark = pytest.mark.slow

CFG = ClipConfig(image_size=28, patch_size=14, v_hidden=64, v_layers=2,
                 v_heads=2, v_mlp=128, vocab_size=100, max_positions=16,
                 t_hidden=32, t_layers=2, t_heads=2, t_mlp=64,
                 projection_dim=48, eos_token_id=2)


@pytest.fixture(scope="module")
def torch_pair():
    import torch
    from transformers import CLIPConfig as HfClipConfig
    from transformers import CLIPModel

    hf = HfClipConfig(
        text_config=dict(vocab_size=CFG.vocab_size,
                         hidden_size=CFG.t_hidden,
                         intermediate_size=CFG.t_mlp,
                         num_hidden_layers=CFG.t_layers,
                         num_attention_heads=CFG.t_heads,
                         max_position_embeddings=CFG.max_positions,
                         hidden_act="quick_gelu", eos_token_id=2,
                         attention_dropout=0.0),
        vision_config=dict(hidden_size=CFG.v_hidden,
                           intermediate_size=CFG.v_mlp,
                           num_hidden_layers=CFG.v_layers,
                           num_attention_heads=CFG.v_heads,
                           image_size=CFG.image_size,
                           patch_size=CFG.patch_size,
                           hidden_act="quick_gelu",
                           attention_dropout=0.0),
        projection_dim=CFG.projection_dim)
    torch.manual_seed(0)
    m = CLIPModel(hf)
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=g))
    m.eval()
    params = jax.tree.map(jnp.asarray,
                          load_clip_checkpoint(
                              {k: v for k, v in m.state_dict().items()},
                              CFG))
    return m, params


def test_image_tower_matches_transformers(torch_pair):
    import torch
    m, params = torch_pair
    rng = np.random.RandomState(1)
    px = rng.randn(3, 3, CFG.image_size, CFG.image_size).astype(np.float32)
    with torch.no_grad():
        want = m.get_image_features(pixel_values=torch.tensor(px)).numpy()
    got = np.asarray(clip_image_embed(params, jnp.asarray(px), CFG))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_text_tower_matches_transformers(torch_pair):
    import torch
    m, params = torch_pair
    rng = np.random.RandomState(2)
    B, L = 3, 12
    ids = rng.randint(1, 90, size=(B, L)).astype(np.int64)
    lens = [12, 7, 9]
    mask = np.zeros((B, L), np.int64)
    for i, n in enumerate(lens):
        ids[i, n:] = 0
        ids[i, n - 1] = 99   # eot = highest id (legacy argmax pooling)
        mask[i, :n] = 1
    with torch.no_grad():
        want = m.get_text_features(input_ids=torch.tensor(ids),
                                   attention_mask=torch.tensor(mask)
                                   ).numpy()
    got = np.asarray(clip_text_embed(params, jnp.asarray(ids), CFG,
                                     attention_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_clip_score_jax_end_to_end(torch_pair):
    """Full CLIPScore from raw uint8 images + ids through the JAX towers
    equals the torch-computed score on the same preprocessed inputs."""
    import torch
    m, params = torch_pair
    from mx_quantization_tpu.evaluation.clip_score import \
        clip_score_from_features
    rng = np.random.RandomState(3)
    images = rng.randint(0, 255, size=(4, 40, 52, 3)).astype(np.uint8)
    px = preprocess_images(images, CFG)
    ids = rng.randint(1, 90, size=(4, 10)).astype(np.int64)
    ids[:, -1] = 99
    mask = np.ones((4, 10), np.int64)

    ie = np.asarray(clip_image_embed(params, jnp.asarray(px), CFG))
    te = np.asarray(clip_text_embed(params, jnp.asarray(ids), CFG,
                                    attention_mask=jnp.asarray(mask)))
    got = clip_score_from_features(ie, te)
    with torch.no_grad():
        iw = m.get_image_features(pixel_values=torch.tensor(px)).numpy()
        tw = m.get_text_features(input_ids=torch.tensor(ids),
                                 attention_mask=torch.tensor(mask)).numpy()
    want = clip_score_from_features(iw, tw)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_preprocessing_matches_clip_processor():
    """preprocess_images vs transformers' CLIPImageProcessor (the actual
    torchmetrics/reference input path).  Resize goes through different
    bicubic implementations (PIL vs jax.image), so parity is bounded, not
    exact: measured mean |delta| ~0.004 normalized units on smooth images
    with ~2e-4 mean shift.  When no resize is needed the pipeline is
    bit-tight."""
    from transformers import CLIPImageProcessor

    from mx_quantization_tpu.models.clip import (ClipConfig,
                                                 preprocess_images)

    full = ClipConfig()  # 224px pipeline, L/14 constants
    rng = np.random.RandomState(0)
    base = jnp.asarray(rng.randn(3, 16, 20, 3))
    import jax.image as jimage
    imgs = np.asarray(jnp.clip(
        jimage.resize(base, (3, 320, 400, 3), "bicubic") * 40 + 128,
        0, 255)).astype(np.uint8)

    proc = CLIPImageProcessor()
    want = proc(images=[imgs[i] for i in range(3)],
                return_tensors="np")["pixel_values"]
    got = preprocess_images(imgs, full)
    assert got.shape == want.shape == (3, 3, 224, 224)
    d = np.abs(got - want)
    assert d.mean() < 0.02, d.mean()
    assert abs((got - want).mean()) < 1e-3

    # no-resize case: 224x224 input skips resampling -> tight
    imgs224 = rng.randint(0, 255, size=(2, 224, 224, 3)).astype(np.uint8)
    want = proc(images=[imgs224[i] for i in range(2)],
                return_tensors="np")["pixel_values"]
    got = preprocess_images(imgs224, full)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_load_clip_from_pretrained_local_dir(tmp_path, torch_pair):
    """Hub-id/local-dir loading path (workloads.accuracy default backend):
    a saved transformers CLIP dir round-trips through
    load_clip_from_pretrained with the variant config derived from the HF
    config — any CLIP variant, sharded or not."""
    import torch
    m, params_direct = torch_pair
    d = tmp_path / "clip"
    m.save_pretrained(str(d))
    from mx_quantization_tpu.models.clip import load_clip_from_pretrained
    cfg2, params2 = load_clip_from_pretrained(str(d))
    assert cfg2 == CFG
    rng = np.random.RandomState(4)
    px = rng.randn(2, 3, CFG.image_size, CFG.image_size).astype(np.float32)
    a = np.asarray(clip_image_embed(
        jax.tree.map(jnp.asarray, params2), jnp.asarray(px), cfg2))
    b = np.asarray(clip_image_embed(
        jax.tree.map(jnp.asarray, params_direct) if not isinstance(
            params_direct, dict) else params_direct, jnp.asarray(px), CFG))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
