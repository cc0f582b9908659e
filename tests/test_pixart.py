"""PixArt-alpha transformer tests: forward shape, quantized top-k self+cross
attention with encoder mask, gating rules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mx_quantization_tpu import finalize_mx_specs
from mx_quantization_tpu.models import (PixArtConfig, PixArtQuantConfig,
                                        init_pixart, pixart_forward)

SPECS = finalize_mx_specs(dict(
    w_elem_format="int8", a_elem_format="int8", scale_bits=8, block_size=32,
    quantize_backprop=False))

TINY = PixArtConfig(num_attention_heads=2, attention_head_dim=32,
                    num_layers=2, sample_size=8, patch_size=2,
                    cross_attention_dim=64, caption_channels=64)


def test_pixart_fp_forward():
    params = init_pixart(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    ctx = jax.random.normal(jax.random.key(2), (2, 6, 64))
    t = jnp.array([100.0, 700.0])
    out = pixart_forward(params, x, ctx, t, TINY, PixArtQuantConfig())
    assert out.shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_pixart_quantized_topk_with_mask():
    params = init_pixart(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    ctx = jax.random.normal(jax.random.key(2), (2, 6, 64))
    t = jnp.array([100.0, 700.0])
    mask = jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], jnp.int32)
    qcfg = PixArtQuantConfig(mx_specs=SPECS, mx_quant=True,
                             self_top_k=True, self_k=8,
                             cross_top_k=True, cross_k=2,
                             ex_pred=True, pred_mode="ex_pred",
                             exclude_blocks=(1,))
    out = pixart_forward(params, x, ctx, t, TINY, qcfg,
                         encoder_attention_mask=mask, timestep_idx=3)
    assert out.shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_pixart_gating_rules():
    qcfg = PixArtQuantConfig(mx_specs=SPECS, mx_quant=True, self_top_k=True,
                             self_k=7, cross_top_k=True, cross_k=3,
                             ex_pred=True, pred_mode="two_step_leading_ones",
                             exclude_blocks=(27,), exclude_blocks_type="ex_pred",
                             exclude_timesteps=(0,))
    c = qcfg.self_attn_cfg(27, timestep_idx=5)
    assert not c.top_k and c.pred_mode == "ex_pred"
    c = qcfg.self_attn_cfg(3, timestep_idx=0)
    assert not c.top_k  # excluded timestep -> dense self attention
    c = qcfg.cross_attn_cfg(3, timestep_idx=0)
    assert c.top_k and not c.approx_flag  # cross keeps top-k on true scores
    c = qcfg.cross_attn_cfg(3, timestep_idx=5)
    assert c.top_k and c.approx_flag


@pytest.mark.slow
def test_pixart_micro_conditioning():
    """alpha-1024 micro-conds: resolution/aspect embeddings change the
    output; sigma (micro_conds=False) ignores them."""
    cfg = PixArtConfig(num_attention_heads=2, attention_head_dim=36,
                       num_layers=1, sample_size=8, patch_size=2,
                       cross_attention_dim=72, caption_channels=64,
                       micro_conds=True)
    assert cfg.use_additional_conditions
    params = init_pixart(jax.random.key(0), cfg)
    assert "res_mlp0" in params["adaln_single"]
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    ctx = jax.random.normal(jax.random.key(2), (2, 6, 64))
    t = jnp.array([100.0, 700.0])
    out_default = pixart_forward(params, x, ctx, t, cfg, PixArtQuantConfig())
    res = jnp.array([[512.0, 512.0], [512.0, 512.0]])
    ar = jnp.array([[2.0], [2.0]])
    out_cond = pixart_forward(params, x, ctx, t, cfg, PixArtQuantConfig(),
                              resolution=res, aspect_ratio=ar)
    assert np.isfinite(np.asarray(out_cond)).all()
    assert not np.allclose(np.asarray(out_default), np.asarray(out_cond))

    # sigma config: same sample_size, conditioning forced off
    sigma_cfg = PixArtConfig(num_attention_heads=2, attention_head_dim=36,
                             num_layers=1, sample_size=8, patch_size=2,
                             cross_attention_dim=72, caption_channels=64,
                             micro_conds=False)
    assert not sigma_cfg.use_additional_conditions
    sp = init_pixart(jax.random.key(0), sigma_cfg)
    assert "res_mlp0" not in sp["adaln_single"]
    a = pixart_forward(sp, x, ctx, t, sigma_cfg, PixArtQuantConfig())
    b = pixart_forward(sp, x, ctx, t, sigma_cfg, PixArtQuantConfig(),
                       resolution=res, aspect_ratio=ar)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_pixart_true_ex_mode():
    params = init_pixart(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(1), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.key(2), (1, 6, 64))
    t = jnp.array([100.0])
    qcfg = PixArtQuantConfig(mx_specs=SPECS, mx_quant=True, self_top_k=True,
                             self_k=4, ex_pred=True, pred_mode="true_ex")
    out = pixart_forward(params, x, ctx, t, TINY, qcfg)
    assert np.isfinite(np.asarray(out)).all()


def test_elsa_cross_attention_raises_clearly():
    """ELSA is square-self-attention-only (the reference's cross-attention
    forward has no ELSA branch and its norm application indexes by query
    position) — a non-square ELSA call must fail with a clear message, not
    an opaque broadcast error."""
    import numpy as np
    import pytest as _pytest

    from mx_quantization_tpu import finalize_mx_specs
    from mx_quantization_tpu.predictors.elsa import ElsaApproximation

    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, quantize_backprop=False))
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, 16, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 8, 64).astype(np.float32))
    with _pytest.raises(ValueError, match="square-self-attention-only"):
        ElsaApproximation(q, k, specs).approximation_scores()
