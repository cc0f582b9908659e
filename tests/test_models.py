"""Model-level tests: DeiT and DiT forward shapes, quantized vs fp proximity,
block gating rules, CFG."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mx_quantization_tpu import finalize_mx_specs
from mx_quantization_tpu.models import (DiT_models, DiTConfig, DiTQuantConfig,
                                        VitConfig, VitQuantConfig, dit_forward,
                                        dit_forward_with_cfg, init_dit,
                                        init_vit, vit_forward)

SPECS = finalize_mx_specs(dict(
    w_elem_format="int8", a_elem_format="int8", scale_bits=8, block_size=32,
    bfloat=0, quantize_backprop=False))

TINY_VIT = VitConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                     num_heads=2, num_classes=10)


@pytest.mark.slow
def test_vit_forward_fp32():
    params = init_vit(jax.random.key(0), TINY_VIT)
    x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    qcfg = VitQuantConfig(mx_quant=False)
    out = vit_forward(params, x, TINY_VIT, qcfg)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_vit_forward_quantized_topk_close_to_fp():
    params = init_vit(jax.random.key(0), TINY_VIT)
    x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    fp = vit_forward(params, x, TINY_VIT, VitQuantConfig(mx_quant=False))
    # N = 5 tokens (4 patches + cls): use k=4
    qcfg = VitQuantConfig(mx_specs=SPECS, mx_quant=True, top_k=True, k=4,
                          pred_mode="ex_pred")
    q = vit_forward(params, x, TINY_VIT, qcfg)
    assert q.shape == fp.shape
    # random init logits are small; just require same argmax topology mostly
    assert np.isfinite(np.asarray(q)).all()
    rel = np.abs(np.asarray(q) - np.asarray(fp)).max() / (
        np.abs(np.asarray(fp)).max() + 1e-9)
    assert rel < 1.0  # quantized output in the same ballpark


def test_vit_block_gating():
    qcfg = VitQuantConfig(mx_specs=SPECS, mx_quant=True, top_k=True, k=5,
                          exclude_blocks=(3,), exclude_block_type="MXINT4",
                          pred_mode="ex_pred")
    depth = 12
    cfg_last = qcfg.block_attn_cfg(11, depth)
    assert not cfg_last.top_k  # block 11 always dense (reference main.py:282)
    cfg_excl = qcfg.block_attn_cfg(3, depth)
    assert cfg_excl.pred_mode == "MXINT4"
    cfg_norm = qcfg.block_attn_cfg(1, depth)
    assert cfg_norm.top_k and cfg_norm.pred_mode == "ex_pred"


TINY_DIT = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                     hidden_size=64, depth=2, num_heads=2, num_classes=10)


@pytest.mark.slow
def test_dit_forward_and_cfg():
    params = init_dit(jax.random.key(0), TINY_DIT)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    t = jnp.array([10.0, 500.0])
    y = jnp.array([1, 2])
    out = dit_forward(params, x, t, y, TINY_DIT, DiTQuantConfig())
    assert out.shape == (2, 8, 8, 8)  # learn_sigma doubles channels
    out_cfg = dit_forward_with_cfg(params, x, t, y, TINY_DIT,
                                   DiTQuantConfig(), cfg_scale=4.0)
    assert out_cfg.shape == (2, 8, 8, 8)


@pytest.mark.slow
def test_dit_quantized_topk():
    params = init_dit(jax.random.key(0), TINY_DIT)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    t = jnp.array([10.0, 500.0])
    y = jnp.array([1, 2])
    qcfg = DiTQuantConfig(mx_specs=SPECS, mx_quant=True, top_k=True, k=8,
                          ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=(1,), exclude_timesteps=(0,))
    out = dit_forward(params, x, t, y, TINY_DIT, qcfg, timestep_idx=5)
    assert out.shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    # exclude_timesteps: at excluded step, top_k must be off for all blocks
    c = qcfg.block_attn_cfg(0, timestep_idx=0)
    assert not c.top_k
    c = qcfg.block_attn_cfg(1, timestep_idx=5)
    assert not c.top_k  # excluded block


def test_dit_factories():
    cfg = DiT_models["DiT-S/8"]()
    assert cfg.depth == 12 and cfg.hidden_size == 384


def test_dit_sampling_tiny():
    from mx_quantization_tpu.diffusion import create_diffusion
    params = init_dit(jax.random.key(0), TINY_DIT)
    diff = create_diffusion("4", learn_sigma=True)
    assert diff.num_timesteps == 4

    def model(x, t, y):
        return dit_forward(params, x, t, y, TINY_DIT, DiTQuantConfig())

    out = diff.p_sample_loop(model, (2, 4, 8, 8), jax.random.key(2),
                             model_kwargs={"y": jnp.array([1, 2])},
                             jit_step=False)
    assert out.shape == (2, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
