"""Smoke tests for the extended model zoo (DeiT-III, CaiT, ResMLP)."""

import numpy as np

import jax
import jax.numpy as jnp

from mx_quantization_tpu import finalize_mx_specs
from mx_quantization_tpu.models.vit import VitQuantConfig
from mx_quantization_tpu.models.zoo import (CaitConfig, Deit3Config,
                                            ResMlpConfig, cait_forward,
                                            deit3_forward, init_cait,
                                            init_deit3, init_resmlp,
                                            resmlp_forward)
import pytest

pytestmark = pytest.mark.slow  # heavy sweep module: fast lane skips it

SPECS = finalize_mx_specs(dict(
    w_elem_format="int8", a_elem_format="int8", scale_bits=8, block_size=32,
    quantize_backprop=False))


def test_deit3():
    cfg = Deit3Config(img_size=32, patch_size=16, embed_dim=64, depth=2,
                      num_heads=2, num_classes=10)
    params = init_deit3(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    out = deit3_forward(params, x, cfg, VitQuantConfig(mx_quant=False))
    assert out.shape == (2, 10)
    qcfg = VitQuantConfig(mx_specs=SPECS, mx_quant=True, top_k=True, k=4)
    outq = deit3_forward(params, x, cfg, qcfg)
    assert np.isfinite(np.asarray(outq)).all()


def test_resmlp():
    cfg = ResMlpConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                       num_classes=10)
    params = init_resmlp(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    out = resmlp_forward(params, x, cfg)
    assert out.shape == (2, 10)
    outq = resmlp_forward(params, x, cfg, mx_specs=SPECS)
    assert np.isfinite(np.asarray(outq)).all()


def test_cait():
    cfg = CaitConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                     depth_token_only=2, num_heads=2, num_classes=10)
    params = init_cait(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    out = cait_forward(params, x, cfg)
    assert out.shape == (2, 10)
    outq = cait_forward(params, x, cfg, mx_specs=SPECS)
    assert np.isfinite(np.asarray(outq)).all()


def test_patchconvnet():
    from mx_quantization_tpu.models.zoo import (PatchConvNetConfig,
                                                init_patchconvnet,
                                                patchconvnet_forward)
    cfg = PatchConvNetConfig(img_size=32, embed_dim=64, depth=2,
                             num_classes=10)
    params = init_patchconvnet(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    out = patchconvnet_forward(params, x, cfg)
    assert out.shape == (2, 10)
    outq = patchconvnet_forward(params, x, cfg, mx_specs=SPECS)
    assert np.isfinite(np.asarray(outq)).all()
