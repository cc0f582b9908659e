"""Prequantized serving contract.

1. prequantize_weights must be numerically IDENTICAL to the on-the-fly
   quantized forward (it only moves the idempotent weight quantization
   offline) — in particular it must NOT snap weights the forwards consume
   unquantized (DiT block adaLN modulation, PixArt AdaLayerNormSingle
   projection; reference parity — the reference only quantizes what it
   wraps in mx.Linear, microxscaling/mx/linear.py:276-304).
2. serve_dtype=bfloat16 stores the quantized weights in bf16; every MX grid
   point of the int/fp4/6/8 element formats is exactly representable there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mx_quantization_tpu import finalize_mx_specs
from mx_quantization_tpu.models import (DiTConfig, DiTQuantConfig,
                                        dit_forward, init_dit)
from mx_quantization_tpu.models.pixart import (PixArtConfig,
                                               PixArtQuantConfig,
                                               init_pixart, pixart_forward)
from mx_quantization_tpu.ops.fastquant import quantize_mx_fast
from mx_quantization_tpu.utils.prequantize import (bf16_exact,
                                                   prequantize_weights)

SPECS = dict(w_elem_format="int8", a_elem_format="int8", scale_bits=8,
             block_size=32, bfloat=0, quantize_backprop=False)


def _tiny_dit():
    cfg = DiTConfig(input_size=8, patch_size=2, hidden_size=64, depth=2,
                    num_heads=2, num_classes=10)
    params = init_dit(jax.random.key(0), cfg)
    # zero-init adaLN weights hide quantization of them; randomize
    params["blocks"]["adaLN"]["weight"] = 0.1 * jax.random.normal(
        jax.random.key(1), params["blocks"]["adaLN"]["weight"].shape)
    params["final_layer"]["adaLN"]["weight"] = 0.1 * jax.random.normal(
        jax.random.key(2), params["final_layer"]["adaLN"]["weight"].shape)
    return cfg, params


@pytest.mark.slow
@pytest.mark.parametrize("custom_tpu", ["fused", None])
def test_dit_prequantize_identity(custom_tpu):
    specs = finalize_mx_specs(dict(SPECS, custom_tpu=custom_tpu))
    cfg, params = _tiny_dit()
    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True, k=8,
                          ex_pred=True, pred_mode="ex_pred")
    x = jax.random.normal(jax.random.key(3), (2, 4, 8, 8))
    t = jnp.array([10.0, 990.0])
    y = jnp.array([3, 7])
    out = dit_forward(params, x, t, y, cfg, qcfg)

    q_params, q_specs = prequantize_weights(params, specs)
    qcfg_pq = DiTQuantConfig(mx_specs=q_specs, mx_quant=True, top_k=True,
                             k=8, ex_pred=True, pred_mode="ex_pred")
    out_pq = dit_forward(q_params, x, t, y, cfg, qcfg_pq)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_pq))


def test_dit_prequantize_leaves_block_adaln_alone():
    specs = finalize_mx_specs(dict(SPECS, custom_tpu="fused"))
    _, params = _tiny_dit()
    q_params, _ = prequantize_weights(params, specs)
    np.testing.assert_array_equal(
        np.asarray(params["blocks"]["adaLN"]["weight"]),
        np.asarray(q_params["blocks"]["adaLN"]["weight"]))
    # final-layer adaLN IS consumed quantized -> snapped
    assert not np.array_equal(
        np.asarray(params["final_layer"]["adaLN"]["weight"]),
        np.asarray(q_params["final_layer"]["adaLN"]["weight"]))
    # qkv weights snapped
    assert not np.array_equal(
        np.asarray(params["blocks"]["attn"]["qkv"]["weight"]),
        np.asarray(q_params["blocks"]["attn"]["qkv"]["weight"]))


def test_pixart_prequantize_identity():
    specs = finalize_mx_specs(dict(SPECS, custom_tpu="fused"))
    cfg = PixArtConfig(sample_size=8, patch_size=2, num_attention_heads=2,
                       attention_head_dim=32, num_layers=2,
                       cross_attention_dim=64, caption_channels=32)
    params = init_pixart(jax.random.key(0), cfg)
    qcfg = PixArtQuantConfig(mx_specs=specs, mx_quant=True,
                             self_top_k=True, self_k=8,
                             cross_top_k=True, cross_k=4,
                             pred_mode="ex_pred")
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    ctx = jax.random.normal(jax.random.key(2), (2, 6, 32))
    t = jnp.array([10.0, 500.0])
    out = pixart_forward(params, x, ctx, t, cfg, qcfg)

    q_params, q_specs = prequantize_weights(params, specs)
    qcfg2 = PixArtQuantConfig(mx_specs=q_specs, mx_quant=True,
                              self_top_k=True, self_k=8,
                              cross_top_k=True, cross_k=4,
                              pred_mode="ex_pred")
    out_pq = pixart_forward(q_params, x, ctx, t, cfg, qcfg2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_pq))


@pytest.mark.parametrize("fmt", ["int8", "int4", "fp8_e4m3", "fp8_e5m2",
                                 "fp6_e3m2", "fp6_e2m3", "fp4_e2m1"])
def test_bf16_storage_exact(fmt):
    assert bf16_exact(fmt)
    x = jax.random.normal(jax.random.key(0), (64, 96)) * 100.0
    qf32 = quantize_mx_fast(x, fmt, 32, 8, axis=-1, out_dtype=jnp.float32)
    qbf = quantize_mx_fast(x, fmt, 32, 8, axis=-1, out_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(qf32),
                                  np.asarray(qbf.astype(jnp.float32)))


def test_fp16_not_bf16_exact():
    assert not bf16_exact("fp16")
    specs = finalize_mx_specs(dict(SPECS, w_elem_format="fp16",
                                   custom_tpu="fused"))
    _, params = _tiny_dit()
    q_params, _ = prequantize_weights(params, specs,
                                      serve_dtype=jnp.bfloat16)
    # quantized weights stay f32 (their grid is not bf16-exact) ...
    assert q_params["blocks"]["attn"]["qkv"]["weight"].dtype == jnp.float32
    # ... while unquantized matmul weights still get the serving cast
    assert q_params["blocks"]["adaLN"]["weight"].dtype == jnp.bfloat16


def test_dit_serve_dtype_bf16_close():
    specs = finalize_mx_specs(dict(SPECS, custom_tpu="fused"))
    cfg, params = _tiny_dit()
    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True, k=8,
                          ex_pred=True, pred_mode="ex_pred",
                          activation_dtype="bfloat16")
    x = jax.random.normal(jax.random.key(3), (2, 4, 8, 8))
    t = jnp.array([10.0, 990.0])
    y = jnp.array([3, 7])

    q32, s32 = prequantize_weights(params, specs)
    qbf, sbf = prequantize_weights(params, specs, serve_dtype=jnp.bfloat16)
    assert qbf["blocks"]["attn"]["qkv"]["weight"].dtype == jnp.bfloat16
    assert qbf["blocks"]["adaLN"]["weight"].dtype == jnp.bfloat16
    # quantized weights are bit-identical under the bf16 storage
    np.testing.assert_array_equal(
        np.asarray(q32["blocks"]["attn"]["qkv"]["weight"]),
        np.asarray(qbf["blocks"]["attn"]["qkv"]["weight"]
                   .astype(jnp.float32)))

    o32 = dit_forward(q32, x, t, y, cfg,
                      DiTQuantConfig(mx_specs=s32, mx_quant=True, top_k=True,
                                     k=8, ex_pred=True, pred_mode="ex_pred",
                                     activation_dtype="bfloat16"))
    obf = dit_forward(qbf, x, t, y, cfg,
                      DiTQuantConfig(mx_specs=sbf, mx_quant=True, top_k=True,
                                     k=8, ex_pred=True, pred_mode="ex_pred",
                                     activation_dtype="bfloat16"))
    # only the unquantized (adaLN/timestep-MLP/patch-embed) matmuls move,
    # by bf16 rounding of weights whose outputs were already bf16-truncated
    np.testing.assert_allclose(np.asarray(o32), np.asarray(obf),
                               rtol=0.1, atol=0.15)
