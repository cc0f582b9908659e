"""Fused (custom_tpu="fused") fast path vs bit-exact emulation.

The fast path must produce the SAME quantized grids as the emulation for
normal-range fp32 inputs (fp32 subnormals flush on the fast path — TPU
arithmetic semantics — and are excluded here; the emulation remains the
bit-parity oracle against the reference).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mx_quantization_tpu import finalize_mx_specs
from mx_quantization_tpu.ops import linear, matmul, quantize_mx
from mx_quantization_tpu.ops.fastquant import (fused_eligible,
                                               quantize_mx_fast)

FUSED = finalize_mx_specs(dict(
    w_elem_format="int8", a_elem_format="int8", scale_bits=8, block_size=32,
    quantize_backprop=False, custom_tpu="fused"))
REF = FUSED.replace(custom_tpu="ref")


def rand(*shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)


@pytest.mark.parametrize("fmt", ["int8", "int4", "int2", "fp8_e5m2",
                                 "fp8_e4m3", "fp6_e3m2", "fp6_e2m3",
                                 "fp4_e2m1"])
@pytest.mark.parametrize("axis", [-1, -2])
def test_fastquant_matches_oracle(fmt, axis):
    x = rand(48, 64, seed=1, scale=3.0)
    got = np.asarray(quantize_mx_fast(x, fmt, 32, 8, axis=axis), np.float32)
    want = np.asarray(quantize_mx(x, 8, fmt, axes=[axis], block_size=32))
    np.testing.assert_array_equal(got, want)


def test_fastquant_extreme_scales():
    # magnitudes across the full normal exponent range, incl. clamp region
    x = rand(8, 64, seed=2) * jnp.asarray(
        np.logspace(-35, 35, 64, dtype=np.float32))
    got = np.asarray(quantize_mx_fast(x, "int8", 32, 8), np.float32)
    want = np.asarray(quantize_mx(x, 8, "int8", axes=[-1], block_size=32))
    np.testing.assert_array_equal(got, want)


def test_fastquant_nondividing_block():
    x = rand(5, 40, seed=3)
    got = np.asarray(quantize_mx_fast(x, "int8", 32, 8), np.float32)
    want = np.asarray(quantize_mx(x, 8, "int8", axes=[-1], block_size=32))
    np.testing.assert_array_equal(got, want)


def test_linear_fused_equals_ref():
    x, w, b = rand(16, 64, seed=4), rand(32, 64, seed=5), rand(32, seed=6)
    out_f = linear(x, w, b, mx_specs=FUSED)
    out_r = linear(x, w, b, mx_specs=REF)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)


def test_matmul_fused_equals_ref():
    a, b = rand(2, 3, 16, 64, seed=7), rand(2, 3, 64, 16, seed=8)
    out_f = matmul(a, b, mx_specs=FUSED, mode_config="aa")
    out_r = matmul(a, b, mx_specs=REF, mode_config="aa")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)


def test_fused_eligibility_gates():
    assert fused_eligible(FUSED, "int8", "int8")
    assert not fused_eligible(REF, "int8", "int8")
    assert fused_eligible(FUSED, "fp8_e4m3", "int8")  # MXFP fast path
    assert not fused_eligible(FUSED, "fp16", "int8")
    # the PixArt-alpha operating point (flush_fp32_subnorms=True) and the
    # DiT operating point (bfloat=16) are both fast-path eligible
    assert fused_eligible(FUSED.replace(mx_flush_fp32_subnorms=True),
                          "int8", "int8")
    assert fused_eligible(FUSED.replace(bfloat=16), "int8", "int8")
    assert not fused_eligible(FUSED.replace(bfloat=12), "int8", "int8")
    assert not fused_eligible(FUSED.replace(fp=16, bfloat=0), "int8", "int8")


@pytest.mark.slow
def test_attention_fused_equals_ref():
    from mx_quantization_tpu.attention import (TopKAttentionConfig,
                                               topk_attention)
    q = rand(1, 2, 32, 64, seed=9)
    k = rand(1, 2, 32, 64, seed=10)
    v = rand(1, 2, 32, 64, seed=11)
    cfg = TopKAttentionConfig(mx_quant=True, top_k=True, k=8,
                              approx_flag=True, pred_mode="ex_pred")
    out_f, _ = topk_attention(q, k, v, 0.125, FUSED, cfg)
    out_r, _ = topk_attention(q, k, v, 0.125, REF, cfg)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)


def test_topk_mask_matches_topk_with_ties():
    from mx_quantization_tpu.attention import _topk_mask
    import jax
    # power-of-two predictor-like scores produce many exact ties
    rng = np.random.RandomState(12)
    s = jnp.asarray(
        2.0 ** rng.randint(-3, 3, (4, 16, 40)) *
        np.sign(rng.randn(4, 16, 40)).astype(np.float32))
    k = 7
    mask = np.asarray(_topk_mask(s, k))
    assert (mask.sum(-1) == k).all()
    _, idx = jax.lax.top_k(s, k)
    ref = np.zeros(s.shape, bool)
    np.put_along_axis(ref, np.asarray(idx), True, axis=-1)
    np.testing.assert_array_equal(mask, ref)


@pytest.mark.parametrize("shape,dtype", [
    ((8, 256, 64), jnp.float32),     # fused-attention style (K=64)
    ((300, 1152), jnp.bfloat16),     # DiT hidden, bf16 serving input
    ((64, 4608), jnp.float32),       # fc2 input width
])
def test_pallas_quantize_kernel_matches_xla(shape, dtype):
    """mx_quantize_pallas (interpret on CPU) == quantize_mx_fast, bit-equal."""
    from mx_quantization_tpu.ops.fastquant import quantize_mx_fast
    from mx_quantization_tpu.ops.kernels.quantize import mx_quantize_pallas
    x = rand(*shape, seed=21, scale=3.0).astype(dtype)
    for fmt in ("int8", "fp8_e4m3", "fp6_e2m3"):
        ref = quantize_mx_fast(x, fmt, 32, 8, axis=-1)
        got = mx_quantize_pallas(x, fmt, 32, 8)
        np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                      np.asarray(got, np.float32))


def test_quantize_mx_serving_dispatch():
    """quantize_mx_serving matches quantize_mx_fast on every input class
    (kernel-eligible, ragged block tail, non-last axis)."""
    from mx_quantization_tpu.ops.fastquant import (quantize_mx_fast,
                                                   quantize_mx_serving)
    for shape, axis in [((256, 1152), -1), ((16, 72), -1), ((64, 32, 5), 1)]:
        x = rand(*shape, seed=22)
        ref = quantize_mx_fast(x, "int8", 32, 8, axis=axis)
        got = quantize_mx_serving(x, "int8", 32, 8, axis=axis)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.slow
def test_fused_attention_kernel_is_differentiable():
    """Training through the fused Pallas attention must not fail and must
    produce the XLA fused path's gradients (the surrogate-VJP contract).
    Regression: jax.grad through fused_topk_attention raised before the
    custom_vjp wrapper existed."""
    import jax
    from mx_quantization_tpu.attention import (TopKAttentionConfig,
                                               topk_attention)
    q = rand(1, 2, 32, 64, seed=31)
    k = rand(1, 2, 32, 64, seed=32)
    v = rand(1, 2, 32, 64, seed=33)
    cfg = TopKAttentionConfig(mx_quant=True, top_k=True, k=8,
                              approx_flag=True, pred_mode="ex_pred")

    def loss(specs, q, k, v):
        out, _ = topk_attention(q, k, v, 0.125, specs, cfg)
        return jnp.sum(out ** 2)

    gf = jax.grad(loss, argnums=(1, 2, 3))(FUSED, q, k, v)
    gr = jax.grad(loss, argnums=(1, 2, 3))(REF, q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_cross_attention_bias_rect_kv():
    """Rectangular kv + additive key-mask bias routes to the fused kernel
    and matches the reference emulation (the PixArt cross-attention
    contract: bias added to BOTH true and predicted scores, top-k on true
    scores, MX_transformer_block.py:765-859)."""
    B, H, N, S, D = 2, 2, 32, 24, 64
    q = rand(B, H, N, D, seed=41)
    k = rand(B, H, S, D, seed=42)
    v = rand(B, H, S, D, seed=43)
    # key mask: last 4 keys masked with the -10000 bias (reference scale)
    mask = np.ones((B, 1, 1, S), np.float32)
    mask[..., -4:] = 0.0
    bias = jnp.asarray((1.0 - mask) * -10000.0)

    from mx_quantization_tpu.attention import (TopKAttentionConfig,
                                               topk_attention)
    for approx in (False, True):
        cfg = TopKAttentionConfig(mx_quant=True, top_k=True, k=8,
                                  approx_flag=approx, pred_mode="ex_pred")
        out_f, _ = topk_attention(q, k, v, D ** -0.5, FUSED, cfg, bias=bias)
        out_r, _ = topk_attention(q, k, v, D ** -0.5, REF, cfg, bias=bias)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-6)


def test_ln_modulate_quantize_kernel():
    """Producer-side fused LN+modulate+MX-quantize matches the unfused
    composition (dit _ln + modulate + quantize_mx_fast) exactly on CPU."""
    from mx_quantization_tpu.ops.fastquant import quantize_mx_fast
    from mx_quantization_tpu.ops.kernels.quantize import \
        ln_modulate_quantize_pallas
    B, N, C = 2, 50, 96
    x = jax.random.normal(jax.random.key(0), (B, N, C), jnp.float32)
    sh = 0.1 * jax.random.normal(jax.random.key(1), (B, C))
    sc = 0.1 * jax.random.normal(jax.random.key(2), (B, C))

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    ref = quantize_mx_fast(ln * (1 + sc[:, None]) + sh[:, None],
                           "int8", 32, 8, axis=-1)
    out = ln_modulate_quantize_pallas(x, sh, sc)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))

    # bfloat=16 (round 5: the DiT operating point's elementwise quantize
    # rides inside the kernel — serving-tier lnmod fusion eligibility)
    from mx_quantization_tpu.ops.fastquant import bf16_round_half_away
    ref16 = quantize_mx_fast(
        bf16_round_half_away(ln * (1 + sc[:, None]) + sh[:, None]),
        "int8", 32, 8, axis=-1)
    out16 = ln_modulate_quantize_pallas(x, sh, sc, bfloat=16)
    np.testing.assert_array_equal(np.asarray(out16, np.float32),
                                  np.asarray(ref16, np.float32))


def test_prequantized_activations_skips_requantize():
    """With prequantized_activations the fast-path linear consumes the
    producer-quantized input unchanged (idempotent semantics)."""
    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, bfloat=0, quantize_backprop=False,
        custom_tpu="fused"))
    from mx_quantization_tpu.ops.fastquant import quantize_mx_fast
    from mx_quantization_tpu.ops.linear import mx_linear
    x = jax.random.normal(jax.random.key(3), (8, 64), jnp.float32)
    w = 0.1 * jax.random.normal(jax.random.key(4), (32, 64), jnp.float32)
    qx = quantize_mx_fast(x, "int8", 32, 8, axis=-1)
    out_pre = mx_linear(qx.astype(jnp.float32), w, None,
                        specs.replace(prequantized_activations=True))
    out_ref = mx_linear(x, w, None, specs)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_quantize_in_kernel_bfloat16():
    """mx_quantize_pallas(bfloat=16) == bf16_round_half_away then quantize
    (the fused in-kernel elementwise round, serving path at the DiT
    operating point)."""
    from mx_quantization_tpu.ops.fastquant import (bf16_round_half_away,
                                                   quantize_mx_fast,
                                                   quantize_mx_serving)
    from mx_quantization_tpu.ops.kernels.quantize import mx_quantize_pallas
    x = rand(64, 1152, seed=33, scale=2.0)
    want = quantize_mx_fast(bf16_round_half_away(x), "int8", 32, 8)
    got = mx_quantize_pallas(x, "int8", 32, 8, bfloat=16)
    np.testing.assert_array_equal(np.asarray(want, np.float32),
                                  np.asarray(got, np.float32))
    # the serving dispatcher applies the same round on the XLA fallback
    got2 = quantize_mx_serving(x, "int8", 32, 8, bfloat=16)
    np.testing.assert_array_equal(np.asarray(want, np.float32),
                                  np.asarray(got2, np.float32))
