"""The three EXACT reference operating points on the fused engine.

Round-1 verdict: the fused path could not run DiT's published specs
(bfloat=16, /root/reference/workloads/DiT/scripts/sample.py:36-52) or
PixArt-alpha's (mx_flush_fp32_subnorms=True, bfloat=32,
text_local_inference_alpha.py:108-124) — benches silently substituted
bfloat=0 / flush off.  These tests pin that the literal reference spec
dicts (a) pass every fast-path gate, (b) agree with the bit-exact
emulation engine, and (c) run through the fused Pallas attention kernel.

Tolerance note: bfloat=16 rounding on the fast path (bf16_round_half_away)
is BIT-EXACT with the emulation's half-away rounding, so the linear/matmul
comparisons are strict; the attention-kernel comparisons keep the usual
tiny tolerance for the kernel's transposed softmax accumulation order
(same as tests/test_fused_attention_kernel.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mx_quantization_tpu.ops import linear, matmul, quantize_mx
from mx_quantization_tpu.ops.fastquant import (fused_eligible,
                                               quantize_mx_fast)
from mx_quantization_tpu.workloads.deit import default_mx_specs
from mx_quantization_tpu.workloads.dit import dit_mx_specs
from mx_quantization_tpu.workloads.pixart import pixart_mx_specs

DEIT = default_mx_specs()          # bfloat=32
DIT = dit_mx_specs()               # bfloat=16
PIXART = pixart_mx_specs()         # bfloat=32 + flush_fp32_subnorms


def rand(*shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)


@pytest.mark.parametrize("specs", [DEIT, DIT, PIXART],
                         ids=["deit", "dit", "pixart"])
def test_operating_points_fast_path_eligible(specs):
    assert fused_eligible(specs, specs.a_elem_format, specs.w_elem_format)


def test_flush_fastquant_matches_emulation():
    """mx_flush_fp32_subnorms on the float-domain fast path == emulation,
    including blocks whose max is fp32-subnormal (flushed to zero)."""
    rng = np.random.RandomState(3)
    x = rng.randn(8, 64).astype(np.float32)
    x[0, :32] *= 1e-41          # whole block subnormal -> flushed
    x[1, :32] *= 1e-41
    x[1, 0] = 1e-37             # one normal value -> block NOT flushed
    x[2, 32:] = 0.0             # zero block (flush is a no-op)
    x = jnp.asarray(x)
    got = np.asarray(quantize_mx_fast(x, "int8", 32, 8, flush=True),
                     np.float32)
    want = np.asarray(quantize_mx(x, 8, "int8", axes=[-1], block_size=32,
                                  flush_fp32_subnorms=True))
    np.testing.assert_array_equal(got, want)
    # and the flushed blocks really are zero
    assert (got[0, :32] == 0).all()
    assert not (got[1, :32] == 0).all()


def test_flush_pallas_kernel_matches_emulation():
    from mx_quantization_tpu.ops.kernels.quantize import mx_quantize_pallas
    rng = np.random.RandomState(4)
    x = rng.randn(16, 64).astype(np.float32)
    x[3, :32] *= 1e-40
    x = jnp.asarray(x)
    got = np.asarray(mx_quantize_pallas(x, "int8", 32, 8, flush=True),
                     np.float32)
    want = np.asarray(quantize_mx(x, 8, "int8", axes=[-1], block_size=32,
                                  flush_fp32_subnorms=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("specs", [DIT, PIXART], ids=["dit", "pixart"])
def test_linear_fused_equals_ref_at_operating_point(specs):
    x, w, b = rand(16, 64, seed=4), rand(32, 64, seed=5), rand(32, seed=6)
    out_f = np.asarray(linear(x, w, b, mx_specs=specs))
    out_r = np.asarray(linear(x, w, b, mx_specs=specs.replace(
        custom_tpu="ref")))
    # bf16_round_half_away is bit-exact with the emulation's bfloat=16
    np.testing.assert_allclose(out_f, out_r, rtol=1e-6, atol=1e-6)


def test_matmul_fused_equals_ref_with_flush():
    a = rand(2, 16, 64, seed=7)
    b = rand(2, 64, 16, seed=8)
    # plant a subnormal-max contraction block in each operand
    a = a.at[0, :, :32].multiply(1e-41)
    b = b.at[0, :32, :].multiply(1e-41)
    out_f = matmul(a, b, mx_specs=PIXART, mode_config="aa")
    out_r = matmul(a, b, mx_specs=PIXART.replace(custom_tpu="ref"),
                   mode_config="aa")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)


def _kernel_vs_xla(specs, seed, bias=None):
    """Run the fused Pallas kernel and the (numerics-equivalent) XLA fused
    path at the given specs; return both outputs."""
    from mx_quantization_tpu.attention import (TopKAttentionConfig,
                                               _xla_topk_dense,
                                               topk_attention)
    q = rand(1, 2, 64, 64, seed=seed)
    k = rand(1, 2, 64, 64, seed=seed + 1)
    v = rand(1, 2, 64, 64, seed=seed + 2)
    cfg = TopKAttentionConfig(mx_quant=True, top_k=True, k=12,
                              approx_flag=True, pred_mode="ex_pred")
    out_k, idx = topk_attention(q, k, v, 0.125, specs, cfg, bias=bias)
    assert idx is None, "did not dispatch to the fused kernel"
    out_x = _xla_topk_dense(q, k, v, 0.125, specs, cfg, bias)
    return np.asarray(out_k, np.float32), np.asarray(out_x, np.float32)


def test_attention_kernel_dispatches_at_dit_operating_point():
    out_k, out_x = _kernel_vs_xla(DIT, seed=10)
    np.testing.assert_allclose(out_k, out_x, rtol=2e-5, atol=2e-5)


def test_attention_kernel_dispatches_at_pixart_operating_point():
    out_k, out_x = _kernel_vs_xla(PIXART, seed=20)
    np.testing.assert_allclose(out_k, out_x, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_attention_kernel_flush_blocks_subnormal_v():
    """A V row-block of fp32 subnormals must flush to zero in the kernel's
    PV quantize exactly like the emulation."""
    from mx_quantization_tpu.attention import (TopKAttentionConfig,
                                               topk_attention)
    q = rand(1, 1, 32, 64, seed=30)
    k = rand(1, 1, 32, 64, seed=31)
    v = rand(1, 1, 32, 64, seed=32)
    cfg = TopKAttentionConfig(mx_quant=True, top_k=True, k=8,
                              approx_flag=True, pred_mode="ex_pred")
    out_f, _ = topk_attention(q, k, v, 0.125, PIXART, cfg)
    out_r, _ = topk_attention(q, k, v, 0.125,
                              PIXART.replace(custom_tpu="ref"), cfg)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)


def test_qkv_kernel_eligible_at_operating_points():
    from mx_quantization_tpu.attention import (TopKAttentionConfig,
                                               fused_qkv_eligible)
    cfg = TopKAttentionConfig(mx_quant=True, top_k=True, k=16,
                              approx_flag=True, pred_mode="ex_pred")
    for specs in (DEIT, DIT, PIXART):
        assert fused_qkv_eligible(specs, cfg, 256)


@pytest.mark.slow
def test_dit_model_fused_equals_ref_at_operating_point():
    """End-to-end DiT-debug forward: fused engine vs emulation engine at
    the exact reference spec dict (bfloat=16)."""
    from mx_quantization_tpu.models.dit import (DiT_models, DiTQuantConfig,
                                                dit_forward, init_dit)
    cfg = DiT_models["DiT-debug"](input_size=8)
    params = init_dit(jax.random.key(0), cfg)
    x = 0.1 * jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    t = jnp.full((2,), 500.0)
    y = jnp.asarray([3, 7], jnp.int32)

    def run(specs):
        qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                              k=8, ex_pred=True, pred_mode="ex_pred",
                              exclude_blocks=(1,))
        return np.asarray(dit_forward(params, x, t, y, cfg, qcfg),
                          np.float32)

    out_f = run(DIT)
    out_r = run(DIT.replace(custom_tpu="ref"))
    # fused vs emulation engines at bfloat=16: elementwise rounding is
    # bit-exact; only kernel near-tie selection/accumulation flips remain
    close = np.isclose(out_f, out_r, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.999, close.mean()
    assert abs(out_f.mean() - out_r.mean()) < 1e-4
