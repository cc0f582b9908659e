"""GELU -> fc2-input quantize producer fusion (round-5; round-4 verdict
ask #2).

gelu_quantize_pallas fuses the MLP activation into the one-pass MX
quantize kernel so the GELU output never exists in HBM.  END-TO-END IT IS
A MEASURED NEGATIVE at the DiT serving point (tools/gelu_fuse_bench.py
--step: 157.4 vs 155.8 ms/step — XLA already epilogue-fuses the GELU into
the fc1 matmul output, so the kernel only adds tanh VPU time to the
quantize pass), kept as a default-off opt-in
(DiTQuantConfig.fuse_gelu=False); these tests pin its numerics and the
wiring in all three model families.

Numerics note: tanh/erfc lower to DIFFERENT approximations inside a
Pallas kernel than in the XLA chain (measured up to ~12 ulp on CPU
interpret), so parity with the unfused chain is exact except for
near-tie quantize flips at block-max/binade boundaries — the assertions
below allow a tiny flip fraction bounded by one grid step.

Reference being replaced: quantize-around-matmul,
/root/reference/microxscaling/mx/linear.py:62-88 with the separate
activation between Mlp linears (/root/reference/workloads/DiT/models.py:232).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mx_quantization_tpu.ops.fastquant import (bf16_round_half_away,
                                               quantize_mx_fast)
from mx_quantization_tpu.ops.kernels.quantize import gelu_quantize_pallas


def _unfused(x, elem_format, bfloat, approximate, flush=False):
    g = jax.nn.gelu(x.astype(jnp.float32), approximate=approximate)
    if bfloat == 16:
        g = bf16_round_half_away(g)
    return quantize_mx_fast(g, elem_format, 32, 8, axis=-1, flush=flush)


def _assert_grid_tie_parity(ref, got, max_flip_frac=1e-3):
    """Equal except a tiny fraction of near-tie grid flips, each bounded
    by ~one grid spacing (relative 0.5 covers every format's coarsest)."""
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    neq = ref != got
    assert neq.mean() <= max_flip_frac, f"flip fraction {neq.mean()}"
    if neq.any():
        d = np.abs(ref[neq] - got[neq])
        mag = np.maximum(np.abs(ref[neq]), np.abs(got[neq]))
        assert (d <= 0.5 * mag + 1e-6).all(), "flip larger than a grid step"


@pytest.mark.parametrize("elem_format", ["int8", "int4", "fp8_e4m3",
                                         "fp4_e2m1"])
@pytest.mark.parametrize("bfloat", [0, 16, 32])
@pytest.mark.parametrize("approximate", [True, False])
def test_gelu_quantize_kernel_matches_unfused(elem_format, bfloat,
                                              approximate):
    x = jax.random.normal(jax.random.key(0), (2, 100, 128),
                          jnp.float32) * 2.0
    ref = _unfused(x, elem_format, bfloat, approximate)
    got = gelu_quantize_pallas(x, elem_format, 32, 8, bfloat=bfloat,
                               approximate=approximate)
    _assert_grid_tie_parity(ref, got)


def test_gelu_quantize_kernel_bf16_input_and_flush():
    x = (jax.random.normal(jax.random.key(1), (4, 64, 96), jnp.float32)
         ).astype(jnp.bfloat16)
    ref = _unfused(x.astype(jnp.float32), "int8", 16, True, flush=True)
    got = gelu_quantize_pallas(x, "int8", 32, 8, bfloat=16, flush=True)
    _assert_grid_tie_parity(ref, got)


def _interpret_gelu_serving(x, specs, approximate=True):
    # CPU stand-in for fastquant.gelu_quantize_serving (which gates on the
    # TPU backend): same kernel, interpret mode
    return gelu_quantize_pallas(
        x, specs.a_elem_format, specs.block_size,
        specs.effective_scale_bits(), flush=specs.mx_flush_fp32_subnorms,
        bfloat=specs.bfloat, approximate=approximate)


def test_dit_serving_forward_with_fusion_matches_unfused(monkeypatch):
    """Wire the fused kernel into the DiT serving forward (as the TPU
    path does with fuse_gelu=True) and pin it against the unfused
    serving forward — identical up to near-tie quantize flips."""
    import dataclasses
    from mx_quantization_tpu.models import dit as dit_mod
    from mx_quantization_tpu.models import (DiTConfig, DiTQuantConfig,
                                            dit_forward, init_dit)
    from mx_quantization_tpu import finalize_mx_specs

    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, bfloat=16, quantize_backprop=False,
        custom_tpu="fused"))
    cfg = DiTConfig(input_size=8, patch_size=2, hidden_size=64, depth=2,
                    num_heads=2, num_classes=10)
    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True, k=8,
                          pred_mode="ex_pred", contract="serving",
                          topk_key_bits=8, fuse_gelu=True)
    params = init_dit(jax.random.key(0), cfg)
    # random-init adaLN gates are zero (vacuous blocks) — randomize
    params = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.key(7), a.shape),
        params)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    t = jnp.array([10.0, 500.0])
    y = jnp.array([3, 7])

    base = np.asarray(dit_forward(
        params, x, t, y, cfg, dataclasses.replace(qcfg, fuse_gelu=False)))
    monkeypatch.setattr(dit_mod, "gelu_quantize_serving",
                        _interpret_gelu_serving)
    fused = np.asarray(dit_forward(params, x, t, y, cfg, qcfg))
    neq = base != fused
    assert neq.mean() < 0.05, f"fused forward diverged: {neq.mean()}"
    np.testing.assert_allclose(base, fused, rtol=0, atol=0.05)


def test_dit_fuse_gelu_flag_off_is_bit_identical(monkeypatch):
    """fuse_gelu=False (the default — measured end-to-end negative) must
    leave the serving forward BIT-identical whether or not the kernel is
    reachable."""
    from mx_quantization_tpu.models import dit as dit_mod
    from mx_quantization_tpu.models import (DiTConfig, DiTQuantConfig,
                                            dit_forward, init_dit)
    from mx_quantization_tpu import finalize_mx_specs

    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, bfloat=16, quantize_backprop=False,
        custom_tpu="fused"))
    cfg = DiTConfig(input_size=8, patch_size=2, hidden_size=64, depth=2,
                    num_heads=2, num_classes=10)
    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True, k=8,
                          pred_mode="ex_pred", contract="serving",
                          topk_key_bits=8)
    assert qcfg.fuse_gelu is False  # the measured-negative default
    params = init_dit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 4, 8, 8))
    t = jnp.array([10.0, 500.0])
    y = jnp.array([3, 7])
    base = np.asarray(dit_forward(params, x, t, y, cfg, qcfg))
    calls = []
    monkeypatch.setattr(
        dit_mod, "gelu_quantize_serving",
        lambda *a, **k: calls.append(1) or _interpret_gelu_serving(*a, **k))
    again = np.asarray(dit_forward(params, x, t, y, cfg, qcfg))
    assert not calls, "fuse_gelu=False must not reach the kernel"
    np.testing.assert_array_equal(base, again)


def test_vit_and_pixart_mlp_fusion_matches_unfused(monkeypatch):
    """Block-level wiring pins for the other two families (the full
    forwards run their blocks inside scan/cond where CPU XLA's thunk
    interpreter rejects bf16 dots produced next to interpret-mode
    pallas; eager block calls exercise the same wiring)."""
    from mx_quantization_tpu.models import vit as vit_mod
    from mx_quantization_tpu.models import pixart as pixart_mod
    from mx_quantization_tpu.models.vit import (VitConfig, init_vit,
                                                vit_mlp)
    from mx_quantization_tpu.models.pixart import (PixArtConfig,
                                                   PixArtQuantConfig,
                                                   init_pixart,
                                                   pixart_block_apply)
    from mx_quantization_tpu import finalize_mx_specs

    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, bfloat=32, quantize_backprop=False,
        custom_tpu="fused"))

    # --- DeiT mlp (erf GELU, bfloat=32) ---
    vcfg = VitConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                     num_heads=2, num_classes=10)
    vparams = init_vit(jax.random.key(0), vcfg)
    bp = jax.tree.map(lambda a: a[0], vparams["blocks"])
    h = jax.random.normal(jax.random.key(5), (2, 17, 64))
    base = np.asarray(vit_mlp(bp["mlp"], h, specs, contract="serving"))
    calls = []
    monkeypatch.setattr(
        vit_mod, "gelu_quantize_serving",
        lambda x, s, approximate: calls.append(approximate)
        or _interpret_gelu_serving(x, s, approximate))
    fused = np.asarray(vit_mlp(bp["mlp"], h, specs, contract="serving",
                               fuse_gelu=True))
    assert calls == [False], "DeiT must fuse the erf (non-approx) GELU"
    np.testing.assert_allclose(base, fused, rtol=0, atol=0.05)
    # exact tier and the default (fuse_gelu=False) never reach the kernel
    calls.clear()
    vit_mlp(bp["mlp"], h, specs, contract="exact", fuse_gelu=True)
    vit_mlp(bp["mlp"], h, specs, contract="serving")
    assert not calls

    # --- PixArt block (tanh GELU, flush specs) ---
    pcfg = PixArtConfig(sample_size=8, num_layers=2, num_attention_heads=2,
                        attention_head_dim=32, caption_channels=64)
    pspecs = specs.replace(mx_flush_fp32_subnorms=True)
    pq = PixArtQuantConfig(mx_specs=pspecs, mx_quant=True,
                           self_top_k=True, self_k=8, pred_mode="ex_pred",
                           contract="serving", topk_key_bits=8)
    pparams = init_pixart(jax.random.key(2), pcfg)
    pbp = jax.tree.map(lambda a: a[0], pparams["blocks"])
    x = jax.random.normal(jax.random.key(3), (2, 16, 64))
    ctx = jax.random.normal(jax.random.key(4), (2, 16, 64)) * 0.02
    t6 = jax.random.normal(jax.random.key(6), (2, 6 * 64))
    # per-block attn cfgs built the way pixart_forward does
    self_cfg = pq.self_attn_cfg(0, None)
    cross_cfg = pq.cross_attn_cfg(0, None)
    base = np.asarray(pixart_block_apply(
        pbp, x, ctx, t6, pcfg, pspecs, self_cfg, cross_cfg))
    pcalls = []
    monkeypatch.setattr(
        pixart_mod, "gelu_quantize_serving",
        lambda x, s, approximate: pcalls.append(approximate)
        or _interpret_gelu_serving(x, s, approximate))
    fused = np.asarray(pixart_block_apply(
        pbp, x, ctx, t6, pcfg, pspecs, self_cfg, cross_cfg,
        fuse_gelu=True))
    assert pcalls == [True], "PixArt must fuse the tanh GELU"
    np.testing.assert_allclose(base, fused, rtol=0, atol=0.05)
