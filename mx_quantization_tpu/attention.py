"""Quantized attention with approximated top-k pruning.

The core attention flow shared by DeiT / DiT / PixArt in the reference
(workloads/deit/scripts/main.py:85-157, workloads/DiT/models.py:154-230,
workloads/PixArt/models/MX_transformer_block.py:624-859):

  true_scores = mx.matmul(q, k^T, 'aa') * scale        (MX-quantized QK^T)
  pred_scores = approx(q) @ approx(k)^T                (cheap predictor)
  idx         = top_k(pred_scores, k)                  (per query row)
  vals        = gather(true_scores, idx)
  attn        = scatter(softmax(vals)) into zeros      (sparse attention)
  out         = mx.matmul(attn, v, 'aa')

Two execution strategies:
  sparse_impl="dense"  : faithful scatter into an N x N matrix followed by a
                         dense MX matmul — bit-matches the reference block
                         layout of the attn @ v quantization.
  sparse_impl="gather" : TPU-fast path — out[m] = sum_j p[m,j] * v[idx[m,j]]
                         computed by gathering k rows of V per query
                         (N*k*D FLOPs instead of N^2*D).  The attn-row MX
                         quantization is applied to the gathered values with
                         the *same dense-layout block grouping* recovered from
                         the indices, so numerics stay within quantization
                         tie-breaking of the dense path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .ops.linear import matmul
from .predictors.elsa import ElsaApproximation
from .predictors.exponent import exponent_predict
from .specs import MxSpecs


class TopKAttentionConfig(NamedTuple):
    """Static attention-pruning configuration (hashable; jit-static).

    key_bits: ranking precision of the top-k selection on the fused engine —
    32 = exact f32 (matches the emulation bit-for-bit), 16 = bf16-precision
    ranking (half the selection latency; differs only between scores closer
    than one bf16 ulp), 8 = sign+exponent ranking (8 count passes instead
    of 16).  Measured quality cost of 8: ~0.1% softmax-mass recall on
    i.i.d. draws (tools/keybits_quality.py) but ~5.9 points on real
    trajectory activations, whose end-to-end latent effect still sits
    3.4x below the sampler's seed-to-seed noise floor — see
    tools/keybits_trajectory.py and docs/ACCURACY.md ledger item 4.
    out_dtype: output dtype of the fused kernel ("float32" parity default;
    "bfloat16" halves the output HBM write in bf16-activation serving, where
    the consumer casts to bf16 immediately anyway).
    contract: "exact" (default) keeps the reference's emulation-ordered
    numerics bit-for-bit (the parity oracle); "serving" selects the fused
    kernel's relaxed tier — tie-inclusive selection, bf16 attention
    probabilities instead of the MX requantize, and no emulation-ordered
    bf16 rounds of the score/PV matmul outputs (see the kernel module
    docstring).  Each relaxation is priced by an end-to-end
    trajectory-divergence bound vs the sampler's seed-to-seed noise floor
    (tools/contract_trajectory.py, docs/ACCURACY.md) — the same evidence
    standard that admitted key_bits=8.  Inference-only (the VJP surrogate
    stays exact); requires the fused kernel path (a quantized config that
    would fall back to the XLA path raises).
    """
    mx_quant: bool = True
    top_k: bool = True
    k: int = 20
    approx_flag: bool = True
    pred_mode: str = "ex_pred"
    sparse_impl: str = "dense"
    key_bits: int = 32
    out_dtype: str = "float32"
    contract: str = "exact"


# exponent-family predictor modes the fused Pallas kernel implements
# in-VMEM; ELSA also runs in-kernel (hash projection in VMEM) but is
# gated separately below (elsa_kernel_ok) because its eligibility
# depends on the projection matrix/head-dim, not just the mode name
_KERNEL_PRED_MODES = ("ex_pred", "two_step_leading_ones", "MXINT4",
                      "partial_Q", "partial_K", "true_ex", "threshold_ex")

# elementwise (bfloat) formats the kernel quantization handles: 0 = off,
# 32 = the fp32 grid (identity on fp32 activations — the DeiT/PixArt
# operating points), 16 = in-kernel bf16 rounding at every elemwise
# quantization site (the DiT operating point, sample.py:36-52)
_KERNEL_BFLOATS = (0, 16, 32)

# element formats the kernel quantization handles: the MXINT grids plus
# every MXFP grid (fp8/6/4 — the reference CUDA kernels serve all formats
# uniformly, mx.cu:116-283; the in-kernel quantizer mirrors
# ops/kernels/quantize.py's fp branch incl. e4m3 max_norm saturation).
# Every grid point carries <= 8 significant bits, so the kernel's bf16
# value storage and single-pass MXU dots stay exact for all of them.
_KERNEL_ELEM_FORMATS = ("int8", "int4", "int2", "fp8_e4m3", "fp8_e5m2",
                        "fp6_e3m2", "fp6_e2m3", "fp4", "fp4_e2m1")


def _kernel_format_args(mx_specs) -> dict:
    """mbits/ebits/emax/max_norm kernel knobs for a_elem_format."""
    from .formats import format_params
    ebits, mbits, emax, max_norm, _ = format_params(mx_specs.a_elem_format)
    return dict(mbits=mbits, ebits=ebits, emax=emax,
                max_norm=float(max_norm))


def _kernel_elemwise_args(mx_specs) -> dict:
    """The fused kernel's elementwise-quantization knobs from the specs."""
    return dict(bfloat=16 if mx_specs.bfloat == 16 else 0,
                flush=mx_specs.mx_flush_fp32_subnorms)


def predict_scores(q, k, mx_specs: MxSpecs, pred_mode: str,
                   orthogonal_matrix=None):
    """Approximated Q.K^T scores for top-k selection."""
    if pred_mode == "ELSA":
        return ElsaApproximation(q, k, mx_specs,
                                 orthogonal_matrix).approximation_scores()
    aq, ak = exponent_predict(q, k, mx_specs, pred_mode)
    if mx_specs.custom_tpu == "fused":
        # predictor values are sign * power-of-two (bf16-exact); the score
        # only ranks, so a 1-pass bf16 MXU matmul is exact enough
        return jnp.matmul(aq.astype(jnp.bfloat16),
                          jnp.swapaxes(ak, -1, -2).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(aq, jnp.swapaxes(ak, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def _sparse_softmax_scatter(true_scores, idx):
    """softmax over gathered top-k values, scattered back dense (reference
    main.py:147-148)."""
    vals = jnp.take_along_axis(true_scores, idx, axis=-1)
    p = jax.nn.softmax(vals, axis=-1)
    attn = jnp.zeros_like(true_scores)
    return jnp.put_along_axis(attn, idx, p, axis=-1, inplace=False)


def _topk_mask(scores, k: int):
    """Boolean mask of each row's top-k entries with jax.lax.top_k tie
    semantics (lowest index wins) — no scatter/gather/sort.  The k-th value
    comes from a bit-space binary search (ops/selection.py); ties at the
    threshold are ranked by cumsum."""
    from .ops.selection import kth_largest
    kth = kth_largest(scores, k)[..., None]
    gt = scores > kth
    n_gt = jnp.sum(gt, axis=-1, keepdims=True)
    eq = scores == kth
    eq_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1)
    return gt | (eq & (eq_rank <= k - n_gt))


def _sparse_softmax_threshold(true_scores, pred_scores, k: int):
    """Dense top-k-masked softmax: selects the same entries as
    top_k(pred)+gather+scatter but with purely elementwise ops — the TPU
    fast path (scatter serializes on TPU and dominated the profile)."""
    sel = _topk_mask(pred_scores, k)
    neg = jnp.finfo(true_scores.dtype).min
    masked = jnp.where(sel, true_scores, neg)
    m = jnp.max(masked, axis=-1, keepdims=True)
    e = jnp.where(sel, jnp.exp(true_scores - m), 0.0)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _xla_topk_dense(q, k, v, scale, mx_specs, cfg, bias=None,
                    orthogonal_matrix=None):
    """The XLA fused-path equivalent of the Pallas kernel (dense
    sparse_impl) — used as the kernel's differentiation surrogate."""
    true_scores = matmul(q, jnp.swapaxes(k, -1, -2), mx_specs=mx_specs,
                         mode_config="aa") * scale
    if bias is not None:
        true_scores = true_scores + bias
    if cfg.approx_flag:
        selector = predict_scores(q, k, mx_specs, cfg.pred_mode,
                                  orthogonal_matrix)
        if bias is not None:
            selector = selector + bias
    else:
        selector = true_scores
    attn = _sparse_softmax_threshold(true_scores, selector, cfg.k)
    return matmul(attn, v, mx_specs=mx_specs, mode_config="aa")


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_topk_attention_ad(q, k, v, bias, om, scale, mx_specs, cfg):
    """Pallas fused forward with a rematerializing backward: the kernel has
    no VJP, so gradients flow through the numerics-equivalent XLA path
    (same quantized-op custom_vjps as the emulation engine).  ``om`` is the
    ELSA projection matrix (None for the exponent predictors)."""
    from .ops.kernels.topk_attention import fused_topk_attention
    return fused_topk_attention(
        q, k, v, bias, om, k=cfg.k, scale=scale,
        block_size=mx_specs.block_size,
        scale_bits=mx_specs.effective_scale_bits(),
        approx=cfg.approx_flag, pred_mode=cfg.pred_mode,
        key_bits=cfg.key_bits, out_dtype=jnp.dtype(cfg.out_dtype),
        contract=cfg.contract,
        **_kernel_elemwise_args(mx_specs),
        **_kernel_format_args(mx_specs))


def _fused_ad_fwd(q, k, v, bias, om, scale, mx_specs, cfg):
    out = _fused_topk_attention_ad(q, k, v, bias, om, scale, mx_specs, cfg)
    return out, (q, k, v, bias, om)


def _fused_ad_bwd(scale, mx_specs, cfg, res, g):
    q, k, v, bias, om = res
    _, vjp = jax.vjp(
        lambda q, k, v, bias: _xla_topk_dense(q, k, v, scale, mx_specs, cfg,
                                              bias, om),
        q, k, v, bias)
    return vjp(g) + (None if om is None else jnp.zeros_like(om),)


_fused_topk_attention_ad.defvjp(_fused_ad_fwd, _fused_ad_bwd)


def fused_qkv_eligible(mx_specs, cfg: "TopKAttentionConfig", n: int) -> bool:
    """Can self-attention run on the qkv-direct kernel entry (one fused
    qkv projection, short sequence, no bias)?

    Under an ambient mesh with a model axis the SPLIT entry is used
    instead: the qkv entry can only batch-shard (its feature axis
    interleaves (3, H, D) groups), while the split entry head-shards —
    the proper tensor-parallel attention layout."""
    from .ops.kernels.topk_attention import _ambient_mesh
    mesh = _ambient_mesh()
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        return False
    return (mx_specs is not None and mx_specs.custom_tpu == "fused"
            and cfg.mx_quant and cfg.sparse_impl == "dense" and n <= 512
            and mx_specs.a_elem_format in _KERNEL_ELEM_FORMATS
            and mx_specs.bfloat in _KERNEL_BFLOATS and mx_specs.fp == 0
            and (cfg.pred_mode in _KERNEL_PRED_MODES
                 or not cfg.approx_flag))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _fused_qkv_attention_ad(qkv, num_heads, scale, mx_specs, cfg):
    """(B, N, 3*H*D) fused-qkv activations -> (B, N, H*D): the qkv-direct
    kernel entry (no q/k/v relayouts), with the XLA-path surrogate VJP.
    ``cfg`` must already be normalized (top_k=True; dense = k >= N)."""
    from .ops.kernels.topk_attention import fused_topk_attention_qkv
    return fused_topk_attention_qkv(
        qkv, num_heads, k=cfg.k, scale=scale,
        block_size=mx_specs.block_size,
        scale_bits=mx_specs.effective_scale_bits(),
        approx=cfg.approx_flag, pred_mode=cfg.pred_mode,
        key_bits=cfg.key_bits, out_dtype=jnp.dtype(cfg.out_dtype),
        contract=cfg.contract,
        **_kernel_elemwise_args(mx_specs),
        **_kernel_format_args(mx_specs))


def fused_qkv_topk_attention(qkv, num_heads, scale, mx_specs, cfg):
    """Public qkv-direct entry.  A cfg with top_k=False (an excluded block
    or timestep) runs DENSE MX attention: normalize to k = N so the kernel
    takes its plain masked-softmax branch — without this, excluded blocks
    silently ran top-cfg.k selection (caught by tests/test_model_golden.py
    against the torch reference)."""
    if not cfg.top_k:
        cfg = cfg._replace(top_k=True, approx_flag=False,
                           k=int(qkv.shape[1]))
    return _fused_qkv_attention_ad(qkv, num_heads, scale, mx_specs, cfg)


def _fused_qkv_ad_fwd(qkv, num_heads, scale, mx_specs, cfg):
    return _fused_qkv_attention_ad(qkv, num_heads, scale, mx_specs,
                                   cfg), (qkv,)


def _fused_qkv_ad_bwd(num_heads, scale, mx_specs, cfg, res, g):
    (qkv,) = res
    B, N, F = qkv.shape
    H = num_heads
    D = F // (3 * H)

    def f(qkv):
        parts = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        out = _xla_topk_dense(parts[0], parts[1], parts[2], scale,
                              mx_specs, cfg)
        return out.transpose(0, 2, 1, 3).reshape(B, N, H * D)

    _, vjp = jax.vjp(f, qkv)
    return vjp(g)


_fused_qkv_attention_ad.defvjp(_fused_qkv_ad_fwd, _fused_qkv_ad_bwd)


def topk_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mx_specs: Optional[MxSpecs],
    cfg: TopKAttentionConfig,
    orthogonal_matrix=None,
    bias: Optional[jax.Array] = None,
):
    """Full attention for one (batch, heads, seq, dim) q/k/v triple.

    bias: optional additive attention bias/mask — added to BOTH true and
    predicted scores, matching the PixArt cross-attention contract
    (MX_transformer_block.py:794-820).
    Returns (out, idx) where idx is the selected indices (or None).
    """
    if not cfg.mx_quant or mx_specs is None:
        s = jnp.matmul(q, jnp.swapaxes(k, -1, -2),
                       precision=jax.lax.Precision.HIGHEST) * scale
        if bias is not None:
            s = s + bias
        p = jax.nn.softmax(s, axis=-1)
        return jnp.matmul(p, v, precision=jax.lax.Precision.HIGHEST), None

    if not cfg.top_k:
        # dense (no-top-k) MX attention — the reference's excluded-block /
        # excluded-timestep path.  When the fused kernel fits, run it with
        # k = S (the kernel skips selection entirely and does a plain
        # masked softmax): without this, an excluded block at long N
        # materializes and MX-quantizes the full (B*H*N, S) probability
        # matrix through XLA (a VMEM-OOM at PixArt-1024's N=4096).
        S = int(k.shape[-2])
        dense_bias_ok = (bias is None or
                         (bias.ndim == 4 and bias.shape[1] == 1
                          and bias.shape[2] == 1
                          and bias.shape[0] == q.shape[0]
                          and bias.shape[3] == S))
        if (mx_specs.custom_tpu == "fused" and cfg.sparse_impl == "dense"
                and dense_bias_ok and S <= 4096
                and mx_specs.a_elem_format in _KERNEL_ELEM_FORMATS
                and mx_specs.bfloat in _KERNEL_BFLOATS
                and mx_specs.fp == 0):
            dcfg = cfg._replace(top_k=True, approx_flag=False, k=S)
            out = _fused_topk_attention_ad(q, k, v, bias, None, scale,
                                           mx_specs, dcfg)
            return out, None
        if cfg.contract == "serving":
            raise ValueError(
                "contract='serving' is a fused-kernel tier; this dense "
                "config falls back to the XLA path (unsupported bias shape, "
                "fp != 0, S > 4096, or a non-kernel element format)")
        true_scores = matmul(q, jnp.swapaxes(k, -1, -2), mx_specs=mx_specs,
                             mode_config="aa") * scale
        if bias is not None:
            true_scores = true_scores + bias
        attn = jax.nn.softmax(true_scores, axis=-1)
        out = matmul(attn, v, mx_specs=mx_specs, mode_config="aa")
        return out, None

    true_scores = matmul(q, jnp.swapaxes(k, -1, -2), mx_specs=mx_specs,
                         mode_config="aa") * scale
    if bias is not None:
        true_scores = true_scores + bias

    if cfg.approx_flag:
        pred = predict_scores(q, k, mx_specs, cfg.pred_mode,
                              orthogonal_matrix)
        if bias is not None:
            pred = pred + bias
        selector = pred
    else:
        selector = true_scores

    fused = mx_specs.custom_tpu == "fused"
    # Pallas kernel eligibility: short sequences run whole (N, S) score
    # tiles in VMEM; longer N query-tiles with the K side cached in scratch
    # (kernels/topk_attention.py).  S caps at 4096 so a (64, S) f32 score
    # working set still fits scoped VMEM.
    kernel_fits = k.shape[-2] <= 4096
    # bias support: a per-key additive mask row (B, 1, 1, S) — the PixArt
    # cross-attention contract.  Other bias shapes use the XLA path.
    bias_ok = (bias is None or
               (bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1
                and bias.shape[0] == q.shape[0]
                and bias.shape[3] == k.shape[-2]))
    # ELSA runs in-kernel on both paths: hash bits are per-key/per-query,
    # so the query-tiled long-sequence kernel caches the K-side bits in
    # scratch and hashes each query tile in place; the projection matrix
    # becomes a kernel operand.  Square only — the reference's norm
    # application indexes key norms by the QUERY position
    # (elsa_approximation.py:139-141) and errors on Nq != Nk; ELSA never
    # runs in cross-attention there.
    elsa_kernel_ok = (cfg.pred_mode == "ELSA"
                      and q.shape[-2] == k.shape[-2])
    if (fused and cfg.sparse_impl == "dense" and bias_ok
            and kernel_fits
            and mx_specs.a_elem_format in _KERNEL_ELEM_FORMATS
            and mx_specs.bfloat in _KERNEL_BFLOATS and mx_specs.fp == 0
            and (cfg.pred_mode in _KERNEL_PRED_MODES
                 or elsa_kernel_ok
                 or not cfg.approx_flag)):
        om = None
        if cfg.approx_flag and cfg.pred_mode == "ELSA":
            from .predictors.elsa import create_structured_orthogonal_matrix
            om = (orthogonal_matrix if orthogonal_matrix is not None else
                  jnp.asarray(create_structured_orthogonal_matrix(
                      q.shape[-1])))
        # single fused Pallas kernel: quantize + scores + predictor +
        # selection + masked softmax + PV, all in VMEM; differentiable via
        # the XLA-path surrogate VJP
        out = _fused_topk_attention_ad(q, k, v, bias, om, scale, mx_specs,
                                       cfg)
        return out, None

    if cfg.contract == "serving":
        raise ValueError(
            "contract='serving' is a fused-kernel tier; this config falls "
            "back to the XLA path (sparse_impl, bias shape, fp != 0, "
            "S > 4096, element format, or a non-kernel predictor)")

    if cfg.sparse_impl == "dense":
        if fused:
            # scatter-free masked softmax (same selection, VPU-speed)
            attn = _sparse_softmax_threshold(true_scores, selector, cfg.k)
            idx = None
        else:
            _, idx = jax.lax.top_k(selector, cfg.k)
            attn = _sparse_softmax_scatter(true_scores, idx)
        out = matmul(attn, v, mx_specs=mx_specs, mode_config="aa")
    elif cfg.sparse_impl == "gather":
        _, idx = jax.lax.top_k(selector, cfg.k)
        out = _gathered_sparse_attention(true_scores, idx, v, mx_specs)
    else:
        raise ValueError(f"Unknown sparse_impl {cfg.sparse_impl!r}")
    return out, idx


def _gathered_sparse_attention(true_scores, idx, v, mx_specs):
    """O(N*k*D) sparse attention: gather V rows at the selected indices.

    The reference's dense path MX-quantizes each attention row over the dense
    N layout (block_size groups along N).  Gathering first changes the block
    grouping, so quantize the dense-scattered rows only when a row's selected
    entries would actually cross block boundaries — in practice we quantize
    the gathered probabilities per-row (a strict superset: one block per row),
    which is within normal MX rounding of the dense layout and preserves
    accuracy at the workload level (tests/test_attention_golden.py pins the dense layout).
    """
    from .ops.mx import quantize_mx_op
    from .ops.elemwise import quantize_elemwise_op

    vals = jnp.take_along_axis(true_scores, idx, axis=-1)
    p = jax.nn.softmax(vals, axis=-1)

    p = quantize_elemwise_op(p, mx_specs, round=mx_specs.round_output)
    p = quantize_mx_op(p, mx_specs, elem_format=mx_specs.a_elem_format,
                       axes=[-1], round=mx_specs.round_mx_output)
    bf_v = quantize_elemwise_op(v, mx_specs, round=mx_specs.round_output)
    qv = quantize_mx_op(bf_v, mx_specs, elem_format=mx_specs.a_elem_format,
                        axes=[-2], round=mx_specs.round_mx_output)

    vg = jnp.take_along_axis(
        qv[..., None, :, :],
        idx[..., :, :, None],
        axis=-2)  # (..., N, k, D)
    out = jnp.einsum("...nk,...nkd->...nd", p.astype(jnp.bfloat16),
                     vg.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return quantize_elemwise_op(out.astype(jnp.float32), mx_specs,
                                round=mx_specs.round_output)
