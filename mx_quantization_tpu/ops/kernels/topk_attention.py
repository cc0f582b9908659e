"""Pallas fused MX top-k attention.

A batch of (batch, head) cells per grid step (16 unrolled cells at the DiT
point — Mosaic pipelines one cell's MXU matmuls against neighbors' VPU
passes): MX-quantize q/k/v, compute true + predictor scores, select each
row's top-k (exact, tie-stable), masked softmax, weigh V — all in VMEM.
This collapses what the XLA path does in ~40 HBM passes over the N x N
score tensors (quantize, predictor matmul, 32-pass k-th binary search,
cumsum, masked softmax, attn quantize, PV matmul) into a single read of
q/k/v and a single write of the output.

Numerics contract (same as attention.topk_attention with sparse_impl="dense"
on the fused path), ``contract="exact"`` tier:
  * q/k MX-quantized per 32-block along the head dim, scores via bf16 MXU
    dot with f32 accumulation (MXINT8 grid points are bf16-exact)
  * predictors, all in-VMEM from the quantized values: ex_pred
    (sign * 2^shared_exp, funcs/exponent_based_prediction.py:135-161),
    EXION two_step_leading_ones (:96-177), Sanger MXINT4 (:179-272),
    partial_Q/partial_K (:274-318), true_ex, threshold_ex (:320-340).
    All verified bit-identical to the XLA path on-chip except
    threshold_ex, whose padded-head-dim dot can flip a near-tie
    (f32 accumulation-order difference, same class as key_bits=16)
  * selection: k-th largest of predictor scores via bit-space binary search
    (exact); ties ranked lowest-index-first like jax.lax.top_k, with the
    rank computed as a triangular-matrix matmul (MXU) instead of a cumsum
  * attn row quantized along N, V along N, PV via bf16 MXU dot

``contract="serving"`` tier (the production-throughput knob, round-4): the
operand quantization, predictor, and threshold search are IDENTICAL to the
exact tier; three emulation-ordering details are relaxed, each priced by an
end-to-end trajectory-divergence measurement against the sampler's
seed-to-seed noise floor (tools/contract_trajectory.py, docs/ACCURACY.md),
the same evidence standard that admitted key_bits=8:
  * tie-INCLUSIVE selection: every key equal to the k-th threshold key is
    kept (sel = keys >= kth) instead of ranking ties lowest-index-first to
    exactly k — the exact tier's selected set is a SUBSET of the serving
    tier's, and the (S, S) tie-rank matmul + eq/rank passes disappear
  * the attention probabilities skip the MX requantize (and its bfloat
    round): softmax output is cast straight to bf16 for the PV dot —
    per-element bf16 precision instead of a per-32-block shared exponent
  * the emulation-ordered bf16 rounds of the score matmul output and the
    PV output are skipped (the f32 values flow through)

Layout notes (Mosaic): the lane (minor) dimension cannot be reshaped into
32-wide blocks, so all quantization places blocks on sublanes: q/k arrive
pre-transposed as (D, N) tiles.  Scores, selection, and softmax run in
TRANSPOSED (S, N) layout (keys on sublanes): the MXU emits the transposed
score matrices for free, per-query reductions become cross-sublane (cheap),
and attn lands PV-ready with no in-register transpose — measured 1.45x on
the kernel (tools/attnk_bench.py `trans` vs `full`).  The only numeric
delta vs the straight layout is the softmax denominator's f32 accumulation
order (near-tie attn-quantize flips at the 2^-9 scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMIN = -2147483648  # python int: pallas kernels must not capture traced consts
_ELSA_THETA = 0.127  # ELSA angle bias (predictors/elsa.py THETA_BIAS)


def _bf16_round(x):
    """Round f32 to the bf16 grid, round="nearest" (half-away): the
    in-kernel bfloat=16 elementwise quantization point (the DiT operating
    point, sample.py:36-52).  Bit-exact with the emulation and the fast-path
    linears' bf16_round_half_away (ops/fastquant.py): add 0x8000 to the
    magnitude bits (ties carry away from zero), truncate; Inf/NaN keep."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    mag = b & 0x7FFFFFFF
    rounded = (mag + 0x8000) & ~0xFFFF
    out_mag = jnp.where(mag >= 0x7F800000, mag, rounded)
    out = out_mag | (b & jnp.int32(_IMIN))
    return jax.lax.bitcast_convert_type(out, jnp.float32)


def _quant_axis0(x, block_size, mbits, scale_bits, flush=False,
                 ebits=0, emax=0, max_norm=0.0):
    """MX-quantize 2D x (K, N) with blocks along axis 0 (sublanes).

    Returns (values bf16, block exponents (K//bs, N) int32).
    flush=True zeroes blocks whose max |x| is fp32-subnormal
    (mx_flush_fp32_subnorms, mx_ops.py:282-283 — the PixArt-alpha
    operating point).

    ebits == 0: int grid (MXINT).  ebits > 0: MXFP grid — private element
    exponent clamped at the format minimum normal, mantissa rounded
    half-away, saturate at max_norm, shared exp offset by the element emax
    (the quantize_mx contract; same math as
    ops/kernels/quantize.py _quantize_block_values_axis0).  Every MXFP
    grid point carries <= 1+mbits significant bits, so the bf16 value
    storage stays exact.  For the fp grids the returned exponents are
    derived from the QUANTIZED values (elemwise rounding can bump the
    block max across a power of two), matching the XLA predictors'
    shared_exponents-of-quantized semantics
    (predictors/exponent.py ExponentApproximation.__init__).
    """
    K, N = x.shape
    nb = K // block_size
    xb = x.reshape(nb, block_size, N)
    bits = jax.lax.bitcast_convert_type(xb, jnp.int32) & 0x7FFFFFFF
    mb = jnp.max(bits, axis=1, keepdims=True)
    if flush:
        xb = jnp.where(mb >= 0x00800000, xb, jnp.zeros_like(xb))
    e = (mb >> 23) - 127 - emax
    scale_emax = 2 ** (scale_bits - 1) - 1
    e = jnp.clip(e, -scale_emax, scale_emax)
    inv_scale = jax.lax.bitcast_convert_type(
        ((-e + 127) << 23).astype(jnp.int32), jnp.float32)
    scale = jax.lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32)
    if ebits == 0:
        half = float(2 ** (mbits - 2))
        qmax = float(2 ** (mbits - 1) - 1)
        scaled = xb * inv_scale * half
        q = jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.5)
        q = jnp.clip(q, -qmax, qmax)
        vals = (q * (1.0 / half) * scale).reshape(K, N).astype(jnp.bfloat16)
        return vals, e.reshape(nb, N)

    scaled = xb * inv_scale
    min_exp = -(2 ** (ebits - 1)) + 2
    sb = jax.lax.bitcast_convert_type(scaled, jnp.int32) & 0x7FFFFFFF
    pe = jnp.maximum((sb >> 23) - 127, min_exp)
    sp_e = jnp.clip(pe - (mbits - 2), -126, 127)
    spacing = jax.lax.bitcast_convert_type(
        ((sp_e + 127) << 23).astype(jnp.int32), jnp.float32)
    inv_spacing = jax.lax.bitcast_convert_type(
        ((-sp_e + 127) << 23).astype(jnp.int32), jnp.float32)
    sm = scaled * inv_spacing
    q = jnp.sign(sm) * jnp.floor(jnp.abs(sm) + 0.5)
    out = jnp.clip(q * spacing, -max_norm, max_norm) * scale
    # predictor exponents from the quantized values (see docstring)
    ob = jax.lax.bitcast_convert_type(out, jnp.int32) & 0x7FFFFFFF
    e2 = (jnp.max(ob, axis=1, keepdims=True) >> 23) - 127
    return (out.reshape(K, N).astype(jnp.bfloat16),
            e2.reshape(nb, N))


def _quant_axis0_pos(x, block_size, mbits, scale_bits, flush=False,
                     ebits=0, emax=0, max_norm=0.0):
    """_quant_axis0 for NON-NEGATIVE inputs (the attention-probability
    rows): skips the sign/abs handling in the round (attn >= 0 always:
    e = exp(...) >= 0, sum > 0) and the lower clip — round-half-away of a
    non-negative value is floor(x + 0.5).  Bit-identical to _quant_axis0
    on non-negative finite inputs and on NaN (floor/min propagate NaN the
    same way); the scaled multiply and output multiply keep the exact
    two-step operation order of the emulation (folding the power-of-two
    pairs into one constant overflows/flushes for extreme block exponents
    where the two-step chain stays finite)."""
    K, N = x.shape
    nb = K // block_size
    xb = x.reshape(nb, block_size, N)
    # keep the sign mask: a sign-carrying NaN (possible via NaN-scale
    # scores) must rank in the block max exactly as in _quant_axis0
    bits = jax.lax.bitcast_convert_type(xb, jnp.int32) & 0x7FFFFFFF
    mb = jnp.max(bits, axis=1, keepdims=True)
    if flush:
        xb = jnp.where(mb >= 0x00800000, xb, jnp.zeros_like(xb))
    e = (mb >> 23) - 127 - emax
    scale_emax = 2 ** (scale_bits - 1) - 1
    e = jnp.clip(e, -scale_emax, scale_emax)
    inv_scale = jax.lax.bitcast_convert_type(
        ((-e + 127) << 23).astype(jnp.int32), jnp.float32)
    scale = jax.lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32)
    if ebits == 0:
        half = float(2 ** (mbits - 2))
        qmax = float(2 ** (mbits - 1) - 1)
        scaled = xb * inv_scale * half
        q = jnp.minimum(jnp.floor(scaled + 0.5), qmax)
        vals = (q * (1.0 / half) * scale).reshape(K, N).astype(jnp.bfloat16)
        return vals, e.reshape(nb, N)

    scaled = xb * inv_scale
    min_exp = -(2 ** (ebits - 1)) + 2
    sb = jax.lax.bitcast_convert_type(scaled, jnp.int32)  # x >= 0
    pe = jnp.maximum((sb >> 23) - 127, min_exp)
    sp_e = jnp.clip(pe - (mbits - 2), -126, 127)
    spacing = jax.lax.bitcast_convert_type(
        ((sp_e + 127) << 23).astype(jnp.int32), jnp.float32)
    inv_spacing = jax.lax.bitcast_convert_type(
        ((-sp_e + 127) << 23).astype(jnp.int32), jnp.float32)
    q = jnp.floor(scaled * inv_spacing + 0.5)
    out = jnp.minimum(q * spacing, max_norm) * scale
    # exponents derived from the quantized values, exactly as in
    # _quant_axis0's fp branch (callers currently discard them — this
    # keeps the two variants interchangeable; unused outputs are DCE'd)
    ob = jax.lax.bitcast_convert_type(out, jnp.int32) & 0x7FFFFFFF
    e2 = (jnp.max(ob, axis=1, keepdims=True) >> 23) - 127
    return (out.reshape(K, N).astype(jnp.bfloat16), e2.reshape(nb, N))


def _exp_sign_approx(qvals, exps, block_size):
    """sign(q) * 2^block_exp as bf16 (the ex_pred operand)."""
    K, N = qvals.shape
    nb = K // block_size
    # element-repeat along sublanes (pltpu.repeat is tile-semantics)
    e_full = jnp.broadcast_to(exps[:, None, :],
                              (nb, block_size, N)).reshape(K, N)
    pw = jax.lax.bitcast_convert_type(
        ((jnp.clip(e_full, -126, 127) + 127) << 23).astype(jnp.int32),
        jnp.float32)
    # full-vector where-operands: Mosaic rejects the i1 relayout needed for
    # replicated scalar branches of a select; compare in f32 (no bf16 cmp)
    return jnp.where(qvals.astype(jnp.float32) < 0, -pw, pw
                     ).astype(jnp.bfloat16)


def _two_step_approx(qvals, exps, block_size):
    """EXION two-step leading-ones predictor operand: sign(q) * se *
    (2^l1 + 2^l2)/64, where l1/l2 are the first/second leading-one
    exponents of the integer mantissa (predictors/exponent.py
    two_step_leading_ones; reference funcs/exponent_based_prediction.py:
    96-177).  Matches the XLA fused path bit-for-bit: f32 arithmetic in
    the library's operation order, then the bf16 operand cast."""
    K, N = qvals.shape
    nb = K // block_size
    e_full = jnp.broadcast_to(exps[:, None, :],
                              (nb, block_size, N)).reshape(K, N)
    inv = jax.lax.bitcast_convert_type(
        ((-jnp.clip(e_full, -127, 127) + 127) << 23).astype(jnp.int32),
        jnp.float32)
    m = qvals.astype(jnp.float32) * inv * 64.0  # integer mantissa

    def lead_pow(x):
        # 2^floor(log2 x) for x >= 0, zeros -> 2^-126 (shared_exponents
        # method="none" zero rule)
        b = jax.lax.bitcast_convert_type(x, jnp.int32)
        # full-vector where branches (Mosaic i1-relayout limitation)
        l = jnp.where(x == 0.0, jnp.full_like(b, -126), (b >> 23) - 127)
        return jax.lax.bitcast_convert_type(
            ((l + 127) << 23).astype(jnp.int32), jnp.float32)

    p1 = lead_pow(jnp.abs(m))
    resid = m - p1  # signed, like the library: negatives clamp to zero
    resid = jnp.where(resid < 0.0, jnp.zeros_like(resid), resid)
    p2 = lead_pow(resid)
    mag = (p1 + p2) / 64.0
    one = jnp.ones_like(m)
    s = jnp.where(m < 0.0, -one, one)
    s = jnp.where(m == 0.0, jnp.zeros_like(m), s)
    return (s * e_full.astype(jnp.float32) * mag).astype(jnp.bfloat16)


def _true_ex_approx(qvals):
    """true_ex: per-element leading-one — sign * 2^floor(log2|q|), with
    zeros mapped to +1.0 exactly like the library (sign(0) -> +1 and
    _true_exponents(0) -> 0; predictors/exponent.py
    exponent_based_sign_leading_ones)."""
    v = qvals.astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(jnp.abs(v), jnp.int32)
    te = jnp.where(v == 0.0, jnp.zeros_like(b), (b >> 23) - 127)
    pw = jax.lax.bitcast_convert_type(
        ((jnp.clip(te, -126, 127) + 127) << 23).astype(jnp.int32),
        jnp.float32)
    return jnp.where(v < 0.0, -pw, pw).astype(jnp.bfloat16)


def _threshold_ex_approx(qvals, exps, block_size):
    """threshold_ex: sign * 2^max(true_exp, shared_exp - 1)
    (predictors/exponent.py exponent_based_threshold_exponent)."""
    K, N = qvals.shape
    nb = K // block_size
    e_full = jnp.broadcast_to(exps[:, None, :],
                              (nb, block_size, N)).reshape(K, N)
    v = qvals.astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(jnp.abs(v), jnp.int32)
    te = jnp.where(v == 0.0, jnp.zeros_like(b), (b >> 23) - 127)
    th = jnp.maximum(te, e_full - 1)
    pw = jax.lax.bitcast_convert_type(
        ((jnp.clip(th, -126, 127) + 127) << 23).astype(jnp.int32),
        jnp.float32)
    one = jnp.ones_like(v)
    sgn = jnp.where(v < 0.0, -one, one)
    sgn = jnp.where(v == 0.0, jnp.zeros_like(v), sgn)
    return (sgn * pw).astype(jnp.bfloat16)


def _kth_keys(keys, k, n_iters=32, lo_init=_IMIN, hi_init=2147483647):
    """Per-COLUMN k-th largest int32 key of ``keys`` (S, N) via binary
    search.  Columns are the query rows of the transposed score layout;
    the per-iteration count is a cross-sublane reduction (cheap on the
    VPU, unlike cross-lane).

    Returns ``(kth, n_gt)``: n_gt = per-column count of keys strictly
    greater than kth, threaded through the search carry for free —
    invariant cnt_hi == count(keys > hi) (0 at hi_init == the key max;
    the down-branch just computed it), and hi == kth at exit — so the
    caller's separate count pass over (S, N) disappears.

    Short searches (n_iters <= 16, the key_bits 8/16 paths) unroll in
    Python: the iterations are serially dependent anyway, but unrolling
    lets Mosaic software-pipeline each count pass against the previous
    iteration's tail (measured -45us/call at the DiT shape,
    tools/attnk3_bench.py vm+unroll)."""
    N = keys.shape[1]
    lo = jnp.full((1, N), jnp.int32(lo_init))
    hi = jnp.full((1, N), jnp.int32(hi_init))
    cnt_hi = jnp.zeros((1, N), jnp.int32)

    def body(state):
        lo, hi, cnt_hi = state
        mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
        cnt = jnp.sum((keys > mid).astype(jnp.int32), axis=0, keepdims=True)
        up = cnt >= k
        return (jnp.where(up, mid + 1, lo), jnp.where(up, hi, mid),
                jnp.where(up, cnt_hi, cnt))

    state = (lo, hi, cnt_hi)
    if n_iters <= 16:
        for _ in range(n_iters):
            state = body(state)
        lo, hi, cnt_hi = state
    else:
        lo, hi, cnt_hi = jax.lax.fori_loop(0, n_iters,
                                           lambda _, s: body(s), state)
    return lo, cnt_hi


def _mono_keys(x):
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b >= 0, b, jnp.bitwise_xor(jnp.invert(b), jnp.int32(_IMIN)))


def _mono_keys_top(x, shift):
    """Top (32 - shift) monotone bits directly: equals
    ``_mono_keys(x) >> shift`` (arithmetic) in one fewer full-size pass.
    Derivation: with h = bits >> shift, the negative branch
    (INTMIN | (~b & 0x7FFFFFFF)) >> shift simplifies to
    -(1 << (31 - shift)) - 1 - h."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    h = jax.lax.shift_right_arithmetic(b, shift)
    return jnp.where(h >= 0, h, (-(1 << (31 - shift)) - 1) - h)


def _topk_attn_kernel(*refs, block_size, mbits, scale_bits, k, scale,
                      s_valid, d_valid, approx, pred_mode, key_bits, cells,
                      out_dtype, has_bias, bfloat, flush,
                      ebits=0, emax=0, max_norm=0.0, relaxed=False):
    """``cells`` (batch*head) cells per grid step; q (cells, N, D),
    k/v (cells, S, D), optional bias (cells, 1, S), out (cells, N, D).

    q/k transpose to (D, N), f32 casts, and head-dim block padding all
    happen IN-VMEM here — cheaper than the HBM layout copies an XLA-side
    swapaxes/pad/astype materializes, and batching cells amortizes the
    per-grid-step pipeline overhead.
    """
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    i = 3
    b_ref = p_ref = None
    if has_bias:
        b_ref = refs[i]; i += 1
    if approx and pred_mode == "ELSA":
        p_ref = refs[i]; i += 1
    o_ref = refs[i]
    for c in range(cells):
        _one_cell(q_ref[c], k_ref[c], v_ref[c],
                  None if b_ref is None else b_ref[c], o_ref, c,
                  block_size=block_size, mbits=mbits, scale_bits=scale_bits,
                  k=k, scale=scale, s_valid=s_valid, d_valid=d_valid,
                  approx=approx, pred_mode=pred_mode, key_bits=key_bits,
                  out_dtype=out_dtype, bfloat=bfloat, flush=flush,
                  ebits=ebits, emax=emax, max_norm=max_norm, relaxed=relaxed,
                  proj_mat=None if p_ref is None else p_ref[:])


def _prep_side(x_nd, block_size, mbits, scale_bits, d_valid, approx,
               pred_mode="ex_pred", side="q", proj=None, bfloat=0,
               flush=False, ebits=0, emax=0, max_norm=0.0,
               pre_transposed=False):
    """(n, D) tile -> transposed quantized operand (Dp, n) bf16 and, when
    ``approx``, the exp-sign predictor operand (Dp, n) bf16.

    Transpose first (bf16 transposes are fine), cast to f32 after, and pad
    the head dim to the block size on SUBLANES in-VMEM — all cheaper than
    the XLA-side pad+cast HBM round-trips they replace."""
    if pre_transposed:
        # the operand already arrives (Dp, n) — head dim on sublanes,
        # block-padded — from the split-emission qkv projection
        # (models/dit.py _qkv_split_t: the MXU emits the transposed
        # layout for free).  NOTE the XLA-side-relayout variant of this
        # idea was measured END-TO-END SLOWER and reverted
        # (tools/servingk_bench.py dead-end note): only a producer that
        # emits this layout natively may use it.
        Dp, n = x_nd.shape
        xt = x_nd.astype(jnp.float32)
        if bfloat == 16 and x_nd.dtype != jnp.bfloat16:
            xt = _bf16_round(xt)
    else:
        n, D = x_nd.shape
        Dp = _round_up(max(d_valid, 8), block_size)
        already_bf16 = x_nd.dtype == jnp.bfloat16
        xt = x_nd.T.astype(jnp.float32)
        if bfloat == 16 and not already_bf16:
            # bfloat=16 elementwise quantization of the operand before the
            # MX quantize (the fast-path linears' bf_fast contract).
            # SKIPPED when the operand arrived bf16: every bf16 value maps
            # to itself under the half-away round, so the pass is a
            # bit-exact identity (the serving path always feeds bf16)
            xt = _bf16_round(xt)
        if Dp - D:
            xt = jnp.concatenate(
                [xt, jnp.zeros((Dp - D, n), jnp.float32)], axis=0)
    vals, exps = _quant_axis0(xt, block_size, mbits, scale_bits, flush,
                              ebits, emax, max_norm)
    if not approx:
        return vals, None
    if pred_mode == "ELSA":
        # sign-of-projection hash bits as +-1 (predictors/elsa.py
        # compute_hashes), from the quantized values; proj is (bits, Dp)
        # HIGHEST precision: the hash is sign(projection) — single-pass
        # bf16 flips bits wherever |proj| is within bf16 rounding of zero
        # (~1% of bits), which cascades into visibly different top-k sets
        pr = jax.lax.dot_general(proj, vals.astype(jnp.float32),
                                 (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        one = jnp.ones_like(pr)
        return vals, jnp.where(pr >= 0.0, one, -one).astype(jnp.bfloat16)
    if pred_mode == "two_step_leading_ones":
        # sign(0) = 0, so padded head-dim rows contribute 0 — no mask
        return vals, _two_step_approx(vals, exps, block_size)
    if pred_mode == "MXINT4":
        # Sanger: requantize the ORIGINAL side to MXINT4 (the library
        # quantizes self.Q/self.K, not the int8 values); zeros stay zero
        v4, _ = _quant_axis0(xt, block_size, 4, scale_bits, flush)  # int4
        return vals, v4
    if ((pred_mode == "partial_K" and side == "k")
            or (pred_mode == "partial_Q" and side == "q")):
        # the full-mantissa side of the partial modes: the MXINT8 values
        return vals, vals
    if pred_mode == "threshold_ex":
        return vals, _threshold_ex_approx(vals, exps, block_size)
    if pred_mode == "true_ex":
        a = _true_ex_approx(vals)  # +1.0 at zeros -> mask padded rows
    else:
        # ex_pred, and the exp-sign side of partial_Q/partial_K
        a = _exp_sign_approx(vals, exps, block_size)
    if d_valid < Dp:
        # padded head-dim rows would contribute sign(0)*2^e; the reference
        # slices the block padding away (mx_ops.py:164-174) — mask them.
        # (an f32 0/1 row mask avoids a Mosaic i1-relayout limitation)
        drow = jax.lax.broadcasted_iota(jnp.int32, (Dp, n), 0)
        dmask = jnp.minimum(
            jnp.maximum(jnp.float32(d_valid) - drow.astype(jnp.float32),
                        0.0), 1.0).astype(jnp.bfloat16)
        a = a * dmask
    return vals, a


def _one_cell(q_nd, k_nd, v_nd, bias_col, o_ref, c, *, block_size, mbits,
              scale_bits, k, scale, s_valid, d_valid, approx, pred_mode,
              key_bits, out_dtype, proj_mat=None, bfloat=0, flush=False,
              ebits=0, emax=0, max_norm=0.0, relaxed=False):
    fmt = dict(ebits=ebits, emax=emax, max_norm=max_norm)
    qv, aq = _prep_side(q_nd, block_size, mbits, scale_bits, d_valid, approx,
                        pred_mode, side="q", proj=proj_mat, bfloat=bfloat,
                        flush=flush, **fmt)
    kv, ak = _prep_side(k_nd, block_size, mbits, scale_bits, d_valid, approx,
                        pred_mode, side="k", proj=proj_mat, bfloat=bfloat,
                        flush=flush, **fmt)
    v32 = v_nd.astype(jnp.float32)
    if bfloat == 16 and v_nd.dtype != jnp.bfloat16:
        v32 = _bf16_round(v32)
    v_q, _ = _quant_axis0(v32, block_size, mbits, scale_bits, flush, **fmt)
    o_ref[c] = _score_select_output(
        qv, aq, kv, ak, v_q, bias_col, block_size=block_size, mbits=mbits,
        scale_bits=scale_bits, k=k, scale=scale, s_valid=s_valid,
        approx=approx, pred_mode=pred_mode, key_bits=key_bits,
        bfloat=bfloat, flush=flush, relaxed=relaxed, **fmt).astype(out_dtype)


def _score_select_output(qv, aq, kv, ak, v_q, bias_col, *, block_size,
                         mbits, scale_bits, k, scale, s_valid, approx,
                         key_bits, pred_mode="ex_pred", bfloat=0,
                         flush=False, ebits=0, emax=0, max_norm=0.0,
                         q_offset=0, relaxed=False):
    """Quantized operands (Dp, N)/(Dp, S) + v_q (S, D) -> attention (N, D)
    f32: true/pred scores, exact top-k selection, masked softmax, PV.

    The whole pipeline runs in TRANSPOSED (S, N) layout: the MXU emits both
    score matrices pre-transposed for free (swap the dot operands — each
    element is the same sum over the head dim, so values are bit-identical),
    every per-query reduction (search counts, n_gt, softmax max/sum) becomes
    a cross-SUBLANE reduction (much cheaper on the VPU than cross-lane), and
    attn comes out already (S, N) — exactly the layout the PV quantize
    needs, deleting the in-register attn.T (measured 1.45x on the kernel,
    tools/attnk_bench.py `trans`).  Only the softmax denominator's f32
    accumulation ORDER changes vs the XLA path — near-tie attn-quantize
    flips at the 2^-9 scale."""
    N = qv.shape[1]
    S = kv.shape[1]

    dn = (((0,), (0,)), ((), ()))
    s_true = jax.lax.dot_general(kv, qv, dn,
                                 preferred_element_type=jnp.float32)
    if bfloat == 16 and not relaxed:
        # the emulation rounds the matmul OUTPUT to bf16 before the external
        # *scale (attention.py true_scores = matmul(...)*scale); the serving
        # tier lets the f32 accumulator flow through
        s_true = _bf16_round(s_true)
    s_true = s_true * scale
    if bias_col is not None:
        # additive attention bias/mask, one column per cell, added to BOTH
        # the true and predicted scores (MX_transformer_block.py:794-820)
        s_true = s_true + bias_col.astype(jnp.float32)

    neg = jnp.full((S, N), -3.0e38, jnp.float32)
    if approx:
        s_sel = jax.lax.dot_general(ak, aq, dn,
                                    preferred_element_type=jnp.float32)
        if pred_mode == "ELSA":
            # aq/ak are +-1 hash bits; score row r (key r on sublanes) =
            # ||k_{COLUMN index}|| * cos(pi/bits * hamming - theta): the
            # REFERENCE scales by the norm at the QUERY index
            # (elsa_approximation.py:139-141 unsqueeze(-1); square
            # self-attention only), which in the transposed (S, N) layout
            # is a (1, N) row of key norms broadcast over sublanes
            bits = float(aq.shape[0])
            ham = 0.5 * (bits - s_sel)
            ang = jnp.maximum((jnp.pi / bits) * ham - _ELSA_THETA, 0.0)
            kvf = kv.astype(jnp.float32)
            knorm2_row = jax.lax.dot_general(
                jnp.ones((1, kvf.shape[0]), jnp.float32), kvf * kvf,
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            # the query-tiled path sees a (S, QT) slice of queries:
            # select the norms at the tile's global query indices
            # (q_offset may be a traced program_id multiple).  Pad the row
            # by a tile width first: the query padding Np can overrun Sp
            # by up to QT-1 lanes, and an un-padded slice would CLAMP its
            # start — scaling REAL queries of the last tile by the wrong
            # keys' norms (rank-neutral except for flushed all-zero
            # blocks, where the column would degenerate to index ties)
            knorm2_row = jnp.concatenate(
                [knorm2_row, jnp.zeros((1, N), jnp.float32)], axis=1)
            knorm2_row = jax.lax.dynamic_slice(
                knorm2_row, (0, q_offset), (1, N))
            s_sel = jnp.sqrt(knorm2_row) * jnp.cos(ang)
        if bias_col is not None:
            s_sel = s_sel + bias_col.astype(jnp.float32)
    else:
        s_sel = s_true
    if s_valid < S:
        row = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0)
        s_sel = jnp.where(row >= s_valid, neg, s_sel)  # padded key rows

    if k >= s_valid:
        # dense attention (k covers every valid key): skip the search and
        # tie-rank entirely — plain masked softmax over the valid keys
        row = jax.lax.broadcasted_iota(jnp.int32, (S, N), 0)
        sel = row < s_valid
        masked = jnp.where(sel, s_true, neg)
        m = jnp.max(masked, axis=0, keepdims=True)
        # exp(masked - m) == where(sel, exp(s_true - m), 0) exactly: the
        # unselected entries are -3e38, and exp underflows to +0.0 there
        # (one full-size select saved)
        e = jnp.exp(masked - m)
        attn_t = e / jnp.sum(e, axis=0, keepdims=True)
        if relaxed:
            at_q = attn_t.astype(jnp.bfloat16)
        else:
            if bfloat == 16:
                attn_t = _bf16_round(attn_t)
            at_q, _ = _quant_axis0_pos(attn_t, block_size, mbits,
                                       scale_bits, flush, ebits, emax,
                                       max_norm)
        out = jax.lax.dot_general(at_q, v_q, dn,
                                  preferred_element_type=jnp.float32)
        return _bf16_round(out) if bfloat == 16 and not relaxed else out

    if key_bits == 16:
        # bf16-precision ranking: keys collapse to their top 16 bits, the
        # binary search halves to 16 iterations.  Selection differs from
        # exact only between scores closer than one bf16 ulp — noise for an
        # approximate predictor (ties stay exact via the rank machinery).
        # _mono_keys_top fuses the monotone map with the shift.
        keys = _mono_keys_top(s_sel, 16)
        # bracket = the exact key range [-32768, 32767]: the bisection
        # invariant is lo <= kth <= hi, so a 2^16-value interval needs
        # exactly 16 count passes (a loose (-32769, 32768] bracket costs
        # a 17th pass for the same bit-identical kth)
        kth, n_gt = _kth_keys(keys, k, n_iters=16, lo_init=-32768,
                              hi_init=32767)
    elif key_bits == 8:
        # sign+exponent ranking: scores collapse to their top 8 bits
        # (sign + 7 exponent bits), the search drops to 8 iterations
        # (exact 256-value bracket [-128, 127], same invariant note as
        # key_bits=16).  Rows tie whenever two scores share a power-of-two
        # bracket; the rank machinery still picks exactly k, lowest index
        # first.  For the exponent-based predictors (whose scores are sums
        # of ±2^e terms) the measured softmax-mass recall is within noise
        # of exact selection — see tools/keybits_quality.py.
        keys = _mono_keys_top(s_sel, 24)
        kth, n_gt = _kth_keys(keys, k, n_iters=8, lo_init=-128, hi_init=127)
    else:
        keys = _mono_keys(s_sel)
        kth, n_gt = _kth_keys(keys, k)
    if relaxed:
        # serving tier: tie-INCLUSIVE selection — keep every key at the
        # threshold (>= k entries; the exact tier's set is a subset).  The
        # (S, S) tie-rank matmul and the eq/rank/n_gt passes all vanish.
        sel = keys >= kth
    else:
        gt = keys > kth
        eq = keys == kth
        # lowest-index-first tie rank via inclusive lower-triangular matmul:
        # rank[c, r] = sum_{c' <= c} eq[c', r].  The triangle is generated
        # TRANSPOSED (tri[c', c] = c' <= c) and contracted over dim 0 so the
        # (S, S) operand sits in the same streamed matmul position as the
        # old row-layout kernel — putting it on a plain LHS made Mosaic
        # materialize all S^2 values and blow scoped VMEM at S=4096
        # (PixArt-1024).
        tri = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) <=
               jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
               ).astype(jnp.float32).astype(jnp.bfloat16)
        rank = jax.lax.dot_general(
            tri, eq.astype(jnp.float32).astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sel = gt | (eq & (rank <= (k - n_gt).astype(jnp.float32)))

    masked = jnp.where(sel, s_true, neg)
    m = jnp.max(masked, axis=0, keepdims=True)
    # exp(masked - m) == where(sel, exp(s_true - m), 0) exactly: unselected
    # entries are -3e38 and exp underflows to +0.0 (one select saved)
    e = jnp.exp(masked - m)
    attn_t = e / jnp.sum(e, axis=0, keepdims=True)
    if relaxed:
        # serving tier: the attention probabilities keep per-element bf16
        # precision instead of the MX requantize (and skip its bfloat
        # round) — ~8 (S, N) VPU passes deleted
        at_q = attn_t.astype(jnp.bfloat16)
    else:
        if bfloat == 16:
            attn_t = _bf16_round(attn_t)
        # attn (S, N) already has the PV blocks on sublanes — no transpose;
        # probabilities are non-negative, so the sign-free quantizer applies
        at_q, _ = _quant_axis0_pos(attn_t, block_size, mbits, scale_bits,
                                   flush, ebits, emax, max_norm)
    out = jax.lax.dot_general(at_q, v_q, dn,
                              preferred_element_type=jnp.float32)
    return _bf16_round(out) if bfloat == 16 and not relaxed else out


def _topk_attn_kernel_tiled(*refs, block_size, mbits, scale_bits, k, scale,
                            s_valid, d_valid, approx, pred_mode, key_bits,
                            out_dtype, has_bias, bfloat, flush,
                            ebits=0, emax=0, max_norm=0.0, relaxed=False):
    """Query-tiled variant for long sequences (N > 512): grid (G, N/QT);
    each step attends one query tile against the FULL key/value set.  The
    quantized K side (kv, predictor operand, v_q) is computed once per cell
    at tile 0 and cached in VMEM scratch across the query tiles — the TPU
    grid is sequential, so the scratch persists.  For pred_mode="ELSA" the
    K-side scratch holds the +-1 hash bits (bits, Sp) and each query tile
    hashes in place (hash bits are per-key/per-query, so they tile)."""
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    i = 3
    b_ref = p_ref = None
    if has_bias:
        b_ref = refs[i]; i += 1
    if approx and pred_mode == "ELSA":
        p_ref = refs[i]; i += 1
    o_ref, kv_s, ak_s, vq_s = refs[i:]

    proj = None if p_ref is None else p_ref[:]

    @pl.when(pl.program_id(1) == 0)
    def _():
        kv, ak = _prep_side(k_ref[0], block_size, mbits, scale_bits,
                            d_valid, approx, pred_mode, side="k",
                            proj=proj, bfloat=bfloat, flush=flush,
                            ebits=ebits, emax=emax, max_norm=max_norm)
        kv_s[:] = kv
        if approx:
            ak_s[:] = ak
        v32 = v_ref[0].astype(jnp.float32)
        if bfloat == 16 and v_ref.dtype != jnp.bfloat16:
            v32 = _bf16_round(v32)
        vq, _ = _quant_axis0(v32, block_size, mbits, scale_bits, flush,
                             ebits, emax, max_norm)
        vq_s[:] = vq

    qv, aq = _prep_side(q_ref[0], block_size, mbits, scale_bits, d_valid,
                        approx, pred_mode, side="q", proj=proj,
                        bfloat=bfloat, flush=flush,
                        ebits=ebits, emax=emax, max_norm=max_norm)
    bias_col = None if b_ref is None else b_ref[0]
    o_ref[0] = _score_select_output(
        qv, aq, kv_s[:], ak_s[:] if approx else None, vq_s[:], bias_col,
        block_size=block_size, mbits=mbits, scale_bits=scale_bits, k=k,
        scale=scale, s_valid=s_valid, approx=approx, pred_mode=pred_mode,
        key_bits=key_bits, bfloat=bfloat, flush=flush,
        ebits=ebits, emax=emax, max_norm=max_norm, relaxed=relaxed,
        q_offset=pl.program_id(1) * q_ref.shape[1]).astype(out_dtype)


def _qkv_attn_kernel(x_ref, o_ref, *, num_heads, head_dim, block_size,
                     mbits, scale_bits, k, scale, s_valid, approx, pred_mode,
                     key_bits, out_dtype, bfloat, flush,
                     ebits=0, emax=0, max_norm=0.0, rows=1, relaxed=False):
    """``rows`` batch rows per grid step: x (rows, Np, 3*H*D) is the fused
    qkv linear output (feature order (3, H, D)); all rows*H heads are
    attended in-VMEM and the output is written proj-ready as
    (rows, Np, H*D) — no (3, B, H, N, D) HBM relayouts on either side.
    rows is sized so rows*H ~= 16 unrolled cells per step (few-head models
    like DeiT-tiny otherwise under-fill the Mosaic pipeline — same
    measurement as the split entry's 16-cell batching)."""
    fmt = dict(ebits=ebits, emax=emax, max_norm=max_norm)
    H, D = num_heads, head_dim
    for r in range(rows):
        x = x_ref[r]
        outs = []
        for h in range(H):
            q_nd = x[:, h * D:(h + 1) * D]
            k_nd = x[:, (H + h) * D:(H + h + 1) * D]
            v_nd = x[:, (2 * H + h) * D:(2 * H + h + 1) * D]
            qv, aq = _prep_side(q_nd, block_size, mbits, scale_bits, D,
                                approx, pred_mode, side="q", bfloat=bfloat,
                                flush=flush, **fmt)
            kv, ak = _prep_side(k_nd, block_size, mbits, scale_bits, D,
                                approx, pred_mode, side="k", bfloat=bfloat,
                                flush=flush, **fmt)
            v32 = v_nd.astype(jnp.float32)
            if bfloat == 16 and v_nd.dtype != jnp.bfloat16:
                v32 = _bf16_round(v32)
            v_q, _ = _quant_axis0(v32, block_size, mbits, scale_bits,
                                  flush, **fmt)
            outs.append(_score_select_output(
                qv, aq, kv, ak, v_q, None, block_size=block_size,
                mbits=mbits, scale_bits=scale_bits, k=k, scale=scale,
                s_valid=s_valid, approx=approx, pred_mode=pred_mode,
                key_bits=key_bits, bfloat=bfloat, flush=flush,
                relaxed=relaxed, **fmt).astype(out_dtype))
        o_ref[r] = jnp.concatenate(outs, axis=1)


def _qkv_impl(qkv, num_heads: int = 0, *, k: int, scale: float,
              block_size: int = 32, mbits: int = 8,
              scale_bits: int = 8, approx: bool = True,
              pred_mode: str = "ex_pred",
              key_bits: int = 32, out_dtype=jnp.float32,
              bfloat: int = 0, flush: bool = False,
              ebits: int = 0, emax: int = 0, max_norm: float = 0.0,
              relaxed: bool = False):
    """(B, N, 3*H*D) fused-qkv activations -> (B, N, H*D) attention output.

    Self-attention fast path for models with a single fused qkv projection
    (DeiT/DiT): the kernel consumes the linear's output layout directly and
    emits the projection-ready layout, skipping the two HBM relayouts the
    split-q/k/v entry needs.  Numerics identical to fused_topk_attention.
    """
    B, N, F = qkv.shape
    H = num_heads
    D = F // (3 * H)
    Np = _round_up(N, 128)
    if Np != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))

    # batch rows so rows*H ~= 16 unrolled cells per grid step (the split
    # entry's measured sweet spot); few-head models (DeiT-tiny H=3) would
    # otherwise under-fill the Mosaic pipeline
    rows = next((r for r in (16 // max(H, 1) or 1, 4, 2)
                 if r >= 1 and r * H <= 16 and B % r == 0), 1)
    kern = functools.partial(
        _qkv_attn_kernel, num_heads=H, head_dim=D, block_size=block_size,
        mbits=mbits, scale_bits=scale_bits, k=k, scale=scale, s_valid=N,
        approx=approx, pred_mode=pred_mode, key_bits=key_bits,
        out_dtype=out_dtype, bfloat=bfloat, flush=flush,
        ebits=ebits, emax=emax, max_norm=max_norm, rows=rows,
        relaxed=relaxed)
    out = pl.pallas_call(
        kern,
        grid=(B // rows,),
        in_specs=[pl.BlockSpec((rows, Np, F), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, Np, H * D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, H * D), out_dtype),
        interpret=_use_interpret(),
    )(qkv)
    if Np != N:
        out = out[:, :N]
    return out


def _round_up(x, m):
    return (x + m - 1) // m * m


def _use_interpret() -> bool:
    import jax
    return jax.default_backend() != "tpu"


def _split_impl(q, k_, v, bias=None, proj=None, *, k: int,
                scale: float,
                block_size: int = 32, mbits: int = 8,
                scale_bits: int = 8, approx: bool = True,
                pred_mode: str = "ex_pred",
                key_bits: int = 32, out_dtype=jnp.float32,
                bfloat: int = 0, flush: bool = False,
                ebits: int = 0, emax: int = 0, max_norm: float = 0.0,
                relaxed: bool = False):
    """(B, H, N, D) q x (B, H, S, D) k/v -> (B, H, N, D) in ``out_dtype``.

    approx=True selects by the predictor given by pred_mode; False by the
    true scores.  pred_mode="ELSA" additionally needs ``proj``, the
    (bits, D) orthogonal projection matrix (short-sequence path only).
    bias: optional additive key-mask bias of shape (B, 1, 1, S), added to
    both true and predicted scores (the PixArt cross-attention contract).
    N/S are padded to the sequence tile (zero pads quantize to zero and
    padded key columns are excluded from selection); the head dim is padded
    to the MX block in-VMEM.  Inputs keep their dtype (bf16 reads half the
    HBM traffic; the kernel casts to f32 in-register — exact).
    """
    B, H, N, D = q.shape
    S = k_.shape[2]
    Np = _round_up(N, 128)
    Sp = _round_up(S, 128)

    def prep(x, P):
        n = x.shape[2]
        if P != n:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, P - n), (0, 0)))
        return x.reshape(B * H, P, D)

    qp, kp, vp = prep(q, Np), prep(k_, Sp), prep(v, Sp)

    G = B * H
    brow = None
    if bias is not None:
        # transposed-pipeline layout: one (Sp, 1) bias COLUMN per cell
        assert bias.shape == (B, 1, 1, S), bias.shape
        brow = jnp.broadcast_to(bias.reshape(B, 1, S), (B, H, S))
        brow = jnp.pad(brow.reshape(G, S, 1).astype(jnp.float32),
                       ((0, 0), (0, Sp - S), (0, 0)))

    elsa = approx and pred_mode == "ELSA"
    if elsa and proj is None:
        raise ValueError("pred_mode='ELSA' needs the projection matrix")
    if elsa:
        bits = proj.shape[0]
        Dp_e = _round_up(max(D, 8), block_size)
        pmat = jnp.pad(proj.astype(jnp.float32),
                       ((0, 0), (0, Dp_e - proj.shape[1])))
    if Np <= 512 and Sp <= 512:
        # cells per grid step: more unrolled cells let Mosaic pipeline one
        # cell's MXU matmuls against neighbors' VPU passes and amortize
        # per-step overhead — measured 581/565/489 us at 4/8/16 cells
        # (bit-identical outputs); 32+ regresses (VMEM pressure).
        cells = next((c for c in (16, 8, 4, 2) if G % c == 0), 1)
        cells_env = int(__import__("os").environ.get("MXQ_ATTN_CELLS", 0))
        if cells_env and G % cells_env == 0:
            cells = cells_env  # measurement override (tools/kernel_probe.py)
        operands = [qp, kp, vp]
        in_specs = [
            pl.BlockSpec((cells, Np, D), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cells, Sp, D), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cells, Sp, D), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if brow is not None:
            operands.append(brow)
            in_specs.append(pl.BlockSpec((cells, Sp, 1),
                                         lambda g: (g, 0, 0),
                                         memory_space=pltpu.VMEM))
        if elsa:
            operands.append(pmat)
            in_specs.append(pl.BlockSpec((bits, Dp_e), lambda g: (0, 0),
                                         memory_space=pltpu.VMEM))
        kern = functools.partial(
            _topk_attn_kernel, block_size=block_size, mbits=mbits,
            scale_bits=scale_bits, k=k, scale=scale, s_valid=S, d_valid=D,
            approx=approx, pred_mode=pred_mode, key_bits=key_bits,
            cells=cells, out_dtype=out_dtype, has_bias=brow is not None,
            bfloat=bfloat, flush=flush,
            ebits=ebits, emax=emax, max_norm=max_norm, relaxed=relaxed)
        out = pl.pallas_call(
            kern,
            grid=(G // cells,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((cells, Np, D), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, Np, D), out_dtype),
            interpret=_use_interpret(),
        )(*operands)
    else:
        # long sequences: query tiling, K-side cached in scratch (see
        # _topk_attn_kernel_tiled).  QT sized so the (QT, Sp) f32 score
        # working set (~6 live arrays) stays within scoped VMEM.
        QT = 256
        # keep the (QT, Sp)-class f32 working set (~6 live arrays) within
        # the raised 64MB vmem_limit below; QT must stay >= 128 — the
        # transposed selection layout puts QT on LANES, and a sub-128 tile
        # wastes half of every vector op (measured 2007ms vs 1125ms at
        # PixArt-1024 when QT collapsed to 64)
        while QT > 128 and QT * Sp * 4 * 6 > (40 << 20):
            QT //= 2
        Np = _round_up(Np, QT)
        if Np != qp.shape[1]:
            qp = jnp.pad(qp, ((0, 0), (0, Np - qp.shape[1]), (0, 0)))
        Dp = _round_up(max(D, 8), block_size)
        operands = [qp, kp, vp]
        in_specs = [
            pl.BlockSpec((1, QT, D), lambda g, t: (g, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, D), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, D), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if brow is not None:
            operands.append(brow)
            in_specs.append(pl.BlockSpec((1, Sp, 1), lambda g, t: (g, 0, 0),
                                         memory_space=pltpu.VMEM))
        if elsa:
            operands.append(pmat)
            in_specs.append(pl.BlockSpec((bits, Dp_e), lambda g, t: (0, 0),
                                         memory_space=pltpu.VMEM))
        kern = functools.partial(
            _topk_attn_kernel_tiled, block_size=block_size, mbits=mbits,
            scale_bits=scale_bits, k=k, scale=scale, s_valid=S, d_valid=D,
            approx=approx, pred_mode=pred_mode, key_bits=key_bits,
            out_dtype=out_dtype, has_bias=brow is not None,
            bfloat=bfloat, flush=flush,
            ebits=ebits, emax=emax, max_norm=max_norm, relaxed=relaxed)
        out = pl.pallas_call(
            kern,
            grid=(G, Np // QT),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, QT, D), lambda g, t: (g, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, Np, D), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((Dp, Sp), jnp.bfloat16),   # kv
                # predictor operand: +-1 hash bits for ELSA, else the
                # exponent-family operand aligned with kv
                pltpu.VMEM(((bits if elsa else Dp), Sp), jnp.bfloat16),
                pltpu.VMEM((Sp, D), jnp.bfloat16),    # v_q
            ],
            # the transposed selection pipeline's live set at Sp=4096
            # (PixArt-1024) slightly exceeds the 16MB default scoped-VMEM
            # budget; v5e has 128MB of VMEM — raise the cap for this
            # long-sequence path only
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20),
            interpret=_use_interpret(),
        )(*operands)
    out = out.reshape(B, H, Np, D)
    if Np != N:
        out = out[:, :, :N]
    return out


# ----------------------------------------------------------------------
# SPMD execution of the Pallas entries.
#
# Mosaic kernels cannot be auto-partitioned by GSPMD, and
# custom_partitioning cannot host them either — the sanctioned route is
# shard_map (discovered by AOT-compiling the TP-sharded DiT step against a
# v5e:2x2 topology; the CPU-mesh dryrun masks it because interpret-mode
# Pallas lowers to ordinary partitionable HLO).  The kernel is
# embarrassingly parallel over (batch, heads), so under an ambient mesh
# (jax.set_mesh) the entries shard_map themselves: batch over the "data"
# axis, heads over the "model" axis (exactly the head-parallel TP layout —
# the row-parallel proj consumes the head-sharded output with no gather).
# Axes that don't divide fall back to replicated execution inside the
# manual region (correct, redundant compute).
# ----------------------------------------------------------------------


from ..fastquant import ambient_mesh as _ambient_mesh  # noqa: E402


def _axis_for(mesh, name, dim_size):
    from ..fastquant import mesh_auto_axes
    auto = mesh_auto_axes(mesh)
    if name in auto and auto[name] > 1 and dim_size % auto[name] == 0:
        return name
    return None


def _shard_mapped(fn, mesh, in_specs, out_specs):
    import jax as _jax
    try:
        return _jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
    except TypeError:  # older kwarg name
        return _jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)


def fused_topk_attention(q, k_, v, bias=None, proj=None, *, k: int,
                         scale: float,
                         block_size: int = 32, mbits: int = 8,
                         scale_bits: int = 8, approx: bool = True,
                         pred_mode: str = "ex_pred",
                         key_bits: int = 32, out_dtype=jnp.float32,
                         bfloat: int = 0, flush: bool = False,
                         ebits: int = 0, emax: int = 0,
                         max_norm: float = 0.0, contract: str = "exact"):
    """Public split-q/k/v entry — see _split_impl for the math.  Under an
    ambient mesh the call shard_maps over (data -> batch, model -> heads);
    single-device it calls the kernel directly.  ``contract="serving"``
    selects the relaxed tier (module docstring)."""
    impl = functools.partial(
        _split_impl, k=k, scale=scale, block_size=block_size, mbits=mbits,
        scale_bits=scale_bits, approx=approx, pred_mode=pred_mode,
        key_bits=key_bits, out_dtype=out_dtype, bfloat=bfloat, flush=flush,
        ebits=ebits, emax=emax, max_norm=max_norm,
        relaxed=contract == "serving")
    mesh = _ambient_mesh()
    if mesh is None:
        return impl(q, k_, v, bias, proj)

    from jax.sharding import PartitionSpec as P
    db = _axis_for(mesh, "data", q.shape[0])
    mh = _axis_for(mesh, "model", q.shape[1])
    qkv_spec = P(db, mh, None, None)
    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    ops = [q, k_, v]
    if bias is not None:
        in_specs.append(P(db, None, None, None))
        ops.append(bias)
    if proj is not None:
        in_specs.append(P(None, None))
        ops.append(proj)

    def local(*local_ops):
        lq, lk, lv = local_ops[:3]
        i = 3
        lb = lp = None
        if bias is not None:
            lb = local_ops[i]; i += 1
        if proj is not None:
            lp = local_ops[i]
        return impl(lq, lk, lv, lb, lp)

    return _shard_mapped(local, mesh, tuple(in_specs), qkv_spec)(*ops)


def fused_topk_attention_qkv(qkv, num_heads: int, *, k: int, scale: float,
                             block_size: int = 32, mbits: int = 8,
                             scale_bits: int = 8, approx: bool = True,
                             pred_mode: str = "ex_pred",
                             key_bits: int = 32, out_dtype=jnp.float32,
                             bfloat: int = 0, flush: bool = False,
                             ebits: int = 0, emax: int = 0,
                             max_norm: float = 0.0, contract: str = "exact"):
    """Public qkv-direct entry — see _qkv_impl.  Under an ambient mesh it
    shard_maps over batch only (the fused-qkv feature axis interleaves
    (3, H, D) groups, so head sharding does not apply here; model-parallel
    callers should use the split entry — fused_qkv_eligible enforces
    this)."""
    impl = functools.partial(
        _qkv_impl, num_heads=num_heads, k=k, scale=scale,
        block_size=block_size, mbits=mbits, scale_bits=scale_bits,
        approx=approx, pred_mode=pred_mode, key_bits=key_bits,
        out_dtype=out_dtype, bfloat=bfloat, flush=flush,
        ebits=ebits, emax=emax, max_norm=max_norm,
        relaxed=contract == "serving")
    mesh = _ambient_mesh()
    if mesh is None:
        return impl(qkv)
    from jax.sharding import PartitionSpec as P
    db = _axis_for(mesh, "data", qkv.shape[0])
    spec = P(db, None, None)
    return _shard_mapped(impl, mesh, (spec,), spec)(qkv)


# ----------------------------------------------------------------------
# Split-emission qkv entry (round 4, opt-in DiTQuantConfig.qkv_layout=
# "split_t"): the qkv projection emits q/k PRE-TRANSPOSED as
# (2*H*Dp, B, Np) straight from the MXU (models/dit.py _qkv_split_t) and
# v in the standard (B, Np, H*D) layout — the kernel's per-cell in-VMEM
# transposes (measured ~40% of the serving kernel in isolation) disappear
# with NO relayout pass anywhere.  Numerics identical to the fused qkv
# entry (same contractions, same rounding order).
# ----------------------------------------------------------------------
def _qkv_t_attn_kernel(qk_ref, v_ref, o_ref, *, num_heads, head_dim,
                       head_dim_p, block_size, mbits, scale_bits, k, scale,
                       s_valid, approx, pred_mode, key_bits, out_dtype,
                       bfloat, flush, ebits=0, emax=0, max_norm=0.0,
                       rows=1, relaxed=False):
    fmt = dict(ebits=ebits, emax=emax, max_norm=max_norm)
    H, D, Dp = num_heads, head_dim, head_dim_p
    Np = v_ref.shape[1]
    for r in range(rows):
        xv = v_ref[r]
        outs = []
        for h in range(H):
            # qk arrives (2*H*Dp, rows*Np): batch rows flattened onto
            # lanes (Mosaic block shapes can't carve a unit middle dim)
            q_td = qk_ref[h * Dp:(h + 1) * Dp, r * Np:(r + 1) * Np]
            k_td = qk_ref[(H + h) * Dp:(H + h + 1) * Dp,
                          r * Np:(r + 1) * Np]
            v_nd = xv[:, h * D:(h + 1) * D]
            qv, aq = _prep_side(q_td, block_size, mbits, scale_bits, D,
                                approx, pred_mode, side="q", bfloat=bfloat,
                                flush=flush, pre_transposed=True, **fmt)
            kv, ak = _prep_side(k_td, block_size, mbits, scale_bits, D,
                                approx, pred_mode, side="k", bfloat=bfloat,
                                flush=flush, pre_transposed=True, **fmt)
            v32 = v_nd.astype(jnp.float32)
            if bfloat == 16 and v_nd.dtype != jnp.bfloat16:
                v32 = _bf16_round(v32)
            v_q, _ = _quant_axis0(v32, block_size, mbits, scale_bits,
                                  flush, **fmt)
            outs.append(_score_select_output(
                qv, aq, kv, ak, v_q, None, block_size=block_size,
                mbits=mbits, scale_bits=scale_bits, k=k, scale=scale,
                s_valid=s_valid, approx=approx, pred_mode=pred_mode,
                key_bits=key_bits, bfloat=bfloat, flush=flush,
                relaxed=relaxed, **fmt).astype(out_dtype))
        o_ref[r] = jnp.concatenate(outs, axis=1)


def fused_topk_attention_qkv_t(qk_t, v, num_heads: int, *, k: int,
                               scale: float, n_valid: int,
                               block_size: int = 32, mbits: int = 8,
                               scale_bits: int = 8, approx: bool = True,
                               pred_mode: str = "ex_pred",
                               key_bits: int = 32, out_dtype=jnp.float32,
                               bfloat: int = 0, flush: bool = False,
                               ebits: int = 0, emax: int = 0,
                               max_norm: float = 0.0,
                               contract: str = "exact"):
    """qk_t (2*H*Dp, B, Np) pre-transposed q/k + v (B, Np, H*D) ->
    (B, Np, H*D) attention output.  Np must be lane-aligned (128) and
    padded QUERY/KEY columns beyond ``n_valid`` must be zero (they are:
    the projection pads with zeros).  Single-device entry (the split
    entry remains the TP path)."""
    FH, B, Np = qk_t.shape
    H = num_heads
    Dp = FH // (2 * H)
    D = v.shape[2] // H
    rows = next((r for r in (16 // max(H, 1) or 1, 4, 2)
                 if r >= 1 and r * H <= 16 and B % r == 0), 1)
    # flatten (B, Np) onto lanes: a free reshape (adjacent dims), and the
    # only block shape Mosaic accepts (a unit middle dim is rejected)
    qk_flat = qk_t.reshape(FH, B * Np)
    kern = functools.partial(
        _qkv_t_attn_kernel, num_heads=H, head_dim=D, head_dim_p=Dp,
        block_size=block_size, mbits=mbits, scale_bits=scale_bits, k=k,
        scale=scale, s_valid=n_valid, approx=approx, pred_mode=pred_mode,
        key_bits=key_bits, out_dtype=out_dtype, bfloat=bfloat, flush=flush,
        ebits=ebits, emax=emax, max_norm=max_norm, rows=rows,
        relaxed=contract == "serving")
    return pl.pallas_call(
        kern,
        grid=(B // rows,),
        in_specs=[pl.BlockSpec((FH, rows * Np), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, Np, H * D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, Np, H * D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, H * D), out_dtype),
        interpret=_use_interpret(),
    )(qk_flat, v)
