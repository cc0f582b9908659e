"""Exponent-based Q·K^T approximation predictors.

Re-implements the reference predictor family
(/root/reference/funcs/exponent_based_prediction.py:11-340 and the working
ex_pred variant in microxscaling/examples/deit/exponent_based_prediction.py:
135-178) as pure functions over JAX arrays.  All modes share a common prelude:
Q and K are MX-quantized along the head dim (axis -1), viewed as blocks of
``block_size``, and per-block shared exponents extracted.

Modes:
  ex_pred   : element -> sign(+-1) * 2**shared_exp        (proposed exp-sign)
  partial_Q : Q stays MXINT8, K -> exp-sign
  partial_K : Q -> exp-sign, K stays MXINT8
  two_step_leading_ones (EXION): int8 mantissa -> sum of first+second
              leading-one powers.  NOTE: the reference multiplies by the
              shared exponent VALUE, not 2**exp (exponent_based_prediction.py
              :126-127); we reproduce that behavior bit-for-bit by default
              and offer the corrected 2**exp scaling via ``exact_scale=True``.
  MXINT4    : re-quantize Q,K to MXINT4 (Sanger)
  true_ex   : sign * 2**floor(log2|elem|)  (leading-one of each element)
  threshold_ex: per-element exponent clamped to >= shared_exp - 1

The predictor only needs to *rank* the per-row scores, so on TPU the
approximated operands stay bf16 (all grid points are powers of two times a
sign — exactly representable) and the score matmul runs single-pass on the
MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..formats import FP32_EXPONENT_BIAS
from ..ops.elemwise import floor_log2_int, quantize_elemwise_op
from ..ops.mx import block_view, quantize_mx_op, shared_exponents, unblock_view
from ..specs import MxSpecs

Array = jax.Array


def _pow2f(e: jax.Array) -> jax.Array:
    """2**e for float e (integer-valued, possibly large-negative).  Exact via
    ldexp; preserves reference semantics where 2**-126 etc. appear."""
    return jnp.ldexp(jnp.ones((), jnp.float32), e.astype(jnp.int32))


def _true_exponents(x: Array) -> Array:
    """floor(log2|x|) with zeros mapped to 0 (reference get_true_exponents,
    examples/deit/exponent_based_prediction.py:98-110)."""
    e = floor_log2_int(x).astype(jnp.float32)
    return jnp.where(x == 0, 0.0, e)


class ExponentApproximation:
    """Stateful-looking wrapper matching the reference class layout; all
    methods are pure."""

    def __init__(self, Q: Array, K: Array, mx_specs: MxSpecs):
        self.specs = mx_specs
        self.Q, self.K = Q, K
        bs = mx_specs.block_size

        def mxq(x, fmt=mx_specs.a_elem_format):
            from ..ops.fastquant import bf_fast, fused_eligible, \
                quantize_mx_fast
            if fused_eligible(mx_specs, fmt):
                return quantize_mx_fast(
                    bf_fast(x, mx_specs), fmt, bs,
                    mx_specs.effective_scale_bits(), axis=-1,
                    flush=mx_specs.mx_flush_fp32_subnorms
                ).astype(jnp.float32)
            return quantize_mx_op(
                quantize_elemwise_op(x, mx_specs, round=mx_specs.round_output),
                mx_specs, elem_format=fmt, axes=[-1],
                round=mx_specs.round_mx_output)

        self._mxq = mxq
        self.MX_Q = mxq(Q)
        self.MX_K = mxq(K)
        self.blk_Q, self.len_Q = block_view(self.MX_Q, -1, bs)
        self.blk_K, self.len_K = block_view(self.MX_K, -1, bs)
        method = mx_specs.shared_exp_method
        self.se_Q = shared_exponents(self.blk_Q, method=method, axes=[-1])
        self.se_K = shared_exponents(self.blk_K, method=method, axes=[-1])

    # -- helpers -------------------------------------------------------
    def _unblock(self, q, k):
        ax = self.blk_Q.ndim - 2
        return (unblock_view(q, ax, self.len_Q),
                unblock_view(k, ax, self.len_K))

    @staticmethod
    def _exp_sign(blk, se):
        signs = jnp.where(blk < 0, -1.0, 1.0)
        return signs * _pow2f(jnp.broadcast_to(se, blk.shape))

    # -- modes ---------------------------------------------------------
    def exponent_based_sign(self) -> Tuple[Array, Array]:
        return self._unblock(self._exp_sign(self.blk_Q, self.se_Q),
                             self._exp_sign(self.blk_K, self.se_K))

    def partial_K(self) -> Tuple[Array, Array]:
        return self._unblock(self._exp_sign(self.blk_Q, self.se_Q),
                             self.blk_K)

    def partial_Q(self) -> Tuple[Array, Array]:
        return self._unblock(self.blk_Q,
                             self._exp_sign(self.blk_K, self.se_K))

    def two_step_leading_ones(self, exact_scale: bool = False
                              ) -> Tuple[Array, Array]:
        def approx(blk, se):
            se_x = jnp.broadcast_to(se, blk.shape)
            signs = jnp.sign(blk)
            raw = blk / _pow2f(se_x) * 64.0
            # first leading one (zeros -> -126 like _shared_exponents none)
            l1 = shared_exponents(raw, method="none")
            resid = raw - _pow2f(l1)
            resid = jnp.where(resid < 0, 0.0, resid)
            l2 = shared_exponents(resid, method="none")
            mag = (_pow2f(l1) + _pow2f(l2)) / 64.0
            scale = _pow2f(se_x) if exact_scale else se_x
            return signs * scale * mag
        return self._unblock(approx(self.blk_Q, self.se_Q),
                             approx(self.blk_K, self.se_K))

    def MXINT4(self) -> Tuple[Array, Array]:
        return (self._mxq(self.Q, "int4"), self._mxq(self.K, "int4"))

    def exponent_based_sign_leading_ones(self) -> Tuple[Array, Array]:
        """true_ex: per-element leading-one (examples/deit variant :163-178)."""
        def approx(blk):
            signs = jnp.where(blk < 0, -1.0, 1.0)
            return signs * _pow2f(_true_exponents(blk))
        return self._unblock(approx(self.blk_Q), approx(self.blk_K))

    def exponent_based_threshold_exponent(self) -> Tuple[Array, Array]:
        def approx(blk, se):
            se_x = jnp.broadcast_to(se, blk.shape)
            te = _true_exponents(blk)
            th = jnp.where(te < se_x - 1, se_x - 1, te)
            return jnp.sign(blk) * _pow2f(th)
        return self._unblock(approx(self.blk_Q, self.se_Q),
                             approx(self.blk_K, self.se_K))


def exponent_predict(Q: Array, K: Array, mx_specs: MxSpecs,
                     pred_mode: str = "ex_pred") -> Tuple[Array, Array]:
    """Dispatch table used by the attention modules (matches the workload
    dispatch in workloads/deit/scripts/main.py:106-118)."""
    obj = ExponentApproximation(Q, K, mx_specs)
    if pred_mode == "ex_pred":
        return obj.exponent_based_sign()
    if pred_mode == "partial_Q":
        return obj.partial_Q()
    if pred_mode == "partial_K":
        return obj.partial_K()
    if pred_mode == "two_step_leading_ones":
        return obj.two_step_leading_ones()
    if pred_mode == "MXINT4":
        return obj.MXINT4()
    if pred_mode == "true_ex":
        return obj.exponent_based_sign_leading_ones()
    if pred_mode == "threshold_ex":
        return obj.exponent_based_threshold_exponent()
    raise ValueError(f"Unknown pred_mode {pred_mode!r}")
