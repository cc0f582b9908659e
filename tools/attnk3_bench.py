"""Round-3 selection-cost attack on the fused top-k attention kernel.

Mirrors the PRODUCTION trans-layout pipeline (ops/kernels/topk_attention.py
_score_select_output) and ablates the selection machinery:

  prod  : production fused_topk_attention entry (baseline)
  v1    : count passes in f32 value-space (no i32 keys for the search)
  v2    : count via MXU ones-matvec on bf16 indicators
  v3    : tie-rank via log-shift cumsum instead of the (S,S) tri matmul
  v4    : softmax drop-a-where + positive-value attn quantize + folded scales
  v5    : all of the above

Every variant must be BIT-IDENTICAL to prod on random inputs (checked).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mx_quantization_tpu.ops.kernels.topk_attention import (
    _bf16_round, _exp_sign_approx, _mono_keys, _prep_side, _quant_axis0,
    _round_up, fused_topk_attention)

B, H, N, D = 16, 16, 256, 72
S = N
K = 154
BS, MBITS, SB = 32, 8, 8
SCALE = D ** -0.5
CELLS = 4
G = B * H
BF = 16  # bfloat=16 operating point
_IMIN = -2147483648


def _keys8_f32(s_sel):
    """Top-8-bit monotone bucket of f32 scores, materialized as f32 values
    in [-128, 127]: h = bits >> 24; key8 = h >= 0 ? h : -129 - h."""
    b = jax.lax.bitcast_convert_type(s_sel, jnp.int32)
    h = jax.lax.shift_right_arithmetic(b, 24)
    k8 = jnp.where(h >= 0, h, -129 - h)
    return k8.astype(jnp.float32)


def _count_f32(ind):
    return jnp.sum(ind, axis=0, keepdims=True)


def _kth_f32(keys_f32, k, lo_init, hi_init, n_iters, count=None):
    """Bisection in f32 value space: keys are small integers stored f32.
    Returns (kth (1,N) f32, n_gt (1,N) f32) with the cnt_hi carry."""
    Ncols = keys_f32.shape[1]
    lo = jnp.full((1, Ncols), jnp.int32(lo_init))
    hi = jnp.full((1, Ncols), jnp.int32(hi_init))
    cnt_hi = jnp.zeros((1, Ncols), jnp.float32)
    one = jnp.ones_like(keys_f32)
    zero = jnp.zeros_like(keys_f32)
    count = count or _count_f32

    def body(_, state):
        lo, hi, cnt_hi = state
        mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
        ind = jnp.where(keys_f32 > mid.astype(jnp.float32), one, zero)
        cnt = count(ind)
        up = cnt >= k
        return (jnp.where(up, mid + 1, lo), jnp.where(up, hi, mid),
                jnp.where(up, cnt_hi, cnt))

    lo, hi, cnt_hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi, cnt_hi))
    return lo.astype(jnp.float32), cnt_hi


def _cumsum_rank(eq_f32):
    """Inclusive cumsum of eq down the sublane (key) axis via log shifts."""
    return jax.lax.cumsum(eq_f32, axis=0)


def _cell(q_nd, k_nd, v_nd, o_ref, c, mode):
    if "noprep" in mode:
        # plain bf16 operands, no MX quantize (WRONG numerics - isolation)
        Dp = _round_up(D, BS)

        def prep(x):
            xt = x.T
            return jnp.concatenate(
                [xt, jnp.zeros((Dp - D, N), jnp.bfloat16)], axis=0)
        qv, kv = prep(q_nd), prep(k_nd)
        aq, ak = qv, kv
        v_q = v_nd
    else:
        qv, aq = _prep_side(q_nd, BS, MBITS, SB, D, True, "ex_pred",
                            side="q", bfloat=BF)
        kv, ak = _prep_side(k_nd, BS, MBITS, SB, D, True, "ex_pred",
                            side="k", bfloat=BF)
        v32 = v_nd.astype(jnp.float32)
        v32 = _bf16_round(v32)
        v_q, _ = _quant_axis0(v32, BS, MBITS, SB)

    dn = (((0,), (0,)), ((), ()))
    s_true = jax.lax.dot_general(kv, qv, dn,
                                 preferred_element_type=jnp.float32)
    s_true = _bf16_round(s_true) * SCALE
    if "nopred" in mode:
        s_sel = s_true   # isolation: skip the predictor matmul
    else:
        s_sel = jax.lax.dot_general(ak, aq, dn,
                                    preferred_element_type=jnp.float32)

    neg = jnp.full((S, N), -3.0e38, jnp.float32)

    if "nosel" in mode:
        sel = s_sel > neg
        kth = None
        masked = jnp.where(sel, s_true, neg)
        m = jnp.max(masked, axis=0, keepdims=True)
        ex = ((s_true - m) * 1.0009765625 if "noexp" in mode
              else jnp.exp(s_true - m))
        e = jnp.where(sel, ex, jnp.zeros_like(s_true))
        attn_t = e / jnp.sum(e, axis=0, keepdims=True)
        attn_t = _bf16_round(attn_t)
        if "noaq" in mode:
            at_q = attn_t.astype(jnp.bfloat16)
        else:
            at_q, _ = _quant_axis0(attn_t, BS, MBITS, SB)
        out = jax.lax.dot_general(at_q, v_q, dn,
                                  preferred_element_type=jnp.float32)
        o_ref[c] = _bf16_round(out).astype(jnp.bfloat16)
        return
    if "vm" in mode:
        # i32 keys (cheap h-form), count via MXU ones-matvec on a bf16
        # indicator (mask -> bf16 select); optional unroll
        b = jax.lax.bitcast_convert_type(s_sel, jnp.int32)
        h = jax.lax.shift_right_arithmetic(b, 24)
        keys_i = jnp.where(h >= 0, h, -129 - h)
        one_b = jnp.ones((S, N), jnp.bfloat16)
        zero_b = jnp.zeros((S, N), jnp.bfloat16)
        ones_row = jnp.ones((8, S), jnp.bfloat16)
        lo = jnp.full((1, N), jnp.int32(-128))
        hi = jnp.full((1, N), jnp.int32(127))
        cnt_hi = jnp.zeros((1, N), jnp.int32)

        def body(state):
            lo, hi, cnt_hi = state
            mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
            if "mxc" in mode:
                ind = (keys_i > mid).astype(jnp.float32
                                            ).astype(jnp.bfloat16)
                cnt = jax.lax.dot_general(
                    ones_row, ind, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32
                )[:1].astype(jnp.int32)
            else:
                cnt = jnp.sum((keys_i > mid).astype(jnp.int32), axis=0,
                              keepdims=True)
            up = cnt >= K
            return (jnp.where(up, mid + 1, lo), jnp.where(up, hi, mid),
                    jnp.where(up, cnt_hi, cnt))

        state = (lo, hi, cnt_hi)
        if "unroll" in mode:
            for _ in range(8):
                state = body(state)
        else:
            state = jax.lax.fori_loop(0, 8, lambda _, s: body(s), state)
        lo, hi, cnt_hi = state
        kth_i, n_gt = lo, cnt_hi.astype(jnp.float32)
        gt = keys_i > kth_i
        eq = keys_i == kth_i
    elif "nocount" in mode:
        # skip the bisection entirely (WRONG selection - cost isolation)
        b = jax.lax.bitcast_convert_type(s_sel, jnp.int32)
        h = jax.lax.shift_right_arithmetic(b, 24)
        keys_i = jnp.where(h >= 0, h, -129 - h)
        kth_i = jnp.zeros((1, N), jnp.int32)
        n_gt = jnp.zeros((1, N), jnp.float32)
        gt = keys_i > kth_i
        eq = keys_i == kth_i
    elif "v1" in mode:
        keys = _keys8_f32(s_sel)
        kth, n_gt = _kth_f32(keys, K, -128, 127, 8)
        gt = keys > kth
        eq = keys == kth
    else:
        keys = jax.lax.shift_right_arithmetic(_mono_keys(s_sel), 24)
        from mx_quantization_tpu.ops.kernels.topk_attention import _kth_keys
        kth_i, n_gt_i = _kth_keys(keys, K, n_iters=8, lo_init=-128,
                                  hi_init=127)
        kth, n_gt = kth_i, n_gt_i.astype(jnp.float32)
        gt = keys > kth_i
        eq = keys == kth_i

    if "norank" in mode:
        rank = jnp.zeros((S, N), jnp.float32)  # WRONG - cost isolation
    elif "v3" in mode:
        one = jnp.ones((S, N), jnp.float32)
        zero = jnp.zeros((S, N), jnp.float32)
        rank = _cumsum_rank(jnp.where(eq, one, zero))
    else:
        tri = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) <=
               jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
               ).astype(jnp.float32).astype(jnp.bfloat16)
        rank = jax.lax.dot_general(
            tri, jnp.where(eq, jnp.ones((S, N), jnp.float32),
                           jnp.zeros((S, N), jnp.float32)
                           ).astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    sel = gt | (eq & (rank <= (K - n_gt)))

    if "v4" in mode:
        masked = jnp.where(sel, s_true, neg)
        m = jnp.max(masked, axis=0, keepdims=True)
        e = jnp.exp(masked - m)   # exp(-3e38 - m) == +0.0 exactly
        attn_t = e / jnp.sum(e, axis=0, keepdims=True)
        attn_t = _bf16_round(attn_t)
        # positive-value MX quantize with folded scale constants
        xb = attn_t.reshape(S // BS, BS, N)
        bits = jax.lax.bitcast_convert_type(xb, jnp.int32)
        mb = jnp.max(bits, axis=1, keepdims=True)  # attn >= 0: bits==mag
        e8 = jnp.clip((mb >> 23) - 127, -127, 127)
        c1 = jax.lax.bitcast_convert_type(
            ((-e8 + 127 + (MBITS - 2)) << 23).astype(jnp.int32),
            jnp.float32)                       # inv_scale * half
        c2 = jax.lax.bitcast_convert_type(
            ((e8 + 127 - (MBITS - 2)) << 23).astype(jnp.int32),
            jnp.float32)                       # scale / half
        scaled = xb * c1
        q8 = jnp.minimum(jnp.floor(scaled + 0.5),
                         jnp.float32(2 ** (MBITS - 1) - 1))
        at_q = (q8 * c2).reshape(S, N).astype(jnp.bfloat16)
    else:
        masked = jnp.where(sel, s_true, neg)
        m = jnp.max(masked, axis=0, keepdims=True)
        e = jnp.where(sel, jnp.exp(s_true - m), jnp.zeros_like(s_true))
        attn_t = e / jnp.sum(e, axis=0, keepdims=True)
        attn_t = _bf16_round(attn_t)
        at_q, _ = _quant_axis0(attn_t, BS, MBITS, SB)

    out = jax.lax.dot_general(at_q, v_q, dn,
                              preferred_element_type=jnp.float32)
    o_ref[c] = _bf16_round(out).astype(jnp.bfloat16)


def make(mode):
    def kern(q_ref, k_ref, v_ref, o_ref):
        for c in range(CELLS):
            _cell(q_ref[c], k_ref[c], v_ref[c], o_ref, c, mode)

    @jax.jit
    def run(q, k, v):
        return pl.pallas_call(
            kern,
            grid=(G // CELLS,),
            in_specs=[pl.BlockSpec((CELLS, N, D), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((CELLS, N, D), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, N, D), jnp.bfloat16),
        )(q, k, v)

    return run


def timed_chain(fn, q, k, v, n0=8, n1=72, reps=4):
    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    o = fn(q, k, v)
    _ = np.asarray(fetch(o))

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = q
            for _ in range(n):
                o = fn(o, k, v)
            _ = np.asarray(fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n1) - run(n0)) / (n1 - n0)


def main():
    q = jax.random.normal(jax.random.key(0), (G, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (G, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (G, N, D), jnp.bfloat16)

    @jax.jit
    def prod(q, k, v):
        return fused_topk_attention(
            q.reshape(B, H, N, D), k.reshape(B, H, N, D),
            v.reshape(B, H, N, D), k=K, scale=SCALE, approx=True,
            pred_mode="ex_pred", key_bits=8, out_dtype=jnp.bfloat16,
            bfloat=BF).reshape(G, N, D)

    ref = np.asarray(prod(q, k, v), np.float32)
    t = timed_chain(prod, q, k, v)
    print(f"prod: {t*1e6:.0f}us/call", flush=True)

    modes = os.environ.get(
        "MODES", "base,vm+unroll,v4,vm+unroll+v4,nosel,nosel+noaq,nosel+noexp,nosel+nopred,nosel+noprep+nopred+noaq+noexp").split(",")
    for mode in modes:
        fn = make(mode)
        o = np.asarray(fn(q, k, v), np.float32)
        exact = np.array_equal(o, ref)
        md = np.abs(o - ref).max()
        t = timed_chain(fn, q, k, v)
        print(f"{mode}: {t*1e6:.0f}us/call exact={exact} maxdiff={md}",
              flush=True)


if __name__ == "__main__":
    main()
