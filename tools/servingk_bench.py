"""Serving-tier kernel variant probe (round 4): with the tie-rank matmul
gone, the MXU sits idle during selection — re-test ideas the EXACT tier
measured as dead ends, plus bf16 VPU passes the serving contract can admit.

Variants (all serving semantics: tie-inclusive selection, bf16 attn,
no emulation rounds; quality deltas belong to tools/contract_trajectory):

  base   : the production serving pipeline (cross-check vs prod entry)
  mxc    : bisection counts via MXU ones-matvec on bf16 indicators
           (round-1 dead end WITH tie-rank on MXU; retest without)
  fscale : fold the *scale pass into the softmax exp argument
  bfsm   : softmax chain (masked/exp/div) in bf16 vector arithmetic
  all    : fscale + bfsm

Run on the TPU: python tools/servingk_bench.py

MEASURED (round 4, one in-run comparison; prod_serving 364us/call):
  base 370 (== prod, cross-check)  mxc 458  fscale 482  bfsm 396
  fscale+bfsm 457
All three ideas are DEAD ENDS even with the MXU idle: the ones-matvec
count still serializes against the VPU compare that builds its
indicator; the folded scale adds a multiply to the exp argument that
costs more than the standalone pass it deletes (Mosaic already fuses
the scale into a neighboring pass); bf16 softmax arithmetic wins
nothing (converted to f32 internally).  Cell-count re-sweep with the
tie-rank VMEM freed (MXQ_ATTN_CELLS env probe, in-run): 16 -> 357us,
24 -> 406, 32 -> 410, 48 -> 370, 64 -> 461 — 16 cells stays optimal.
The serving pipeline as shipped is at its local optimum — further
kernel gains need structural change (e.g. per-key-block score bounds
to skip whole blocks of keys).
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
    _bf16_round, _kth_keys, _mono_keys_top, _prep_side, _quant_axis0,
    fused_topk_attention)

B, H, N, D = 16, 16, 256, 72
S = N
K = 154
BS, MBITS, SB = 32, 8, 8
SCALE = D ** -0.5
CELLS = 16
G = B * H
BF = 16


def _cell(q_nd, k_nd, v_nd, o_ref, c, mode):
    qv, aq = _prep_side(q_nd, BS, MBITS, SB, D, True, "ex_pred",
                        side="q", bfloat=BF)
    kv, ak = _prep_side(k_nd, BS, MBITS, SB, D, True, "ex_pred",
                        side="k", bfloat=BF)
    v_q, _ = _quant_axis0(v_nd.astype(jnp.float32), BS, MBITS, SB)

    dn = (((0,), (0,)), ((), ()))
    s_raw = jax.lax.dot_general(kv, qv, dn,
                                preferred_element_type=jnp.float32)
    s_sel = jax.lax.dot_general(ak, aq, dn,
                                preferred_element_type=jnp.float32)

    keys = _mono_keys_top(s_sel, 24)
    if "mxc" in mode:
        ones_row = jnp.ones((8, S), jnp.bfloat16)
        lo = jnp.full((1, N), jnp.int32(-128))
        hi = jnp.full((1, N), jnp.int32(127))

        def body(state):
            lo, hi = state
            mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
            ind = (keys > mid).astype(jnp.float32).astype(jnp.bfloat16)
            cnt = jax.lax.dot_general(
                ones_row, ind, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:1].astype(jnp.int32)
            up = cnt >= K
            return (jnp.where(up, mid + 1, lo), jnp.where(up, hi, mid))

        state = (lo, hi)
        for _ in range(8):
            state = body(state)
        kth = state[0]
    else:
        kth, _ = _kth_keys(keys, K, n_iters=8, lo_init=-128, hi_init=127)
    sel = keys >= kth

    neg = jnp.full((S, N), -3.0e38, jnp.float32)
    if "bfsm" in mode:
        s_b = (s_raw if "fscale" in mode else s_raw * SCALE
               ).astype(jnp.bfloat16)
        negb = jnp.full((S, N), -3.0e38, jnp.bfloat16)
        masked = jnp.where(sel, s_b, negb)
        m = jnp.max(masked, axis=0, keepdims=True)
        arg = (masked - m)
        if "fscale" in mode:
            arg = arg * jnp.bfloat16(SCALE)
        e = jnp.exp(arg)
        at_q = e / jnp.sum(e, axis=0, keepdims=True)
        at_q = at_q.astype(jnp.bfloat16)
    else:
        s_true = s_raw if "fscale" in mode else s_raw * SCALE
        masked = jnp.where(sel, s_true, neg)
        m = jnp.max(masked, axis=0, keepdims=True)
        arg = masked - m
        if "fscale" in mode:
            arg = arg * SCALE
        e = jnp.exp(arg)
        at_q = (e / jnp.sum(e, axis=0, keepdims=True)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(at_q, v_q, dn,
                              preferred_element_type=jnp.float32)
    o_ref[c] = out.astype(jnp.bfloat16)


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
            interpret=jax.default_backend() != "tpu",
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
            bfloat=BF, contract="serving").reshape(G, N, D)

    ref = np.asarray(prod(q, k, v), np.float32)
    t = timed_chain(prod, q, k, v)
    print(f"prod_serving: {t*1e6:.0f}us/call", flush=True)

    modes = os.environ.get("MODES", "base,mxc,fscale,bfsm,fscale+bfsm"
                           ).split(",")
    for mode in modes:
        fn = make(mode)
        try:
            o = np.asarray(fn(q, k, v), np.float32)
        except Exception as e:
            print(f"{mode}: FAILED {str(e)[:160]}", flush=True)
            continue
        exact = np.array_equal(o, ref)
        md = np.abs(o - ref).max()
        t = timed_chain(fn, q, k, v)
        print(f"{mode}: {t*1e6:.0f}us/call exact={exact} maxdiff={md:.4g}",
              flush=True)


if __name__ == "__main__":
    main()


def probe_pretransposed():
    """Price the in-kernel q/k transposes: feed operands ALREADY in the
    (D, N) transposed layout and skip the transpose inside _prep_side.
    If base-minus-pret is small, the transposed-qkv-emission redesign
    (model-side layout change) isn't worth its complexity."""
    from mx_quantization_tpu.ops.kernels.topk_attention import (
        _quant_axis0, _exp_sign_approx, _round_up)
    Dp = _round_up(D, BS)

    def cell_pret(qt, kt, v_nd, o_ref, c):
        # qt/kt arrive (Dp, N) bf16 — no transpose, no pad
        def quant_side(xt):
            vals, exps = _quant_axis0(xt.astype(jnp.float32), BS, MBITS, SB)
            return vals, _exp_sign_approx(vals, exps, BS)
        qv, aq = quant_side(qt)
        kv, ak = quant_side(kt)
        v_q, _ = _quant_axis0(v_nd.astype(jnp.float32), BS, MBITS, SB)
        dn = (((0,), (0,)), ((), ()))
        s_raw = jax.lax.dot_general(kv, qv, dn,
                                    preferred_element_type=jnp.float32)
        s_sel = jax.lax.dot_general(ak, aq, dn,
                                    preferred_element_type=jnp.float32)
        keys = _mono_keys_top(s_sel, 24)
        kth, _ = _kth_keys(keys, K, n_iters=8, lo_init=-128, hi_init=127)
        sel = keys >= kth
        neg = jnp.full((S, N), -3.0e38, jnp.float32)
        s_true = s_raw * SCALE
        masked = jnp.where(sel, s_true, neg)
        m = jnp.max(masked, axis=0, keepdims=True)
        e = jnp.exp(masked - m)
        at_q = (e / jnp.sum(e, axis=0, keepdims=True)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(at_q, v_q, dn,
                                  preferred_element_type=jnp.float32)
        o_ref[c] = out.astype(jnp.bfloat16)

    def kern(q_ref, k_ref, v_ref, o_ref):
        for c in range(CELLS):
            cell_pret(q_ref[c], k_ref[c], v_ref[c], o_ref, c)

    @jax.jit
    def run(q, k, v):
        return pl.pallas_call(
            kern,
            grid=(G // CELLS,),
            in_specs=[
                pl.BlockSpec((CELLS, Dp, N), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CELLS, Dp, N), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CELLS, N, D), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CELLS, N, D), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, N, D), jnp.bfloat16),
            interpret=jax.default_backend() != "tpu",
        )(q, k, v)

    qt = jax.random.normal(jax.random.key(0), (G, Dp, N), jnp.bfloat16)
    kt = jax.random.normal(jax.random.key(1), (G, Dp, N), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (G, N, D), jnp.bfloat16)
    fetch = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    _ = np.asarray(fetch(run(qt, kt, v)))

    def chain(n, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = v
            for _ in range(n):
                o = run(qt, kt, o)
            _ = np.asarray(fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best
    t = (chain(72) - chain(8)) / 64
    print(f"pretransposed-serving: {t*1e6:.0f}us/call "
          f"(compare vs the base serving variant IN THE SAME RUN)",
          flush=True)


if os.environ.get("PROBE") == "pret":
    # run main's base variant then the pretransposed probe, one process
    def _probe_main():
        q = jax.random.normal(jax.random.key(0), (G, N, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (G, N, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (G, N, D), jnp.bfloat16)
        fn = make("base")
        _ = np.asarray(fn(q, k, v))
        t = timed_chain(fn, q, k, v)
        print(f"base-serving: {t*1e6:.0f}us/call", flush=True)
        probe_pretransposed()
    _probe_main()
    sys.exit(0)

# ROUND-4 DEAD END (measured end-to-end, then REVERTED): feeding q/k
# PRE-TRANSPOSED to the kernel looked like a big win in isolation
# (pretransposed-serving 347 vs base 587 us/call in-run above), but
# moving the transpose to an XLA-side relayout of the qkv linear output
# REGRESSED the full bench: serving 2.043 -> 1.921, exact 1.872 -> 1.732
# imgs/sec/chip.  Round-1's conclusion stands at step level: the in-VMEM
# per-cell transposes overlap the Mosaic pipeline almost for free, while
# the HBM relayout pass is real serial memory traffic (and the split
# qk_t/v operand pair pipelines DMA worse than one contiguous block).
# The isolated-probe delta measures the VMEM-layout benefit WITHOUT the
# cost of producing that layout.  A true fix would emit q/k transposed
# straight from the qkv matmul (MXU can), but that requires splitting
# the quantized qkv linear into two differently-laid-out matmuls —
# untried, the remaining candidate for a structural kernel win.
