"""Pass-by-pass price of the fused top-k attention kernel (round-4 verdict
weak #2: the 261us "isolation floor" had no named owner).

Builds an ADDITIVE ladder of kernel variants at the DiT operating point
(N=S=256, D=72, k=154, key_bits=8, bfloat=16, 16 cells/grid step): each
rung adds one pass group to the previous rung, so rung-to-rung deltas give
every microsecond a named owner.  The ladder passes through the SERVING
tier (rung == the contract="serving" pipeline) and ends at the full EXACT
pipeline; both are cross-checked against the production entry.

All numbers are IN-RUN deltas from one process (absolute us swing up to 2x
between tunnel sessions — round-3 fact).  Run on the TPU:

  python tools/passprice_bench.py            # ladder
  MODES=prod_exact,prod_serving python tools/passprice_bench.py

MEASURED (round 4, one in-run ladder; us/call over 256 cells):
  prod_exact 607, prod_serving 416 (1.46x).  Ladder cross-checks:
  L15(=exact) 605, L12(=serving) 400.  Stable top deltas (the
  exact-only passes): L13 score-bf16-round +26, L14 attn-round+
  MX-requantize +92, L15 tie-rank +88 — summing to the 607-416 gap.
  The LOW rungs are NOT additive (L00 dma-only 514 > L02 matmuls 291):
  with no compute to overlap, Mosaic's DMA pipeline stalls differently —
  treat rungs below L05 as pipeline-noise floor probes, not pass prices.
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
    _bf16_round, _exp_sign_approx, _kth_keys, _mono_keys_top, _prep_side,
    _quant_axis0, _quant_axis0_pos, _round_up, fused_topk_attention)

B, H, N, D = 16, 16, 256, 72
S = N
K = 154
BS, MBITS, SB = 32, 8, 8
SCALE = D ** -0.5
CELLS = 16
G = B * H
BF = 16

# Ladder: each rung = previous + the named stage.  Stage flags accumulate.
LADDER = [
    ("L00_dma_only", set()),
    ("L01_+transpose_pad", {"prep"}),
    ("L02_+score_matmul_pv", {"prep", "mm"}),
    ("L03_+v_quant", {"prep", "mm", "vq"}),
    ("L04_+qk_quant", {"prep", "mm", "vq", "qkq"}),
    ("L05_+predictor", {"prep", "mm", "vq", "qkq", "pred"}),
    ("L06_+scale_mul", {"prep", "mm", "vq", "qkq", "pred", "scl"}),
    ("L07_+mask_max", {"prep", "mm", "vq", "qkq", "pred", "scl", "max"}),
    ("L08_+exp", {"prep", "mm", "vq", "qkq", "pred", "scl", "max", "exp"}),
    ("L09_+sum_div", {"prep", "mm", "vq", "qkq", "pred", "scl", "max",
                      "exp", "div"}),
    ("L10_+keys", {"prep", "mm", "vq", "qkq", "pred", "scl", "max", "exp",
                   "div", "keys"}),
    ("L11_+search8", {"prep", "mm", "vq", "qkq", "pred", "scl", "max",
                      "exp", "div", "keys", "search"}),
    ("L12_+gt_select=SERVING", {"prep", "mm", "vq", "qkq", "pred", "scl",
                                "max", "exp", "div", "keys", "search",
                                "sel"}),
    ("L13_+score_bf16_round", {"prep", "mm", "vq", "qkq", "pred", "scl",
                               "max", "exp", "div", "keys", "search", "sel",
                               "sround"}),
    ("L14_+attn_round+mxquant", {"prep", "mm", "vq", "qkq", "pred", "scl",
                                 "max", "exp", "div", "keys", "search",
                                 "sel", "sround", "aq"}),
    ("L15_+tie_rank=EXACT", {"prep", "mm", "vq", "qkq", "pred", "scl",
                             "max", "exp", "div", "keys", "search", "sel",
                             "sround", "aq", "rank", "oround"}),
]


def _cell(q_nd, k_nd, v_nd, o_ref, c, st):
    Dp = _round_up(D, BS)
    if "qkq" in st:
        qv, aq = _prep_side(q_nd, BS, MBITS, SB, D, "pred" in st, "ex_pred",
                            side="q", bfloat=BF)
        kv, ak = _prep_side(k_nd, BS, MBITS, SB, D, "pred" in st, "ex_pred",
                            side="k", bfloat=BF)
    elif "prep" in st:
        def prep(x):
            return jnp.concatenate(
                [x.T, jnp.zeros((Dp - D, N), jnp.bfloat16)], axis=0)
        qv, kv = prep(q_nd), prep(k_nd)
        aq, ak = qv, kv
    if "vq" in st:
        v_q, _ = _quant_axis0(v_nd.astype(jnp.float32), BS, MBITS, SB)
    else:
        v_q = v_nd

    if "mm" not in st:
        o_ref[c] = v_nd  # pure DMA roundtrip (plus any prep above)
        return

    dn = (((0,), (0,)), ((), ()))
    s_true = jax.lax.dot_general(kv, qv, dn,
                                 preferred_element_type=jnp.float32)
    if "sround" in st:
        s_true = _bf16_round(s_true)
    if "scl" in st:
        s_true = s_true * SCALE
    if "pred" in st:
        s_sel = jax.lax.dot_general(ak, aq, dn,
                                    preferred_element_type=jnp.float32)
    else:
        s_sel = s_true

    neg = jnp.full((S, N), -3.0e38, jnp.float32)
    if "keys" in st:
        keys = _mono_keys_top(s_sel, 24)
        if "search" in st:
            kth, n_gt = _kth_keys(keys, K, n_iters=8, lo_init=-128,
                                  hi_init=127)
        else:
            kth = jnp.full((1, N), jnp.int32(0))
            n_gt = jnp.zeros((1, N), jnp.int32)
        if "rank" in st:
            gt = keys > kth
            eq = keys == kth
            tri = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) <=
                   jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
                   ).astype(jnp.float32).astype(jnp.bfloat16)
            rank = jax.lax.dot_general(
                tri, eq.astype(jnp.float32).astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sel = gt | (eq & (rank <= (K - n_gt).astype(jnp.float32)))
        elif "sel" in st:
            sel = keys >= kth
        else:
            sel = keys > jnp.int32(-2 ** 31)  # all-true, via a compare pass
    else:
        sel = s_sel > neg

    if "max" in st:
        masked = jnp.where(sel, s_true, neg)
        m = jnp.max(masked, axis=0, keepdims=True)
        at = masked - m
    else:
        at = s_true
    if "exp" in st:
        at = jnp.exp(at)
    if "div" in st:
        at = at / jnp.sum(at, axis=0, keepdims=True)

    if "aq" in st:
        at = _bf16_round(at)
        at_q, _ = _quant_axis0_pos(at, BS, MBITS, SB)
    else:
        at_q = at.astype(jnp.bfloat16)
    out = jax.lax.dot_general(at_q, v_q, dn,
                              preferred_element_type=jnp.float32)
    if "oround" in st:
        out = _bf16_round(out)
    o_ref[c] = out.astype(jnp.bfloat16)


def make(st):
    def kern(q_ref, k_ref, v_ref, o_ref):
        for c in range(CELLS):
            _cell(q_ref[c], k_ref[c], v_ref[c], o_ref, c, st)

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

    def prod(contract):
        @jax.jit
        def f(q, k, v):
            return fused_topk_attention(
                q.reshape(B, H, N, D), k.reshape(B, H, N, D),
                v.reshape(B, H, N, D), k=K, scale=SCALE, approx=True,
                pred_mode="ex_pred", key_bits=8, out_dtype=jnp.bfloat16,
                bfloat=BF, contract=contract).reshape(G, N, D)
        return f

    only = os.environ.get("MODES")
    results = []
    if only is None or "prod" in only:
        for c in ("exact", "serving"):
            fn = prod(c)
            t = timed_chain(fn, q, k, v)
            results.append((f"prod_{c}", t * 1e6))
            print(f"prod_{c}: {t*1e6:.0f}us/call", flush=True)
    prev = None
    for name, st in LADDER:
        if only and name.split("_")[0] not in only and only != "ladder":
            continue
        fn = make(st)
        _ = np.asarray(fn(q, k, v))  # compile check
        t = timed_chain(fn, q, k, v) * 1e6
        d = "" if prev is None else f"  (+{t - prev:.0f})"
        print(f"{name}: {t:.0f}us/call{d}", flush=True)
        results.append((name, t))
        prev = t
    print("\nSUMMARY (us/call over 256 cells; /256 for us/cell):")
    for n, t in results:
        print(f"  {n:28s} {t:7.0f}")


if __name__ == "__main__":
    main()
