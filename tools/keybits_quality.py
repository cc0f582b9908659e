"""Quality of reduced-precision top-k ranking keys (key_bits 32/16/8).

The fused attention kernel selects each row's top-k by binary search over a
monotone integer encoding of the predictor scores; ``key_bits`` truncates
the keys (32 = exact fp32 order, 16 = bf16 order, 8 = sign+exponent order)
and shortens the search (33/17/9 count passes).  This tool measures what
that truncation costs at the DiT operating point (N=256, D=72, k=154,
MXINT8 ex_pred): the softmax-mass recall of the selected set against the
TRUE top-k of the full-precision scores (funcs/analysis.py:136-157
semantics), plus how many selected indices differ from exact-key selection.

Run on CPU: python tools/keybits_quality.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mx_quantization_tpu.ops.kernels.topk_attention import (
    _exp_sign_approx, _mono_keys, _quant_axis0, _two_step_approx)

N, D, K, BS = 256, 72, 154, 32
HEADS = 64  # rows of independent (q, k) draws


def select(keys, k):
    """Reference selection: top-k by key order, lowest index first on ties
    (the kernel's gt | (eq & rank<=k-n_gt) logic, computed densely)."""
    kth = np.partition(keys, -k, axis=-1)[..., -k]
    gt = keys > kth[..., None]
    eq = keys == kth[..., None]
    n_gt = gt.sum(-1)
    rank = np.cumsum(eq, axis=-1)
    return gt | (eq & (rank <= (k - n_gt)[..., None]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred-mode", default="ex_pred",
                    choices=["ex_pred", "two_step_leading_ones"])
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    recalls = {32: [], 16: [], 8: []}
    flips = {16: [], 8: []}
    for h in range(HEADS):
        # per-head scale variation: activations in real blocks span decades
        sq = 10.0 ** rng.uniform(-2, 2)
        sk = 10.0 ** rng.uniform(-2, 2)
        q = (sq * rng.randn(N, D)).astype(np.float32)
        k_ = (sk * rng.randn(N, D)).astype(np.float32)

        Dp = (D + BS - 1) // BS * BS
        qt = np.pad(q.T, ((0, Dp - D), (0, 0))).astype(np.float32)
        kt = np.pad(k_.T, ((0, Dp - D), (0, 0))).astype(np.float32)
        qv, qe = _quant_axis0(jnp.asarray(qt), BS, 8, 8)
        kv, ke = _quant_axis0(jnp.asarray(kt), BS, 8, 8)
        if args.pred_mode == "two_step_leading_ones":
            aq = np.asarray(_two_step_approx(qv, qe, BS), np.float32)
            ak = np.asarray(_two_step_approx(kv, ke, BS), np.float32)
        else:
            aq = np.asarray(_exp_sign_approx(qv, qe, BS), np.float32)
            ak = np.asarray(_exp_sign_approx(kv, ke, BS), np.float32)
        dmask = (np.arange(Dp) < D)[:, None]
        aq *= dmask
        ak *= dmask

        s_true = (np.asarray(qv, np.float32).T @ np.asarray(kv, np.float32)
                  ) * D ** -0.5
        s_sel = aq.T @ ak
        keys32 = np.asarray(_mono_keys(jnp.asarray(s_sel)))

        p = np.exp(s_true - s_true.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        true_sel = select(np.asarray(_mono_keys(jnp.asarray(s_true))), K)
        true_mass = (p * true_sel).sum(-1)

        sel = {}
        for bits, shift in ((32, 0), (16, 16), (8, 24)):
            sel[bits] = select(keys32 >> shift, K)
            mass = (p * sel[bits]).sum(-1)
            recalls[bits].append(mass / true_mass)
        for bits in (16, 8):
            flips[bits].append((sel[bits] != sel[32]).sum(-1) / 2)

    for bits in (32, 16, 8):
        r = np.concatenate(recalls[bits])
        print(f"key_bits={bits:2d}: softmax-mass recall "
              f"mean={r.mean():.5f} p5={np.percentile(r, 5):.5f} "
              f"min={r.min():.5f}")
    for bits in (16, 8):
        f = np.concatenate(flips[bits])
        print(f"key_bits={bits:2d}: indices differing from exact keys "
              f"mean={f.mean():.2f}/{K} max={int(f.max())}")


if __name__ == "__main__":
    main()
