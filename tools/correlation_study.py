"""Predictor-quality correlation study.

Re-implements the reference's standalone experiment
(funcs/test_scatter.py:60-194): Spearman rank correlation of each
approximated Q.K^T predictor against the true MX-quantized scores, plus the
softmax-mass recall of the predicted top-k (funcs/analysis.py
diff_idx_analysis) — the evidence basis for choosing ex_pred / k values.

    python tools/correlation_study.py [--n 256] [--d 64] [--k 32]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--heads", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    # CPU by default: 8 predictor jit-compiles on the remote-compile TPU take
    # longer than the study itself; numerics are identical.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.stats import spearmanr

    from mx_quantization_tpu import finalize_mx_specs
    from mx_quantization_tpu.analysis import attention_prediction_quality
    from mx_quantization_tpu.attention import predict_scores
    from mx_quantization_tpu.ops import matmul

    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, bfloat=0, quantize_backprop=False))

    rng = np.random.RandomState(args.seed)
    q = jnp.asarray(rng.randn(1, args.heads, args.n, args.d)
                    .astype(np.float32))
    k = jnp.asarray(rng.randn(1, args.heads, args.n, args.d)
                    .astype(np.float32))
    true = matmul(q, jnp.swapaxes(k, -1, -2), mx_specs=specs,
                  mode_config="aa") * (args.d ** -0.5)
    true_np = np.asarray(true)

    report = {}
    for mode in ["ex_pred", "partial_Q", "partial_K",
                 "two_step_leading_ones", "MXINT4", "true_ex",
                 "threshold_ex", "ELSA"]:
        om = None
        if mode == "ELSA":
            from mx_quantization_tpu.predictors.elsa import \
                create_structured_orthogonal_matrix
            om = jnp.asarray(create_structured_orthogonal_matrix(args.d))
        pred = predict_scores(q, k, specs, mode, om)
        rho = spearmanr(np.asarray(pred).ravel(), true_np.ravel()).statistic
        idx = jax.lax.top_k(pred, args.k)[1]
        quality = attention_prediction_quality(true, idx, args.k)
        report[mode] = {"spearman": round(float(rho), 4), **{
            kk: round(vv, 4) for kk, vv in quality.items()}}
        print(f"{mode:24s} rho={rho:.3f} "
              f"recall={quality['softmax_recall']:.3f}")
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
