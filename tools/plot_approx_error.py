"""Box plot of self- vs cross-head K-approximation error (reference
funcs/plots.py:4-41): relative error of each predictor's approximated
Q.K^T against the true scores, per predictor mode.

Usage: python tools/plot_approx_error.py [--out approx_error.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="approx_error.png")
    ap.add_argument("--modes", nargs="*",
                    default=["ex_pred", "partial_Q", "partial_K",
                             "two_step_leading_ones", "MXINT4"])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mx_quantization_tpu import finalize_mx_specs
    from mx_quantization_tpu.predictors.exponent import exponent_predict

    specs = finalize_mx_specs(dict(w_elem_format="int8",
                                   a_elem_format="int8", scale_bits=8,
                                   block_size=32, quantize_backprop=False))
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(4, 64, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 64, 64).astype(np.float32))
    true = np.asarray(jnp.matmul(q, jnp.swapaxes(k, -1, -2)))

    errs = {}
    for mode in args.modes:
        aq, ak = exponent_predict(q, k, specs, mode)
        pred = np.asarray(jnp.matmul(aq, jnp.swapaxes(ak, -1, -2)))
        # normalized elementwise error (the reference plots |err| boxes)
        e = np.abs(pred - true) / (np.abs(true).mean() + 1e-8)
        errs[mode] = e.ravel()
        print(f"{mode}: median={np.median(e):.3f} p90={np.percentile(e,90):.3f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.boxplot(list(errs.values()), tick_labels=list(errs.keys()),
                   showfliers=False)
        ax.set_ylabel("normalized |pred - true|")
        ax.set_title("Q.K^T approximation error by predictor")
        fig.tight_layout()
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    except Exception as e:  # matplotlib optional in this image
        print(f"(plot skipped: {e})")


if __name__ == "__main__":
    main()
