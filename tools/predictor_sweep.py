"""DeiT-base predictor comparison sweep (BASELINE.json configs[2]):
Sanger MXINT4 / EXION two-step leading-ones / ELSA projection / ex_pred
(+ partial and true_ex/threshold variants), each measured for

  * eval throughput on the chip at the reference operating point
    (deit_base_patch16_224, k=30, batch 100 — run_deit.sh:41-52), and
  * selection quality on real model activations: per-block softmax-mass
    recall of the predicted top-k (funcs/analysis.py:136-157 metric via
    analysis.vit_prediction_analysis).

Without --checkpoint the recall column uses RANDOM-INIT weights (rank
order is indicative; absolute recall shifts with trained activations).

Run: python tools/predictor_sweep.py [--model deit_base_patch16_224]
     [--k 30] [--checkpoint deit_base.pth] [--skip-throughput]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

MODES = ("ex_pred", "two_step_leading_ones", "MXINT4", "partial_Q",
         "partial_K", "true_ex", "threshold_ex", "ELSA")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_base_patch16_224")
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--skip-throughput", action="store_true")
    args = ap.parse_args()

    from workload_probe import SPECS, deit_probe
    from mx_quantization_tpu.analysis import vit_prediction_analysis
    from mx_quantization_tpu.models import VitQuantConfig, init_vit
    from mx_quantization_tpu.models.vit import VIT_CONFIGS
    from mx_quantization_tpu.predictors.elsa import (
        create_structured_orthogonal_matrix)

    cfg = VIT_CONFIGS[args.model]
    if args.checkpoint:
        from mx_quantization_tpu.utils.checkpoint import load_deit_checkpoint
        params = jax.tree.map(jnp.asarray,
                              load_deit_checkpoint(args.checkpoint,
                                                   depth=cfg.depth))
    else:
        print("NOTE: random-init weights (no --checkpoint) — recall is "
              "rank-indicative only")
        params = init_vit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (8, 3, 224, 224))
    om = jnp.asarray(create_structured_orthogonal_matrix(cfg.head_dim))

    rows = []
    for mode in MODES:
        qcfg = VitQuantConfig(mx_specs=SPECS, mx_quant=True, top_k=True,
                              k=args.k, approx_flag=True, pred_mode=mode)
        recs = vit_prediction_analysis(params, x, cfg, qcfg,
                                       om if mode == "ELSA" else None)
        recall = float(np.mean([r["softmax_recall"] for r in recs]))
        cov = float(np.mean([r["avg_chosen_k"] for r in recs]))
        tput = None
        if not args.skip_throughput:
            tput = deit_probe(model=args.model, k=args.k, B=args.batch,
                              pred_mode=mode)
        rows.append((mode, recall, cov, tput))
        print(f"{mode:24s} recall={recall:.4f} avg_chosen_k={cov:6.1f}"
              + (f" {tput:7.1f} imgs/sec" if tput else ""), flush=True)

    print("\nmode                      recall  avg_chosen_k  imgs/sec")
    for mode, recall, cov, tput in rows:
        print(f"{mode:24s}  {recall:.4f}  {cov:12.1f}  "
              f"{'' if tput is None else f'{tput:8.1f}'}")


if __name__ == "__main__":
    main()
