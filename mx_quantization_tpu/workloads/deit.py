"""DeiT ImageNet evaluation workload.

Re-implements the reference's quantized-DeiT eval driver
(workloads/deit/scripts/main.py:320-766 + engine.py:85-112): build the model
config + quantization plan from CLI args, load the checkpoint, stream the
validation set, report top-1/top-5.  Distribution is SPMD: the batch is
sharded over the mesh data axis and accuracy counters are psum'd — replacing
DistributedSampler + metric all_reduce (deit/utils.py:36-47).

Run:
    python -m mx_quantization_tpu.workloads.deit --model deit_tiny_patch16_224 \
        --checkpoint deit_tiny.pth --data-path /data/imagenet/val \
        --mx-quant --top-k --k 80 --pred-mode ex_pred
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vit import (VIT_CONFIGS, VitConfig, VitQuantConfig, init_vit,
                          vit_forward)
from ..predictors.elsa import create_structured_orthogonal_matrix
from ..specs import MxSpecs, finalize_mx_specs

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def default_mx_specs(custom_tpu: str = "fused") -> MxSpecs:
    """The DeiT workload's EXACT hardcoded specs (reference deit
    main.py:716-736): MXINT8 w/a, scale 8, block 32, bfloat=32 elementwise
    (the fp32 grid — identity on fp32 activations), inference only."""
    return finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        shared_exp_method="max", block_size=32, bfloat=32, fp=0,
        round="nearest", mx_flush_fp32_subnorms=False,
        quantize_backprop=False, custom_tpu=custom_tpu))


def accuracy_counts(logits: jax.Array, labels: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """(top1_correct, top5_correct) counts for a batch."""
    top5 = jax.lax.top_k(logits, 5)[1]
    c1 = jnp.sum(top5[:, 0] == labels)
    c5 = jnp.sum(jnp.any(top5 == labels[:, None], axis=1))
    return c1, c5


def evaluate(params, cfg: VitConfig, qcfg: VitQuantConfig,
             batches: Iterator[Tuple[np.ndarray, np.ndarray]],
             orthogonal_matrix=None, log_every: int = 20) -> dict:
    """Top-1/top-5 over an iterator of (images NCHW float32, labels int)."""

    # counters ACCUMULATE ON DEVICE: fetching per-batch counts would stall
    # every dispatch on a host round trip (~25 ms through the axon tunnel —
    # tools/serving_trace.py measured the same stall class in serving);
    # carrying them as device scalars keeps the batch chain pipelined and
    # the host only syncs at log points and at the end.
    @jax.jit
    def step(params, c1, c5, x, y):
        logits = vit_forward(params, x, cfg, qcfg, orthogonal_matrix)
        b1, b5 = accuracy_counts(logits, y)
        return c1 + b1, c5 + b5

    n = 0
    c1 = jnp.int32(0)
    c5 = jnp.int32(0)
    t0 = time.time()
    for i, (x, y) in enumerate(batches):
        c1, c5 = step(params, c1, c5, jnp.asarray(x), jnp.asarray(y))
        n += len(y)
        if log_every and (i + 1) % log_every == 0:
            print(f"[{i+1}] acc@1 {int(c1)/n:.4f} acc@5 {int(c5)/n:.4f} "
                  f"({n/(time.time()-t0):.1f} img/s)")
    return {"acc1": int(c1) / max(n, 1), "acc5": int(c5) / max(n, 1), "n": n}


def imagenet_val_batches(data_path: str, batch_size: int = 100,
                         img_size: int = 224, limit: Optional[int] = None,
                         native: bool = True):
    """Yield (images, labels) from an ImageNet-style folder tree
    (val/<wnid>/*.JPEG).  Uses the native C++ loader when available
    (mx_quantization_tpu/native), falling back to PIL."""
    from ..data.imagenet import iterate_imagenet
    yield from iterate_imagenet(data_path, batch_size, img_size, limit=limit,
                                native=native)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("DeiT MX evaluation")
    p.add_argument("--model", default="deit_tiny_patch16_224",
                   choices=sorted(VIT_CONFIGS))
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--data-path", default=None)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--mx-quant", action="store_true")
    p.add_argument("--top-k", action="store_true")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--no-approx", action="store_true",
                   help="top-k from true scores (approx_flag=False)")
    p.add_argument("--pred-mode", default="ex_pred")
    p.add_argument("--exclude-blocks", type=int, nargs="*", default=[])
    p.add_argument("--exclude-block-type", default="ex_pred")
    p.add_argument("--engine", default="fused", choices=["fused", "ref"])
    p.add_argument("--contract", default="exact",
                   choices=["exact", "serving"],
                   help="serving = relaxed fused-kernel attention tier "
                        "(tie-inclusive selection, bf16 attn probs; "
                        "recall provably >= the exact tier — docs/"
                        "ACCURACY.md #5)")
    p.add_argument("--anal", action="store_true",
                   help="per-block predictor-quality records on the first "
                        "batch (reference --anal)")
    p.add_argument("--anal-dir", default="analysis_out")
    p.add_argument("--sparse-impl", default="dense",
                   choices=["dense", "gather"])
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = VIT_CONFIGS[args.model]
    specs = default_mx_specs(args.engine) if args.mx_quant else None
    qcfg = VitQuantConfig(
        mx_specs=specs, mx_quant=args.mx_quant, top_k=args.top_k, k=args.k,
        approx_flag=not args.no_approx, pred_mode=args.pred_mode,
        exclude_blocks=tuple(args.exclude_blocks),
        exclude_block_type=args.exclude_block_type,
        sparse_impl=args.sparse_impl, contract=args.contract)

    if args.checkpoint:
        from ..utils.checkpoint import load_deit_checkpoint
        params = load_deit_checkpoint(args.checkpoint, depth=cfg.depth)
        params = jax.tree.map(jnp.asarray, params)
    else:
        print("WARNING: no checkpoint — random init (smoke test only)")
        params = init_vit(jax.random.key(0), cfg)

    om = None
    if args.pred_mode == "ELSA":
        om = jnp.asarray(create_structured_orthogonal_matrix(cfg.head_dim))

    if args.data_path:
        batches = imagenet_val_batches(args.data_path, args.batch_size,
                                       cfg.img_size, args.limit)
    else:
        print("WARNING: no --data-path — synthetic batch (smoke test only)")
        rng = np.random.RandomState(0)
        batches = iter([(rng.randn(args.batch_size, 3, cfg.img_size,
                                   cfg.img_size).astype(np.float32),
                         rng.randint(0, 1000, args.batch_size))])

    if args.anal:
        # --anal instrumentation (reference deit main.py --anal): per-block
        # predictor quality on the first batch's real activations
        import itertools
        from ..analysis import AnalysisWriter, vit_prediction_analysis
        writer = AnalysisWriter(args.anal_dir)
        first = next(batches)
        batches = itertools.chain([first], batches)
        for rec in vit_prediction_analysis(params, jnp.asarray(first[0]),
                                           cfg, qcfg, om):
            writer.write(rec)
            print(json.dumps(rec))

    stats = evaluate(params, cfg, qcfg, batches, om)
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
