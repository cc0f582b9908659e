"""DeiT training/fine-tuning loop.

Re-implements the reference's train path (workloads/deit/engine.py:19-82
train_one_epoch + main.py:770-834): AdamW, label-smoothing cross entropy,
optional mixup, EMA, cosine schedule — SPMD over the mesh data axis.  The
reference's AMP/loss-scaler machinery is unnecessary on TPU (bf16 compute
is native); quantization-aware training uses quantize_backprop=True specs.
"""

from __future__ import annotations

import argparse
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.vit import (VIT_CONFIGS, VitConfig, VitQuantConfig, init_vit,
                          vit_forward)
from ..parallel import MeshPlan, make_mesh, shard_batch, shard_params_dp


def label_smoothing_ce(logits, labels, smoothing: float = 0.1):
    n = logits.shape[-1]
    target = jax.nn.one_hot(labels, n) * (1 - smoothing) + smoothing / n
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def mixup_batch(key, x, y, num_classes, alpha: float = 0.8):
    """Mixup (reference uses timm Mixup, engine.py:35-37)."""
    lam = jax.random.beta(key, alpha, alpha)
    perm = jax.random.permutation(key, x.shape[0])
    x2 = lam * x + (1 - lam) * x[perm]
    y1 = jax.nn.one_hot(y, num_classes)
    y2 = lam * y1 + (1 - lam) * y1[perm]
    return x2, y2


def train(cfg: VitConfig, qcfg: VitQuantConfig, data_iter,
          steps: int = 100, lr: float = 5e-4, weight_decay: float = 0.05,
          ema_decay: float = 0.99996, label_smoothing: float = 0.1,
          mesh=None, seed: int = 0, log_every: int = 50):
    if mesh is None:
        mesh = make_mesh(MeshPlan(data=1, model=1))
    params = init_vit(jax.random.key(seed), cfg)
    ema = jax.tree.map(jnp.copy, params)
    sched = optax.cosine_decay_schedule(lr, steps)
    opt = optax.adamw(sched, weight_decay=weight_decay)
    opt_state = opt.init(params)
    params = shard_params_dp(mesh, params)

    def step_fn(params, ema, opt_state, x, y):
        def loss_fn(p):
            logits = vit_forward(p, x, cfg, qcfg)
            return label_smoothing_ce(logits, y, label_smoothing)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                           ema, params)
        return params, ema, opt_state, loss

    step_jit = jax.jit(step_fn)
    with jax.set_mesh(mesh):
        for step, (x, y) in enumerate(data_iter):
            if step >= steps:
                break
            x = shard_batch(mesh, jnp.asarray(x))
            y = shard_batch(mesh, jnp.asarray(y))
            params, ema, opt_state, loss = step_jit(params, ema, opt_state,
                                                    x, y)
            if log_every and (step + 1) % log_every == 0:
                print(f"step {step+1}: loss {float(loss):.4f}")
    return params, ema


def main(argv=None):
    p = argparse.ArgumentParser("DeiT training (smoke-scale)")
    p.add_argument("--model", default="deit_tiny_patch16_224",
                   choices=sorted(VIT_CONFIGS))
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--img-size", type=int, default=32)
    args = p.parse_args(argv)
    base = VIT_CONFIGS[args.model]
    import dataclasses
    cfg = dataclasses.replace(base, img_size=args.img_size)
    rng = np.random.RandomState(0)

    def synth():
        while True:
            yield (rng.randn(args.batch, 3, cfg.img_size,
                             cfg.img_size).astype(np.float32),
                   rng.randint(0, cfg.num_classes, args.batch))

    train(cfg, VitQuantConfig(mx_quant=False), synth(), steps=args.steps,
          log_every=5)


if __name__ == "__main__":
    main()
