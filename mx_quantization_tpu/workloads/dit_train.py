"""DiT training loop (reference workloads/DiT/train.py:87-269, TPU-native).

DDP -> SPMD: the batch shards over the mesh "data" axis and gradients come
out all-reduced by XLA (no explicit bucketing).  EMA is a pure pytree lerp
(train.py:40-49); checkpoints store model/ema/opt state on process 0
(train.py:231-243); loss logging averages over the global batch (psum built
into the mean under pjit).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import create_diffusion
from ..models.dit import (DiT_models, DiTConfig, DiTQuantConfig, dit_forward,
                          init_dit)
from ..parallel import MeshPlan, make_mesh, shard_batch, shard_params_dp
from ..utils.checkpoint import save_params


def update_ema(ema_params, params, decay: float = 0.9999):
    """EMA <- decay * EMA + (1-decay) * params (reference train.py:40-49)."""
    return jax.tree.map(lambda e, p: decay * e + (1 - decay) * p,
                        ema_params, params)


def make_train_step(cfg: DiTConfig, qcfg: DiTQuantConfig, diffusion,
                    optimizer, timestep_sampler=None):
    """timestep_sampler: optional diffusion.timestep_sampler.UniformSampler
    (default) — importance resampling uses LossSecondMomentResampler whose
    state the caller threads (see tests)."""
    def train_step(params, ema_params, opt_state, x0, y, key):
        t_key, n_key = jax.random.split(key)
        if timestep_sampler is not None:
            t, t_weights = timestep_sampler.sample(t_key, x0.shape[0])
        else:
            t = jax.random.randint(t_key, (x0.shape[0],), 0,
                                   diffusion.num_timesteps)
            t_weights = jnp.ones((x0.shape[0],))

        def loss_fn(p):
            def model(xt, tt, y):
                return dit_forward(p, xt, tt, y, cfg, qcfg)
            terms = diffusion.training_losses(model, x0, t, n_key,
                                              model_kwargs={"y": y})
            return jnp.mean(terms["loss"] * t_weights)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = update_ema(ema_params, params)
        return params, ema_params, opt_state, loss

    return train_step


def train(cfg: DiTConfig, qcfg: DiTQuantConfig, data_iter,
          steps: int = 1000, lr: float = 1e-4, ckpt_every: int = 0,
          results_dir: str = "results", log_every: int = 100,
          mesh=None, seed: int = 0):
    """data_iter yields (latents (B,4,h,w), labels (B,)).  Returns
    (params, ema_params)."""
    if mesh is None:
        ndev = len(jax.devices())
        # data axis must divide the global batch
        first = next(iter(data_iter), None)
        assert first is not None, "empty data iterator"
        batch = first[0].shape[0]
        import itertools
        data_iter = itertools.chain([first], data_iter)
        while ndev > 1 and batch % ndev != 0:
            ndev -= 1
        mesh = make_mesh(MeshPlan(data=ndev, model=1))

    params = init_dit(jax.random.key(seed), cfg)
    ema_params = jax.tree.map(jnp.copy, params)
    optimizer = optax.adamw(lr, weight_decay=0.0)  # train.py:156
    opt_state = optimizer.init(params)

    params = shard_params_dp(mesh, params)
    ema_params = shard_params_dp(mesh, ema_params)

    diffusion = create_diffusion(None)  # 1000 linear steps (train.py:112)
    step_fn = jax.jit(make_train_step(cfg, qcfg, diffusion, optimizer))

    key = jax.random.key(seed + 1)
    running, t0 = [], time.time()
    with jax.set_mesh(mesh):
        for step, (x0, y) in enumerate(data_iter):
            if step >= steps:
                break
            key, sk = jax.random.split(key)
            x0 = shard_batch(mesh, jnp.asarray(x0))
            y = shard_batch(mesh, jnp.asarray(y))
            params, ema_params, opt_state, loss = step_fn(
                params, ema_params, opt_state, x0, y, sk)
            running.append(loss)
            if log_every and (step + 1) % log_every == 0:
                lv = float(jnp.mean(jnp.stack(running)))
                sps = log_every / (time.time() - t0)
                print(f"step {step+1}: loss {lv:.4f} ({sps:.2f} steps/s)")
                running, t0 = [], time.time()
            if ckpt_every and (step + 1) % ckpt_every == 0 \
                    and jax.process_index() == 0:
                os.makedirs(results_dir, exist_ok=True)
                save_params(os.path.join(results_dir,
                                         f"{step+1:07d}.pkl"),
                            {"model": params, "ema": ema_params})
    return params, ema_params


def main(argv=None):
    p = argparse.ArgumentParser("DiT training (smoke-scale)")
    p.add_argument("--model", default="DiT-S/8", choices=sorted(DiT_models))
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image-size", type=int, default=32)
    args = p.parse_args(argv)

    cfg = DiT_models[args.model](input_size=args.image_size // 8)
    rng = np.random.RandomState(0)

    def synth():
        while True:
            yield (rng.randn(args.batch, 4, cfg.input_size,
                             cfg.input_size).astype(np.float32),
                   rng.randint(0, cfg.num_classes, args.batch))

    train(cfg, DiTQuantConfig(), synth(), steps=args.steps, log_every=5)


if __name__ == "__main__":
    main()
