"""DPM-Solver++ (2M) multistep scheduler for PixArt-style text-to-image
sampling (reference pipeline uses diffusers' DPMSolverMultistepScheduler with
20 steps, workloads/PixArt/scripts/text_local_inference_alpha.py:201-210).

Epsilon-prediction, data-prediction (dpmsolver++) formulation, 2nd-order
multistep; scaled-linear betas as in Stable-Diffusion-family models.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class DPMSolverMultistep:
    def __init__(self, num_train_timesteps: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012,
                 beta_schedule: str = "scaled_linear",
                 solver_order: int = 2):
        if beta_schedule == "scaled_linear":
            betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                num_train_timesteps, dtype=np.float64) ** 2
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                                dtype=np.float64)
        else:
            raise ValueError(beta_schedule)
        self.num_train_timesteps = num_train_timesteps
        alphas_cumprod = np.cumprod(1.0 - betas)
        self.alpha_t = np.sqrt(alphas_cumprod)
        self.sigma_t = np.sqrt(1 - alphas_cumprod)
        self.lambda_t = np.log(self.alpha_t) - np.log(self.sigma_t)
        self.solver_order = solver_order

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        # diffusers-style linspace over [0, T-1], descending
        t = np.linspace(0, self.num_train_timesteps - 1,
                        num_inference_steps + 1).round()[::-1][:-1]
        return t.astype(np.int64)

    def sample(self, model: Callable, shape, key,
               num_inference_steps: int = 20, model_kwargs=None,
               guidance_scale: float = 0.0,
               uncond_kwargs=None, jit_step: bool = True):
        """Run DPM-Solver++(2M).  ``model(x, t, **kwargs) -> eps``.

        If guidance_scale > 0, runs CFG: model is called on a doubled batch
        by the caller-provided kwargs convention (cond first, uncond second).
        """
        model_kwargs = model_kwargs or {}
        x = jax.random.normal(key, shape)
        ts = self.timesteps(num_inference_steps)

        def eps_to_x0(x, t_idx, eps):
            a, s = self.alpha_t[t_idx], self.sigma_t[t_idx]
            return (x - s * eps) / a

        def call_model(x, t):
            eps = model(x, t, **model_kwargs)
            if guidance_scale and uncond_kwargs is not None:
                eps_u = model(x, t, **uncond_kwargs)
                eps = eps_u + guidance_scale * (eps - eps_u)
            return eps

        if jit_step:
            # t arrives as a TRACED (B,) float array: one compile serves
            # every solver step (was static -> one compile per step)
            call_model = jax.jit(call_model)

        prev_x0 = None
        prev_t = None
        for i, t_idx in enumerate(ts):
            eps = call_model(x, jnp.full((shape[0],), float(t_idx),
                                         jnp.float32))
            x0 = eps_to_x0(x, t_idx, eps)
            s_t = int(ts[i + 1]) if i + 1 < len(ts) else 0
            lam_s, lam_t = self.lambda_t[t_idx], self.lambda_t[s_t]
            h = lam_t - lam_s
            a_s, sg_s = self.alpha_t[s_t], self.sigma_t[s_t]
            sg_prev = self.sigma_t[t_idx]
            if prev_x0 is None or self.solver_order == 1:
                # DPM-Solver++(1) == DDIM in data space
                x = (sg_s / sg_prev) * x - a_s * jnp.expm1(-h) * x0
            else:
                h_prev = self.lambda_t[t_idx] - self.lambda_t[prev_t]
                r = h_prev / h if h != 0 else 1.0
                d = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * prev_x0
                x = (sg_s / sg_prev) * x - a_s * jnp.expm1(-h) * d
            prev_x0, prev_t = x0, t_idx
        return x
