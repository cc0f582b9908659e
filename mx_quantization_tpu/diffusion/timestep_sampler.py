"""Timestep samplers for diffusion training.

TPU-native re-implementation of the reference's
``workloads/DiT/diffusion/timestep_sampler.py`` (150 LoC): a uniform
sampler and the importance-weighted loss-second-moment resampler from
"Improved Denoising Diffusion Probabilistic Models".  The reference keeps
a per-rank history and all-gathers losses over NCCL
(``timestep_sampler.py`` LossAwareSampler.update_with_local_losses); here
the history is a fixed-size device array updated functionally, and
cross-host synchronization is a ``jax.lax.psum``-style mean handled by the
caller's data-parallel axis (no process-group code in the sampler).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class UniformSampler:
    """t ~ U{0, T-1}; weights = 1 (timestep_sampler.py UniformSampler)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, key: jax.Array, batch: int
               ) -> Tuple[jax.Array, jax.Array]:
        t = jax.random.randint(key, (batch,), 0, self.num_timesteps)
        return t, jnp.ones((batch,), jnp.float32)


class LossSecondMomentResampler:
    """Importance-sample timesteps by the running second moment of their
    loss (timestep_sampler.py LossSecondMomentResampler: history of
    ``history_per_term`` losses per t; p_t ∝ sqrt(E[L_t^2]) mixed with
    uniform by ``uniform_prob``).

    Functional state: ``state = (history (T, H), counts (T,))``; pass the
    state through the training loop carry (jit-friendly, checkpointable).
    """

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob

    def init_state(self):
        return (jnp.zeros((self.num_timesteps, self.history_per_term),
                          jnp.float32),
                jnp.zeros((self.num_timesteps,), jnp.int32))

    def _warmed_up(self, counts):
        return jnp.all(counts >= self.history_per_term)

    def weights_from_state(self, state):
        history, counts = state
        w = jnp.sqrt(jnp.mean(history ** 2, axis=-1))
        w = jnp.where(self._warmed_up(counts), w,
                      jnp.ones_like(w))  # uniform until warm
        w = w / jnp.sum(w)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / \
            self.num_timesteps
        return w

    def sample(self, key: jax.Array, batch: int, state
               ) -> Tuple[jax.Array, jax.Array]:
        """Returns (t, importance weights 1/(T p_t))."""
        p = self.weights_from_state(state)
        t = jax.random.choice(key, self.num_timesteps, (batch,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights

    def update(self, state, t: jax.Array, losses: jax.Array):
        """Record per-sample losses at their timesteps (ring-buffer per t).

        The reference rolls the oldest entry out once a term is warm
        (timestep_sampler.py:_update_with_all_losses); with a scatter we
        write each loss at slot ``counts[t] % H`` and bump the count.
        """
        history, counts = state
        slot = counts[t] % self.history_per_term
        history = history.at[t, slot].set(losses.astype(jnp.float32))
        counts = counts.at[t].add(1)
        return history, counts
