"""Continuous-batching diffusion serving.

The BASELINE north star calls for "a continuous-batching diffusion/vision
serving loop" — a capability the reference lacks entirely (its drivers batch
statically).  Design:

  * The server keeps a fixed pool of ``slots`` (the compiled batch size).
    Every engine step runs ONE denoising step for all active slots — each
    slot carries its own timestep index, latent, and condition, exploiting
    that the model takes per-sample timesteps.  Slots at different denoise
    depths coexist in one batch, so new requests start immediately instead
    of waiting for the current batch to finish (classic continuous
    batching, applied to diffusion).
  * Finished slots emit their sample and are refilled from the queue in the
    same step.  The jitted step function is shape-stable: (slots, C, H, W)
    latents + (slots,) timestep indices + (slots,) conditions + an active
    mask.  Inactive slots run dummy compute (masked out) — on TPU a masked
    lane is cheaper than a recompile.
  * CFG is folded in by doubling the model batch inside the step.

Works with any epsilon/learned-variance model (DiT here); sharding the slot
axis over the mesh "data" axis scales it to a pod slice.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion import GaussianDiffusion, create_diffusion


@dataclasses.dataclass
class Request:
    request_id: int
    condition: object            # class label (DiT) or a condition pytree
    # (PixArt: {"embeds": (L, 4096), "mask": (L,)} — any structure matching
    # the server's null_condition)
    cfg_scale: float = 4.0
    key: Optional[np.ndarray] = None


@dataclasses.dataclass
class Result:
    request_id: int
    latent: np.ndarray
    steps: int
    latency_s: float


class DiffusionServer:
    """Continuous-batching sampler around a CFG denoise model.

    model_fn(latents (S,C,H,W), t (S,), cond) -> (S, 2C, H, W)

    ``cond`` is a pytree whose leaves are batched on axis 0 (slots):
    an int label array for DiT, or e.g. {"embeds": (S, L, 4096),
    "mask": (S, L)} for PixArt text conditioning.  ``null_condition``
    supplies the per-request null (CFG) value with the same structure
    (unbatched); requests carry conditions of that structure.
    """

    def __init__(self, model_fn: Callable, latent_shape, num_steps: int,
                 slots: int = 8, null_condition: int = 1000,
                 cfg_scale: float = 4.0, seed: int = 0, mesh=None):
        self.model_fn = model_fn
        self.mesh = mesh
        self.latent_shape = tuple(latent_shape)  # (C, H, W)
        self.slots = slots
        self.null_condition = null_condition
        self.cfg_scale = cfg_scale
        self.diffusion = create_diffusion(str(num_steps))
        self.num_steps = self.diffusion.num_timesteps

        self._queue: "queue.Queue[Request]" = queue.Queue()
        self._results: Dict[int, Result] = {}
        self._done = threading.Event()
        self._key = jax.random.key(seed)

        # slot state (host side)
        C, H, W = self.latent_shape
        self._lat = np.zeros((slots, C, H, W), np.float32)
        self._step_idx = np.zeros((slots,), np.int32)   # next spaced step
        self._null = jax.tree.map(np.asarray, null_condition)
        self._cond = jax.tree.map(
            lambda n: np.broadcast_to(n, (slots,) + np.shape(n)).copy(),
            self._null)
        self._active = np.zeros((slots,), bool)
        self._req: List[Optional[Request]] = [None] * slots
        self._t0 = np.zeros((slots,), np.float64)

        if mesh is None:
            self._step_jit = jax.jit(self._engine_step)
        else:
            # pod-slice serving: slots shard over the mesh "data" axis (DP);
            # weights arrive TP/FSDP-sharded inside model_fn (the caller
            # shards params with parallel.mesh helpers), so every engine
            # step runs SPMD with XLA-inserted ICI collectives
            from jax.sharding import NamedSharding, PartitionSpec
            ndata = mesh.shape["data"]
            if slots % ndata:
                raise ValueError(f"slots={slots} must divide over the "
                                 f"data axis ({ndata} devices)")
            s1 = NamedSharding(mesh, PartitionSpec("data"))
            s4 = NamedSharding(mesh, PartitionSpec("data", None, None, None))
            rep = NamedSharding(mesh, PartitionSpec())
            cond_sh = jax.tree.map(
                lambda n: NamedSharding(
                    mesh, PartitionSpec("data", *([None] * np.ndim(n)))),
                self._null)
            self._step_jit = jax.jit(
                self._engine_step,
                in_shardings=(s4, s1, cond_sh, s1, rep), out_shardings=s4)

    # ------------------------------------------------------------------
    def _engine_step(self, lat, step_idx, cond, active, key):
        """One denoise step for every slot at its own timestep."""
        S = self.slots
        diff = self.diffusion
        t = jnp.asarray(diff.timestep_map)[step_idx].astype(jnp.float32)

        # CFG doubling: cond batch then null batch
        lat2 = jnp.concatenate([lat, lat], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        cond2 = jax.tree.map(
            lambda c, n: jnp.concatenate(
                [c, jnp.broadcast_to(jnp.asarray(n), c.shape)], axis=0),
            cond, self._null)
        out = self.model_fn(lat2, t2, cond2)
        eps_all, rest = out[:, :3], out[:, 3:]
        c_eps, u_eps = jnp.split(eps_all, 2, axis=0)
        eps = u_eps + self.cfg_scale * (c_eps - u_eps)
        model_out = jnp.concatenate([eps, rest[:S]], axis=1)

        mean, log_var, _ = diff.p_mean_variance(model_out, lat, step_idx)
        noise = jax.random.normal(key, lat.shape, lat.dtype)
        nonzero = (step_idx > 0).astype(lat.dtype)[:, None, None, None]
        new_lat = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        new_lat = jnp.where(active[:, None, None, None], new_lat, lat)
        return new_lat

    # ------------------------------------------------------------------
    def submit(self, req: Request) -> int:
        self._queue.put(req)
        return req.request_id

    def _fill_slots(self):
        for s in range(self.slots):
            if self._active[s]:
                continue
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            self._key, rk = jax.random.split(self._key)
            C, H, W = self.latent_shape
            self._lat[s] = np.asarray(
                jax.random.normal(rk, (C, H, W)), np.float32)
            self._step_idx[s] = self.num_steps - 1
            def put(buf, val):
                buf[s] = np.asarray(val)
            jax.tree.map(put, self._cond, req.condition)
            self._active[s] = True
            self._req[s] = req
            self._t0[s] = time.time()

    def step(self) -> List[Result]:
        """Run one engine step; returns finished results."""
        self._fill_slots()
        if not self._active.any():
            return []
        self._key, sk = jax.random.split(self._key)
        new_lat = self._step_jit(jnp.asarray(self._lat),
                                 jnp.asarray(self._step_idx),
                                 jax.tree.map(jnp.asarray, self._cond),
                                 jnp.asarray(self._active), sk)
        self._lat = np.array(new_lat)  # writable copy (asarray is read-only)

        finished: List[Result] = []
        for s in range(self.slots):
            if not self._active[s]:
                continue
            if self._step_idx[s] == 0:
                req = self._req[s]
                res = Result(req.request_id, self._lat[s].copy(),
                             self.num_steps, time.time() - self._t0[s])
                self._results[req.request_id] = res
                finished.append(res)
                self._active[s] = False
                self._req[s] = None
            else:
                self._step_idx[s] -= 1
        return finished

    def run_until_drained(self, max_steps: int = 100000) -> Dict[int, Result]:
        """Serve until the queue and all slots are empty."""
        for _ in range(max_steps):
            self.step()
            if self._queue.empty() and not self._active.any():
                break
        return self._results
