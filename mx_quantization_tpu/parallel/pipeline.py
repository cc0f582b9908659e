"""Pipeline parallelism over the stacked block axis (GPipe schedule).

The reference has no PP (SURVEY.md §2.6); the closest it gets is
diffusers' layer-wise CPU offload (text_local_inference_alpha.py:186).
Here the stacked parameter layout (models/stacked.py) makes PP natural:
shard the depth axis over a mesh axis, run microbatches through the
stages, and hand activations forward with ``lax.ppermute`` over ICI.

SPMD schedule: every stage executes every step; stages outside their
active window compute masked garbage (the standard collective-permute
pipeline).  Bubble fraction is (P-1)/(n_micro+P-1).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_blocks(stacked, body: Callable, x: jax.Array, mesh: Mesh,
                    axis: str = "model", n_micro: int = 4) -> jax.Array:
    """Apply ``body(block_params, x) -> x`` for every block in the stacked
    pytree, pipelined over ``mesh`` axis ``axis``.

    * ``stacked``: pytree with leading depth axis D; D % P == 0 (P = axis
      size).  Stage s owns blocks [s*D/P, (s+1)*D/P).
    * ``x``: (B, ...) activations; B % n_micro == 0.
    * ``body`` must be uniform across blocks (per-block static configs
      can't vary inside a pipeline stage — run_blocks handles that case on
      a single stage instead).

    Returns the same result as the sequential scan, bit-for-bit (same
    per-block op order), with stage-to-stage ICI transfers of one
    microbatch activation per step.
    """
    P_ = mesh.shape[axis]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    assert depth % P_ == 0, (depth, P_)
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    micro = x.reshape((n_micro, mb) + x.shape[1:])
    perm = [(i, i + 1) for i in range(P_ - 1)]

    param_specs = jax.tree.map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked)

    def stage_fn(local_stack, micro):
        s = jax.lax.axis_index(axis)
        T = n_micro + P_ - 1

        def run_local(xm):
            def scan_body(carry, bp):
                return body(bp, carry), None
            out, _ = jax.lax.scan(scan_body, xm, local_stack)
            return out

        def step(carry, t):
            recv, acc = carry
            idx = jnp.clip(t - s, 0, n_micro - 1)
            fresh = jax.lax.dynamic_index_in_dim(micro, idx, 0,
                                                 keepdims=False)
            inp = jnp.where(s == 0, fresh, recv)
            out = run_local(inp)
            active = jnp.logical_and(t >= s, t - s < n_micro)
            out = jnp.where(active, out, jnp.zeros_like(out))
            # last stage banks its finished microbatch
            bank = jnp.logical_and(s == P_ - 1, active)
            acc = jax.lax.dynamic_update_index_in_dim(
                acc, jnp.where(bank, out, jax.lax.dynamic_index_in_dim(
                    acc, idx, 0, keepdims=False)), idx, 0)
            nxt = jax.lax.ppermute(out, axis, perm) if P_ > 1 else out
            return (nxt, acc), None

        acc0 = jnp.zeros_like(micro)
        recv0 = jnp.zeros_like(micro[0])
        (_, acc), _ = jax.lax.scan(step, (recv0, acc0), jnp.arange(T))
        # only stage P-1 holds the result; psum broadcasts it everywhere
        acc = jnp.where(s == P_ - 1, acc, jnp.zeros_like(acc))
        return jax.lax.psum(acc, axis)

    other_axes = tuple(a for a in mesh.axis_names if a != axis)
    out = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        check_rep=False,
    )(stacked, micro)
    return out.reshape((B,) + x.shape[1:])
