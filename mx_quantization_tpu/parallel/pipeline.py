"""Pipeline parallelism over the stacked block axis (GPipe schedule).

The reference has no PP (SURVEY.md §2.6); the closest it gets is
diffusers' layer-wise CPU offload (text_local_inference_alpha.py:186).
Here the stacked parameter layout (models/stacked.py) makes PP natural:
shard the depth axis over a mesh axis, run microbatches through the
stages, and hand activations forward with ``lax.ppermute`` over ICI.

SPMD schedule: every stage executes every step; stages outside their
active window compute masked garbage (the standard collective-permute
pipeline).  Bubble fraction is (P-1)/(n_micro+P-1).

Activations may be an arbitrary PYTREE of (B, ...) arrays (e.g. DiT
carries (tokens, conditioning)), and per-block static configs may vary:
pass ``flags`` (a (D,) int32 array of branch indices) + ``branches`` (the
list of ``body(block_params, x) -> x`` callables) — the same
switch-on-scanned-flag scheme as models/stacked.run_blocks, so
exclude_blocks models pipeline too.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_blocks(stacked, body: Optional[Callable], x, mesh: Mesh,
                    axis: str = "model", n_micro: int = 4,
                    flags=None, branches: Optional[Sequence[Callable]] = None):
    """Apply the per-block body for every block in the stacked pytree,
    pipelined over ``mesh`` axis ``axis``.

    * ``stacked``: pytree with leading depth axis D; D % P == 0 (P = axis
      size).  Stage s owns blocks [s*D/P, (s+1)*D/P).
    * ``x``: pytree of (B, ...) activations; B % n_micro == 0.
    * homogeneous blocks: pass ``body(block_params, x) -> x``.
      heterogeneous blocks: pass ``flags`` ((D,) int32 branch index per
      block) + ``branches`` (list of bodies); ``body`` is ignored.

    Returns the same result as the sequential scan, bit-for-bit (same
    per-block op order), with stage-to-stage ICI transfers of one
    microbatch activation per step.
    """
    P_ = mesh.shape[axis]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    assert depth % P_ == 0, (depth, P_)
    B = jax.tree.leaves(x)[0].shape[0]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    micro = jax.tree.map(
        lambda a: a.reshape((n_micro, mb) + a.shape[1:]), x)
    perm = [(i, i + 1) for i in range(P_ - 1)]

    param_specs = jax.tree.map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked)

    het = flags is not None
    if het:
        flags = jnp.asarray(flags, jnp.int32)
        assert flags.shape == (depth,), flags.shape

    def stage_fn(local_stack, local_flags, micro):
        s = jax.lax.axis_index(axis)
        T = n_micro + P_ - 1

        def run_local(xm):
            if het:
                def scan_body(carry, xs):
                    bp, flag = xs
                    return jax.lax.switch(flag, list(branches), bp,
                                          carry), None
                out, _ = jax.lax.scan(scan_body, xm,
                                      (local_stack, local_flags))
            else:
                def scan_body(carry, bp):
                    return body(bp, carry), None
                out, _ = jax.lax.scan(scan_body, xm, local_stack)
            return out

        def step(carry, t):
            recv, acc = carry
            idx = jnp.clip(t - s, 0, n_micro - 1)
            fresh = jax.tree.map(
                lambda m: jax.lax.dynamic_index_in_dim(m, idx, 0,
                                                       keepdims=False),
                micro)
            inp = jax.tree.map(lambda f, r: jnp.where(s == 0, f, r),
                               fresh, recv)
            out = run_local(inp)
            active = jnp.logical_and(t >= s, t - s < n_micro)
            out = jax.tree.map(
                lambda o: jnp.where(active, o, jnp.zeros_like(o)), out)
            # last stage banks its finished microbatch
            bank = jnp.logical_and(s == P_ - 1, active)

            def bank_one(a, o):
                cur = jax.lax.dynamic_index_in_dim(a, idx, 0,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    a, jnp.where(bank, o, cur), idx, 0)

            acc = jax.tree.map(bank_one, acc, out)
            if P_ > 1:
                nxt = jax.tree.map(
                    lambda o: jax.lax.ppermute(o, axis, perm), out)
            else:
                nxt = out
            return (nxt, acc), None

        acc0 = jax.tree.map(jnp.zeros_like, micro)
        recv0 = jax.tree.map(lambda m: jnp.zeros_like(m[0]), micro)
        (_, acc), _ = jax.lax.scan(step, (recv0, acc0), jnp.arange(T))
        # only stage P-1 holds the result; psum broadcasts it everywhere
        acc = jax.tree.map(
            lambda a: jax.lax.psum(
                jnp.where(s == P_ - 1, a, jnp.zeros_like(a)), axis), acc)
        return acc

    flag_arg = flags if het else jnp.zeros((depth,), jnp.int32)
    out = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(param_specs, P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )(stacked, flag_arg, micro)
    return jax.tree.map(
        lambda o, orig: o.reshape((B,) + orig.shape[1:]), out, x)
