"""Stacked-block utilities: params for N identical blocks are stored as one
pytree with a leading depth axis, and homogeneous runs of blocks execute
under ``lax.scan``.

Why: an unrolled 28-block quantized DiT-XL/2 produces a huge XLA graph
(every MX fake-quant expands into bit-twiddling subgraphs) and minutes of
compile time.  Scanning compiles ONE block and reuses it.  Blocks whose
static config differs (e.g. the reference's exclude_blocks / last-block
rules) break the scan into runs: consecutive blocks with identical configs
scan together, odd ones run unrolled.

The stacked layout is also the natural substrate for pipeline parallelism
(shard the depth axis) and for fast checkpoint conversion.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence

import jax
import jax.numpy as jnp


def stack_blocks(blocks: Sequence[Any]):
    """List of per-block pytrees -> single pytree with leading depth axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def unstack_block(stacked, i: int):
    """Select block i from a stacked pytree (lazy slice under jit)."""
    return jax.tree.map(lambda a: a[i], stacked)


def slice_blocks(stacked, start: int, stop: int):
    return jax.tree.map(lambda a: a[start:stop], stacked)


def depth_of(stacked) -> int:
    return jax.tree.leaves(stacked)[0].shape[0]


def run_blocks(stacked, cfgs: Sequence[Any], body: Callable, x,
               unroll_threshold: int = 1):
    """Apply ``body(block_params, cfg, x) -> x`` for each block in order.

    Consecutive blocks with equal (hashable) ``cfg`` execute as one
    ``lax.scan`` over their stacked params; singleton runs are unrolled.
    """
    depth = len(cfgs)
    runs: List[tuple] = []  # (start, stop, cfg)
    start = 0
    for i in range(1, depth + 1):
        if i == depth or cfgs[i] != cfgs[start]:
            runs.append((start, i, cfgs[start]))
            start = i

    for (s, e, cfg) in runs:
        n = e - s
        if n <= unroll_threshold:
            for i in range(s, e):
                x = body(unstack_block(stacked, i), cfg, x)
        else:
            seg = slice_blocks(stacked, s, e)

            def scan_body(carry, bp, cfg=cfg):
                return body(bp, cfg, carry), None

            x, _ = jax.lax.scan(scan_body, x, seg)
    return x
