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

    All blocks execute under ONE ``lax.scan`` over the full stacked params;
    blocks whose static ``cfg`` differs (e.g. exclude_blocks) dispatch via
    ``lax.switch`` on a scanned per-block flag.  Slicing the stack into
    homogeneous runs instead (the previous design) made XLA materialize a
    copy of every sliced weight stack on each step — 6.5 ms/step (~8%) on
    the DiT-XL/2 bench.
    """
    depth = len(cfgs)
    uniq: List[Any] = []
    for c in cfgs:
        if not any(c == u for u in uniq):
            uniq.append(c)

    if len(uniq) == 1:
        def scan_body(carry, bp):
            return body(bp, cfgs[0], carry), None

        x, _ = jax.lax.scan(scan_body, x, stacked)
        return x

    flags = jnp.asarray([next(j for j, u in enumerate(uniq) if c == u)
                         for c in cfgs], jnp.int32)
    branches = [(lambda bp, carry, cfg=cfg: body(bp, cfg, carry))
                for cfg in uniq]

    def scan_body(carry, xs):
        bp, flag = xs
        return jax.lax.switch(flag, branches, bp, carry), None

    x, _ = jax.lax.scan(scan_body, x, (stacked, flags))
    return x
