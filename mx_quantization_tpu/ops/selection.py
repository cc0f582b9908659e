"""Exact k-th largest selection without sorting.

TPU sorts are the dominant cost of the dense top-k mask (a full bitonic sort
per attention row); the k-th value is all we need.  This module finds it by
binary search over the monotonic integer encoding of fp32 (32 vectorized
count passes, ~2x faster than sort at N=256 and increasingly better for
longer rows), exactly — ties and all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SIGN = -2147483648  # 0x80000000 (python int: no import-time backend init)


def monotonic_keys(x: jax.Array) -> jax.Array:
    """int32 keys whose signed order equals the float order of x.

    b >= 0 -> b;  b < 0 -> ~b ^ 0x80000000.  (-0 maps just below +0; they
    compare equal as floats only through exact ties, which the callers'
    tie-rank logic handles identically either way.)
    """
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return jnp.where(b >= 0, b, jnp.bitwise_xor(jnp.invert(b), _SIGN))


def kth_largest_keys(keys: jax.Array, k: int) -> jax.Array:
    """Per-row k-th largest of int32 keys along the last axis (exact).

    Returns (...,) keys.  Binary search for the smallest t with
    count(keys > t) < k.
    """
    shape = keys.shape[:-1]
    lo = jnp.full(shape, jnp.int32(-2147483648))
    hi = jnp.full(shape, jnp.int32(2147483647))

    def body(_, state):
        lo, hi = state
        span = hi - lo  # may wrap; treat as unsigned
        mid = lo + jax.lax.shift_right_logical(span, 1)
        cnt = jnp.sum((keys > mid[..., None]).astype(jnp.int32), axis=-1)
        go_up = cnt >= k
        lo = jnp.where(go_up, mid + 1, lo)
        hi = jnp.where(go_up, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return lo


def kth_largest(x: jax.Array, k: int) -> jax.Array:
    """Per-row k-th largest float along the last axis, exact (==
    jnp.sort(x)[..., n-k])."""
    t = kth_largest_keys(monotonic_keys(x), k)
    # invert the key map
    back = jnp.where(t >= 0, t, jnp.invert(jnp.bitwise_xor(t, _SIGN)))
    return jax.lax.bitcast_convert_type(back, jnp.float32)
