"""Microbench k-th-largest selection strategies inside a Pallas kernel.

Isolates the binary-search count loop at the fused-attention shape:
grid of 64 steps x 4 cells, each cell a (256, 256) int32 key matrix,
k=154, 17 iterations (key_bits=16 range).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

N, CELLS, G = 256, 4, 256
K = 154
LO, HI = -32769, 32768
ITERS = 17


def body_vpu(keys, k):
    lo = jnp.full((N, 1), jnp.int32(LO))
    hi = jnp.full((N, 1), jnp.int32(HI))

    def body(_, state):
        lo, hi = state
        mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
        cnt = jnp.sum((keys > mid).astype(jnp.int32), axis=1, keepdims=True)
        up = cnt >= k
        return jnp.where(up, mid + 1, lo), jnp.where(up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, ITERS, body, (lo, hi))
    return lo


def body_mxu(keys, k):
    lo = jnp.full((N, 1), jnp.int32(LO))
    hi = jnp.full((N, 1), jnp.int32(HI))
    ones = jnp.ones((N, 8), jnp.bfloat16)
    zero = jnp.zeros((N, N), jnp.float32)
    one = jnp.ones((N, N), jnp.float32)
    kf = jnp.float32(k)

    def body(_, state):
        lo, hi = state
        mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
        gt = jnp.where(keys > mid, one, zero).astype(jnp.bfloat16)
        cnt = jax.lax.dot_general(gt, ones, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        up = cnt[:, :1] >= kf
        return jnp.where(up, mid + 1, lo), jnp.where(up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, ITERS, body, (lo, hi))
    return lo


def body_while(keys, k):
    lo = jnp.full((N, 1), jnp.int32(LO))
    hi = jnp.full((N, 1), jnp.int32(HI))

    def cond(state):
        lo, hi = state
        return jnp.max(hi - lo) > 0

    def body(state):
        lo, hi = state
        mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
        cnt = jnp.sum((keys > mid).astype(jnp.int32), axis=1, keepdims=True)
        up = cnt >= k
        return jnp.where(up, mid + 1, lo), jnp.where(up, hi, mid)

    lo, hi = jax.lax.while_loop(cond, body, (lo, hi))
    return lo


def make(body_fn):
    def kern(x_ref, o_ref):
        for c in range(CELLS):
            keys = jax.lax.shift_right_arithmetic(
                jax.lax.bitcast_convert_type(
                    x_ref[c].astype(jnp.float32), jnp.int32), 16)
            kth = body_fn(keys, K)
            o_ref[c] = jnp.broadcast_to(kth.astype(jnp.float32), (N, N))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(G // CELLS,),
            in_specs=[pl.BlockSpec((CELLS, N, N), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CELLS, N, N), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, N, N), jnp.float32),
        )(x)

    return run


def timed_chain(fn, x, n0=1, n1=6, reps=3):
    @jax.jit
    def fetch(x):
        return jnp.sum(x)

    o = fn(x)
    _ = np.asarray(fetch(o))

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = x
            for _ in range(n):
                o = fn(o)
            _ = np.asarray(fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n1) - run(n0)) / (n1 - n0)


x = jax.random.normal(jax.random.key(0), (G, N, N), jnp.float32)

ref = None
for name, bf in [("vpu", body_vpu), ("mxu", body_mxu), ("while", body_while)]:
    fn = make(bf)
    out = np.asarray(fn(x))
    if ref is None:
        ref = out
    else:
        print(f"  {name} matches vpu: {np.array_equal(out, ref)}", flush=True)
    t = timed_chain(fn, x)
    print(f"{name}: {t*1e6:.0f}us/call", flush=True)
