"""Isolate the DiT patch-embed (B=16, 4x32x32 -> 256 tokens x 1152) cost
and compare lowering strategies."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def timed(fn, *args, n0=2, n1=20, reps=3):
    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    o = fn(*args)
    _ = np.asarray(fetch(o))

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            os_ = [fn(*args) for _ in range(n)]
            _ = np.asarray(fetch(os_[-1]))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n1) - run(n0)) / (n1 - n0)


B, C, Hs, Ws, p, Dm = 16, 4, 32, 32, 2, 1152
x = jax.random.normal(jax.random.key(0), (B, C, Hs, Ws), jnp.float32)
w = 0.02 * jax.random.normal(jax.random.key(1), (Dm, C, p, p), jnp.float32)
b = jnp.zeros((Dm,))


@jax.jit
def im2col_matmul(x):
    cols = x.reshape(B, C, Hs // p, p, Ws // p, p)
    cols = cols.transpose(0, 2, 4, 1, 3, 5).reshape(B, -1, C * p * p)
    xb = cols.astype(jnp.bfloat16)
    wb = w.reshape(Dm, -1).T.astype(jnp.bfloat16)
    return jnp.matmul(xb, wb, preferred_element_type=jnp.float32) + b


@jax.jit
def conv_direct(x):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (p, p), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    out = out + b.reshape(1, -1, 1, 1)
    return out.reshape(B, Dm, -1).transpose(0, 2, 1)


@jax.jit
def conv_nhwc(x):
    xn = x.transpose(0, 2, 3, 1).astype(jnp.bfloat16)
    wn = w.transpose(2, 3, 1, 0).astype(jnp.bfloat16)  # HWIO
    out = jax.lax.conv_general_dilated(
        xn, wn, (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return out.reshape(B, -1, Dm) + b


@jax.jit
def strided_sum(x):
    xb = x.astype(jnp.bfloat16)
    acc = None
    for i in range(p):
        for j in range(p):
            xs = xb[:, :, i::p, j::p]           # (B, C, 16, 16)
            xs = xs.reshape(B, C, -1)           # (B, C, 256)
            term = jnp.einsum("bcn,dc->bnd", xs, w[:, :, i, j].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    return acc + b


for name, fn in [("im2col_matmul", im2col_matmul),
                 ("conv_direct", conv_direct),
                 ("conv_nhwc", conv_nhwc),
                 ("strided_sum", strided_sum)]:
    r = np.asarray(fn(x), np.float32)
    ref = np.asarray(im2col_matmul(x), np.float32)
    err = np.abs(r - ref).max()
    t = timed(fn, x)
    print(f"{name}: {t*1e6:.0f}us  maxdiff={err:.2e}")
