"""Isolate the fc2 (4096x4608 @ 4608x1152) quantized-linear cost."""

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

from mx_quantization_tpu.ops.fastquant import quantize_mx_fast


def timed(fn, *args, n0=2, n1=12, reps=3):
    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    o = fn(*args)
    _ = np.asarray(fetch(o))

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(*args)
            _ = np.asarray(fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n1) - run(n0)) / (n1 - n0)


M, K, N = 4096, 4608, 1152
a32 = jax.random.normal(jax.random.key(0), (M, K), jnp.float32)
a16 = a32.astype(jnp.bfloat16)
w = jax.random.normal(jax.random.key(1), (K, N), jnp.float32) * 0.02
wq = quantize_mx_fast(w, "int8", 32, 8, axis=0)


@jax.jit
def quant_only(x):
    return quantize_mx_fast(x, "int8", 32, 8, axis=-1)


@jax.jit
def mm_only(qx):
    return jnp.matmul(qx, wq, preferred_element_type=jnp.float32)


@jax.jit
def mm_plain_bf16(x):
    return jnp.matmul(x.astype(jnp.bfloat16), wq,
                      preferred_element_type=jnp.float32)


@jax.jit
def full(x):
    qx = quantize_mx_fast(x, "int8", 32, 8, axis=-1)
    return jnp.matmul(qx, wq, preferred_element_type=jnp.float32)


qa = quant_only(a32)
print("quant_only(f32 in):", timed(quant_only, a32) * 1e6, "us")
print("quant_only(bf16 in):", timed(quant_only, a16) * 1e6, "us")
print("mm_only(bf16 quantized):", timed(mm_only, qa) * 1e6, "us")
print("mm_plain_bf16(f32 in):", timed(mm_plain_bf16, a32) * 1e6, "us")
print("full(f32 in):", timed(full, a32) * 1e6, "us")
print("full(bf16 in):", timed(full, a16) * 1e6, "us")
