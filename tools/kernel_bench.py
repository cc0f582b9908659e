"""Microbench the fused top-k attention kernel at the DiT-XL/2 operating
point, with ablations to locate the in-kernel cost (selection / predictor /
quantize)."""

import argparse
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

from mx_quantization_tpu.ops.kernels.topk_attention import fused_topk_attention


def timed_chain(fn, q, k, v, n0=2, n1=10, reps=3):
    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

    o = fn(q, k, v)
    _ = np.asarray(fetch(o))

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = q
            for _ in range(n):
                o = fn(o, k, v)  # output feeds q: true dependency
            _ = np.asarray(fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n1) - run(n0)) / (n1 - n0)


def main():
    B, H, N, D = 16, 16, 256, 72
    q = jax.random.normal(jax.random.key(0), (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, H, N, D), jnp.bfloat16)
    scale = D ** -0.5

    variants = {
        "full(ex_pred,k=154,kb16)": dict(k=154, approx=True, key_bits=16),
        "full(kb32)": dict(k=154, approx=True, key_bits=32),
        "no-predictor(sel=true)": dict(k=154, approx=False, key_bits=16),
    }
    for name, kw in variants.items():
        fn = lambda q, k_, v_, kw=kw: fused_topk_attention(
            q, k_, v_, scale=scale, out_dtype=jnp.bfloat16, **kw)
        t = timed_chain(fn, q, k, v)
        per_block = t * 1e6
        print(f"{name}: {per_block:.0f}us/call ({per_block/ (B*H):.2f}us/cell)")


if __name__ == "__main__":
    main()
