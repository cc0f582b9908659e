"""Microbench: XLA fast-path quantized linear vs Pallas fused mx_matmul
at the DiT-XL/2 serving shapes.  Chained-dispatch timing (see bench.py).
"""

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
from mx_matmul_ablation import mx_matmul_pallas  # retired ablation kernel


def timed_chain(fn, x, n0=2, n1=12, reps=3):
    @jax.jit
    def fetch(x):
        return jnp.sum(x.astype(jnp.float32))

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


def main():
    # DiT-XL/2 serving shapes: tokens=16*256=4096, hidden 1152
    shapes = [
        ("qkv", 4096, 1152, 3456),
        ("proj", 4096, 1152, 1152),
        ("fc1", 4096, 1152, 4608),
        ("fc2", 4096, 4608, 1152),
    ]
    for name, M, K, N in shapes:
        a = jax.random.normal(jax.random.key(0), (M, K), jnp.float32)
        w = jax.random.normal(jax.random.key(1), (K, N), jnp.float32) * 0.02
        wq = quantize_mx_fast(w, "int8", 32, 8, axis=0)  # prequantized bf16

        @jax.jit
        def xla_path(x, w=wq):
            qx = quantize_mx_fast(x, "int8", 32, 8, axis=-1)
            out = jnp.matmul(qx, w, preferred_element_type=jnp.float32)
            return out[:, :K] if out.shape[1] >= K else jnp.pad(
                out, ((0, 0), (0, K - out.shape[1])))

        @jax.jit
        def xla_bf16out(x, w=wq):
            qx = quantize_mx_fast(x, "int8", 32, 8, axis=-1)
            out = jnp.matmul(qx, w, preferred_element_type=jnp.bfloat16)
            out = out.astype(jnp.float32)
            return out[:, :K] if out.shape[1] >= K else jnp.pad(
                out, ((0, 0), (0, K - out.shape[1])))

        @jax.jit
        def pallas_path(x, w=w):
            out = mx_matmul_pallas(x, w)
            return out[:, :K] if out.shape[1] >= K else jnp.pad(
                out, ((0, 0), (0, K - out.shape[1])))

        tx = timed_chain(xla_path, a)
        tb = timed_chain(xla_bf16out, a)
        tp = timed_chain(pallas_path, a)
        ideal = 2 * M * K * N / 197e12
        print(f"{name}: XLA {tx*1e6:.0f}us  XLA-bf16out {tb*1e6:.0f}us  "
              f"Pallas {tp*1e6:.0f}us  MXU-ideal {ideal*1e6:.0f}us")


if __name__ == "__main__":
    main()
