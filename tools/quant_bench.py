"""Chained-dispatch microbench: XLA quantize_mx_fast vs Pallas
mx_quantize_pallas at DiT activation shapes, plus fused linear variants."""

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
from mx_quantization_tpu.ops.kernels.quantize import mx_quantize_pallas


def timed_chain(fn, x, n0=2, n1=12, reps=3):
    """fn must map x -> same shape+dtype; chained for true dependency."""
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
    for name, M, K in [("qkv-in", 4096, 1152), ("fc2-in", 4096, 4608)]:
        a = (jax.random.normal(jax.random.key(0), (M, K), jnp.float32)
             .astype(jnp.bfloat16))

        @jax.jit
        def xla_q(x):
            return quantize_mx_fast(x, "int8", 32, 8, axis=-1,
                                    out_dtype=jnp.bfloat16)

        @jax.jit
        def pallas_q(x):
            return mx_quantize_pallas(x, "int8", 32, 8,
                                      out_dtype=jnp.bfloat16)

        # parity first
        d = jnp.abs(xla_q(a).astype(jnp.float32) -
                    pallas_q(a).astype(jnp.float32)).max()
        tx = timed_chain(xla_q, a)
        tp = timed_chain(pallas_q, a)
        ideal = 2 * M * K * 2 / 1.6e12  # bf16 read+write at ~1.6 TB/s
        print(f"{name}: XLA {tx*1e6:.0f}us  Pallas {tp*1e6:.0f}us  "
              f"mem-ideal {ideal*1e6:.0f}us  maxdiff {float(d):.2e}")

        # fused linear: quantize (either way) + bf16 matmul, chained via
        # square weight to keep shape
        w = (0.02 * jax.random.normal(jax.random.key(1), (K, K))
             ).astype(jnp.bfloat16)

        @jax.jit
        def lin_xla(x):
            qx = quantize_mx_fast(x, "int8", 32, 8, axis=-1,
                                  out_dtype=jnp.bfloat16)
            return jnp.matmul(qx, w, preferred_element_type=jnp.bfloat16)

        @jax.jit
        def lin_pallas(x):
            qx = mx_quantize_pallas(x, "int8", 32, 8, out_dtype=jnp.bfloat16)
            return jnp.matmul(qx, w, preferred_element_type=jnp.bfloat16)

        tlx = timed_chain(lin_xla, a)
        tlp = timed_chain(lin_pallas, a)
        mm_ideal = 2 * M * K * K / 918e12
        print(f"  linear({K}x{K}): XLA {tlx*1e6:.0f}us  "
              f"Pallas {tlp*1e6:.0f}us  mxu-ideal {mm_ideal*1e6:.0f}us")


if __name__ == "__main__":
    main()
