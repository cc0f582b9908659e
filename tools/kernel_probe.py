"""Time the PRODUCTION fused top-k attention kernel at the DiT bench shape.

Ground-truth numbers for the kernel roofline: B*H cells at N=S=256, D=72,
k=154, ex_pred, key_bits=8, bfloat=16 (the exact bench.py operating point).
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

from mx_quantization_tpu.ops.kernels.topk_attention import fused_topk_attention

B, H, N, D = 16, 16, 256, 72
K = 154
SCALE = D ** -0.5


def timed_chain(fn, q, k, v, n0=1, n1=8, reps=3):
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
                o = fn(o[..., :D].astype(q.dtype), k, v)
            _ = np.asarray(fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n1) - run(n0)) / (n1 - n0)


def main():
    q = jax.random.normal(jax.random.key(0), (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, H, N, D), jnp.bfloat16)

    for key_bits in (8, 16, 32):
        @jax.jit
        def fn(q, k, v, key_bits=key_bits):
            return fused_topk_attention(
                q, k, v, k=K, scale=SCALE, approx=True, pred_mode="ex_pred",
                key_bits=key_bits, out_dtype=jnp.bfloat16, bfloat=16)
        t = timed_chain(fn, q, k, v)
        print(f"prod key_bits={key_bits}: {t*1e6:.0f}us/call", flush=True)

    # dense path (k >= S)
    @jax.jit
    def fd(q, k, v):
        return fused_topk_attention(
            q, k, v, k=N, scale=SCALE, approx=False,
            key_bits=8, out_dtype=jnp.bfloat16, bfloat=16)
    t = timed_chain(fd, q, k, v)
    print(f"prod dense(k=S): {t*1e6:.0f}us/call", flush=True)


if __name__ == "__main__":
    main()


def fp_point():
    """MXFP8-e4m3 kernel timing point (round-3: fp formats in-kernel)."""
    q = jax.random.normal(jax.random.key(0), (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, H, N, D), jnp.bfloat16)

    @jax.jit
    def fn(q, k, v):
        return fused_topk_attention(
            q, k, v, k=K, scale=SCALE, approx=True, pred_mode="ex_pred",
            key_bits=8, out_dtype=jnp.bfloat16, bfloat=16,
            mbits=5, ebits=4, emax=8, max_norm=448.0)
    t = timed_chain(fn, q, k, v)
    print(f"prod mxfp8_e4m3 key_bits=8: {t*1e6:.0f}us/call", flush=True)


if os.environ.get("FP") == "1":
    fp_point()
