"""In-run micro-bench: unfused gelu + quantize-kernel chain vs the fused
gelu_quantize_pallas at the DiT fc2-input site (M=2B*N=16384, K=4608).

The unfused chain is what the serving step runs through round 4
(models/dit.py: XLA gelu feeding mx_quantize_pallas); the fused kernel is
round-5 verdict ask #2.  Also times the raw quantize kernel (no gelu) as
the floor reference.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mx_quantization_tpu.ops.kernels.quantize import (gelu_quantize_pallas,
                                                      mx_quantize_pallas)

M, K = 16384, 4608
x = (jax.random.normal(jax.random.key(0), (M, K), jnp.float32)
     ).astype(jnp.bfloat16)

@jax.jit
def unfused(x):
    g = jax.nn.gelu(x, approximate=True)
    return mx_quantize_pallas(g, "int8", 32, 8, bfloat=16)

@jax.jit
def fused(x):
    return gelu_quantize_pallas(x, "int8", 32, 8, bfloat=16)

@jax.jit
def quant_only(x):
    return mx_quantize_pallas(x, "int8", 32, 8, bfloat=16)

@jax.jit
def fetch(o):
    return jnp.sum(o.astype(jnp.float32))

def timed(fn, n0=4, n1=24, reps=3):
    o = fn(x); _ = np.asarray(fetch(o))
    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(x)
            _ = np.asarray(fetch(o))
            best = min(best, time.perf_counter() - t0)
        return best
    return (run(n1) - run(n0)) / (n1 - n0)

hbm_bound = (M * K * 2 * 2) / 819e9  # bf16 read+write at ~819 GB/s
for name, fn in [("quant_only", quant_only), ("unfused gelu+quant", unfused),
                 ("fused gelu_quant", fused)]:
    t = timed(fn)
    print(f"{name}: {t*1e6:.0f} us  ({t/hbm_bound:.2f}x memory bound)",
          flush=True)


def step_ab():
    """In-run A/B: full serving step with fuse_gelu on vs off (one
    process, dispatch-chained timing — the only trustworthy comparison
    through the tunnel)."""
    import dataclasses
    from mx_quantization_tpu.models import (DiT_models, DiTQuantConfig,
                                            dit_forward_with_cfg, init_dit)
    from mx_quantization_tpu.workloads.dit import dit_mx_specs
    from mx_quantization_tpu.utils.prequantize import prequantize_weights

    specs = dit_mx_specs("fused")
    cfg = DiT_models["DiT-XL/2"](input_size=32)
    params = init_dit(jax.random.key(0), cfg)
    q_params, specs = prequantize_weights(params, specs,
                                          serve_dtype=jnp.bfloat16)
    B = 32
    xx = 0.1 * jax.random.normal(jax.random.key(1), (2 * B, 4, 32, 32))
    tt = jnp.full((2 * B,), 500.0)
    yy = jnp.concatenate([jnp.arange(B) % 1000, jnp.full((B,), 1000)]
                         ).astype(jnp.int32)
    base = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                          k=154, ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=(27,), topk_key_bits=8,
                          activation_dtype="bfloat16", contract="serving")

    def timed_step(qcfg):
        @jax.jit
        def step(p, x):
            out = dit_forward_with_cfg(p, x, tt, yy, cfg, qcfg,
                                       cfg_scale=4.0)
            return x - 0.01 * out[:, :4]

        o = step(q_params, xx)
        _ = np.asarray(fetch(o))

        def run(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = xx
                for _ in range(n):
                    o = step(q_params, o)
                _ = np.asarray(fetch(o))
                best = min(best, time.perf_counter() - t0)
            return best
        return (run(7) - run(1)) / 6

    for name, qc in [("fuse_gelu=True", base),
                     ("fuse_gelu=False",
                      dataclasses.replace(base, fuse_gelu=False)),
                     ("fuse_gelu=True (re)", base)]:
        t = timed_step(qc)
        print(f"{name}: {t*1e3:.2f} ms/step -> {B/(t*100):.4f} imgs/sec "
              "@100 steps", flush=True)


if len(sys.argv) > 1 and sys.argv[1] == "--step":
    step_ab()
