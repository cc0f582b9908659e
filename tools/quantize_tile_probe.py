"""Tile-size probe for the activation-quantize kernel at the fc2-input
shape (the largest single quantize site in the serving step profile:
13.6 ms/step at ~1.3x memory bound, (2B*N, 4608) bf16).

Round-3 tried RAISING the budget (256 rows at K=4608 via 64MB vmem):
regressed.  This probes SMALLER tiles (finer DMA pipelining won before)
plus the neighboring sites' shapes.  In-run deltas only.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
import jax.numpy as jnp
os.makedirs("/root/repo/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from mx_quantization_tpu.ops.kernels.quantize import mx_quantize_pallas

def timed(fn, x, n0=8, n1=72, reps=4):
    fetch = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    _ = np.asarray(fetch(fn(x)))
    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); o = x
            for _ in range(n):
                o = fn(o)
            _ = np.asarray(fetch(o)); best = min(best, time.perf_counter()-t0)
        return best
    return (run(n1) - run(n0)) / (n1 - n0)

for (M, K) in ((16384, 4608), (16384, 1152)):
    x = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
    base = None
    for tr in (32, 64, 128, 256):
        @jax.jit
        def f(x, tr=tr):
            return mx_quantize_pallas(x, "int8", tile_rows=tr,
                                      out_dtype=jnp.bfloat16)
        try:
            o = np.asarray(f(x))
            t = timed(f, x) * 1e6
            if base is None:
                base = np.asarray(f(x), np.float32)
            ok = np.array_equal(np.asarray(f(x), np.float32), base)
            print(f"({M},{K}) tile_rows={tr}: {t:.0f}us bitexact={ok}",
                  flush=True)
        except Exception as e:
            print(f"({M},{K}) tile_rows={tr}: FAIL {str(e)[:100]}",
                  flush=True)

# MEASURED (round 4, in-run): (16384,4608) tile_rows 32/64/128/256 ->
# 1498/756/481/479us (256 is capped to 128 internally - same config);
# (16384,1152) -> 457/263/168/163us.  The shipped sizing is optimal;
# finer tiles LOSE here (the round-3 "finer tiles pipeline DMA better"
# observation applied to raising the cap, not to sub-128 tiles).  The
# fc2-input site's ~1.3x-over-memory-bound gap is VPU compute on the f32
# intermediates, not tiling - 27 blocks x 481us = 13.0ms/step, matching
# the profile's 13.6ms.
