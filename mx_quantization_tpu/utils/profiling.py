"""Profiling / tracing utilities (aux subsystem).

The reference's only tracing is a DEBUG print decorator
(mx_mapping.py:26-38) and cuda-memory prints (deit/utils.py:155-159).  Here:
jax.profiler trace capture, a step-timer context, and a roofline estimate
helper for quantized matmuls.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mx_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device sync via scalar fetch.

    NOTE: on asynchronous dispatch backends (including the remote-relay TPU
    used here), ``block_until_ready`` does NOT wait — pass the step output
    and the timer fetches a scalar reduction to force completion.
    """

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, out=None):
        if out is not None:
            import jax.numpy as jnp
            import numpy as np
            leaf = out
            import jax
            leaves = jax.tree.leaves(out)
            if leaves:
                np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        import numpy as np
        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {"mean_s": float(t.mean()), "p50_s": float(np.median(t)),
                "min_s": float(t.min()), "steps": len(self.times)}


def matmul_roofline(m: int, n: int, k: int, dtype_bytes: int = 2,
                    peak_tflops: float = 197.0,
                    hbm_gbps: float = 819.0) -> Dict[str, float]:
    """Speed-of-light estimate for one matmul on v5e (bf16 MXU defaults)."""
    flops = 2.0 * m * n * k
    bytes_ = dtype_bytes * (m * k + k * n + m * n)
    t_compute = flops / (peak_tflops * 1e12)
    t_memory = bytes_ / (hbm_gbps * 1e9)
    return {
        "flops": flops,
        "bytes": float(bytes_),
        "t_compute_us": t_compute * 1e6,
        "t_memory_us": t_memory * 1e6,
        "bound": "compute" if t_compute > t_memory else "memory",
        "sol_us": max(t_compute, t_memory) * 1e6,
    }


def parse_trace(trace_dir: str, top: int = 0,
                leaf_only: bool = True) -> Dict[str, float]:
    """Sum device-event durations (us) by op name from a jax.profiler trace
    directory — the no-TensorBoard analysis path used by tools/profile_step
    (works through the remote-relay TPU where XPlane viewers are absent).

    Trace events NEST (jit fn ⊃ while ⊃ cond ⊃ fusions), so summing every
    event double-counts containers.  ``leaf_only`` (default) keeps only
    events that contain no other event — their durations tile the device
    timeline exactly and sum to the true busy time.

    Returns {op_name: total_us}, descending; ``top`` truncates.
    """
    import bisect
    import glob
    import gzip
    import json
    from collections import defaultdict

    by_name: Dict[str, float] = defaultdict(float)
    for f in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
        if not leaf_only:
            for ev in evs:
                by_name[ev.get("name", "")] += ev.get("dur", 0)
            continue
        # events without timestamps (synthetic/partial traces) can't nest —
        # count them directly
        for ev in evs:
            if "ts" not in ev:
                by_name[ev.get("name", "")] += ev.get("dur", 0)
        evs = [e for e in evs if "ts" in e]
        by_track: Dict[tuple, list] = defaultdict(list)
        for ev in evs:
            by_track[(ev.get("pid"), ev.get("tid"))].append(ev)
        for track in by_track.values():
            track.sort(key=lambda e: e["ts"])
            starts = [e["ts"] for e in track]
            for i, ev in enumerate(track):
                dur = ev.get("dur", 0)
                j = bisect.bisect_right(starts, ev["ts"])
                if dur and not (j < len(track)
                                and starts[j] < ev["ts"] + dur):
                    by_name[ev.get("name", "")] += dur
    items = sorted(by_name.items(), key=lambda kv: -kv[1])
    if top:
        items = items[:top]
    return dict(items)
