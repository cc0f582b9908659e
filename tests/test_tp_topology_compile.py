"""Multi-chip TPU compile regression: the TP-sharded quantized DiT step
must AOT-compile for a real v5e pod-slice topology with overlapped
(async) ICI collectives.

This is the test that catches the class of bug the CPU-mesh dryrun masks:
Mosaic kernels cannot be auto-partitioned by GSPMD, so the fused attention
kernel must shard_map itself under an ambient mesh (and the Pallas
quantize kernel must fall back to the XLA formulation).  Compilation runs
against jax.experimental.topologies — no TPU hardware needed, but the TPU
compiler must be importable, and the session conftest forces the CPU
backend (which would lower Pallas in interpret mode), so the probe runs in
a SUBPROCESS with the default platform; it skips cleanly where the
topology is unavailable.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_tp_dit_step_compiles_for_v5e_slice_with_overlap():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "tp_topology_probe.py")
    proc = subprocess.run(
        [sys.executable, tool, "--model", "DiT-S/2", "--batch", "8"],
        capture_output=True, text=True, env=env, timeout=560)
    if proc.returncode != 0 and ("get_topology_desc" in proc.stderr
                                  or "UNIMPLEMENTED" in proc.stderr):
        pytest.skip(f"v5e topology unavailable: {proc.stderr[-300:]}")
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "OVERLAP CONFIRMED" in out, out
    # the fused Pallas kernel must be inside the multi-chip executable
    tcc = [l for l in out.splitlines() if "tpu_custom_call" in l]
    assert tcc and int(tcc[0].split(":")[1]) > 0, out


def test_tp_dit_step_compiles_for_multihost_slice():
    """BASELINE.md protocol ">=2 hosts": the TP step must compile for a
    16-chip v5e:4x4 (4 hosts) with async collectives."""
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "tp_topology_probe.py")
    proc = subprocess.run(
        [sys.executable, tool, "--model", "DiT-S/2", "--batch", "8",
         "--topology", "v5e:4x4"],
        capture_output=True, text=True, env=env, timeout=560)
    if proc.returncode != 0 and ("get_topology_desc" in proc.stderr
                                  or "UNIMPLEMENTED" in proc.stderr):
        pytest.skip(f"v5e:4x4 topology unavailable: {proc.stderr[-300:]}")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OVERLAP CONFIRMED" in proc.stdout, proc.stdout


def test_serving_engine_step_compiles_for_multihost_slice():
    """The serving engine step (donated pool + finish buffers + per-slot
    timestep gathers) must compile under a multi-host mesh — the graph
    where GSPMD/Mosaic sharding regressions hide (round-2 weak #7)."""
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "serving_topology_probe.py")
    proc = subprocess.run([sys.executable, tool], capture_output=True,
                          text=True, env=env, timeout=560)
    if proc.returncode != 0 and ("get_topology_desc" in proc.stderr
                                  or "UNIMPLEMENTED" in proc.stderr):
        pytest.skip(f"v5e:4x4 topology unavailable: {proc.stderr[-300:]}")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SERVING STEP COMPILED" in proc.stdout, proc.stdout
    tcc = [l for l in proc.stdout.splitlines() if "tpu_custom_call" in l]
    assert tcc and int(tcc[0].split(":")[1]) > 0, proc.stdout


@pytest.mark.slow
def test_pixart_dpm_serving_step_compiles_for_multihost_slice():
    """Round-4: the PixArt-alpha DPM-Solver++ serving engine step
    (engine_step_dpm — donated pool incl. per-slot prev_x0 multistep
    state, per-slot coefficient gathers, text-condition pytree, MXINT8 +
    self_k=77 two_step_leading_ones quantization ON) must AOT-compile for
    a v5e:4x4 multi-host slice (BASELINE configs[4])."""
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "serving_topology_probe.py")
    proc = subprocess.run([sys.executable, tool, "--engine", "dpm"],
                          capture_output=True, text=True, env=env,
                          timeout=560)
    if proc.returncode != 0 and ("get_topology_desc" in proc.stderr
                                  or "UNIMPLEMENTED" in proc.stderr):
        pytest.skip(f"v5e:4x4 topology unavailable: {proc.stderr[-300:]}")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SERVING STEP COMPILED" in proc.stdout, proc.stdout
    tcc = [l for l in proc.stdout.splitlines() if "tpu_custom_call" in l]
    assert tcc and int(tcc[0].split(":")[1]) > 0, proc.stdout
