"""True multi-process distributed test: 2 processes x 4 virtual CPU devices
form one 8-device world through parallel.distributed.initialize_distributed
(the jax.distributed bootstrap replacing the reference's NCCL
init_process_group) — the reference has NO multi-node test at all
(SURVEY §4.3); this exercises coordinator wiring, the torchrun-style env
convention, and a cross-process global-array reduction.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy sweep module: fast lane skips it

_WORKER = r"""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from mx_quantization_tpu.parallel.distributed import initialize_distributed

info = initialize_distributed()   # torchrun-style env: RANK/WORLD_SIZE/...
assert info["world_size"] == 2, info
assert info["rank"] == int(os.environ["RANK"])
assert info["is_master"] == (info["rank"] == 0)

devs = jax.devices()
assert len(devs) == 8, len(devs)          # 2 processes x 4 local
assert jax.local_device_count() == 4

from jax.sharding import Mesh, NamedSharding, PartitionSpec

mesh = Mesh(np.array(devs), ("data",))
sh = NamedSharding(mesh, PartitionSpec("data"))
local = np.arange(4 * info["rank"], 4 * info["rank"] + 4, dtype=np.float32)
x = jax.make_array_from_process_local_data(sh, local, global_shape=(8,))

total = jax.jit(lambda a: a.sum(),
                out_shardings=NamedSharding(mesh, PartitionSpec()))(x)
print(f"RANK{info['rank']} SUM {float(total)}", flush=True)
"""


def test_two_process_world(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    portno = port.getsockname()[1]
    port.close()

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "RANK": str(rank), "WORLD_SIZE": "2",
            "MASTER_ADDR": "127.0.0.1", "MASTER_PORT": str(portno),
            "XLA_FLAGS": env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    # sum over the 8-device global array 0..7 = 28, replicated to both ranks
    assert "RANK0 SUM 28.0" in outs[0], outs[0][-2000:]
    assert "RANK1 SUM 28.0" in outs[1], outs[1][-2000:]


_MODEL_WORKER = r"""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from mx_quantization_tpu.parallel.distributed import initialize_distributed

info = initialize_distributed()
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mx_quantization_tpu import finalize_mx_specs
from mx_quantization_tpu.models import (DiTConfig, DiTQuantConfig,
                                        dit_forward, init_dit)

cfg = DiTConfig(input_size=8, patch_size=2, hidden_size=64, depth=2,
                num_heads=2, num_classes=10)
specs = finalize_mx_specs(dict(w_elem_format="int8", a_elem_format="int8",
                               scale_bits=8, block_size=32,
                               quantize_backprop=False))
qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True, k=8,
                      pred_mode="ex_pred")

mesh = Mesh(np.array(jax.devices()), ("data",))
rep = NamedSharding(mesh, P())
dp = NamedSharding(mesh, P("data"))
dp4 = NamedSharding(mesh, P("data", None, None, None))

# params are process-identical (same seed) -> replicated global arrays
host_params = jax.tree.map(np.asarray, init_dit(jax.random.key(0), cfg))
# adaLN-Zero init zeroes the final projection -> perturb for a nonzero loss
prng = np.random.RandomState(1)
fl = host_params["final_layer"]["linear"]
fl["weight"] = fl["weight"] + 0.01 * prng.randn(*fl["weight"].shape
                                                ).astype(np.float32)
params = jax.tree.map(
    lambda a: jax.make_array_from_process_local_data(rep, a), host_params)

# global batch 8: each process contributes its local 4 rows
rank = info["rank"]
rng = np.random.RandomState(7)
xg = rng.randn(8, 4, 8, 8).astype(np.float32)
tg = np.full((8,), 300.0, np.float32)
yg = (np.arange(8) % 10).astype(np.int32)
x = jax.make_array_from_process_local_data(dp4, xg[4*rank:4*rank+4],
                                           global_shape=(8, 4, 8, 8))
t = jax.make_array_from_process_local_data(dp, tg[4*rank:4*rank+4],
                                           global_shape=(8,))
y = jax.make_array_from_process_local_data(dp, yg[4*rank:4*rank+4],
                                           global_shape=(8,))

@jax.jit
def step(params, x, t, y):
    out = dit_forward(params, x, t, y, cfg, qcfg)
    return jnp.mean(out.astype(jnp.float32) ** 2)

loss = step(params, x, t, y)
print(f"RANK{rank} LOSS {float(loss):.6f}", flush=True)
"""


def test_two_process_sharded_model_step(tmp_path):
    """Quantized top-k DiT forward over a 2-process x 4-device world:
    replicated params, data-sharded global batch, XLA collectives across
    the process boundary; both ranks must agree on the global loss."""
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    portno = port.getsockname()[1]
    port.close()

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "RANK": str(rank), "WORLD_SIZE": "2",
            "MASTER_ADDR": "127.0.0.1", "MASTER_PORT": str(portno),
            "XLA_FLAGS": env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _MODEL_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

    losses = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out[-2000:]
        line = [l for l in out.splitlines() if "LOSS" in l][0]
        losses.append(float(line.split()[-1]))
    assert losses[0] == losses[1]
    assert np.isfinite(losses[0]) and losses[0] > 0
