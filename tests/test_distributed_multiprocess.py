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
