"""Multi-host initialization.

Replaces the reference's env/SLURM NCCL bootstrap (deit/utils.py:216-238,
run_with_submitit.py) with jax.distributed: on a TPU pod slice the runtime
discovers peers itself; on SLURM/GPU-style launches coordinator address and
process counts come from the environment.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed if running multi-process; no-op otherwise.

    Env conventions supported (mirrors reference init_distributed_mode):
      * TPU pod: zero-config (jax.distributed.initialize() autodetects)
      * torchrun-style: RANK / WORLD_SIZE / MASTER_ADDR / MASTER_PORT
      * SLURM: SLURM_PROCID / SLURM_NTASKS
    Returns {"rank", "world_size", "is_master"}.
    """
    import jax

    if coordinator_address is None and "MASTER_ADDR" in os.environ:
        coordinator_address = (os.environ["MASTER_ADDR"] + ":" +
                               os.environ.get("MASTER_PORT", "1234"))
    if num_processes is None:
        for var in ("WORLD_SIZE", "SLURM_NTASKS"):
            if var in os.environ:
                num_processes = int(os.environ[var])
                break
    if process_id is None:
        for var in ("RANK", "SLURM_PROCID"):
            if var in os.environ:
                process_id = int(os.environ[var])
                break

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)

    rank = jax.process_index()
    world = jax.process_count()
    return {"rank": rank, "world_size": world, "is_master": rank == 0}
