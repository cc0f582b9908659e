"""Multi-node launch helpers.

Replaces the reference's submitit SLURM launcher
(workloads/deit/run_with_submitit.py): generates an sbatch script that runs
one process per host with the env vars jax.distributed expects, with
requeue-on-timeout (the reference's checkpoint() resubmission,
run_with_submitit.py:58-68) via SBATCH --requeue + signal trap.  On a TPU
pod slice none of this is needed — jax.distributed.initialize() is
zero-config — so this exists for SLURM-managed clusters.
"""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional

SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --time={timeout_min}
#SBATCH --requeue
#SBATCH --signal=USR1@60
#SBATCH --output={log_dir}/%j_%t.out

export MASTER_ADDR=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -1)
export MASTER_PORT={port}
export WORLD_SIZE=$SLURM_NTASKS
export RANK=$SLURM_PROCID

# requeue on timeout signal (reference submitit checkpoint/resubmit)
trap 'scontrol requeue $SLURM_JOB_ID' USR1

srun --kill-on-bad-exit=1 bash -c 'RANK=$SLURM_PROCID {command}'
"""


def write_sbatch(command: str, job_name: str = "mxq", nodes: int = 2,
                 timeout_min: int = 2880, port: int = 29500,
                 log_dir: str = "slurm_logs",
                 out_path: str = "launch.sbatch") -> str:
    os.makedirs(log_dir, exist_ok=True)
    script = SBATCH_TEMPLATE.format(job_name=job_name, nodes=nodes,
                                    timeout_min=timeout_min, port=port,
                                    log_dir=log_dir, command=command)
    with open(out_path, "w") as f:
        f.write(script)
    return out_path


def submit(sbatch_path: str) -> Optional[str]:
    """sbatch the script; returns the job id (None if sbatch unavailable)."""
    try:
        out = subprocess.run(["sbatch", sbatch_path], check=True,
                             capture_output=True, text=True)
        return out.stdout.strip().split()[-1]
    except (FileNotFoundError, subprocess.CalledProcessError):
        return None
