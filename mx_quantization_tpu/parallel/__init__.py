"""SPMD parallelism: mesh construction, parameter sharding rules, and
distributed init.

Replaces the reference's NCCL/DDP layer (deit/utils.py:216-238, DiT/train.py:
117-151, sample_ddp.py:37-43) with mesh-based SPMD: data parallelism is a
batch-axis sharding, tensor parallelism shards attention heads / MLP columns,
and XLA inserts the collectives over ICI.  No process-group code in models.
"""

from .mesh import (
    MeshPlan,
    make_mesh,
    shard_batch,
    shard_params_dp,
    shard_params_fsdp,
    shard_vit_params_tp,
    shard_dit_params_tp,
    tp_param_specs,
)
from .distributed import initialize_distributed
from .pipeline import pipeline_blocks
