"""Device-mesh helpers and sharding rules for the model zoo.

Design: a 2D ("data", "model") mesh.  DP shards the batch axis over "data"
(the SPMD replacement for the reference's DistributedDataParallel,
deit/scripts/main.py:665).  TP shards:

  * qkv / fc1 projections column-wise — weight (out, in) split on out — so
    each model-shard computes its own heads / MLP columns,
  * proj / fc2 row-wise — weight (out, in) split on in — producing partial
    sums that XLA combines with an all-reduce over ICI.

MX quantization composes cleanly with this TP layout: both qkv (axes=[-1])
and proj (axes=[-1]) quantize along the *input-feature* axis, so column
splits never break a quantization block, and row splits cut on
head_dim/MLP-column boundaries (multiples of the 32-block for all configs).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    data: int = 1
    model: int = 1

    @property
    def ndev(self):
        return self.data * self.model


def make_mesh(plan: Optional[MeshPlan] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if plan is None:
        plan = MeshPlan(data=len(devices), model=1)
    assert plan.ndev <= len(devices), (plan, len(devices))
    devs = np.asarray(devices[: plan.ndev]).reshape(plan.data, plan.model)
    return Mesh(devs, ("data", "model"))


def shard_batch(mesh: Mesh, x):
    """Shard leading (batch) axis over the data axis."""
    ndim = x.ndim if hasattr(x, "ndim") else 1
    spec = P("data", *([None] * (ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def _put(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_params_dp(mesh: Mesh, params):
    """Fully replicate parameters (pure data parallelism)."""
    return jax.tree.map(lambda x: _put(mesh, x, P()), params)


def _tp_rule_transformer(path: str, x):
    """Shared TP rules for qkv/proj/fc1/fc2-style transformer params.

    Stacked block params carry a leading depth axis (models/stacked.py) —
    the rule pads the spec with None on the left to match ndim.
    """
    def pad(spec_tail):
        # stacked-block leading (depth) axes shard over "data" (FSDP-style;
        # XLA gathers each scan step's layer) — composing TP x FSDP
        lead = x.ndim - len(spec_tail)
        lead_spec = (["data"] + [None] * (lead - 1)) if lead else []
        return P(*(lead_spec + list(spec_tail)))

    if re.search(r"(qkv|fc1)\.weight$", path):
        return pad(["model", None])  # column parallel: split out_features
    if re.search(r"(qkv|fc1)\.bias$", path):
        return pad(["model"])
    if re.search(r"(proj|fc2)\.weight$", path):
        return pad([None, "model"])  # row parallel: split in_features
    return P()                        # replicate everything else


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def _rule_spec(mesh, path, x, rule_fn) -> P:
    spec = rule_fn(_path_str(path), x)
    # guard per axis: drop shardings whose dimension doesn't divide
    fixed = [
        name if (name is None or x.shape[axis] % mesh.shape[name] == 0)
        else None
        for axis, name in enumerate(spec)
    ]
    return P(*fixed) if fixed else P()


def _shard_with_rules(mesh, params, rule_fn):
    def put(path, x):
        return _put(mesh, x, _rule_spec(mesh, path, x, rule_fn))
    return jax.tree_util.tree_map_with_path(put, params)


def tp_param_specs(mesh: Mesh, params):
    """PartitionSpec tree for the transformer TP rules WITHOUT placing data
    — usable with jax.ShapeDtypeStruct for AOT/topology compilation (the
    mesh may be built from jax.experimental.topologies abstract devices)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: _rule_spec(mesh, path, x, _tp_rule_transformer),
        params)


def shard_vit_params_tp(mesh: Mesh, params):
    """Tensor-parallel sharding for the ViT/DeiT param tree."""
    return _shard_with_rules(mesh, params, _tp_rule_transformer)


def shard_dit_params_tp(mesh: Mesh, params):
    """Tensor-parallel sharding for the DiT param tree."""
    return _shard_with_rules(mesh, params, _tp_rule_transformer)


def shard_params_fsdp(mesh: Mesh, params, min_size: int = 2 ** 16):
    """FSDP-style parameter sharding over the "data" axis.

    Stacked block trees (models/stacked.py) shard their leading depth axis;
    other large arrays shard their largest divisible axis.  XLA inserts the
    per-layer all-gathers during the scan (ZeRO-3 semantics).  Small arrays
    stay replicated.
    """
    data = mesh.shape["data"]

    def put(path, x):
        if data == 1 or x.size < min_size:
            return _put(mesh, x, P())
        for axis in range(x.ndim):
            if x.shape[axis] % data == 0:
                spec = [None] * x.ndim
                spec[axis] = "data"
                return _put(mesh, x, P(*spec))
        return _put(mesh, x, P())

    return jax.tree_util.tree_map_with_path(put, params)
