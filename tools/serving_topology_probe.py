"""AOT-compile the continuous-batching SERVING engine step for a
multi-host v5e pod-slice topology.

Round-2 verdict weak #7: the multi-chip compile proof covered the static
TP step only — the serving engine step (donated latent/index/mask pool +
non-donated finish buffers + per-slot timestep gathers) is exactly the
graph where a GSPMD/Mosaic sharding regression would hide, and CPU-mesh
tests can't see it (interpret-mode Pallas lowers to plain HLO).

This probe builds serving.engine_step — the same function
DiffusionServer jits — over an abstract multi-host topology
(jax.experimental.topologies, default v5e:4x4 = 16 chips across 4 hosts),
with the pool sharded over "data", weights TP-sharded over "model", and
the pool buffers donated, then compiles and reports the collective
schedule (async start/done pairs + instruction gaps) via
tp_topology_probe.schedule_report.

Usage: python tools/serving_topology_probe.py [--topology v5e:4x4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tp_topology_probe import schedule_report


def compile_serving_step(model="DiT-S/2", topology="v5e:4x4", slots=32,
                         data_axis=8):
    from mx_quantization_tpu.diffusion import create_diffusion
    from mx_quantization_tpu.models.dit import (DiT_models, DiTQuantConfig,
                                                dit_forward, init_dit)
    from mx_quantization_tpu.parallel import tp_param_specs
    from mx_quantization_tpu.serving import engine_step
    from mx_quantization_tpu.workloads.dit import dit_mx_specs

    td = topologies.get_topology_desc(platform="tpu",
                                      topology_name=topology)
    devs = np.array(td.devices)
    n = len(devs)
    mesh = Mesh(devs.reshape(data_axis, n // data_axis), ("data", "model"))

    cfg = DiT_models[model](input_size=32)
    qcfg = DiTQuantConfig(mx_specs=dit_mx_specs("fused"), mx_quant=True,
                          top_k=True, k=154, pred_mode="ex_pred",
                          exclude_blocks=(cfg.depth - 1,),
                          topk_key_bits=8, activation_dtype="bfloat16")
    params = init_dit(jax.random.key(0), cfg)
    pspecs = tp_param_specs(mesh, params)
    absp = jax.tree.map(
        lambda x, sp: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, sp)),
        params, pspecs)

    diffusion = create_diffusion("100")

    def model_fn(p, lat, t, y):
        return dit_forward(p, lat, t, y, cfg, qcfg)

    def sd(shape, dt, spec):
        return jax.ShapeDtypeStruct(shape, dt,
                                    sharding=NamedSharding(mesh, spec))

    lat = sd((slots, 4, 32, 32), jnp.float32, P("data"))
    sidx = sd((slots,), jnp.int32, P("data"))
    act = sd((slots,), jnp.bool_, P("data"))
    cond = sd((slots,), jnp.int32, P("data"))
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    step = jax.jit(
        lambda p, lat, sidx, act, cond, key: engine_step(
            model_fn, diffusion, 1000, 4.0, slots, p, lat, sidx, act,
            cond, key),
        donate_argnums=(1, 2, 3))
    with jax.set_mesh(mesh):
        compiled = step.lower(absp, lat, sidx, act, cond, key).compile()
    return compiled, mesh, n


def compile_serving_step_dpm(topology="v5e:4x4", slots=32, data_axis=8,
                             num_layers=2):
    """AOT-compile the PixArt DPM-Solver++ serving engine step
    (engine_step_dpm: donated pool incl. per-slot prev_x0 multistep state,
    per-slot coefficient gathers, text-condition pytree) for a multi-host
    slice — round-4 task: BASELINE configs[4] "PixArt-alpha continuous
    batching on multi-host slice" at its real scheduler.  num_layers is
    truncated (sharding structure per block is identical; 28 blocks only
    slow the probe)."""
    from mx_quantization_tpu.models import (PixArtConfig, PixArtQuantConfig,
                                            init_pixart, pixart_forward)
    from mx_quantization_tpu.parallel import tp_param_specs
    from mx_quantization_tpu.serving import dpm_tables, engine_step_dpm
    from mx_quantization_tpu.workloads.pixart import pixart_mx_specs

    td = topologies.get_topology_desc(platform="tpu",
                                      topology_name=topology)
    devs = np.array(td.devices)
    n = len(devs)
    mesh = Mesh(devs.reshape(data_axis, n // data_axis), ("data", "model"))

    cfg = PixArtConfig(num_layers=num_layers)
    qcfg = PixArtQuantConfig(mx_specs=pixart_mx_specs("fused"),
                             mx_quant=True, self_top_k=True, self_k=77,
                             ex_pred=True,
                             pred_mode="two_step_leading_ones",
                             topk_key_bits=8, activation_dtype="bfloat16")
    params = init_pixart(jax.random.key(0), cfg)
    pspecs = tp_param_specs(mesh, params)
    absp = jax.tree.map(
        lambda x, sp: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, sp)),
        params, pspecs)

    tables = dpm_tables(20)
    L = 120

    def model_fn(p, lat, t, cond):
        return pixart_forward(p, lat, cond["embeds"], t, cfg, qcfg,
                              encoder_attention_mask=cond["mask"])

    def sd(shape, dt, spec):
        return jax.ShapeDtypeStruct(shape, dt,
                                    sharding=NamedSharding(mesh, spec))

    lat = sd((slots, 4, 32, 32), jnp.float32, P("data"))
    sidx = sd((slots,), jnp.int32, P("data"))
    px0 = sd((slots, 4, 32, 32), jnp.float32, P("data"))
    act = sd((slots,), jnp.bool_, P("data"))
    cond = {"embeds": sd((slots, L, cfg.caption_channels), jnp.float32,
                         P("data")),
            "mask": sd((slots, L), jnp.float32, P("data"))}
    null = {"embeds": np.zeros((L, cfg.caption_channels), np.float32),
            "mask": np.ones((L,), np.float32)}

    step = jax.jit(
        lambda p, lat, sidx, px0, act, cond: engine_step_dpm(
            model_fn, tables, null, 4.5, slots, 4, p, lat, sidx, px0,
            act, cond),
        donate_argnums=(1, 2, 3, 4))
    with jax.set_mesh(mesh):
        compiled = step.lower(absp, lat, sidx, px0, act, cond).compile()
    return compiled, mesh, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="DiT-S/2")
    ap.add_argument("--engine", choices=["ddpm", "dpm"], default="ddpm")
    ap.add_argument("--topology", default="v5e:4x4")
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--data-axis", type=int, default=8)
    args = ap.parse_args()
    if args.engine == "dpm":
        args.model = "PixArt-alpha-256(2L)"
        compiled, mesh, n = compile_serving_step_dpm(
            args.topology, args.slots, args.data_axis)
    else:
        compiled, mesh, n = compile_serving_step(
            args.model, args.topology, args.slots, args.data_axis)
    txt = compiled.as_text()
    rep = schedule_report(txt)
    hosts = n // 4  # v5e: 4 chips per host
    print(f"model={args.model} topology={args.topology} chips={n} "
          f"hosts={hosts} mesh={dict(mesh.shape)} hlo_bytes={len(txt)}")
    for k, v in rep["counts"].items():
        print(f"  {k}: {v}")
    print(f"  async start/done pairs: {rep['async_pairs']}, "
          f"median instrs in flight: {rep['gap_median']}, "
          f"max: {rep['gap_max']}")
    assert hosts >= 2, "topology is not multi-host"
    assert rep["async_pairs"] > 0 and rep["gap_median"] > 0, \
        "no overlapped collectives in the serving-step schedule"
    # donation must survive sharding: donated pool buffers show as
    # input/output aliases in the compiled executable
    assert "input_output_alias" in txt, \
        "pool donation dropped: no input/output aliasing in the executable"
    print("SERVING STEP COMPILED for a multi-host slice with async "
          "collectives; pool donation in place.")


if __name__ == "__main__":
    main()
