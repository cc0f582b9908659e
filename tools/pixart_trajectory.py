"""Serving-tier trajectory quality for PIXART-shaped attention
(round-4 verdict missing #2 / next-round ask #4: the trajectory/recall
protocol existed for DiT only, while PixArt's self-attn (k=77 over 256
latent tokens) and masked CROSS-attention (k over 120 T5 tokens, mask
bias added to BOTH true and predicted scores —
/root/reference/workloads/PixArt/models/MX_transformer_block.py:765-859)
have different tie/score structure).

Same two-phase design as tools/contract_trajectory.py:

  phase ``traj`` (TPU): PixArt-alpha 256^2 at the reference operating
    point (28 blocks, self_k=77 two_step_leading_ones, cross_k=60,
    exclude block 27, DPM-Solver++(2M) 20 steps, CFG 4.5 —
    run_pixart_alpha.sh:31-42), synthetic T5 embeds, randomized params
    (no trained PixArt checkpoints exist in this environment; caveat as
    in the round-3 DiT protocol).  Four trajectories: serving(kb=8),
    exact(kb=8), exact(kb=32) from the SAME seed + exact(kb=32) from a
    different seed (the solver's noise floor is ZERO for the
    deterministic ODE — the different-SEED run measures how far apart
    two legitimate samples are, the scale against which tier divergence
    is judged).  Captures serving-run latents every 2 steps.

  phase ``analyze`` (CPU): replays a forward at each captured
    (latent, t), capturing q/k/bias per block for BOTH attention kinds,
    and reports softmax-mass recall of exact(kb32)/exact(kb8)/
    serving(tie-inclusive kb8) selections against the true top-k mass —
    separately for self-attention and masked cross-attention.

Usage:
  python tools/pixart_trajectory.py --phase traj
  python tools/pixart_trajectory.py --phase analyze
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "/root/repo/.cache/pixart_traj.npz"
B = 2
STEPS = 20
SELF_K = 77
CROSS_K = 60
CAPTURE_EVERY = 2
PRED_MODE = "two_step_leading_ones"


def _setup(platform=None):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    os.makedirs("/root/repo/.cache/jax", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def _model(jax):
    import jax.numpy as jnp
    from mx_quantization_tpu.models import PixArtConfig, init_pixart
    from mx_quantization_tpu.utils.prequantize import prequantize_weights
    from mx_quantization_tpu.workloads.pixart import pixart_mx_specs

    cfg = PixArtConfig()  # alpha-256: 28 layers, d=1152, 16 heads, D=72
    specs = pixart_mx_specs("fused")
    params = init_pixart(jax.random.key(0), cfg)
    # randomize every param (zero-init modulations would make blocks
    # near-vacuous — same rationale as the DiT trajectory protocol)
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(42), len(leaves))
    leaves = [0.1 * jax.random.normal(k, l.shape, jnp.float32)
              for k, l in zip(keys, leaves)]
    params = jax.tree.unflatten(tree, leaves)
    q_params, specs = prequantize_weights(params, specs,
                                          serve_dtype=jnp.bfloat16)
    return cfg, specs, q_params


def _embeds(jax, cfg):
    import jax.numpy as jnp
    embeds = jax.random.normal(jax.random.key(5),
                               (B, 120, cfg.caption_channels)) * 0.02
    # realistic ragged mask: prompt 0 uses 9 tokens, prompt 1 uses 47
    mask = np.zeros((B, 120), np.float32)
    mask[0, :9] = 1
    mask[1, :47] = 1
    null = jax.random.normal(jax.random.key(6),
                             (1, 120, cfg.caption_channels)) * 0.02
    return embeds, jnp.asarray(mask), null


def _qcfg(specs, cfg, kb, contract):
    from mx_quantization_tpu.models import PixArtQuantConfig
    return PixArtQuantConfig(
        mx_specs=specs, mx_quant=True, self_top_k=True, self_k=SELF_K,
        cross_top_k=True, cross_k=CROSS_K, ex_pred=True,
        pred_mode=PRED_MODE,
        exclude_blocks=(cfg.num_layers - 1,), topk_key_bits=kb,
        contract=contract, activation_dtype="bfloat16")


def phase_traj():
    jax = _setup()
    import jax.numpy as jnp
    from mx_quantization_tpu.diffusion import DPMSolverMultistep
    from mx_quantization_tpu.models import pixart_forward

    cfg, specs, q_params = _model(jax)
    embeds, mask, null = _embeds(jax, cfg)
    solver = DPMSolverMultistep()
    guidance = 4.5

    nullb = jnp.broadcast_to(null, embeds.shape)
    ctx2 = jnp.concatenate([embeds, nullb], axis=0)
    mask2 = jnp.concatenate([mask, jnp.ones_like(mask)], axis=0)

    def run(kb, contract, seed, capture=False):
        qc = _qcfg(specs, cfg, kb, contract)

        @jax.jit
        def cfg_eps(p, x, t):
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            out = pixart_forward(p, x2, ctx2, t2, cfg, qc,
                                 encoder_attention_mask=mask2)
            eps2 = out[:, : cfg.in_channels]
            eps_c, eps_u = jnp.split(eps2, 2, axis=0)
            return eps_u + guidance * (eps_c - eps_u)

        x = jax.random.normal(jax.random.key(seed),
                              (B, cfg.in_channels, cfg.sample_size,
                               cfg.sample_size))
        ts = solver.timesteps(STEPS)
        prev_x0 = None
        prev_t = None
        caps = {}
        for si, t_idx in enumerate(ts):
            if capture and si % CAPTURE_EVERY == 0:
                caps[f"lat_{si}"] = np.asarray(x)
            t = jnp.full((B,), float(t_idx))
            eps = cfg_eps(q_params, x, t)
            a, sg = solver.alpha_t[t_idx], solver.sigma_t[t_idx]
            x0 = (x - sg * eps) / a
            s_t = int(ts[si + 1]) if si + 1 < len(ts) else 0
            h = solver.lambda_t[s_t] - solver.lambda_t[t_idx]
            a_s, sg_s = solver.alpha_t[s_t], solver.sigma_t[s_t]
            if prev_x0 is None:
                x = (sg_s / sg) * x - a_s * jnp.expm1(-h) * x0
            else:
                h_prev = (solver.lambda_t[t_idx] -
                          solver.lambda_t[prev_t])
                r = h_prev / h if h != 0 else 1.0
                d = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * prev_x0
                x = (sg_s / sg) * x - a_s * jnp.expm1(-h) * d
            prev_x0, prev_t = x0, t_idx
        return np.asarray(x), caps

    print("serving(kb=8) trajectory (with captures)...", flush=True)
    lat_srv, caps = run(8, "serving", seed=100, capture=True)
    print("exact(kb=8) trajectory (same seed)...", flush=True)
    lat_e8, _ = run(8, "exact", seed=100)
    print("exact(kb=32) trajectory (same seed)...", flush=True)
    lat_e32, _ = run(32, "exact", seed=100)
    print("exact(kb=32) trajectory (different seed)...", flush=True)
    lat_e32b, _ = run(32, "exact", seed=101)

    nrm = np.linalg.norm(lat_e32)
    d_srv32 = np.linalg.norm(lat_srv - lat_e32) / nrm
    d_832 = np.linalg.norm(lat_e8 - lat_e32) / nrm
    d_seed = np.linalg.norm(lat_e32 - lat_e32b) / nrm
    print("final-latent divergence (PixArt-alpha 256, random-init):")
    print(f"  serving(kb8) vs exact(kb32): {d_srv32:.4f}")
    print(f"  exact(kb8)   vs exact(kb32): {d_832:.4f}")
    print(f"  different-seed sample scale: {d_seed:.4f}")
    np.savez_compressed(OUT, lat_srv=lat_srv, lat_e8=lat_e8,
                        lat_e32=lat_e32, lat_e32b=lat_e32b,
                        d_srv32=d_srv32, d_832=d_832, d_seed=d_seed,
                        **caps)
    print("wrote", OUT)


def phase_analyze():
    jax = _setup("cpu")
    import jax.numpy as jnp
    from mx_quantization_tpu.attention import predict_scores
    from mx_quantization_tpu.models import pixart_forward
    from mx_quantization_tpu.models import pixart as pixart_mod
    from mx_quantization_tpu.ops.linear import matmul
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from keybits_quality import select

    cfg, specs, q_params = _model(jax)
    embeds, mask, null = _embeds(jax, cfg)
    data = np.load(OUT)
    from mx_quantization_tpu.diffusion import DPMSolverMultistep
    ts = DPMSolverMultistep().timesteps(STEPS)

    captured = []
    orig = pixart_mod.topk_attention

    def cap_attn(q, k, v, scale, mxs, attn_cfg, bias=None, **kw):
        captured.append((np.asarray(q, np.float32),
                         np.asarray(k, np.float32),
                         None if bias is None else np.asarray(
                             bias, np.float32), float(scale), attn_cfg))
        return orig(q, k, v, scale, mxs, attn_cfg, bias=bias, **kw)

    pixart_mod.topk_attention = cap_attn

    # run blocks as a python loop so the capture sees concrete arrays
    # (the stacked scan/switch would hand the callback tracers)
    from mx_quantization_tpu.models.stacked import unstack_block

    def run_blocks_loop(stacked, cfgs, body, x):
        for i, c in enumerate(cfgs):
            x = body(unstack_block(stacked, i), c, x)
        return x

    pixart_mod.run_blocks = run_blocks_loop
    qc = _qcfg(specs, cfg, 32, "exact")

    rows = {"self": [], "cross": []}
    steps = sorted(int(k.split("_")[1]) for k in data.files
                   if k.startswith("lat_") and k.split("_")[1].isdigit())
    for si in steps:
        captured.clear()
        lat = jnp.asarray(data[f"lat_{si}"])
        t = jnp.full((B,), float(ts[si]))
        _ = pixart_forward(q_params, lat, embeds, t, cfg, qc,
                           encoder_attention_mask=mask)
        for q, k_, bias, scale, acfg in captured:
            if not acfg.top_k or not acfg.approx_flag:
                continue
            Bq, H, N, D = q.shape
            S = k_.shape[2]
            kind = "self" if S == N else "cross"
            kk = SELF_K if kind == "self" else CROSS_K
            qf = q.reshape(-1, N, D)
            kf = k_.reshape(-1, S, D)
            pred = np.asarray(predict_scores(
                jnp.asarray(qf), jnp.asarray(kf), specs, acfg.pred_mode),
                np.float32)
            true = np.asarray(matmul(
                jnp.asarray(qf), jnp.swapaxes(jnp.asarray(kf), -1, -2),
                mx_specs=specs, mode_config="aa"), np.float32) * scale
            if bias is not None:
                # mask bias added to BOTH true and predicted scores
                # (MX_transformer_block.py:794-801,:820)
                bb = np.broadcast_to(bias, (Bq, H, N, S)).reshape(-1, N, S)
                pred = pred + bb
                true = true + bb
            keys = np.ascontiguousarray(pred).view(np.int32)
            keys = np.where(keys >= 0, keys, ~keys ^ np.int32(-2 ** 31))
            p = np.exp(true - true.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            tkeys = np.ascontiguousarray(true).view(np.int32)
            tkeys = np.where(tkeys >= 0, tkeys, ~tkeys ^ np.int32(-2 ** 31))
            t_sel = select(tkeys, kk)
            t_mass = (p * t_sel).sum(-1)
            s32 = select(keys, kk)
            s8 = select(keys >> 24, kk)
            k8 = keys >> 24
            kth8 = np.partition(k8, -kk, axis=-1)[..., -kk][..., None]
            s_srv = (k8 >= kth8)
            rows[kind].append((
                si, ((p * s32).sum(-1) / t_mass).mean(),
                ((p * s8).sum(-1) / t_mass).mean(),
                ((p * s_srv).sum(-1) / t_mass).mean(),
                s_srv.sum(-1).mean()))
        print(f"step {si}: analyzed {len(captured)} attention calls",
              flush=True)

    for kind in ("self", "cross"):
        if not rows[kind]:
            print(f"\nPIXART {kind}-attention: no approx top-k calls "
                  "captured (check ex_pred/approx_flag)")
            continue
        agg = np.array([(r[1], r[2], r[3], r[4]) for r in rows[kind]])
        kk = SELF_K if kind == "self" else CROSS_K
        nk = 256 if kind == "self" else 120
        print(f"\nPIXART {kind.upper()}-ATTention aggregate "
              f"(k={kk}, keys={nk}, {PRED_MODE}):")
        print(f"  recall(exact kb32)          = {agg[:, 0].mean():.5f}")
        print(f"  recall(exact kb8)           = {agg[:, 1].mean():.5f}")
        print(f"  recall(serving kb8 tie-incl)= {agg[:, 2].mean():.5f}")
        print(f"  mean selected (serving)     = {agg[:, 3].mean():.1f}")
    print(f"\nfinal-latent: serving-vs-exact32 {float(data['d_srv32']):.4f}"
          f"  exact8-vs-exact32 {float(data['d_832']):.4f}"
          f"  different-seed scale {float(data['d_seed']):.4f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["traj", "analyze"], required=True)
    a = ap.parse_args()
    if a.phase == "traj":
        phase_traj()
    else:
        phase_analyze()
