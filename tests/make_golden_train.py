"""Generate a QUANTIZED TRAINING loss-trajectory golden from the reference.

Runs the reference torch debug DiT (make_golden_model build) with
``quantize_backprop=True`` through the reference's own
GaussianDiffusion.training_losses (workloads/DiT/diffusion/
gaussian_diffusion.py:717-784) for several plain-SGD steps on fixed
(x0, y, t, noise) batches, recording the per-step mean loss/mse/vb.

tests/test_train_trajectory_golden.py replays the same schedule through our
dit_forward + diffusion.training_losses + optax.sgd: QAT numerics
(quantized forward AND backward) are pinned end to end, not just per-op.

t deliberately includes 0 to pin the t==0 decoder-NLL branch of the vb
term (gaussian_diffusion.py _vb_terms_bpd).

Usage: python tests/make_golden_train.py   (requires /root/reference)
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import make_golden_model as gm  # noqa: E402

import torch  # noqa: E402

REF = "/root/reference"
OUT_DIR = os.path.join(HERE, "golden")

sys.path.insert(0, os.path.join(REF, "workloads", "DiT"))
from diffusion import create_diffusion  # noqa: E402  (reference package)

TRAIN_SPECS = gm.ref_finalize({
    "w_elem_format": "int8", "a_elem_format": "int8", "scale_bits": 8,
    "shared_exp_method": "max", "block_size": 32, "bfloat": 16, "fp": 0,
    "bfloat_subnorms": True, "round": "nearest",
    "mx_flush_fp32_subnorms": False, "custom_cuda": False,
    "quantize_backprop": True,
})

STEPS = 4
LR = 1e-3


def main():
    torch.manual_seed(0)
    # class_dropout_prob=0: the CFG label dropout (models.py LabelEmbedder)
    # draws from the global torch RNG in train mode — nondeterministic
    # between runs and absent from our replay (which pins labels)
    m = gm.ref_models.DiT(mx_quant=True, mx_specs=TRAIN_SPECS, top_k=True,
                          k=8, ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=[1], exclude_timesteps=[],
                          class_dropout_prob=0.0, **gm.MODEL_KW)
    g = torch.Generator().manual_seed(45)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(0.1 * torch.randn(p.shape, generator=g))
    m.train()

    diffusion = create_diffusion(timestep_respacing="")  # 1000-step train
    opt = torch.optim.SGD(m.parameters(), lr=LR)

    rng = np.random.RandomState(77)
    B = 2
    save = {}
    losses, mses, vbs = [], [], []
    torch.topk = gm._stable_topk
    for step in range(STEPS):
        x0 = torch.tensor(rng.randn(B, 4, 8, 8).astype(np.float32))
        y = torch.tensor(rng.randint(0, 10, size=(B,)).astype(np.int64))
        # include t=0 on the first step: pins the decoder-NLL vb branch
        t = (torch.tensor(np.array([0, 999], np.int64)) if step == 0 else
             torch.tensor(rng.randint(0, 1000, size=(B,)).astype(np.int64)))
        noise = torch.tensor(rng.randn(B, 4, 8, 8).astype(np.float32))
        save[f"s{step}_x0"] = x0.numpy()
        save[f"s{step}_y"] = y.numpy()
        save[f"s{step}_t"] = t.numpy()
        save[f"s{step}_noise"] = noise.numpy()

        # per-module timestep counters must not gate anything between
        # frameworks; exclude_timesteps=[] so they are inert
        if step == 0:
            with torch.no_grad():
                xt_dbg = diffusion.q_sample(x0, t, noise=noise)
                save["s0_xt"] = xt_dbg.numpy()
                save["s0_model_out"] = m(xt_dbg, t, y=y).numpy()
        terms = diffusion.training_losses(m, x0, t, model_kwargs=dict(y=y),
                                          noise=noise)
        loss = terms["loss"].mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        mses.append(float(terms["mse"].mean()))
        vbs.append(float(terms["vb"].mean()))
        print(f"step {step}: loss={losses[-1]:.6f} mse={mses[-1]:.6f} "
              f"vb={vbs[-1]:.6f}")

    save["losses"] = np.array(losses, np.float64)
    save["mses"] = np.array(mses, np.float64)
    save["vbs"] = np.array(vbs, np.float64)
    # initial weights for the replay (regenerate the same init)
    m2 = gm.ref_models.DiT(mx_quant=False, mx_specs=None, top_k=False,
                           k=8, ex_pred=False, class_dropout_prob=0.0,
                           **gm.MODEL_KW)
    g = torch.Generator().manual_seed(45)
    with torch.no_grad():
        for p in m2.parameters():
            p.copy_(0.1 * torch.randn(p.shape, generator=g))
    torch.save(m2.state_dict(), os.path.join(OUT_DIR, "train_sd.pt"))
    np.savez_compressed(os.path.join(OUT_DIR, "train_traj.npz"), **save)
    print("wrote train_traj.npz + train_sd.pt")


if __name__ == "__main__":
    main()
