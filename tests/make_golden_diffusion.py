"""Golden outputs from the reference diffusion engine
(/root/reference/workloads/DiT/diffusion): schedule coefficients,
p_mean_variance, q_sample, and a DETERMINISTIC DDIM(eta=0) chain driven by
a fixed linear toy model — pins our diffusion/gaussian.py sampling math
(respacing, posterior tables, learned-range variance split, ddim update)
numerically, independent of RNG differences.

Usage: python tests/make_golden_diffusion.py   (requires /root/reference)
"""

import os
import sys

import numpy as np

REF = "/root/reference/workloads/DiT"
sys.path.insert(0, REF)

import torch  # noqa: E402
from diffusion import create_diffusion  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "golden")

SHAPE = (2, 4, 8, 8)


class ToyModel(torch.nn.Module):
    """Deterministic 2C-channel 'model': eps = a*x + b per channel,
    var logits = tanh(x) — same closed form on both sides."""

    def __init__(self):
        super().__init__()
        self.dummy = torch.nn.Parameter(torch.zeros(1))

    def forward(self, x, t, **kw):
        tt = t.float().reshape(-1, 1, 1, 1)
        eps = 0.3 * x + 0.01 * tt / 1000.0
        var = torch.tanh(x)
        return torch.cat([eps, var], dim=1)


def main():
    rng = np.random.RandomState(11)
    save = {}
    for tag, spacing in [("train", ""), ("s100", "100"),
                         ("ddim25", "ddim25")]:
        d = create_diffusion(timestep_respacing=spacing)
        save[f"{tag}_betas"] = np.asarray(d.betas, np.float64)
        save[f"{tag}_post_logvar"] = np.asarray(
            d.posterior_log_variance_clipped, np.float64)
        save[f"{tag}_post_mean_c1"] = np.asarray(d.posterior_mean_coef1,
                                                 np.float64)
        save[f"{tag}_post_mean_c2"] = np.asarray(d.posterior_mean_coef2,
                                                 np.float64)
        if hasattr(d, "timestep_map"):
            save[f"{tag}_timestep_map"] = np.asarray(d.timestep_map,
                                                     np.int64)

        x = torch.tensor(rng.randn(*SHAPE).astype(np.float32))
        x0 = torch.tensor(rng.randn(*SHAPE).astype(np.float32))
        noise = torch.tensor(rng.randn(*SHAPE).astype(np.float32))
        n = d.num_timesteps
        t = torch.tensor(np.array([0, n - 1], np.int64))
        save[f"{tag}_x"] = x.numpy()
        save[f"{tag}_x0"] = x0.numpy()
        save[f"{tag}_noise"] = noise.numpy()
        save[f"{tag}_qsample"] = d.q_sample(x0, t, noise=noise).numpy()

        out = d.p_mean_variance(ToyModel(), x, t, clip_denoised=False)
        save[f"{tag}_pmv_mean"] = out["mean"].numpy()
        save[f"{tag}_pmv_logvar"] = out["log_variance"].numpy()
        save[f"{tag}_pmv_predx0"] = out["pred_xstart"].numpy()

    # deterministic DDIM chain (eta=0: no sampling noise)
    d = create_diffusion(timestep_respacing="ddim10")
    z = torch.tensor(rng.randn(*SHAPE).astype(np.float32))
    save["ddim_chain_z"] = z.numpy()
    with torch.no_grad():
        out = d.ddim_sample_loop(ToyModel(), SHAPE, noise=z,
                                 clip_denoised=False, eta=0.0,
                                 progress=False)
    save["ddim_chain_out"] = out.numpy()

    np.savez_compressed(os.path.join(OUT_DIR, "diffusion.npz"), **save)
    print("wrote diffusion.npz;",
          {k: v.shape for k, v in list(save.items())[:4]})


if __name__ == "__main__":
    main()
