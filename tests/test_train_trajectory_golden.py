"""QAT loss-trajectory golden: our quantized forward+backward through real
SGD steps vs the reference torch trajectory (make_golden_train.py).

Each step consumes the SAME (x0, y, t, noise) batch as the torch run; the
loss sequence pins the full quantize_backprop=True training chain — model
forward, diffusion loss (incl. the t==0 decoder-NLL vb branch), gradients
through every quantized custom_vjp, and the SGD update — at trajectory
level, not just per-op.  Tolerances loosen with step index: MX quantization
amplifies cross-framework transcendental ulp deltas through the weight
updates (see tests/test_pixart_model_golden.py docstring).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mx_quantization_tpu import finalize_mx_specs
from mx_quantization_tpu.diffusion import create_diffusion
from mx_quantization_tpu.models import (DiTConfig, DiTQuantConfig,
                                        dit_forward)
from mx_quantization_tpu.utils.checkpoint import load_dit_checkpoint

pytestmark = pytest.mark.slow

GOLD = os.path.join(os.path.dirname(__file__), "golden", "train_traj.npz")
SD = os.path.join(os.path.dirname(__file__), "golden", "train_sd.pt")

CFG = DiTConfig(input_size=8, patch_size=2, in_channels=4, hidden_size=64,
                depth=2, num_heads=2, num_classes=10)
STEPS = 4
LR = 1e-3


def train_specs():
    # the golden's spec: MXINT8, bfloat=16, quantize_backprop=True
    return finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        shared_exp_method="max", block_size=32, bfloat=16, fp=0,
        round="nearest", mx_flush_fp32_subnorms=False,
        quantize_backprop=True))


def test_qat_loss_trajectory_matches_torch():
    golden = np.load(GOLD)
    params = jax.tree.map(jnp.asarray, load_dit_checkpoint(SD, depth=2))
    specs = train_specs()
    qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True, k=8,
                          ex_pred=True, pred_mode="ex_pred",
                          exclude_blocks=(1,))
    diffusion = create_diffusion(None)  # 1000-step training schedule
    assert diffusion.num_timesteps == 1000
    opt = optax.sgd(LR)
    opt_state = opt.init(params)

    def loss_fn(params, x0, y, t, noise):
        def model(xt, tt, y):
            return dit_forward(params, xt, tt, y, CFG, qcfg)

        terms = diffusion.training_losses(
            model, x0, t, key=None, model_kwargs={"y": y}, noise=noise)
        return jnp.mean(terms["loss"]), terms

    step_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    losses, mses, vbs = [], [], []
    for s in range(STEPS):
        x0 = jnp.asarray(golden[f"s{s}_x0"])
        y = jnp.asarray(golden[f"s{s}_y"])
        t = jnp.asarray(golden[f"s{s}_t"])
        noise = jnp.asarray(golden[f"s{s}_noise"])
        (loss, terms), grads = step_fn(params, x0, y, t, noise)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
        mses.append(float(jnp.mean(terms["mse"])))
        vbs.append(float(jnp.mean(terms["vb"])))

    want = golden["losses"]
    # step 0 shares identical weights: tight; later steps accumulate
    # quantization-amplified drift through the updated weights
    np.testing.assert_allclose(losses[0], want[0], rtol=2e-4)
    np.testing.assert_allclose(mses[0], golden["mses"][0], rtol=2e-4)
    np.testing.assert_allclose(vbs[0], golden["vbs"][0], rtol=2e-3)
    for s in range(1, STEPS):
        np.testing.assert_allclose(losses[s], want[s], rtol=2e-2), \
            f"step {s}"
    # the trajectory must actually descend like the reference's
    assert losses[0] > losses[-1]
