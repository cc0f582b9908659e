"""Diffusion sampling math vs the reference engine
(workloads/DiT/diffusion): schedule/posterior coefficients per respacing,
q_sample, learned-range p_mean_variance, and a deterministic DDIM(eta=0)
chain driven by the same closed-form toy model.  Goldens from
tests/make_golden_diffusion.py — RNG-independent by construction.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mx_quantization_tpu.diffusion import create_diffusion

GOLD = os.path.join(os.path.dirname(__file__), "golden", "diffusion.npz")

SPACINGS = {"train": None, "s100": "100", "ddim25": "ddim25"}


def toy_model(x, t, **kw):
    tt = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
    eps = 0.3 * x + 0.01 * tt / 1000.0
    var = jnp.tanh(x)
    return jnp.concatenate([eps, var], axis=1)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLD)


@pytest.mark.parametrize("tag", list(SPACINGS))
def test_schedule_tables_match_reference(golden, tag):
    d = create_diffusion(SPACINGS[tag])
    np.testing.assert_allclose(d.betas, golden[f"{tag}_betas"], rtol=1e-12)
    np.testing.assert_allclose(d.posterior_log_variance_clipped,
                               golden[f"{tag}_post_logvar"], rtol=1e-10)
    np.testing.assert_allclose(d.posterior_mean_coef1,
                               golden[f"{tag}_post_mean_c1"], rtol=1e-10)
    np.testing.assert_allclose(d.posterior_mean_coef2,
                               golden[f"{tag}_post_mean_c2"], rtol=1e-10)
    if f"{tag}_timestep_map" in golden:
        np.testing.assert_array_equal(d.timestep_map,
                                      golden[f"{tag}_timestep_map"])


@pytest.mark.parametrize("tag", list(SPACINGS))
def test_qsample_and_p_mean_variance_match_reference(golden, tag):
    d = create_diffusion(SPACINGS[tag])
    x = jnp.asarray(golden[f"{tag}_x"])
    x0 = jnp.asarray(golden[f"{tag}_x0"])
    noise = jnp.asarray(golden[f"{tag}_noise"])
    n = d.num_timesteps
    t = jnp.asarray(np.array([0, n - 1], np.int64))

    qs = d.q_sample(x0, t, noise)
    np.testing.assert_allclose(np.asarray(qs), golden[f"{tag}_qsample"],
                               rtol=2e-6, atol=2e-6)

    # reference p_mean_variance calls the model with the MAPPED timestep
    out = toy_model(x, d.model_t(t).astype(jnp.float32))
    mean, log_var, pred_x0 = d.p_mean_variance(out, x, t,
                                               clip_denoised=False)
    np.testing.assert_allclose(np.asarray(mean), golden[f"{tag}_pmv_mean"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(log_var),
                               golden[f"{tag}_pmv_logvar"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pred_x0),
                               golden[f"{tag}_pmv_predx0"],
                               rtol=2e-5, atol=2e-5)


def test_deterministic_ddim_chain_matches_reference(golden):
    import jax

    d = create_diffusion("ddim10")
    z = jnp.asarray(golden["ddim_chain_z"])
    out = d.ddim_sample_loop(toy_model, z.shape, jax.random.key(0),
                             eta=0.0, clip_denoised=False, noise=z)
    np.testing.assert_allclose(np.asarray(out), golden["ddim_chain_out"],
                               rtol=2e-4, atol=2e-4)
