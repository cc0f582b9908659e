"""Quantized-backward goldens: our custom_vjp grads vs reference torch
autograd at quantize_backprop=True (backward axes contract,
reference microxscaling/mx/linear.py:105-206, matmul.py:150-166, bmm.py).

Goldens from tests/make_golden_backward.py.  Forward outputs are asserted
too, so each case pins the full fwd+bwd chain at its spec.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mx_quantization_tpu import finalize_mx_specs
from mx_quantization_tpu.ops import bmm, linear, matmul

GOLD = os.path.join(os.path.dirname(__file__), "golden", "backward.npz")


def specs(bfloat=0):
    return finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        shared_exp_method="max", block_size=32, bfloat=bfloat, fp=0,
        round="nearest", mx_flush_fp32_subnorms=False,
        quantize_backprop=True))


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLD)


def _close(got, want, rtol=2e-5, atol=2e-5):
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)


@pytest.mark.parametrize("tag,bfloat,bias", [
    ("lin32", 0, True),
    ("lin72", 0, True),          # in=72: grad-quantizer block padding
    ("lin_bf16", 16, True),      # bfloat=16 elementwise backward
    ("lin_nobias", 0, False),
])
def test_linear_backward_matches_torch(golden, tag, bfloat, bias):
    s = specs(bfloat)
    x = jnp.asarray(golden[f"{tag}_x"])
    w = jnp.asarray(golden[f"{tag}_w"])
    b = jnp.asarray(golden[f"{tag}_b"]) if bias else None
    g = jnp.asarray(golden[f"{tag}_g"])

    out = linear(x, w, b, mx_specs=s)
    _close(out, golden[f"{tag}_out"])

    if bias:
        def f(x, w, b):
            return jnp.sum(linear(x, w, b, mx_specs=s) * g)
        gx, gw, gb = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
        _close(gb, golden[f"{tag}_gb"])
    else:
        def f(x, w):
            return jnp.sum(linear(x, w, None, mx_specs=s) * g)
        gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    _close(gx, golden[f"{tag}_gx"])
    _close(gw, golden[f"{tag}_gw"])


@pytest.mark.parametrize("mode", ["aa", "aw", "wa"])
def test_matmul_backward_matches_torch(golden, mode):
    s = specs()
    a = jnp.asarray(golden[f"mm_{mode}_a"])
    b = jnp.asarray(golden[f"mm_{mode}_b"])
    g = jnp.asarray(golden[f"mm_{mode}_g"])

    out = matmul(a, b, mx_specs=s, mode_config=mode)
    _close(out, golden[f"mm_{mode}_out"])

    def f(a, b):
        return jnp.sum(matmul(a, b, mx_specs=s, mode_config=mode) * g)

    ga, gb = jax.grad(f, argnums=(0, 1))(a, b)
    _close(ga, golden[f"mm_{mode}_ga"])
    _close(gb, golden[f"mm_{mode}_gb"])


def test_bmm_backward_matches_torch(golden):
    s = specs()
    a = jnp.asarray(golden["bmm_a"])
    b = jnp.asarray(golden["bmm_b"])
    g = jnp.asarray(golden["bmm_g"])

    out = bmm(a, b, mx_specs=s)
    _close(out, golden["bmm_out"])

    def f(a, b):
        return jnp.sum(bmm(a, b, mx_specs=s) * g)

    ga, gb = jax.grad(f, argnums=(0, 1))(a, b)
    _close(ga, golden["bmm_ga"])
    _close(gb, golden["bmm_gb"])
