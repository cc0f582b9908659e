"""Split-emission qkv layout (DiTQuantConfig.qkv_layout="split_t"): the
projection emits q/k pre-transposed straight from the MXU; values must
match the fused-layout path modulo f32 accumulation order (the MX grid
amplifies ulp-scale dot-order deltas into occasional grid-step flips —
same tolerance class as the model goldens)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mx_quantization_tpu.models import (DiT_models, DiTConfig,
                                        DiTQuantConfig, dit_forward,
                                        init_dit)
from mx_quantization_tpu.workloads.dit import dit_mx_specs


@pytest.mark.parametrize("hidden,heads", [(64, 2), (144, 2)])  # D=32, D=72
@pytest.mark.parametrize("contract", ["exact", "serving"])
def test_split_t_matches_fused_layout(hidden, heads, contract):
    cfg = DiTConfig(input_size=32, patch_size=2, hidden_size=hidden,
                    depth=2, num_heads=heads, num_classes=10)  # N=256
    specs = dit_mx_specs("fused")
    params = init_dit(jax.random.key(0), cfg)
    # randomize gates so blocks actually contribute
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree.unflatten(tree, [
        0.05 * jax.random.normal(k, l.shape, jnp.float32)
        for k, l in zip(keys, leaves)])
    x = 0.1 * jax.random.normal(jax.random.key(2), (2, 4, 32, 32))
    t = jnp.array([500.0, 100.0])
    y = jnp.array([3, 7], jnp.int32)

    def run(layout):
        qcfg = DiTQuantConfig(mx_specs=specs, mx_quant=True, top_k=True,
                              k=20, ex_pred=True, pred_mode="ex_pred",
                              exclude_blocks=(1,), topk_key_bits=8,
                              contract=contract, qkv_layout=layout,
                              activation_dtype="bfloat16")
        return np.asarray(dit_forward(params, x, t, y, cfg, qcfg),
                          np.float32)

    a, b = run("fused"), run("split_t")
    close = np.isclose(a, b, rtol=1e-4, atol=1e-4)
    assert close.mean() >= 0.99, close.mean()
    assert abs(a.mean() - b.mean()) < 2e-4
