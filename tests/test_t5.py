"""JAX T5 encoder vs transformers' T5EncoderModel (value-for-value).

The reference encodes PixArt prompts with an 8-bit torch T5
(text_local_inference_alpha.py:70-103); models/t5.py is the TPU-native
encoder.  A tiny random T5 v1.1 config runs through both stacks via the
state-dict converter — wrong bucket math, missing bias, scaled attention,
or a bad FFN gating all diverge immediately.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

pytestmark = pytest.mark.slow

from mx_quantization_tpu.models.t5 import (T5Config, init_t5_encoder,
                                           load_t5_checkpoint, t5_encode)


def _tiny_cfgs():
    from transformers import T5Config as HFT5Config
    cfg = T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                   num_layers=3, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=32)
    hf = HFT5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
        is_encoder_decoder=False, use_cache=False, tie_word_embeddings=False)
    return cfg, hf


def test_t5_encoder_matches_transformers():
    from transformers import T5EncoderModel
    cfg, hf = _tiny_cfgs()
    torch.manual_seed(0)
    m = T5EncoderModel(hf).eval()

    rng = np.random.RandomState(1)
    ids = rng.randint(0, 256, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        want = m(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    params = jax.tree.map(jnp.asarray,
                          load_t5_checkpoint(m.state_dict(), cfg))
    got = np.asarray(t5_encode(params, jnp.asarray(ids),
                               jnp.asarray(mask), cfg))
    # masked positions produce garbage on both sides (HF keeps computing
    # them); compare valid positions
    np.testing.assert_allclose(got[0], want[0], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(got[1, :8], want[1, :8], rtol=2e-3,
                               atol=2e-4)


def test_t5_encoder_quantized_runs():
    """MXINT8-quantized T5 encoding (the TPU-native analogue of the
    reference's 8-bit bitsandbytes T5) stays close to fp32."""
    from mx_quantization_tpu import finalize_mx_specs
    cfg, _ = _tiny_cfgs()
    params = init_t5_encoder(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.RandomState(2).randint(0, 256, (2, 10)))
    fp = np.asarray(t5_encode(params, ids, None, cfg))
    specs = finalize_mx_specs(dict(
        w_elem_format="int8", a_elem_format="int8", scale_bits=8,
        block_size=32, quantize_backprop=False, custom_tpu="fused"))
    q = np.asarray(t5_encode(params, ids, None, cfg, mx_specs=specs))
    assert np.isfinite(q).all()
    # int8 quantization error, not divergence
    rel = np.abs(q - fp).mean() / (np.abs(fp).mean() + 1e-9)
    assert rel < 0.05, rel
