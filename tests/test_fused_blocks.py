"""Fused FFN/SSRU Pallas blocks vs the unfused transformer ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from slimt_tpu.config import ModelConfig
from slimt_tpu.io import load_items
from slimt_tpu.io.loader import load_weights
from slimt_tpu.io.synthetic import synthetic_model_bytes
from slimt_tpu.models import transformer as tfm
from slimt_tpu.ops import fused_blocks


@pytest.fixture(scope="module")
def params():
    config = ModelConfig(encoder_layers=1, decoder_layers=1, num_heads=4)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=64, emb_dim=32, ffn_dim=64, seed=11
        )
    )
    return load_weights(items, config)


def test_ffn_block_matches(params):
    layer = params["encoder"][0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 7, 32)).astype(np.float32))
    want = np.asarray(tfm._ffn_block(layer, x, "xla_int8"))
    got = np.asarray(
        fused_blocks.ffn_block(x, layer["ffn"], layer["ffn"]["ln"])
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_ssru_block_matches(params):
    rnn = params["decoder"][0]["rnn"]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((6, 1, 32)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((6, 1, 32)).astype(np.float32))
    want_h, want_c = tfm.ssru_forward(rnn, c, x, "xla_int8")
    got_h, got_c = fused_blocks.ssru_block(x, c, rnn)
    np.testing.assert_allclose(
        np.asarray(got_c), np.asarray(want_c), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_h), np.asarray(want_h), atol=1e-5
    )


def test_ffn_block_large_tiles(params):
    layer = params["encoder"][0]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((300, 32)).astype(np.float32))
    want = np.asarray(tfm._ffn_block(layer, x, "xla_int8"))
    got = np.asarray(
        fused_blocks.ffn_block(x, layer["ffn"], layer["ffn"]["ln"])
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_decoder_layer_step_matches(params):
    """Experimental whole-decoder-layer kernel (ops/decoder_step_pallas):
    parity with the unfused path in interpret mode."""
    import jax.numpy as jnp

    from slimt_tpu.models import transformer as tfm
    from slimt_tpu.ops.decoder_step_pallas import decoder_layer_step

    layer = params["decoder"][0]
    rng = np.random.default_rng(4)
    B, T, E, H = 5, 12, 32, 4
    x = jnp.asarray(rng.standard_normal((B, 1, E)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B, 1, E)).astype(np.float32))
    enc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32) * 0.3)
    mask = np.ones((B, T), np.float32)
    mask[1, -4:] = 0
    mask_add = jnp.asarray(
        ((1.0 - mask) * -99999999.0)[:, None, None, :].astype(np.float32)
    )
    kv = tfm.precompute_cross_kv({"decoder": [layer]}, enc, H, "xla_int8")[0]
    want_y, want_c, want_attn = tfm.decoder_layer_forward(
        layer, c, x, mask_add, kv, H, "xla_int8"
    )
    got_y, got_c, got_attn0 = decoder_layer_step(layer, c, x, mask_add, kv, H)
    np.testing.assert_allclose(
        np.asarray(got_y), np.asarray(want_y), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_c), np.asarray(want_c), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_attn0), np.asarray(want_attn)[:, 0, 0, :], atol=1e-6
    )
