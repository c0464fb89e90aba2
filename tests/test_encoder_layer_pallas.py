"""Parity tests for the whole-encoder-layer fused Pallas kernel.

ops/encoder_layer_pallas.encoder_layer_fused computes a complete
reference encoder layer (QKVO int8 affines, multi-head SDPA,
residual + post-LN, FFN + post-LN — slimt/Modules.cc:287-334) in one
program. The int8 affines are bit-exact vs ops/qmm (same rint/clip
quantization, associative i32 accumulation); LN/softmax are the same
f32 formulas as models/transformer, differing only in accumulation
order — these tests pin the ulp class and the full-forward token
identity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slimt_tpu.config import ModelConfig
from slimt_tpu.io import load_items
from slimt_tpu.io.loader import load_weights, stack_layers
from slimt_tpu.io.synthetic import synthetic_model_bytes
from slimt_tpu.models import transformer as tfm
from slimt_tpu.ops.encoder_layer_pallas import encoder_layer_fused


def _build(vocab=1000, ffn=1536, seed=0):
    config = ModelConfig(encoder_layers=2, decoder_layers=2)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=vocab, emb_dim=256, ffn_dim=ffn,
            seed=seed,
        )
    )
    return config, load_weights(items, config)


@pytest.mark.parametrize("b,t", [(1, 16), (4, 32), (8, 64), (3, 48)])
def test_layer_matches_xla(b, t):
    config, host = _build(seed=b + t)
    layer = host["encoder"][0]
    rng = np.random.default_rng(b * 100 + t)
    x = jnp.asarray(rng.standard_normal((b, t, 256)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[-1, t // 2:] = 0
    mask_add = tfm.make_additive_mask(jnp.asarray(mask))
    ref = tfm.encoder_layer_forward(layer, x, mask_add, config.num_heads)
    got = encoder_layer_fused(x, mask_add=mask_add, layer=layer,
                              num_heads=config.num_heads)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=0
    )


def test_encoder_forward_fused_layer():
    """encoder_forward(fused_layer=True) routes every layer through
    the kernel — list and stacked (lax.scan) forms agree with XLA."""
    config, host = _build()
    rng = np.random.default_rng(7)
    b, t = 4, 32
    idx = jnp.asarray(rng.integers(3, 1000, (b, t)).astype(np.int32))
    mask = np.ones((b, t), np.float32)
    mask[2, 20:] = 0
    mask_add = tfm.make_additive_mask(jnp.asarray(mask))

    stacked = stack_layers(dict(host), decoder=False)
    x = tfm.transform_embedding(tfm.embed(stacked, idx))
    base = tfm.encoder_forward(stacked, x, mask_add, config.num_heads)
    fused_stacked = tfm.encoder_forward(
        stacked, x, mask_add, config.num_heads, fused_layer=True
    )
    fused_list = tfm.encoder_forward(
        host, x, mask_add, config.num_heads, fused_layer=True
    )
    np.testing.assert_allclose(
        np.asarray(fused_stacked), np.asarray(base), atol=5e-5, rtol=0
    )
    np.testing.assert_array_equal(
        np.asarray(fused_stacked), np.asarray(fused_list)
    )


def test_translate_batch_fused_layer_same_tokens():
    """Greedy tokens are identical with the fused encoder layer under
    the declared serving numerics (CPU interpret)."""
    from slimt_tpu.models.decode import translate_batch

    config, host = _build(vocab=500, seed=1)
    params = jax.device_put(stack_layers(host))
    rng = np.random.default_rng(1)
    b, t = 4, 16
    idx = jnp.asarray(rng.integers(3, 500, (b, t)).astype(np.int32))
    mask = np.ones((b, t), np.float32)
    mask[1, 9:] = 0
    mask = jnp.asarray(mask)
    kwargs = dict(
        eos_id=0, max_steps=12, num_heads=config.num_heads,
        kv_dtype="int16", argmax_method="packed_fp16",
        with_alignment=False,
    )
    base = translate_batch(params, idx, mask, **kwargs)
    fused = translate_batch(params, idx, mask, fused_layer=True, **kwargs)
    np.testing.assert_array_equal(
        np.asarray(base.tokens), np.asarray(fused.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(base.valid), np.asarray(fused.valid)
    )
