"""Parity tests for the fused wrap-regime encoder SDPA kernel.

ops/attention.fused_sdpa_joined computes all heads' attention per
batch block on joined [B,T,E] operands (per-head selection by
exact-zero lane masking). The zero lanes are f32 additive
identities — they add no error terms — so the only deviation from the
einsum path is dot-accumulation order (ulp-level, observed 0 for
small summation trees, <=5e-7 abs at T=128). These tests pin that
class, through both the raw op and the full encoder.
Reference semantics: slimt/Modules.cc:24-86 (SDPA with alpha on QK^T).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slimt_tpu.config import ModelConfig
from slimt_tpu.io import load_items
from slimt_tpu.io.loader import load_weights, stack_layers
from slimt_tpu.io.synthetic import synthetic_model_bytes
from slimt_tpu.models import transformer as tfm
from slimt_tpu.ops.attention import fused_sdpa_joined


def _einsum_sdpa(q, k, v, mask_add, num_heads):
    b, t, e = q.shape
    d = e // num_heads
    qh = q.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    out, _ = tfm.scaled_dot_product_attention(qh, kh, vh, mask_add)
    return out.transpose(0, 2, 1, 3).reshape(b, t, e)


@pytest.mark.parametrize(
    "b,t,heads", [(1, 16, 8), (3, 16, 8), (4, 48, 4), (8, 128, 8)]
)
def test_fused_sdpa_matches_einsum(b, t, heads):
    e = 256
    rng = np.random.default_rng(b * 1000 + t)
    q = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, e)), jnp.float32)
    mask = np.zeros((b, 1, 1, t), np.float32)
    # Padded tail on some rows (additive -inf-class mask).
    mask[-1, :, :, t // 2:] = -1e9
    mask = jnp.asarray(mask)
    ref = _einsum_sdpa(q, k, v, mask, heads)
    got = fused_sdpa_joined(q, k, v, mask, heads)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6, rtol=0
    )


def test_encoder_forward_fused_sdpa_bit_exact():
    config = ModelConfig(encoder_layers=2, decoder_layers=2)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=1000, emb_dim=256, ffn_dim=512,
            seed=0,
        )
    )
    stacked = stack_layers(load_weights(items, config), decoder=False)
    rng = np.random.default_rng(0)
    b, t = 4, 32
    idx = jnp.asarray(rng.integers(3, 1000, (b, t)).astype(np.int32))
    mask = np.ones((b, t), np.float32)
    mask[2, 20:] = 0
    mask[3, 5:] = 0
    mask_add = tfm.make_additive_mask(jnp.asarray(mask))
    x = tfm.transform_embedding(tfm.embed(stacked, idx))
    base = tfm.encoder_forward(stacked, x, mask_add, config.num_heads)
    fused = tfm.encoder_forward(
        stacked, x, mask_add, config.num_heads, fused_sdpa=True
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), atol=1e-5, rtol=0
    )


def test_translate_batch_fused_sdpa_same_tokens():
    """Greedy tokens through the full forward are identical with the
    fused encoder SDPA (CPU interpret; zero-lane masking is exact)."""
    from slimt_tpu.models.decode import translate_batch

    config = ModelConfig(encoder_layers=2, decoder_layers=2)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=500, emb_dim=256, ffn_dim=512,
            seed=1,
        )
    )
    params = jax.device_put(stack_layers(load_weights(items, config)))
    rng = np.random.default_rng(1)
    b, t = 4, 16
    idx = jnp.asarray(rng.integers(3, 500, (b, t)).astype(np.int32))
    mask = np.ones((b, t), np.float32)
    mask[1, 9:] = 0
    mask = jnp.asarray(mask)
    base = translate_batch(
        params, idx, mask, eos_id=0, max_steps=12,
        num_heads=config.num_heads, kv_dtype="int16",
        argmax_method="packed_fp16", with_alignment=False,
    )
    fused = translate_batch(
        params, idx, mask, eos_id=0, max_steps=12,
        num_heads=config.num_heads, kv_dtype="int16",
        argmax_method="packed_fp16", with_alignment=False,
        fused_sdpa=True,
    )
    np.testing.assert_array_equal(
        np.asarray(base.tokens), np.asarray(fused.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(base.valid), np.asarray(fused.valid)
    )
