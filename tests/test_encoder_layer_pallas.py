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


def _build(vocab=1000, ffn=1536, emb=256, seed=0):
    config = ModelConfig(encoder_layers=2, decoder_layers=2)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=vocab, emb_dim=emb, ffn_dim=ffn,
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


@pytest.mark.parametrize(
    "b,t,emb,ffn",
    [
        (2, 128, 512, 2048),  # base model (emb 512 / ffn 2048) at the
        (4, 64, 512, 2048),   # wrap-regime T the service actually uses
        (2, 128, 256, 1536),  # tiny at full wrap_length T=128
        (2, 256, 256, 1536),  # the gate's T ceiling
    ],
)
def test_layer_matches_xla_base_shapes(b, t, emb, ffn):
    """The gate admits any E % 128 == 0; pin parity at the BASE model's
    shapes (slimt/Model.cc:219-231 preset) and the wrap-length T the
    production path buckets to, not just tiny E=256/T<=64. The VMEM
    budget loop in encoder_layer_fused shrinks the batch block for the
    wider FFN — these cases exercise that path."""
    config, host = _build(emb=emb, ffn=ffn, seed=t + emb)
    layer = host["encoder"][0]
    rng = np.random.default_rng(emb + t)
    x = jnp.asarray(
        rng.standard_normal((b, t, emb)).astype(np.float32)
    )
    mask = np.ones((b, t), np.float32)
    mask[-1, t // 2:] = 0
    mask_add = tfm.make_additive_mask(jnp.asarray(mask))
    ref = tfm.encoder_layer_forward(layer, x, mask_add, config.num_heads)
    got = encoder_layer_fused(x, mask_add=mask_add, layer=layer,
                              num_heads=config.num_heads)
    # Two deviation classes, both exact-class: f32 accumulation-order
    # noise (~1e-5) on every element, plus int8 rint-flip LSBs on the
    # rare activation entries that sit exactly on a quantization tie
    # after the order-different LN/softmax (one int8 LSB dequantizes
    # to ~3e-3 at these scales). Pin both: the flip class bounded by
    # a few LSBs, and its population < 1%.
    diff = np.abs(np.asarray(got) - np.asarray(ref))
    assert diff.max() < 1e-2, f"beyond the quant-LSB class: {diff.max()}"
    flipped = (diff > 1e-4).mean()
    assert flipped < 0.01, f"too many rint-flip entries: {flipped:.4f}"


def test_layer_fused_shard_map_dp_bit_exact():
    """The kernel under shard_map over an 8-device "data" axis (the DP
    serving mesh; weights replicated) is BIT-identical to the
    unsharded kernel: the grid is batch blocks and each device runs
    the identical program on its batch shard."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from slimt_tpu.parallel import sharding as shd

    config, host = _build(seed=3)
    layer = host["encoder"][0]
    rng = np.random.default_rng(11)
    b, t, e = 16, 32, 256
    x = jnp.asarray(rng.standard_normal((b, t, e)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[5, 20:] = 0
    mask_add = tfm.make_additive_mask(jnp.asarray(mask))

    base = encoder_layer_fused(x, layer, mask_add, config.num_heads)

    mesh = shd.make_mesh(data=8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ms = jax.device_put(mask_add, NamedSharding(mesh, P("data")))
    ls = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), dict(layer)
    )
    got = jax.jit(
        lambda xx, ll, mm: tfm.encoder_layer_forward(
            ll, xx, mm, config.num_heads, fused_layer=True,
            fused_layer_mesh=mesh,
        )
    )(xs, ls, ms)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_model_gate_allows_dp_mesh():
    """Model(encoder_layer_kernel='on') accepts a replicated-weights
    DP mesh (shard_map path) and still rejects TP-sharded weights.
    Tokens on the DP mesh match the unsharded model exactly."""
    from tests.helpers import make_package
    from slimt_tpu.models.model import Model
    from slimt_tpu.parallel import sharding as shd

    config = ModelConfig(
        encoder_layers=2, decoder_layers=2, encoder_layer_kernel="on"
    )
    pkg = make_package(config=config, emb_dim=256, ffn_dim=512)
    segments = [[5, 9, 4, 0], [7, 2, 0], [3, 8, 6, 2, 0]]

    solo = Model(config, pkg)
    want = [h.target for h in solo.forward(segments)]

    mesh = shd.make_mesh(data=2)
    model = Model(config, pkg, mesh=mesh, sharding="replicate")
    hyps = model.forward(segments)
    assert [h.target for h in hyps] == want

    with pytest.raises(ValueError, match="encoder_layer_kernel"):
        tp = Model(config, pkg, mesh=shd.make_mesh(model=2), sharding="tp")
        tp.forward(segments)


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
