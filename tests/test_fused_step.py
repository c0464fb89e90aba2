"""Whole-step fused decoder kernel (ops/decoder_step_pallas.
whole_decode_step, provider="fused_step"): every decoder layer +
shortlisted logit projection + greedy argmax in one Pallas program.

Runs in interpret mode on the CPU suite; parity target is the XLA
path with the same bfloat16 joined KV cache (identical quantization
contract, so tokens should match except for rare bf16-rounding
near-ties)."""

import numpy as np
import pytest
import jax.numpy as jnp

from slimt_tpu.config import ModelConfig
from slimt_tpu.io import load_items
from slimt_tpu.io.loader import load_weights, stack_layers
from slimt_tpu.io.synthetic import synthetic_model_bytes
from slimt_tpu.models import decode as dec

CONFIG = ModelConfig(encoder_layers=2, decoder_layers=2, num_heads=4)
VOCAB = 4736  # > 2 projection tiles, not a multiple of TILE_S (2048)
EMB = 32


@pytest.fixture(scope="module")
def params():
    blob = synthetic_model_bytes(
        config=CONFIG, vocab_size=VOCAB, emb_dim=EMB, ffn_dim=64, seed=3
    )
    return stack_layers(load_weights(load_items(blob), CONFIG))


def _batch(seed, b=5, t=9):
    rng = np.random.default_rng(seed)
    indices = rng.integers(3, VOCAB, size=(b, t)).astype(np.uint32)
    lengths = rng.integers(3, t + 1, size=b)
    mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)
    indices[mask == 0] = 0
    return jnp.asarray(indices), jnp.asarray(mask)


def _run(params, indices, mask, provider, shortlist=None, **kw):
    return dec.translate_batch(
        params,
        indices,
        mask,
        eos_id=2,
        max_steps=12,
        num_heads=CONFIG.num_heads,
        provider=provider,
        shortlist=shortlist,
        **kw,
    )


def test_fused_step_matches_xla_bf16_full_vocab(params):
    """Full tied vocab: the projection spans 3 tiles with a partial
    final tile (mask semantics of the running argmax)."""
    indices, mask = _batch(seed=1)
    want = _run(params, indices, mask, "xla_int8", kv_dtype="bfloat16")
    got = _run(params, indices, mask, "fused_step", kv_dtype="bfloat16")
    agree = (np.asarray(got.tokens) == np.asarray(want.tokens)).mean()
    assert agree >= 0.95, f"token agreement {agree}"
    assert np.asarray(got.valid).any()
    np.testing.assert_allclose(
        np.asarray(got.alignment),
        np.asarray(want.alignment),
        atol=0.05,
    )


def test_fused_step_matches_xla_bf16_shortlist(params):
    indices, mask = _batch(seed=2)
    shortlist = jnp.asarray(np.arange(0, VOCAB, 5, dtype=np.int32))
    want = _run(
        params, indices, mask, "xla_int8",
        shortlist=shortlist, kv_dtype="bfloat16",
    )
    got = _run(params, indices, mask, "fused_step", shortlist=shortlist,
               kv_dtype="bfloat16")
    agree = (np.asarray(got.tokens) == np.asarray(want.tokens)).mean()
    assert agree >= 0.95, f"token agreement {agree}"


@pytest.mark.parametrize("b", [1, 3, 33])
def test_fused_step_batch_sizes(params, b):
    """Partial B tiles (b=33 crosses the 32-row tile) and the B=1
    latency shape decode without NaNs leaking from padding rows."""
    indices, mask = _batch(seed=4, b=b)
    want = _run(params, indices, mask, "xla_int8", kv_dtype="bfloat16")
    got = _run(params, indices, mask, "fused_step", kv_dtype="bfloat16")
    agree = (np.asarray(got.tokens) == np.asarray(want.tokens)).mean()
    assert agree >= 0.9, f"token agreement {agree} at b={b}"
    assert np.isfinite(np.asarray(got.alignment)).all()


def test_fused_step_int16_matches_xla(params):
    """The whole-step kernel reads the int16 PER-ROW cache natively
    (the declared serving numerics): same quantization contract as the
    XLA int16 branch (kqi/vqi fold into score/value dequants), so
    tokens match up to f32 dot-order near-ties."""
    indices, mask = _batch(seed=6)
    want = _run(params, indices, mask, "xla_int8", kv_dtype="int16")
    got = _run(params, indices, mask, "fused_step", kv_dtype="int16")
    agree = (np.asarray(got.tokens) == np.asarray(want.tokens)).mean()
    assert agree >= 0.95, f"token agreement {agree}"


def test_fused_step_coerces_reduced_kv(params):
    """Unsupported quantized caches (int8/k8v16) coerce to the int16
    per-row cache instead of erroring — bit-identical to asking for
    int16 directly."""
    indices, mask = _batch(seed=6)
    want = _run(params, indices, mask, "fused_step", kv_dtype="int16")
    for kv in ("int8", "k8v16"):
        got = _run(params, indices, mask, "fused_step", kv_dtype=kv)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(want.tokens)
        )


def test_fused_step_through_service():
    """ModelConfig(qmm_provider='fused_step') end to end through the
    Blocking service (bucketed shapes, shortlist absent) — outputs
    must match the default provider's."""
    import dataclasses

    from slimt_tpu.config import Config
    from slimt_tpu.models.model import Model
    from slimt_tpu.runtime.service import Blocking
    from tests.helpers import TINY_TEST_CONFIG, make_package

    package = make_package()
    base = Model(TINY_TEST_CONFIG, package)
    fused = Model(
        dataclasses.replace(TINY_TEST_CONFIG, qmm_provider="fused_step"),
        package,
    )
    texts = ["hello world", "a quick brown test", "unknown zzz"]
    with Blocking(Config()) as svc:
        want = [r.target.text for r in svc.translate(base, texts)]
    with Blocking(Config()) as svc:
        got = [r.target.text for r in svc.translate(fused, texts)]
    assert got == want


def test_fused_step_base_like_shapes():
    """Shape generality: 8 heads, emb 64, ffn 128 (base-model ratios
    scaled down) through the fused whole-step kernel."""
    config = ModelConfig(encoder_layers=2, decoder_layers=2, num_heads=8)
    blob = synthetic_model_bytes(
        config=config, vocab_size=512, emb_dim=64, ffn_dim=128, seed=7
    )
    p = stack_layers(load_weights(load_items(blob), config))
    rng = np.random.default_rng(0)
    indices = jnp.asarray(rng.integers(3, 512, size=(4, 8)).astype(np.uint32))
    mask = jnp.ones((4, 8), jnp.float32)
    kw = dict(eos_id=2, max_steps=10, num_heads=8)
    want = dec.translate_batch(
        p, indices, mask, provider="xla_int8", kv_dtype="bfloat16", **kw
    )
    got = dec.translate_batch(
        p, indices, mask, provider="fused_step", kv_dtype="bfloat16", **kw
    )
    agree = (np.asarray(got.tokens) == np.asarray(want.tokens)).mean()
    assert agree >= 0.9, f"token agreement {agree}"
