"""Parity of the Pallas int16 decode-attention kernel (interpret mode
on CPU) against the XLA joined-layout formulation it replaces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slimt_tpu.models import transformer as tfm
from slimt_tpu.ops.decode_attn_pallas import decode_attention_int16


def _case(b, t, e, h, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, e)).astype(np.float32))
    kf = rng.normal(size=(b, t, e)).astype(np.float32)
    vf = rng.normal(size=(b, t, e)).astype(np.float32)
    # Per-row int16 quantization exactly like precompute_cross_kv's
    # reduced path: symmetric rint, per-(b, t) scales.
    kmax = np.maximum(np.abs(kf).max(axis=2), 1e-6)
    vmax = np.maximum(np.abs(vf).max(axis=2), 1e-6)
    kq = 32767.0 / kmax
    vq = 32767.0 / vmax
    k16 = np.rint(kf * kq[:, :, None]).astype(np.int16)
    v16 = np.rint(vf * vq[:, :, None]).astype(np.int16)
    mask = np.zeros((b, t), np.float32)
    mask[:, -2:] = -1e8  # some padded source positions
    kv = {
        "k": jnp.asarray(k16),
        "v": jnp.asarray(v16),
        "kqi": jnp.asarray((1.0 / kq).astype(np.float32)),
        "vqi": jnp.asarray((1.0 / vq).astype(np.float32)),
    }
    return q, kv, jnp.asarray(mask)


@pytest.mark.parametrize("b,t", [(4, 16), (8, 24), (16, 64)])
def test_matches_xla_joined_int16(b, t):
    e, h = 64, 4
    q, kv, mask = _case(b, t, e, h)
    mask_add = mask[:, None, None, :]  # [B,1,1,T]
    want, _ = tfm._decode_attention_joined(q[:, None, :], kv, mask_add, h)
    got = decode_attention_int16(
        q, kv["k"], kv["v"], kv["kqi"], kv["vqi"], mask, h, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want[:, 0, :]), rtol=2e-5, atol=2e-5
    )


def test_fully_masked_rows_are_finite():
    """Batch-bucket padding rows are fully masked; the kernel must not
    emit NaNs for them (they are discarded, but NaNs poison XLA
    reductions in surrounding fusions)."""
    e, h = 64, 4
    q, kv, mask = _case(4, 16, e, h, seed=3)
    mask = mask.at[2, :].set(-1e8)
    got = decode_attention_int16(
        q, kv["k"], kv["v"], kv["kqi"], kv["vqi"], mask, h, interpret=True
    )
    assert np.isfinite(np.asarray(got)).all()


def test_block_batch_sizing():
    from slimt_tpu.ops.decode_attn_pallas import _block_batch

    # Fits the 12 MiB budget and divides the batch — including
    # NON-power-of-two batches (a power-of-two bucket times a
    # data-parallel process count, e.g. 8 x 3 = 24): the grid floors,
    # so a non-divisor block would leave trailing rows unwritten.
    for batch, t in [
        (2048, 64), (2048, 128), (2048, 192), (16, 64), (1, 16),
        (24, 64), (96, 64), (40, 128), (3, 16),
    ]:
        bb = _block_batch(batch, t, 256)
        assert batch % bb == 0, (batch, t, bb)
        assert 12 * bb * t * 256 <= 12 * 1024 * 1024 or bb == 1


def test_non_power_of_two_batch_all_rows_written():
    """batch=24 (8-bucket x 3 processes shape): every output row must
    be computed — the grid-floor bug left rows >= bb uninitialized."""
    e, h = 64, 4
    q, kv, mask = _case(24, 16, e, h, seed=5)
    mask_add = mask[:, None, None, :]
    want, _ = tfm._decode_attention_joined(q[:, None, :], kv, mask_add, h)
    got = decode_attention_int16(
        q, kv["k"], kv["v"], kv["kqi"], kv["vqi"], mask, h, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want[:, 0, :]), rtol=2e-5, atol=2e-5
    )
