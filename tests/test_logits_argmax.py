"""Fused projection+argmax kernel: bit-identical index to the XLA
logits+argmax path (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from slimt_tpu.ops import logits_argmax, qmm


@pytest.mark.parametrize(
    "b,k,n",
    [
        (1, 256, 512),
        (8, 256, 1024),
        (128, 256, 2048),
        (9, 64, 512),
        (8, 256, 2688),  # partial final vocab tile (2688 % 512 != 0)
    ],
)
def test_matches_xla_argmax(b, k, n):
    rng = np.random.default_rng(b + n)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    bias = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    aq = jnp.float32(31.7)
    bq = jnp.float32(90.2)

    want = jnp.argmax(
        qmm.affine(x, w, bias, aq, bq, provider="xla_int8"), axis=-1
    ).astype(jnp.int32)
    got = logits_argmax.argmax_affine(x, w, bias, aq, bq, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_tie_prefers_first():
    """jnp.argmax returns the first maximum; so must the tiled scan,
    including across vocab tiles."""
    k, n = 128, 1024
    x = jnp.ones((2, k), jnp.float32)
    w = jnp.zeros((k, n), jnp.int8)
    # identical columns in different tiles -> exact logit ties
    w = w.at[:, 3].set(5)
    w = w.at[:, 700].set(5)  # second tile (TILE_N=512), same logit
    bias = jnp.zeros((n,), jnp.float32)
    got = logits_argmax.argmax_affine(
        x, w, bias, jnp.float32(4.0), jnp.float32(2.0), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), [3, 3])


def test_partial_tile_padding_never_wins():
    """All real logits negative + a partial final tile: the padded
    columns (zeros in interpret mode) must not beat the real maximum,
    and the returned index must stay < n."""
    b, k, n = 4, 128, 640  # 640 % 512 = 128: final tile 3/4 padding
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.abs(rng.standard_normal((b, k))) + 0.1, jnp.float32
    )  # strictly positive
    w = jnp.asarray(rng.integers(-127, -1, (k, n)), jnp.int8)  # < 0
    bias = jnp.full((n,), -50.0, jnp.float32)
    aq, bq = jnp.float32(10.0), jnp.float32(10.0)
    want = jnp.argmax(
        qmm.affine(x, w, bias, aq, bq, provider="xla_int8"), axis=-1
    ).astype(jnp.int32)
    got = logits_argmax.argmax_affine(x, w, bias, aq, bq, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert (np.asarray(got) < n).all()


def test_supported_widths():
    assert logits_argmax.supported(32000)
    assert logits_argmax.supported(1024)
    assert not logits_argmax.supported(96)
    assert not logits_argmax.supported(250)


def test_packed_key_modes_match_packed_argmax_16():
    """The kernel's packed-key epilogue (VERDICT r3 task 6a) is
    bit-identical to transformer.packed_argmax_16 over the same
    logits, for both 16-bit key dtypes."""
    import jax.numpy as jnp

    from slimt_tpu.models.transformer import packed_argmax_16
    from slimt_tpu.ops import qmm

    rng = np.random.default_rng(7)
    b_, k, n = 16, 64, 1536
    x = jnp.asarray(rng.standard_normal((b_, k)).astype(np.float32))
    w = jnp.asarray(rng.integers(-127, 128, (k, n)).astype(np.int8))
    bias = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
    aq, bq = jnp.float32(20.0), jnp.float32(15.0)
    logits = qmm.affine(x, w, bias, aq, bq)
    for meth, dt in (
        ("packed_fp16", jnp.float16), ("packed_bf16", jnp.bfloat16)
    ):
        want = np.asarray(packed_argmax_16(logits, dt))
        got = np.asarray(
            logits_argmax.argmax_affine(
                x, w, bias, aq, bq, interpret=True, method=meth
            )
        )
        np.testing.assert_array_equal(want, got)
