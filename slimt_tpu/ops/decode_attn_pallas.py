"""Pallas decode-step cross-attention over the joined int16 KV cache.

Why this kernel exists (measured, 2026-08-20): the XLA formulation of
`transformer._decode_attention_joined` expresses the per-head score
reduction as a batched MXU GEMM against a block-diagonal selector —
which requires materializing `q2 = q ⊙ sel` as a [B, E, H] f32 buffer
per layer (16 MiB at B=2048). XLA cannot fuse a nontrivial producer
into a dot operand, so q2 is written to and re-read from HBM every
step: ~64 MiB/step across the two decoder layers ≈ 78 µs at v5e HBM
peak — almost exactly the measured 77 µs gap between the attention
component (410 µs) and its own HBM floor (333 µs) in the devstep
decomposition (PERFORMANCE.md).

Here the whole per-layer attention runs in VMEM per batch block, so
only K/V (int16) stream from HBM — the floor traffic:

    kq     = K_f32 ⊙ q          (VPU, in VMEM — never hits HBM)
    scores = (kq)@sel            [bB·T, E] x [E, H]   (MXU)
    attn   = softmax_T(scores · scale · kqi + mask)
    A      = (attn·vqi)@selᵀ     [bB·T, H] x [H, E]   (MXU)
    out    = Σ_T (A ⊙ V_f32)     (VPU sublane reduce)

Identical math to the int16 branch of `_decode_attention_joined`
(same dequant folding, same mask-add semantics); accumulation order
differs (elementwise-then-reduce vs dot), so parity is tested to f32
tolerance plus token-level equality on full decodes
(tests/test_decode_attn_pallas.py). Used only on the alignment-free
path: attention weights are not materialized (the caller gets zeros;
the alignment path keeps the XLA formulation).

Reference behavior being implemented: cross-attention of the SSRU
decoder layer, slimt/Modules.cc:237-259 (q from the decoder state,
K/V precomputed from encoder_out) — redesigned for TPU as a
bandwidth-floor streaming kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_batch(batch: int, t: int, emb: int) -> int:
    """Largest power-of-two batch block that DIVIDES the batch (the
    grid floors — a non-divisor would leave trailing rows unwritten)
    and whose working set fits VMEM: K+V double-buffered int16
    (8·bB·T·E bytes) + one reused f32 scratch (4·bB·T·E) within a
    ~12 MiB budget. Batches are power-of-two buckets times the
    data-parallel process count, so non-powers like 24 occur."""
    budget = 12 * 1024 * 1024
    per_row = 12 * t * emb  # bytes per batch row in the working set
    bb = 1
    while (
        batch % (bb * 2) == 0
        and (bb * 2) * per_row <= budget
    ):
        bb *= 2
    return bb


def _kernel(q_ref, k_ref, v_ref, kqi_ref, vqi_ref, mask_ref, sel_ref,
            selt_ref, out_ref, scratch_ref, *, scale: float):
    k = k_ref[:].astype(jnp.float32)  # [bB, T, E]
    bb, t, e = k.shape
    h = sel_ref.shape[1]
    # kq never leaves VMEM — the whole point of the kernel.
    scratch_ref[:] = k * q_ref[:][:, None, :]
    scores = jnp.dot(
        scratch_ref[:].reshape(bb * t, e),
        sel_ref[:],
        preferred_element_type=jnp.float32,
    ).reshape(bb, t, h)
    # Per-row K dequant + 1/sqrt(d) fold into the scores, then the
    # additive mask — identical to the XLA int16 branch.
    scores = scores * (scale * kqi_ref[:][:, :, None]) + mask_ref[:][:, :, None]
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    attn = p / jnp.sum(p, axis=1, keepdims=True)  # softmax over T
    attn_v = attn * vqi_ref[:][:, :, None]  # per-row V dequant
    # Expand head weights back over features; reuse the kq scratch.
    scratch_ref[:] = jnp.dot(
        attn_v.reshape(bb * t, h),
        selt_ref[:],
        preferred_element_type=jnp.float32,
    ).reshape(bb, t, e)
    out_ref[:] = jnp.sum(scratch_ref[:] * v_ref[:].astype(jnp.float32), axis=1)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def decode_attention_int16(
    q: jax.Array,  # [B, E] f32 — Q-projection output for this step
    k: jax.Array,  # [B, T, E] int16 joined cache
    v: jax.Array,  # [B, T, E] int16 joined cache
    kqi: jax.Array,  # [B, T] f32 per-row K dequant scales
    vqi: jax.Array,  # [B, T] f32 per-row V dequant scales
    mask: jax.Array,  # [B, T] f32 additive mask row
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns out [B, E] (pre-O-projection attention mix)."""
    b, t, e = k.shape
    scale = 1.0 / math.sqrt(e // num_heads)
    d = e // num_heads
    eye = jnp.eye(num_heads, dtype=jnp.float32)
    sel = jnp.repeat(eye, d, axis=0)  # [E, H]
    selt = jnp.repeat(eye, d, axis=1)  # [H, E]
    bb = _block_batch(b, t, e)
    grid = (b // bb,)

    def row(i):
        return (i, 0)

    def cube(i):
        return (i, 0, 0)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, e), row),
            pl.BlockSpec((bb, t, e), cube),
            pl.BlockSpec((bb, t, e), cube),
            pl.BlockSpec((bb, t), row),
            pl.BlockSpec((bb, t), row),
            pl.BlockSpec((bb, t), row),
            pl.BlockSpec((e, num_heads), lambda i: (0, 0)),
            pl.BlockSpec((num_heads, e), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, e), row),
        out_shape=jax.ShapeDtypeStruct((b, e), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, t, e), jnp.float32)],
        interpret=interpret,
    )(q, k, v, kqi, vqi, mask, sel, selt)
