"""Blockwise (flash-style) attention Pallas kernel.

The reference sidesteps long sequences entirely — inputs are hard-
wrapped at 128 tokens and SDPA materializes full [B,H,T,T] score
matrices via CBLAS sgemm (slimt/Modules.cc:24-86, SURVEY §5 "long
context"). This kernel lifts that constraint for the encoder: queries
are processed in blocks so attention memory is O(T·BLOCK_Q) per
program instead of O(T²) for the whole batch, with K/V resident in
VMEM (students' head_dim is 32-64, so K/V for even 8k tokens fit
easily).

Used for encoder self-attention only — decoder cross-attention needs
the attention weights for alignments (slimt/Model.cc:84-108) and has
query length 1 anyway.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128


def _fused_sdpa_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, num_heads
):
    """Whole-sequence multi-head SDPA on joined [G, T, E] operands.

    One program handles G batch rows × ALL heads; scores live only in
    VMEM. Per-head Q/V are selected by masking lanes (head h owns
    lanes [h·D, (h+1)·D)) so every dot contracts/produces the full
    E=H·D lane dimension — MXU-perfect tiles at E=256, no [*, D=32]
    lane padding and no [B,H,T,T] HBM materialization. The extra
    zero-lane multiply-adds are exact +0.0 terms (f32 identity), so
    the math matches the per-head einsum up to dot accumulation
    order."""
    g_rows, t, e = q_ref.shape
    head_dim = e // num_heads
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (t, e), 1) // head_dim
    for g in range(g_rows):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        m = mask_ref[g, 0]  # [T] additive over key positions
        acc = jnp.zeros((t, e), jnp.float32)
        for h in range(num_heads):
            sel = lane_head == h
            qm = jnp.where(sel, q, 0.0)
            scores = (
                jax.lax.dot_general(
                    qm, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + m[None, :]
            )  # [T, T]
            attn = jax.nn.softmax(scores, axis=-1)
            vm = jnp.where(sel, v, 0.0)
            acc = acc + jax.lax.dot_general(
                attn, vm,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[g] = acc


def _fused_sdpa_kernel_stack(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, num_heads
):
    """Stacked-heads variant: every head's scores ride ONE big dot.

    QM = the H head-masked copies of q stacked along SUBLANES
    [H·T, E]; scores for every head = ONE [H·T,E]·[E,T] dot and one
    softmax over the key lanes. The output accumulation stays per-head
    ([T,T]·[T,E] dots over cheap sublane slices of attn) — merging it
    into one dot needs a [H,T,T]→[T,H·T] lane-merge relayout Mosaic
    does not legalize (infer-vector-layout: unsupported shape cast)."""
    g_rows, t, e = q_ref.shape
    head_dim = e // num_heads
    # [H, 1, E] 0/1 masks: head h owns lanes [h·D, (h+1)·D).
    lane = jax.lax.broadcasted_iota(jnp.int32, (num_heads, 1, e), 2)
    head = jax.lax.broadcasted_iota(jnp.int32, (num_heads, 1, e), 0)
    hmask = (lane // head_dim == head).astype(jnp.float32)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (t, e), 1) // head_dim
    for g in range(g_rows):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        m = mask_ref[g, 0]  # [T]
        qm = (q[None, :, :] * hmask).reshape(num_heads * t, e)
        scores = (
            jax.lax.dot_general(
                qm, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + m[None, :]
        )  # [H·T, T]
        attn = jax.nn.softmax(scores, axis=-1)
        acc = jnp.zeros((t, e), jnp.float32)
        for h in range(num_heads):
            a_h = attn[h * t:(h + 1) * t, :]  # sublane slice
            o_h = jax.lax.dot_general(
                a_h, v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + jnp.where(lane_head == h, o_h, 0.0)
        o_ref[g] = acc


def fused_sdpa_joined(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask_add: jax.Array,
    num_heads: int,
    interpret: Optional[bool] = None,
    block_b: int = 8,
) -> jax.Array:
    """Fused encoder SDPA for the wrap-length regime (T ≤ ~256).

    q/k/v: JOINED [B, T, E] affine outputs (no split_heads transpose);
    mask_add: [B, 1, 1, T] additive → out [B, T, E] f32.

    Motivation (scripts/ubench_encoder.py): at the headline shape
    (B=2048 × T=64) the XLA scores path — materialized [B,H,T,T] f32
    scores through HBM, batched [T,32]-contraction dots — costs
    ~16 ms of the ~45 ms encoder. `blockwise_attention` above loses
    here too (one tiny program per (b,h): 16k program launches for
    64×32 dots). This kernel instead gives each program G whole batch
    rows × all heads with E as the lane dimension throughout.
    """
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    b, t, e = q.shape
    scale = 1.0 / math.sqrt(e // num_heads)
    import os as _os

    # SLIMT_TPU_SDPA_{BLOCK,IMPL} are TRACE-TIME bench overrides only:
    # they are read when the enclosing jit traces, so a mid-process env
    # change is ignored by already-compiled (B,T,S) buckets.
    g = max(1, int(_os.environ.get("SLIMT_TPU_SDPA_BLOCK", block_b)))
    # VMEM budget: each row's stacked scores are [H·T, T] f32; shrink
    # the batch block so g·H·T² stays ≤ ~8 MB (the encoder-layer
    # kernel budgets the same way). At the wrap-regime default
    # (T=64, H=8) this leaves g at block_b.
    while g > 1 and g * num_heads * t * t > 2 * 1024 * 1024:
        g //= 2
    while b % g:
        g //= 2
    mask2 = jnp.broadcast_to(mask_add[:, 0, :, :], (b, 1, t))

    kernel = (
        _fused_sdpa_kernel
        if _os.environ.get("SLIMT_TPU_SDPA_IMPL", "stack") == "loop"
        else _fused_sdpa_kernel_stack
    )
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, t, e), jnp.float32),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, t, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, t, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * t * t * e,
            bytes_accessed=4 * 4 * b * t * e,
            transcendentals=b * num_heads * t * t,
        ),
        interpret=interpret,
    )(q.astype(jnp.float32), k.astype(jnp.float32),
      v.astype(jnp.float32), mask2.astype(jnp.float32))


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    # q [1, BQ, D]; k/v [1, T, D]; mask [1, 1, T] additive; o [1, BQ, D]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = (
        jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
        + mask_ref[0]
    )  # [BQ, T]
    weights = jax.nn.softmax(scores, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        weights, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask_add: jax.Array,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """q,k,v: [B,H,T,D]; mask_add: [B,1,1,T] additive → out [B,H,Tq,D]."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    bh = b * h
    q2 = q.reshape(bh, t_q, d)
    k2 = k.reshape(bh, t_k, d)
    v2 = v.reshape(bh, t_k, d)
    mask2 = jnp.broadcast_to(mask_add[:, 0], (b, 1, t_k))

    block_q = min(BLOCK_Q, t_q)
    grid = (bh, pl.cdiv(t_q, block_q))

    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t_q, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t_k, d), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t_k, d), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, t_k), lambda i, j, h=h: (i // h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_q * t_k * d,
            bytes_accessed=4 * bh * (t_q * d * 2 + 2 * t_k * d),
            transcendentals=bh * t_q * t_k,
        ),
        interpret=interpret,
    )(q2, k2, v2, mask2)
    return out.reshape(b, h, t_q, d)
