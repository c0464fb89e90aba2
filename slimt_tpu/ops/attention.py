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
