"""Whole-encoder-layer fused Pallas kernel.

One program computes a COMPLETE reference encoder layer
(slimt/Modules.cc:287-334: Q/K/V/O int8 affines, multi-head SDPA,
residual + post-LN, FFN pair with relu, residual + post-LN) for a
block of batch rows, with every intermediate resident in VMEM.

Why: the XLA encoder is activation-HBM-traffic-bound at serving batch
(scripts/ubench_encoder.py: ~45 ms/batch at B=2048×T=64, ~47% of the
headline wall) — each op boundary round-trips [B,T,E]-class f32
activations through HBM, and XLA cannot fuse across the matmuls. In
this kernel the only HBM activation traffic for the whole layer is
x in + x out; the weights' block index never changes, so Pallas loads
them once for the whole grid, not per program.

Numerics: the int8 affines reproduce ops/qmm exactly (rint/clip ±127
quantization, int8→int32 MXU accumulation — associative, so
BIT-exact); LN statistics and softmax are the same f32 formulas as
models/transformer (layer_norm, scaled_dot_product_attention); the
per-head SDPA uses the stacked-heads masked-lane formulation of
ops/attention._fused_sdpa_kernel_stack (exact-zero lanes add no error
terms). Deviations from the XLA path are dot-accumulation-order-only
— the same measured exact-class as `enc_sdpa=fused`
(crosscheck/serving_agreement.json row).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slimt_tpu.ops.fused_blocks import _int8_mm, _layer_norm, _quant


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _sdpa_rows(q, k, v, m, num_heads, scale):
    """Stacked-heads SDPA on one row's joined [T, E] operands.

    All heads' scores ride ONE [H·T,E]·[E,T] dot (head h's Q masked to
    its own lanes, zero elsewhere), softmax over keys; the output
    accumulation stays per-head over cheap sublane slices of attn
    (the one-dot form needs a lane-merge relayout Mosaic rejects)."""
    t, e = q.shape
    head_dim = e // num_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (num_heads, 1, e), 2)
    head = jax.lax.broadcasted_iota(jnp.int32, (num_heads, 1, e), 0)
    hmask = (lane // head_dim == head).astype(jnp.float32)
    lane_head = (
        jax.lax.broadcasted_iota(jnp.int32, (t, e), 1) // head_dim
    )
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
        a_h = attn[h * t:(h + 1) * t, :]
        o_h = jax.lax.dot_general(
            a_h, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jnp.where(lane_head == h, o_h, 0.0)
    return acc


def _layer_kernel(
    scale_ref,
    x_ref, mask_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    alns_ref, alnb_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, flns_ref, flnb_ref,
    o_ref,
    *, num_heads,
):
    (aq_q, inv_q, aq_k, inv_k, aq_v, inv_v, aq_o, inv_o,
     aq_1, inv_1, aq_2, inv_2) = (scale_ref[i] for i in range(12))
    g_rows, t, e = x_ref.shape
    scale = 1.0 / math.sqrt(e // num_heads)
    # Every affine runs ONCE over all G rows merged into the sublane
    # dim ([G·T, E] dots — 6 big MXU dots per program instead of 6·G
    # small ones); only the SDPA is per-row (each row has its own K).
    x = x_ref[:].reshape(g_rows * t, e)
    yq = _int8_mm(_quant(x, aq_q), wq_ref).astype(jnp.float32) \
        * inv_q + bq_ref[0, :]
    yk = _int8_mm(_quant(x, aq_k), wk_ref).astype(jnp.float32) \
        * inv_k + bk_ref[0, :]
    yv = _int8_mm(_quant(x, aq_v), wv_ref).astype(jnp.float32) \
        * inv_v + bv_ref[0, :]
    att = jnp.concatenate(
        [
            _sdpa_rows(
                yq[g * t:(g + 1) * t],
                yk[g * t:(g + 1) * t],
                yv[g * t:(g + 1) * t],
                mask_ref[g, 0],
                num_heads,
                scale,
            )
            for g in range(g_rows)
        ],
        axis=0,
    )  # [G·T, E]
    out = _int8_mm(_quant(att, aq_o), wo_ref).astype(jnp.float32) \
        * inv_o + bo_ref[0, :]
    x1 = _layer_norm(x + out, alns_ref[0, :], alnb_ref[0, :])
    h = _int8_mm(_quant(x1, aq_1), w1_ref).astype(jnp.float32) \
        * inv_1 + b1_ref[0, :]
    h = jnp.maximum(h, 0.0)
    y = _int8_mm(_quant(h, aq_2), w2_ref).astype(jnp.float32) \
        * inv_2 + b2_ref[0, :]
    o_ref[:] = _layer_norm(
        y + x1, flns_ref[0, :], flnb_ref[0, :]
    ).reshape(g_rows, t, e)


def encoder_layer_fused(
    x: jax.Array,
    layer: dict,
    mask_add: jax.Array,
    num_heads: int,
    interpret: Optional[bool] = None,
    block_b: int = 4,
) -> jax.Array:
    """x: [B, T, E] f32; layer: {"att": {...}, "ffn": {...}} weight
    pytree (loader layout); mask_add: [B, 1, 1, T] additive.
    Returns the post-FFN-LN [B, T, E] output of one encoder layer."""
    if interpret is None:
        interpret = not _on_tpu()
    b, t, e = x.shape
    att, ffn = layer["att"], layer["ffn"]
    f = ffn["w1"]["q"].shape[-1]
    g = int(os.environ.get("SLIMT_TPU_ENC_LAYER_BLOCK", block_b))
    # VMEM budget: the batched-affine form carries [g·t, F] f32 hidden
    # activations (plus Q/K/V and the double-buffered x blocks); keep
    # g·t at the measured sweet spot (512 rows at tiny11's F=1536,
    # scaled down for wider FFNs).
    while g > 1 and g * t * max(f, 4 * e) > 512 * 1536:
        g //= 2
    while b % g:
        g //= 2
    mask2 = jnp.broadcast_to(mask_add[:, 0, :, :], (b, 1, t)).astype(
        jnp.float32
    )

    def pair(p):
        return [p["aq"].astype(jnp.float32), 1.0 / (p["aq"] * p["bq"])]

    scales = jnp.stack(
        pair(att["q"]) + pair(att["k"]) + pair(att["v"]) + pair(att["o"])
        + pair(ffn["w1"]) + pair(ffn["w2"])
    ).astype(jnp.float32)

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    row = lambda i, *_: (i, 0, 0)  # noqa: E731
    whole = lambda i, *_: (0, 0)  # noqa: E731

    return pl.pallas_call(
        functools.partial(_layer_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, t, e), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // g,),
            in_specs=[
                vmem((g, t, e), row),
                vmem((g, 1, t), lambda i, *_: (i, 0, 0)),
                vmem((e, e), whole), vmem((1, e), whole),   # q
                vmem((e, e), whole), vmem((1, e), whole),   # k
                vmem((e, e), whole), vmem((1, e), whole),   # v
                vmem((e, e), whole), vmem((1, e), whole),   # o
                vmem((1, e), whole), vmem((1, e), whole),   # att ln
                vmem((e, f), whole), vmem((1, f), whole),   # w1
                vmem((f, e), whole), vmem((1, e), whole),   # w2
                vmem((1, e), whole), vmem((1, e), whole),   # ffn ln
            ],
            out_specs=vmem((g, t, e), row),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * (4 * e * e + 2 * e * f)
            + 4 * b * num_heads * t * t * e,
            bytes_accessed=8 * b * t * e + 4 * e * e + 2 * e * f,
            transcendentals=b * num_heads * t * t,
        ),
        interpret=interpret,
    )(
        scales,
        x.astype(jnp.float32),
        mask2,
        att["q"]["q"], att["q"]["b"].reshape(1, e),
        att["k"]["q"], att["k"]["b"].reshape(1, e),
        att["v"]["q"], att["v"]["b"].reshape(1, e),
        att["o"]["q"], att["o"]["b"].reshape(1, e),
        att["ln"]["scale"].reshape(1, e), att["ln"]["bias"].reshape(1, e),
        ffn["w1"]["q"], ffn["w1"]["b"].reshape(1, f),
        ffn["w2"]["q"], ffn["w2"]["b"].reshape(1, e),
        ffn["ln"]["scale"].reshape(1, e), ffn["ln"]["bias"].reshape(1, e),
    )
