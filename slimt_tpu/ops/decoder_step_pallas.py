"""Fully fused decoder-layer Pallas kernel for the decode loop.

One kernel per decoder layer per step computes the whole
DecoderLayer::forward (slimt/Modules.cc:237-259) — SSRU cell,
cross-attention over the cached K/V, and the FFN block — entirely in
VMEM:

    f    = σ(Wf·q(x) + bf);  c' = f⊙c + (1-f)⊙(W·q(x))
    h    = LN(x + relu(c'))
    q    = Wq·q(h) + bq  (per-head)
    p_h  = softmax(Σ_d K_h q_h / √D + mask)        (VPU mul+reduce)
    att  = LN(h + Wo·q(Σ_t p V) + bo)
    y    = LN(att + W2·q(relu(W1·q(att) + b1)) + b2)

replacing ~25 XLA ops (and their intermediate HBM round-trips) per
layer with one program. The attention uses the VPU broadcast-multiply
formulation (batched [1,D]×[T,D] matvecs waste the MXU). Weights stay
whole in VMEM (≤1.2 MB/layer for the student models); the batch is
tiled.

Returns (y, c', attn_head0) — head 0 of the attention weights feeds
the soft alignments (slimt/Model.cc:84-108).

STATUS: experimental, interpret-parity-tested, compiles standalone on
TPU with a raised VMEM cap — but not wired into the default decode:
for head_dim=32 student models Mosaic pads the per-head K/V lane
dimension to 128 (4x VMEM), so inside the decode scan the kernel plus
XLA's surrounding fusion exceeds the 16 MB scoped-VMEM budget at
serving batch sizes. The XLA path with the VPU mul-reduce attention
(transformer.scaled_dot_product_attention) is within ~2-3x of the HBM
floor already, so the remaining headroom did not justify a layout
rewrite this round; revisit with [B,T,E]-layout KV and selector-matrix
head reduction if more decode throughput is needed.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 64
LN_EPS = 1e-6


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _q8(x, aq):
    return jnp.clip(jnp.rint(x * aq), -127.0, 127.0).astype(jnp.int8)


def _mm(x_q, w_ref):
    return jax.lax.dot_general(
        x_q, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _ln(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    return centered * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _kernel(
    scales_ref,
    # activations
    x_ref, c_ref, k_ref, v_ref, mask_ref,
    # ssru weights
    wf_ref, bf_ref, w_ref, ln_rnn_s, ln_rnn_b,
    # attention weights
    wq_ref, bq_ref, wo_ref, bo_ref, ln_att_s, ln_att_b,
    # ffn weights
    w1_ref, b1_ref, w2_ref, b2_ref, ln_ffn_s, ln_ffn_b,
    # outputs
    y_ref, c_out_ref, attn0_ref,
    *, num_heads,
):
    (aqf, invf, aqw, invw, aq_q, inv_q, aq_o, inv_o,
     aq1, inv1, aq2, inv2) = [scales_ref[i] for i in range(12)]
    x = x_ref[:]  # [TB, E]
    e = x.shape[-1]
    d = e // num_heads
    scale = 1.0 / math.sqrt(d)

    # SSRU (slimt/Modules.cc:182-235)
    f = jax.nn.sigmoid(
        _mm(_q8(x, aqf), wf_ref).astype(jnp.float32) * invf + bf_ref[0, :]
    )
    wx = _mm(_q8(x, aqw), w_ref).astype(jnp.float32) * invw
    c_t = f * c_ref[:] + (1.0 - f) * wx
    h = _ln(x + jnp.maximum(c_t, 0.0), ln_rnn_s[0, :], ln_rnn_b[0, :])

    # cross-attention, per head on the VPU
    q = (
        _mm(_q8(h, aq_q), wq_ref).astype(jnp.float32) * inv_q
        + bq_ref[0, :]
    )  # [TB, E]
    mask = mask_ref[:]  # [TB, T] additive
    outs = []
    for head in range(num_heads):
        qh = q[:, head * d : (head + 1) * d]  # [TB, D]
        kh = k_ref[:, head]  # [TB, T, D] (cache dtype, e.g. bf16)
        vh = v_ref[:, head]
        # f32 in-register per head (Mosaic cannot broadcast bf16
        # across a new middle axis); TILE_B keeps the temps small.
        scores = (
            (kh.astype(jnp.float32) * qh[:, None, :]).sum(-1) * scale + mask
        )  # [TB, T]
        p = jax.nn.softmax(scores, axis=-1)
        if head == 0:
            attn0_ref[:] = p
        outs.append((vh.astype(jnp.float32) * p[..., None]).sum(1))
    attn_out = jnp.concatenate(outs, axis=-1)  # [TB, E]

    out = (
        _mm(_q8(attn_out, aq_o), wo_ref).astype(jnp.float32) * inv_o
        + bo_ref[0, :]
    )
    a = _ln(h + out, ln_att_s[0, :], ln_att_b[0, :])

    # FFN block (slimt/Modules.cc:321-334)
    hidden = jnp.maximum(
        _mm(_q8(a, aq1), w1_ref).astype(jnp.float32) * inv1 + b1_ref[0, :],
        0.0,
    )
    y = (
        _mm(_q8(hidden, aq2), w2_ref).astype(jnp.float32) * inv2
        + b2_ref[0, :]
    )
    y_ref[:] = _ln(y + a, ln_ffn_s[0, :], ln_ffn_b[0, :])
    c_out_ref[:] = c_t


def decoder_layer_step(
    layer: dict,
    state: jax.Array,  # [B, 1, E]
    x: jax.Array,  # [B, 1, E]
    mask_add: jax.Array,  # [B, 1, 1, T]
    kv: Tuple[jax.Array, jax.Array],  # [B, H, T, D] each (any float dtype)
    num_heads: int,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (y [B,1,E], new_state [B,1,E], attn0 [B,T]) — only
    head 0 of the attention weights (the alignment consumer,
    slimt/Model.cc:84-108); materializing all H heads would cost an
    extra [B,H,T] f32 buffer per step for data nothing reads."""
    if interpret is None:
        interpret = not _on_tpu()
    b = x.shape[0]
    e = x.shape[-1]
    k, v = kv
    t = k.shape[2]
    d = e // num_heads

    rnn, att, ffn = layer["rnn"], layer["att"], layer["ffn"]
    wf, w = rnn["wf"], rnn["w"]
    wq, wo = att["q"], att["o"]
    w1, w2 = ffn["w1"], ffn["w2"]
    scales = jnp.stack(
        [
            wf["aq"], 1.0 / (wf["aq"] * wf["bq"]),
            w["aq"], 1.0 / (w["aq"] * w["bq"]),
            wq["aq"], 1.0 / (wq["aq"] * wq["bq"]),
            wo["aq"], 1.0 / (wo["aq"] * wo["bq"]),
            w1["aq"], 1.0 / (w1["aq"] * w1["bq"]),
            w2["aq"], 1.0 / (w2["aq"] * w2["bq"]),
        ]
    ).astype(jnp.float32)

    tile_b = min(TILE_B, b)
    grid = (pl.cdiv(b, tile_b),)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    f_dim = w1["q"].shape[-1]

    def vec(n):
        return vmem((1, n), lambda i, *_: (0, 0))

    y, c_t, attn0 = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        out_shape=(
            jax.ShapeDtypeStruct((b, e), jnp.float32),
            jax.ShapeDtypeStruct((b, e), jnp.float32),
            jax.ShapeDtypeStruct((b, t), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                vmem((tile_b, e), lambda i, *_: (i, 0)),  # x
                vmem((tile_b, e), lambda i, *_: (i, 0)),  # c
                vmem((tile_b, num_heads, t, d), lambda i, *_: (i, 0, 0, 0)),
                vmem((tile_b, num_heads, t, d), lambda i, *_: (i, 0, 0, 0)),
                vmem((tile_b, t), lambda i, *_: (i, 0)),  # mask
                vmem((e, e), lambda i, *_: (0, 0)),  # wf
                vec(e),  # bf
                vmem((e, e), lambda i, *_: (0, 0)),  # w
                vec(e), vec(e),  # ln_rnn
                vmem((e, e), lambda i, *_: (0, 0)),  # wq
                vec(e),  # bq
                vmem((e, e), lambda i, *_: (0, 0)),  # wo
                vec(e),  # bo
                vec(e), vec(e),  # ln_att
                vmem((e, f_dim), lambda i, *_: (0, 0)),  # w1
                vec(f_dim),  # b1
                vmem((f_dim, e), lambda i, *_: (0, 0)),  # w2
                vec(e),  # b2
                vec(e), vec(e),  # ln_ffn
            ],
            out_specs=(
                vmem((tile_b, e), lambda i, *_: (i, 0)),
                vmem((tile_b, e), lambda i, *_: (i, 0)),
                vmem((tile_b, t), lambda i, *_: (i, 0)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        scales,
        x[:, 0, :].astype(jnp.float32),
        state[:, 0, :].astype(jnp.float32),
        k, v,
        mask_add[:, 0, 0, :].astype(jnp.float32),
        wf["q"], wf["b"].reshape(1, e),
        w["q"],
        rnn["ln"]["scale"].reshape(1, e), rnn["ln"]["bias"].reshape(1, e),
        wq["q"], wq["b"].reshape(1, e),
        wo["q"], wo["b"].reshape(1, e),
        att["ln"]["scale"].reshape(1, e), att["ln"]["bias"].reshape(1, e),
        w1["q"], w1["b"].reshape(1, f_dim),
        w2["q"], w2["b"].reshape(1, e),
        ffn["ln"]["scale"].reshape(1, e), ffn["ln"]["bias"].reshape(1, e),
    )
    return y[:, None, :], c_t[:, None, :], attn0


# --- [B, T, E]-layout variant -----------------------------------------
#
# Avoids the head-split [B,H,T,D] layout whose D=32 lane dimension
# Mosaic pads to 128 (4x VMEM). K/V stay in the pre-split [B,T,E]
# layout (E=256 lanes, aligned); per-head score/output reductions use
# selector matmuls:  scores = (K ⊙ q) @ S,  p_full = p @ Sᵀ, with
# S[e,h] = 1 iff lane e belongs to head h.


def _kernel_bte(
    scales_ref,
    x_ref, c_ref, k_ref, v_ref, mask_ref, sel_ref,
    wf_ref, bf_ref, w_ref, ln_rnn_s, ln_rnn_b,
    wq_ref, bq_ref, wo_ref, bo_ref, ln_att_s, ln_att_b,
    w1_ref, b1_ref, w2_ref, b2_ref, ln_ffn_s, ln_ffn_b,
    y_ref, c_out_ref, attn0_ref,
    *, num_heads,
):
    (aqf, invf, aqw, invw, aq_q, inv_q, aq_o, inv_o,
     aq1, inv1, aq2, inv2) = [scales_ref[i] for i in range(12)]
    x = x_ref[:]  # [TB, E]
    tb, e = x.shape
    d = e // num_heads
    scale = 1.0 / math.sqrt(d)

    f = jax.nn.sigmoid(
        _mm(_q8(x, aqf), wf_ref).astype(jnp.float32) * invf + bf_ref[0, :]
    )
    wx = _mm(_q8(x, aqw), w_ref).astype(jnp.float32) * invw
    c_t = f * c_ref[:] + (1.0 - f) * wx
    h = _ln(x + jnp.maximum(c_t, 0.0), ln_rnn_s[0, :], ln_rnn_b[0, :])

    q = (
        _mm(_q8(h, aq_q), wq_ref).astype(jnp.float32) * inv_q
        + bq_ref[0, :]
    )  # [TB, E]
    k = k_ref[:]  # [TB, T, E] cache dtype
    v = v_ref[:]
    t = k.shape[1]
    sel = sel_ref[:]  # [E, H] f32 head-membership selector

    prod = k.astype(jnp.float32) * q[:, None, :]  # [TB, T, E]
    scores = jax.lax.dot_general(
        prod.reshape(tb * t, e), sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tb, t, num_heads) * scale
    scores = scores + mask_ref[:][:, :, None]
    p = jax.nn.softmax(scores, axis=1)  # over T
    attn0_ref[:] = p[:, :, 0]
    p_full = jax.lax.dot_general(
        p.reshape(tb * t, num_heads), sel,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tb, t, e)
    attn_out = (v.astype(jnp.float32) * p_full).sum(axis=1)  # [TB, E]

    out = (
        _mm(_q8(attn_out, aq_o), wo_ref).astype(jnp.float32) * inv_o
        + bo_ref[0, :]
    )
    a = _ln(h + out, ln_att_s[0, :], ln_att_b[0, :])

    hidden = jnp.maximum(
        _mm(_q8(a, aq1), w1_ref).astype(jnp.float32) * inv1 + b1_ref[0, :],
        0.0,
    )
    y = (
        _mm(_q8(hidden, aq2), w2_ref).astype(jnp.float32) * inv2
        + b2_ref[0, :]
    )
    y_ref[:] = _ln(y + a, ln_ffn_s[0, :], ln_ffn_b[0, :])
    c_out_ref[:] = c_t


def decoder_layer_step_bte(
    layer: dict,
    state: jax.Array,  # [B, 1, E]
    x: jax.Array,  # [B, 1, E]
    mask_add: jax.Array,  # [B, 1, 1, T]
    kv: Tuple[jax.Array, jax.Array],  # [B, T, E] each (unsplit layout)
    num_heads: int,
    interpret: Optional[bool] = None,
    tile_b: int = 32,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[B,T,E]-KV fused decoder layer. Returns (y, c', attn0 [B,T])."""
    if interpret is None:
        interpret = not _on_tpu()
    b = x.shape[0]
    e = x.shape[-1]
    k, v = kv
    t = k.shape[1]
    d = e // num_heads

    rnn, att, ffn = layer["rnn"], layer["att"], layer["ffn"]
    wf, w = rnn["wf"], rnn["w"]
    wq, wo = att["q"], att["o"]
    w1, w2 = ffn["w1"], ffn["w2"]
    scales = jnp.stack(
        [
            wf["aq"], 1.0 / (wf["aq"] * wf["bq"]),
            w["aq"], 1.0 / (w["aq"] * w["bq"]),
            wq["aq"], 1.0 / (wq["aq"] * wq["bq"]),
            wo["aq"], 1.0 / (wo["aq"] * wo["bq"]),
            w1["aq"], 1.0 / (w1["aq"] * w1["bq"]),
            w2["aq"], 1.0 / (w2["aq"] * w2["bq"]),
        ]
    ).astype(jnp.float32)
    lanes = jnp.arange(e)[:, None]
    sel = (lanes // d == jnp.arange(num_heads)[None, :]).astype(jnp.float32)

    tile_b = min(tile_b, b)
    grid = (pl.cdiv(b, tile_b),)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    f_dim = w1["q"].shape[-1]

    def vec(n):
        return vmem((1, n), lambda i, *_: (0, 0))

    y, c_t, attn0 = pl.pallas_call(
        functools.partial(_kernel_bte, num_heads=num_heads),
        out_shape=(
            jax.ShapeDtypeStruct((b, e), jnp.float32),
            jax.ShapeDtypeStruct((b, e), jnp.float32),
            jax.ShapeDtypeStruct((b, t), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                vmem((tile_b, e), lambda i, *_: (i, 0)),
                vmem((tile_b, e), lambda i, *_: (i, 0)),
                vmem((tile_b, t, e), lambda i, *_: (i, 0, 0)),
                vmem((tile_b, t, e), lambda i, *_: (i, 0, 0)),
                vmem((tile_b, t), lambda i, *_: (i, 0)),
                vmem((e, num_heads), lambda i, *_: (0, 0)),
                vmem((e, e), lambda i, *_: (0, 0)),
                vec(e),
                vmem((e, e), lambda i, *_: (0, 0)),
                vec(e), vec(e),
                vmem((e, e), lambda i, *_: (0, 0)),
                vec(e),
                vmem((e, e), lambda i, *_: (0, 0)),
                vec(e),
                vec(e), vec(e),
                vmem((e, f_dim), lambda i, *_: (0, 0)),
                vec(f_dim),
                vmem((f_dim, e), lambda i, *_: (0, 0)),
                vec(e),
                vec(e), vec(e),
            ],
            out_specs=(
                vmem((tile_b, e), lambda i, *_: (i, 0)),
                vmem((tile_b, e), lambda i, *_: (i, 0)),
                vmem((tile_b, t), lambda i, *_: (i, 0)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        scales,
        x[:, 0, :].astype(jnp.float32),
        state[:, 0, :].astype(jnp.float32),
        k, v,
        mask_add[:, 0, 0, :].astype(jnp.float32),
        sel,
        wf["q"], wf["b"].reshape(1, e),
        w["q"],
        rnn["ln"]["scale"].reshape(1, e), rnn["ln"]["bias"].reshape(1, e),
        wq["q"], wq["b"].reshape(1, e),
        wo["q"], wo["b"].reshape(1, e),
        att["ln"]["scale"].reshape(1, e), att["ln"]["bias"].reshape(1, e),
        w1["q"], w1["b"].reshape(1, f_dim),
        w2["q"], w2["b"].reshape(1, e),
        ffn["ln"]["scale"].reshape(1, e), ffn["ln"]["bias"].reshape(1, e),
    )
    return y[:, None, :], c_t[:, None, :], attn0
