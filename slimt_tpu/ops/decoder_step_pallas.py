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

STATUS (round 3): the per-layer kernel above is the historical
experiment; what SHIPS from this file is `whole_decode_step` — the
whole-step fusion behind `ModelConfig(qmm_provider="fused_step")`,
the measured interactive-latency recommendation at batch=1 (10-12
µs/step vs ~27-35 for the default path, re-confirmed across two
sessions — PERFORMANCE.md "batch1"). At serving batch sizes it
measures SLOWER than XLA's own fusion (1234 vs 793 µs/step at
B=2048) and the serving default remains xla_int8. Numerics: the
kernel runs a float joined KV cache (bf16 coercion for reduced
dtypes) + its own argmax — bf16-class agreement, labeled wherever the
B=1 number is quoted.
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
    scales = [scales_ref[i] for i in range(12)]
    ones = jnp.ones_like(mask_ref[:])  # float-cache kqi/vqi (exact)
    y, c_t, attn0 = _layer_math_bte(
        x_ref[:], c_ref[:], k_ref[:], v_ref[:], ones, ones,
        mask_ref[:], sel_ref[:],
        scales,
        wf_ref, bf_ref, w_ref, ln_rnn_s, ln_rnn_b,
        wq_ref, bq_ref, wo_ref, bo_ref, ln_att_s, ln_att_b,
        w1_ref, b1_ref, w2_ref, b2_ref, ln_ffn_s, ln_ffn_b,
        num_heads=num_heads,
    )
    y_ref[:] = y
    c_out_ref[:] = c_t
    attn0_ref[:] = attn0


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

# --- whole-step fused kernel ------------------------------------------
#
# One pallas_call per decode step runs BOTH decoder layers, the
# (shortlisted) tied-embedding logit projection, and the greedy argmax
# — replacing the ~35 small XLA ops the while_loop body otherwise
# schedules. Target: the small-batch / latency regime (p50 sentence
# latency), where the step cost is per-op overhead rather than HBM
# bandwidth; the serving-batch regime stays on the XLA path (ablations
# showed per-step pallas_calls break XLA's cross-step pipelining at
# B>=512 — see ops/logits_argmax.py STATUS).
#
# Grid: (B tiles, vocab tiles). Layer math runs once per B tile (at
# vocab tile j == 0), stashing the final hidden state in an output ref
# that persists across j; every j then projects one [E, TILE_S] weight
# tile on the MXU and folds a running (max, argmax) exactly like
# ops/logits_argmax.py (strict > across tiles == jnp.argmax's
# first-maximum semantics).

TILE_S = 2048


def _layer_math_bte(
    x, c, k, v, kqi, vqi, mask, sel, scales,
    wf_ref, bf_ref, w_ref, ln_rnn_s, ln_rnn_b,
    wq_ref, bq_ref, wo_ref, bo_ref, ln_att_s, ln_att_b,
    w1_ref, b1_ref, w2_ref, b2_ref, ln_ffn_s, ln_ffn_b,
    num_heads,
):
    """SSRU + joined-layout cross-attention + FFN on VMEM-resident
    values (the body of _kernel_bte, shared with the whole-step
    kernel). Returns (y, c_t, attn_head0).

    kqi/vqi: per-row (b, t) inverse K/V dequant scales ([TB, T]) — the
    int16 per-row cache's scales, all-ones for float caches (x * 1.0
    is bit-exact, so the float path is unchanged)."""
    (aqf, invf, aqw, invw, aq_q, inv_q, aq_o, inv_o,
     aq1, inv1, aq2, inv2) = scales
    tb, e = x.shape
    d = e // num_heads
    scale = 1.0 / math.sqrt(d)

    f = jax.nn.sigmoid(
        _mm(_q8(x, aqf), wf_ref).astype(jnp.float32) * invf + bf_ref[0, :]
    )
    wx = _mm(_q8(x, aqw), w_ref).astype(jnp.float32) * invw
    c_t = f * c + (1.0 - f) * wx
    h = _ln(x + jnp.maximum(c_t, 0.0), ln_rnn_s[0, :], ln_rnn_b[0, :])

    q = (
        _mm(_q8(h, aq_q), wq_ref).astype(jnp.float32) * inv_q
        + bq_ref[0, :]
    )  # [TB, E]
    t = k.shape[1]

    # Float caches: round q and attn through the cache dtype, exactly
    # like the XLA joined path (transformer._decode_attention_joined
    # rounds its bf16 operands) — keeps the two paths' argmax
    # near-ties aligned. int16 per-row caches (the declared serving
    # numerics) keep q/attn in f32 like the XLA int16 branch; the
    # per-row dequants fold elementwise below.
    float_cache = jnp.issubdtype(k.dtype, jnp.floating)
    q_r = q.astype(k.dtype).astype(jnp.float32) if float_cache else q
    prod = k.astype(jnp.float32) * q_r[:, None, :]  # [TB, T, E]
    scores = jax.lax.dot_general(
        prod.reshape(tb * t, e), sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(tb, t, num_heads) * scale
    scores = scores * kqi[:, :, None]  # per-row K dequant (ones: float)
    scores = scores + mask[:, :, None]
    p = jax.nn.softmax(scores, axis=1)  # over T
    attn0 = p[:, :, 0]
    p_r = (
        p.astype(k.dtype).astype(jnp.float32) if float_cache else p
    ) * vqi[:, :, None]  # per-row V dequant (ones: float)
    p_full = jax.lax.dot_general(
        p_r.reshape(tb * t, num_heads), sel,
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
    return (
        _ln(y + a, ln_ffn_s[0, :], ln_ffn_b[0, :]),
        c_t,
        attn0,
    )


_LAYER_REFS = 22  # c, k, v, kqi, vqi + 17 weight/LN refs per layer


def _whole_kernel(
    scales_ref, x_ref, mask_ref, sel_ref, *refs,
    num_layers, num_heads, n_out,
):
    layer_refs = refs[: num_layers * _LAYER_REFS]
    wout_ref, bout_ref = refs[num_layers * _LAYER_REFS : num_layers * _LAYER_REFS + 2]
    outs = refs[num_layers * _LAYER_REFS + 2 :]
    c_out_refs = outs[:num_layers]
    attn0_ref, h_ref, val_ref, idx_ref = outs[num_layers : num_layers + 4]

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _layers():
        x = x_ref[:]
        mask = mask_ref[:]
        sel = sel_ref[:]
        attn0 = None
        for l in range(num_layers):
            r = layer_refs[l * _LAYER_REFS : (l + 1) * _LAYER_REFS]
            c_ref, k_ref, v_ref, kqi_ref, vqi_ref = r[:5]
            scales = [scales_ref[l * 12 + i] for i in range(12)]
            x, c_t, attn0 = _layer_math_bte(
                x, c_ref[:], k_ref[:], v_ref[:], kqi_ref[:], vqi_ref[:],
                mask, sel, scales,
                *r[5:], num_heads=num_heads,
            )
            c_out_refs[l][:] = c_t
        attn0_ref[:] = attn0
        h_ref[:] = x

    # Projection tile j: int8 MXU matmul + running first-max argmax.
    aq_out = scales_ref[num_layers * 12]
    inv_out = scales_ref[num_layers * 12 + 1]
    h = h_ref[:]
    x_q = _q8(h, aq_out)
    logits = (
        _mm(x_q, wout_ref).astype(jnp.float32) * inv_out + bout_ref[0, :]
    )
    cols = j * TILE_S + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 1
    )
    logits = jnp.where(cols < n_out, logits, -jnp.inf)
    tile_max = jnp.max(logits, axis=1)
    tile_arg = jnp.argmax(logits, axis=1).astype(jnp.int32)
    cand = j * TILE_S + tile_arg

    @pl.when(j == 0)
    def _init():
        val_ref[:, 0] = tile_max
        idx_ref[:, 0] = cand

    @pl.when(j > 0)
    def _update():
        prev = val_ref[:, 0]
        better = tile_max > prev
        val_ref[:, 0] = jnp.where(better, tile_max, prev)
        idx_ref[:, 0] = jnp.where(better, cand, idx_ref[:, 0])


def whole_decode_step(
    layers: list,
    states: Tuple[jax.Array, ...],  # per layer [B, 1, E]
    x: jax.Array,  # [B, 1, E] transformed prev embedding
    mask_add: jax.Array,  # [B, 1, 1, T]
    kv_caches: Tuple[dict, ...],  # per layer joined dicts (bf16/f32)
    num_heads: int,
    projection: Tuple[jax.Array, jax.Array],  # (W [E, S] int8, b [S])
    out_aq: jax.Array,
    emb_bq: jax.Array,
    interpret: Optional[bool] = None,
    tile_b: int = 32,
) -> Tuple[jax.Array, Tuple[jax.Array, ...], jax.Array]:
    """One fused decode step over every decoder layer + shortlisted
    logits + greedy argmax. Returns (choice [B] int32, new_states,
    attn_head0 [B, T] of the LAST layer — the alignment consumer,
    slimt/Model.cc:84-108). KV caches must be the joined [B, T, E]
    layout in a float dtype (bf16 default; int8 caches stay on the
    XLA path)."""
    if interpret is None:
        interpret = not _on_tpu()
    b = x.shape[0]
    e = x.shape[-1]
    t = kv_caches[0]["k"].shape[1]
    d = e // num_heads
    n_layers = len(layers)
    wout, bout = projection
    n_out = wout.shape[-1]
    s_pad = -(-n_out // TILE_S) * TILE_S if n_out > TILE_S else n_out
    tile_s = min(TILE_S, s_pad)

    scale_list = []
    for layer in layers:
        rnn, att, ffn = layer["rnn"], layer["att"], layer["ffn"]
        for w in (rnn["wf"], rnn["w"], att["q"], att["o"],
                  ffn["w1"], ffn["w2"]):
            scale_list += [w["aq"], 1.0 / (w["aq"] * w["bq"])]
    scale_list += [out_aq, 1.0 / (out_aq * emb_bq)]
    scales = jnp.stack(scale_list).astype(jnp.float32)

    lanes = jnp.arange(e)[:, None]
    sel = (lanes // d == jnp.arange(num_heads)[None, :]).astype(jnp.float32)

    tile_b = min(tile_b, b)
    grid = (pl.cdiv(b, tile_b), pl.cdiv(n_out, tile_s))
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def vec(n):
        return vmem((1, n), lambda i, j, *_: (0, 0))

    def per_b(*shape):
        return vmem((tile_b,) + shape, lambda i, j, *_: (i,) + (0,) * len(shape))

    def whole(*shape):
        return vmem(shape, lambda i, j, *_: (0,) * len(shape))

    in_specs = [
        per_b(e),  # x
        per_b(t),  # mask
        whole(e, num_heads),  # sel
    ]
    inputs = [
        x[:, 0, :].astype(jnp.float32),
        mask_add[:, 0, 0, :].astype(jnp.float32),
        sel,
    ]
    f_dim = layers[0]["ffn"]["w1"]["q"].shape[-1]
    for layer, state, kv in zip(layers, states, kv_caches):
        rnn, att, ffn = layer["rnn"], layer["att"], layer["ffn"]
        wf, w = rnn["wf"], rnn["w"]
        wq, wo = att["q"], att["o"]
        w1, w2 = ffn["w1"], ffn["w2"]
        in_specs += [
            per_b(e),        # c
            per_b(t, e),     # k
            per_b(t, e),     # v
            per_b(t),        # kqi (per-row K dequant; ones for float)
            per_b(t),        # vqi
            whole(e, e), vec(e),             # wf, bf
            whole(e, e),                      # w
            vec(e), vec(e),                   # ln_rnn
            whole(e, e), vec(e),              # wq, bq
            whole(e, e), vec(e),              # wo, bo
            vec(e), vec(e),                   # ln_att
            whole(e, f_dim), vec(f_dim),      # w1, b1
            whole(f_dim, e), vec(e),          # w2, b2
            vec(e), vec(e),                   # ln_ffn
        ]
        inputs += [
            state[:, 0, :].astype(jnp.float32),
            kv["k"], kv["v"],
            jnp.broadcast_to(
                jnp.asarray(kv.get("kqi", 1.0), jnp.float32), (b, t)
            ),
            jnp.broadcast_to(
                jnp.asarray(kv.get("vqi", 1.0), jnp.float32), (b, t)
            ),
            wf["q"], wf["b"].reshape(1, e),
            w["q"],
            rnn["ln"]["scale"].reshape(1, e), rnn["ln"]["bias"].reshape(1, e),
            wq["q"], wq["b"].reshape(1, e),
            wo["q"], wo["b"].reshape(1, e),
            att["ln"]["scale"].reshape(1, e), att["ln"]["bias"].reshape(1, e),
            w1["q"], w1["b"].reshape(1, f_dim),
            w2["q"], w2["b"].reshape(1, e),
            ffn["ln"]["scale"].reshape(1, e), ffn["ln"]["bias"].reshape(1, e),
        ]
    in_specs += [
        vmem((e, tile_s), lambda i, j, *_: (0, j)),   # wout
        vmem((1, tile_s), lambda i, j, *_: (0, j)),   # bout
    ]
    inputs += [wout, bout.reshape(1, n_out)]

    out_shape = (
        tuple(
            jax.ShapeDtypeStruct((b, e), jnp.float32)
            for _ in range(n_layers)
        )
        + (
            jax.ShapeDtypeStruct((b, t), jnp.float32),   # attn0
            jax.ShapeDtypeStruct((b, e), jnp.float32),   # h (persist)
            jax.ShapeDtypeStruct((b, 1), jnp.float32),   # best value
            jax.ShapeDtypeStruct((b, 1), jnp.int32),     # best index
        )
    )
    out_specs = (
        tuple(per_b(e) for _ in range(n_layers))
        + (per_b(t), per_b(e), per_b(1), per_b(1))
    )

    results = pl.pallas_call(
        functools.partial(
            _whole_kernel,
            num_layers=n_layers,
            num_heads=num_heads,
            n_out=n_out,
        ),
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scales, *inputs)

    new_states = tuple(c[:, None, :] for c in results[:n_layers])
    attn0 = results[n_layers]
    idx = results[n_layers + 3][:, 0]
    return idx, new_states, attn0
