"""Fused transformer-block Pallas kernels.

Each kernel collapses a whole reference module into one TPU program,
eliminating the intermediate HBM round-trips and per-op overhead the
XLA path pays (the decode step is op-overhead-bound, not FLOP-bound —
see PERFORMANCE.md):

  ffn_block:  y = LN( x + W2·relu(W1·quant(x)) )     — the reference
      FFN pair + residual + post-LN (slimt/Modules.cc:321-334) with
      both int8 GEMMs, requantization of the hidden activations, bias
      adds, relu, residual and layer-norm in VMEM.

  ssru_block: h = LN( x + relu(f⊙c + (1-f)⊙Wx) ), f = σ(Wf·quant(x))
      — the whole SSRU cell (slimt/Modules.cc:182-235): two int8
      GEMMs + gates + highway + LN; also returns the new cell state.

Both tile over rows of the flattened activations; the weights (≤1.5k
feature dims for these students) stay whole in VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
LN_EPS = 1e-6


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _quant(x, aq):
    return jnp.clip(jnp.rint(x * aq), -127.0, 127.0).astype(jnp.int8)


def _int8_mm(x_q, w_ref):
    return jax.lax.dot_general(
        x_q,
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _layer_norm(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    return centered * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _ffn_kernel(
    scale_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref, o_ref
):
    aq1, inv1, aq2, inv2 = (
        scale_ref[0], scale_ref[1], scale_ref[2], scale_ref[3]
    )
    x = x_ref[:]
    h = _int8_mm(_quant(x, aq1), w1_ref).astype(jnp.float32) * inv1
    h = jnp.maximum(h + b1_ref[0, :], 0.0)
    y = _int8_mm(_quant(h, aq2), w2_ref).astype(jnp.float32) * inv2
    y = y + b2_ref[0, :] + x  # residual
    o_ref[:] = _layer_norm(y, lns_ref[0, :], lnb_ref[0, :])


def ffn_block(
    x: jax.Array,
    ffn: dict,
    ln: dict,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x [..., E]; ffn = {"w1","w2"} affines, ln = {"scale","bias"}."""
    if interpret is None:
        interpret = not _on_tpu()
    lead = x.shape[:-1]
    e = x.shape[-1]
    f = ffn["w1"]["q"].shape[-1]
    x2 = x.reshape(-1, e).astype(jnp.float32)
    m = x2.shape[0]
    w1, w2 = ffn["w1"], ffn["w2"]
    scales = jnp.stack(
        [
            w1["aq"].astype(jnp.float32),
            1.0 / (w1["aq"] * w1["bq"]),
            w2["aq"].astype(jnp.float32),
            1.0 / (w2["aq"] * w2["bq"]),
        ]
    )
    grid = (pl.cdiv(m, TILE_M),)
    out = pl.pallas_call(
        _ffn_kernel,
        out_shape=jax.ShapeDtypeStruct((m, e), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_M, e), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e, f), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f, e), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, e), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, e), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, e), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE_M, e), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * e * f,
            bytes_accessed=2 * e * f + m * e * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        scales,
        x2,
        w1["q"],
        w1["b"].reshape(1, f),
        w2["q"],
        w2["b"].reshape(1, e),
        ln["scale"].reshape(1, e),
        ln["bias"].reshape(1, e),
    )
    return out.reshape(*lead, e)


def _ssru_kernel(
    scale_ref, x_ref, c_ref, wf_ref, bf_ref, w_ref, lns_ref, lnb_ref,
    h_ref, c_out_ref,
):
    aqf, invf, aqw, invw = (
        scale_ref[0], scale_ref[1], scale_ref[2], scale_ref[3]
    )
    x = x_ref[:]
    f = jax.nn.sigmoid(
        _int8_mm(_quant(x, aqf), wf_ref).astype(jnp.float32) * invf
        + bf_ref[0, :]
    )
    wx = _int8_mm(_quant(x, aqw), w_ref).astype(jnp.float32) * invw
    c_t = f * c_ref[:] + (1.0 - f) * wx
    y = jnp.maximum(c_t, 0.0)
    h_ref[:] = _layer_norm(x + y, lns_ref[0, :], lnb_ref[0, :])
    c_out_ref[:] = c_t


def ssru_block(
    x: jax.Array,
    state: jax.Array,
    rnn: dict,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """x, state: [..., E]; rnn = {"wf": affine, "w": linear, "ln"}.
    Returns (h, new_state)."""
    if interpret is None:
        interpret = not _on_tpu()
    lead = x.shape[:-1]
    e = x.shape[-1]
    x2 = x.reshape(-1, e).astype(jnp.float32)
    c2 = state.reshape(-1, e).astype(jnp.float32)
    m = x2.shape[0]
    wf, w = rnn["wf"], rnn["w"]
    scales = jnp.stack(
        [
            wf["aq"].astype(jnp.float32),
            1.0 / (wf["aq"] * wf["bq"]),
            w["aq"].astype(jnp.float32),
            1.0 / (w["aq"] * w["bq"]),
        ]
    )
    grid = (pl.cdiv(m, TILE_M),)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    h, c_t = pl.pallas_call(
        _ssru_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, e), jnp.float32),
            jax.ShapeDtypeStruct((m, e), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                vmem((TILE_M, e), lambda i, *_: (i, 0)),
                vmem((TILE_M, e), lambda i, *_: (i, 0)),
                vmem((e, e), lambda i, *_: (0, 0)),
                vmem((1, e), lambda i, *_: (0, 0)),
                vmem((e, e), lambda i, *_: (0, 0)),
                vmem((1, e), lambda i, *_: (0, 0)),
                vmem((1, e), lambda i, *_: (0, 0)),
            ],
            out_specs=(
                vmem((TILE_M, e), lambda i, *_: (i, 0)),
                vmem((TILE_M, e), lambda i, *_: (i, 0)),
            ),
        ),
        interpret=interpret,
    )(
        scales,
        x2,
        c2,
        wf["q"],
        wf["b"].reshape(1, e),
        w["q"],
        rnn["ln"]["scale"].reshape(1, e),
        rnn["ln"]["bias"].reshape(1, e),
    )
    return h.reshape(*lead, e), c_t.reshape(*lead, e)
