"""Fused int8 quantize→matmul→dequantize Pallas kernels.

TPU-native replacement for the reference's int8 GEMM providers
(slimt/qmm/Intgemm.inl.cc, Ruy.inl.cc, Gemmology.inl.cc): one kernel
fuses what the reference does in three passes (PrepareA quantization,
int8 GEMM, unquantize+bias epilogue callback):

    acc[m,n] = Σ_k round(x[m,k]·aq) · w_q[k,n]      (MXU, int8→int32)
    y[m,n]   = acc[m,n] / (aq·bq) + b[n]            (VPU epilogue)

Grid tiles (TILE_M × TILE_N) over the output; K (the model feature
dim, 256–2048) always fits VMEM whole, so no K-loop is needed. The
activation quantization (round-to-nearest-even, saturate to ±127 —
intgemm's PrepareA convention) happens in-register on the x tile, so
activations never round-trip through HBM as int8.

Falls back to interpret mode off-TPU so the unit tests exercise the
same kernel code on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
TILE_N = 128


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _affine_kernel(scale_ref, x_ref, w_ref, b_ref, o_ref):
    """One (TILE_M, TILE_N) output tile; scale_ref holds [aq, inv]."""
    aq = scale_ref[0]
    inv = scale_ref[1]  # 1 / (aq * bq)
    x_q = jnp.clip(jnp.rint(x_ref[:] * aq), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = acc.astype(jnp.float32) * inv + b_ref[0, :]


def _affine_2d(
    x: jax.Array,
    w_q: jax.Array,
    b: jax.Array,
    aq: jax.Array,
    bq: jax.Array,
    interpret: bool,
) -> jax.Array:
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2, (x.shape, w_q.shape)
    scales = jnp.stack(
        [aq.astype(jnp.float32), 1.0 / (aq * bq)]
    ).astype(jnp.float32)

    grid = (pl.cdiv(m, TILE_M), pl.cdiv(n, TILE_N))
    flops = 2 * m * n * k
    return pl.pallas_call(
        _affine_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE_M, k), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (k, TILE_N), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, TILE_N), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (TILE_M, TILE_N), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=m * k * 4 + k * n + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scales, x, w_q, b.reshape(1, n))


def affine(
    x: jax.Array,
    w_q: jax.Array,
    b: Optional[jax.Array],
    aq: jax.Array,
    bq: jax.Array,
    out_dtype: jnp.dtype = jnp.float32,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = dequant(quant(x) @ w_q) [+ b]; accepts [..., K] activations."""
    if interpret is None:
        interpret = not _on_tpu()
    n = w_q.shape[-1]
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k).astype(jnp.float32)
    bias = (
        b.astype(jnp.float32)
        if b is not None
        else jnp.zeros((n,), jnp.float32)
    )
    aq = jnp.asarray(aq, jnp.float32)
    bq = jnp.asarray(bq, jnp.float32)
    y = _affine_2d(x2, w_q, bias, aq, bq, interpret)
    return y.reshape(*lead, n).astype(out_dtype)
