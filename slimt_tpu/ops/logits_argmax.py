"""Fused int8 logits-projection + argmax Pallas kernel.

The greedy sampler only needs argmax(logits) (reference greedy_sample,
slimt/Transformer.cc:279-339), yet the decode loop's XLA path
materializes the [B, V] f32 logits to HBM and re-reads them for the
argmax — at B=1024, V=32k that is ~260 MB of HBM traffic per step,
measured at ~112 µs of the ~375 µs step (scripts/ubench_decode_step).

This kernel runs the tied-embedding projection
(slimt/Transformer.cc:104-117) tile-by-tile on the MXU and keeps a
running (best value, best index) per row in VMEM across the
vocab-tile grid axis, so logits never touch HBM:

    acc[m,n]  = Σ_k round(x[m,k]·aq) · w_q[k,n]     (MXU, int8→int32)
    logit     = acc / (aq·bq) + bias[n]             (VPU epilogue)
    best[m]   = first-max over vocab tiles          (VMEM carry)

Tie semantics match jnp.argmax (first maximum): strict `>` across
tiles, first-occurrence argmax within a tile. The epilogue math is
identical to ops.qmm.affine, so the selected index is exactly the
XLA path's argmax.

STATUS: experimental, parity-tested (tests/test_logits_argmax.py) but
OFF by default — measured SLOWER than the XLA path inside the decode
while_loop on v5e (375→580µs/step with 128-row tiles, →638µs with a
whole-batch tile; 2026-08-17 ablations). XLA already fuses the argmax
reduction into the dot consumer and pipelines it across loop steps,
which a per-step pallas_call breaks. Enable for experiments with
SLIMT_TPU_FUSED_ARGMAX=1 (read at trace time in
transformer.output_argmax).

Falls back to interpret mode off-TPU (unit tests); callers gate on
`supported()` for shape constraints (vocab % 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 1024  # whole serving batch in one tile: W streams ONCE.
TILE_N = 512  # vocab tile; K×TILE_N int8 weights = 128 KB at K=256


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def supported(n: int) -> bool:
    """Projection width the kernel can tile (full 128-lane tiles)."""
    return n % 128 == 0 and n >= TILE_N


def _tile_m(m: int) -> int:
    """One batch tile when possible (W then streams through VMEM
    exactly once; with multiple M tiles every tile re-reads all of W).
    VMEM at (1024, 512): x 1MB + acc 2MB + logits 2MB + W 128KB."""
    if m >= TILE_M:
        return TILE_M
    return max(8, -(-m // 8) * 8)


def _kernel(scale_ref, x_ref, w_ref, b_ref, val_ref, idx_ref, *, n,
            packed_dtype=None):
    j = pl.program_id(1)
    aq = scale_ref[0]
    inv = scale_ref[1]  # 1 / (aq * bq)
    x_q = jnp.clip(jnp.rint(x_ref[:] * aq), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    logits = acc.astype(jnp.float32) * inv + b_ref[0, :]
    # Mask the final partial vocab tile: its padded columns hold
    # unspecified W/bias block data that must never win the argmax.
    cols = j * TILE_N + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 1
    )
    if packed_dtype is not None:
        # Packed-key epilogue (the serving argmax, VERDICT r3 task 6a):
        # the sortable-int transform of the 16-bit-rounded logit in
        # the high bits, the reversed GLOBAL column in the low 16 —
        # the running cross-tile reduce is ONE s32 max over one carry
        # ref (no value/index pair), matching
        # transformer.packed_argmax_16 bit-for-bit.
        lb = logits.astype(packed_dtype)
        bits = jax.lax.bitcast_convert_type(
            lb, jnp.uint16
        ).astype(jnp.int32)
        sortable = jnp.where(
            bits >= 0x8000, 0xFFFF - bits, bits | 0x8000
        )
        key = ((sortable - 0x8000) << 16) | (0xFFFF - cols)
        key = jnp.where(cols < n, key, jnp.iinfo(jnp.int32).min)
        tile_best = jnp.max(key, axis=1)  # [TILE_M]

        @pl.when(j == 0)
        def _init_p():
            idx_ref[:, 0] = tile_best

        @pl.when(j > 0)
        def _update_p():
            idx_ref[:, 0] = jnp.maximum(idx_ref[:, 0], tile_best)

        val_ref[:, 0] = jnp.zeros_like(tile_best, jnp.float32)
        return
    logits = jnp.where(cols < n, logits, -jnp.inf)
    tile_max = jnp.max(logits, axis=1)  # [TILE_M]
    tile_arg = jnp.argmax(logits, axis=1).astype(jnp.int32)
    cand = j * TILE_N + tile_arg

    @pl.when(j == 0)
    def _init():
        val_ref[:, 0] = tile_max
        idx_ref[:, 0] = cand

    @pl.when(j > 0)
    def _update():
        prev = val_ref[:, 0]
        better = tile_max > prev  # strict: earlier tile wins ties
        val_ref[:, 0] = jnp.where(better, tile_max, prev)
        idx_ref[:, 0] = jnp.where(better, cand, idx_ref[:, 0])


@functools.partial(jax.jit, static_argnames=("interpret", "method"))
def _argmax_2d(x, w_q, b, scales, interpret, method="exact"):
    m, k = x.shape
    _, n = w_q.shape
    tile_m = _tile_m(m)
    grid = (pl.cdiv(m, tile_m), pl.cdiv(n, TILE_N))
    packed_dtype = {
        "packed_fp16": jnp.float16, "packed_bf16": jnp.bfloat16,
    }.get(method)
    val, idx = pl.pallas_call(
        functools.partial(_kernel, n=n, packed_dtype=packed_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (tile_m, k), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (k, TILE_N), lambda i, j, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TILE_N), lambda i, j, *_: (0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (tile_m, 1), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_m, 1), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 4 + k * n + m * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scales, x, w_q, b.reshape(1, n))
    if packed_dtype is not None:
        # The carry ref holds the winning packed key; unpack the
        # reversed column (identical to packed_argmax_16's epilogue).
        return 0xFFFF - (idx[:, 0] & 0xFFFF)
    return idx[:, 0]


def argmax_affine(x, w_q, b, aq, bq, interpret=None, method="exact"):
    """argmax over dequant(quant(x) @ w_q) + b, rows of x.

    x: [B, K] f32; w_q: [K, N] int8; b: [N] f32. Returns [B] int32.
    method="exact": bit-identical index to
    jnp.argmax(qmm.affine(...), axis=-1). method="packed_fp16"/
    "packed_bf16": bit-identical to transformer.packed_argmax_16 over
    the same logits (the serving argmax) with the key fold fused into
    the projection epilogue."""
    if interpret is None:
        interpret = not _on_tpu()
    scales = jnp.stack(
        [jnp.asarray(aq, jnp.float32), 1.0 / (aq * bq)]
    ).astype(jnp.float32)
    bias = (
        b.astype(jnp.float32)
        if b is not None
        else jnp.zeros((w_q.shape[1],), jnp.float32)
    )
    return _argmax_2d(
        x.astype(jnp.float32), w_q, bias, scales, interpret, method
    )
