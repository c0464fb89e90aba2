"""Scaling regression tests on the virtual 8-device CPU mesh.

Two layers of defense, per round-2 verdict feedback (wall-clock ratio
thresholds on a shared CI host redline under load):

1. STRUCTURAL (primary, deterministic, load-immune): the compiled
   SPMD program must actually be partitioned — `num_partitions=N`,
   batch-carrying buffers at their LOCAL shard shape [B/N, T] with no
   full-batch [B, T] buffer anywhere in the module (a degenerate
   GSPMD partition replicates the whole computation and keeps
   full-size buffers), and TP weight parameters device-sharded.
   This catches the regressions the old wall-clock thresholds were
   after (hidden serialization via replication, a lost sharding
   annotation) no matter what else is running on the host.

2. WALL-CLOCK CANARY (secondary): paired base/sharded timing with a
   deliberately gross floor — it exists to catch a per-step host
   round-trip (orders of magnitude, not percentages) and must not
   fire from CPU oversubscription. Measured context on this mesh:
   DP 1.3-1.45x idle, 0.74x under heavy load; TP 0.5-0.6x idle,
   0.21x under heavy load (scripts/scaling_curve.py).
"""

import os
import re
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)

from slimt_tpu.config import ModelConfig
from slimt_tpu.io import load_items
from slimt_tpu.io.loader import load_weights
from slimt_tpu.io.synthetic import synthetic_model_bytes
from slimt_tpu.models.decode import translate_batch
from slimt_tpu.parallel import sharding as shd

MAX_ROUNDS = 3
BATCH, SEQ, STEPS = 64, 24, 8


@pytest.fixture(scope="module")
def setup():
    config = ModelConfig(encoder_layers=3, decoder_layers=2, num_heads=4)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=128, emb_dim=64, ffn_dim=128, seed=0
        )
    )
    return config, load_weights(items, config)


def _compiled_text(setup, mesh_kw):
    config, params = setup
    mesh = shd.make_mesh(**mesh_kw)
    n = int(np.prod(list(mesh.shape.values())))
    if mesh_kw.get("model", 1) > 1:
        placed = shd.shard_params(params, mesh)
    else:
        placed = shd.replicate_params(params, mesh)
    bspec = NamedSharding(mesh, shd.batch_pspec())
    rng = np.random.default_rng(0)
    idx = jax.device_put(
        jnp.asarray(rng.integers(3, 128, (BATCH, SEQ)).astype(np.int32)),
        bspec,
    )
    msk = jax.device_put(jnp.ones((BATCH, SEQ), np.float32), bspec)
    fn = jax.jit(
        lambda p, i, m: translate_batch(
            p, i, m, eos_id=-1, max_steps=STEPS,
            num_heads=config.num_heads, provider="xla_int8",
        )
    )
    return fn.lower(placed, idx, msk).compile().as_text(), n


def test_dp_partitioned_not_replicated(setup):
    """DP=N compiles to a true SPMD program over batch shards: local
    [B/N, T] inputs, local decode buffers, and NO full-batch buffer
    anywhere (a degenerate partition would replicate them)."""
    assert len(jax.devices()) >= 8
    for n in (2, 4, 8):
        txt, _ = _compiled_text(setup, {"data": n})
        local_b = BATCH // n
        assert f"num_partitions={n}" in txt, f"DP={n}: not SPMD"
        assert re.search(
            rf"s32\[{local_b},{SEQ}\]\S* parameter", txt
        ), f"DP={n}: input not batch-sharded"
        assert not re.search(
            rf"s32\[{BATCH},{SEQ}\]", txt
        ), f"DP={n}: full-batch token buffer present (replicated work)"
        # The while-loop token output buffer must also be local.
        assert f"s32[{local_b},{STEPS}]" in txt, f"DP={n}: loop buffer"
        assert f"s32[{BATCH},{STEPS}]" not in txt, (
            f"DP={n}: full-batch loop buffer (hidden serialization)"
        )


def test_tp_weights_sharded(setup):
    """TP=2 device-shards the megatron-split weights (a lost sharding
    annotation silently replicates them and every GEMM)."""
    assert len(jax.devices()) >= 8
    txt, _ = _compiled_text(setup, {"model": 2})
    assert "num_partitions=2" in txt
    # At least the FFN w1 [64,128] must appear as a device-sharded
    # parameter at its local [64,64] shard shape.
    assert re.search(
        r"s8\[64,64\]\S* parameter\(\d+\), sharding=\{devices", txt
    ), "TP=2: no device-sharded int8 weight parameter found"
    # The full-width FFN w1 must not be a replicated parameter.
    assert not re.search(
        r"s8\[64,128\]\S* parameter\(\d+\), sharding=\{replicated\}"
        r"[^\n]*ffn[^\n]*w1",
        txt,
    ), "TP=2: FFN w1 replicated instead of column-sharded"


def _tps(params, config, mesh_kw):
    from scaling_curve import measure

    return measure(
        params, config, mesh_kw, batch=BATCH, seq=SEQ, steps=STEPS,
        repeats=3,
    )


def _assert_ratio(setup, mesh_kw, floor, label):
    config, params = setup
    ratios = []
    for _ in range(MAX_ROUNDS):
        base = _tps(params, config, {})  # paired: same load window
        tps = _tps(params, config, mesh_kw)
        ratios.append(tps / base)
        if ratios[-1] >= floor:
            return
    pytest.fail(
        f"{label} ratio < {floor} in all {MAX_ROUNDS} paired rounds: "
        + ", ".join(f"{r:.2f}" for r in ratios)
    )


def test_dp_wallclock_canary(setup):
    """Gross canary only: a per-step host round-trip would land far
    below 0.4; CPU oversubscription (measured 0.74 under heavy load)
    must not fire it. Partitioning correctness is asserted
    structurally above."""
    assert len(jax.devices()) >= 8
    _assert_ratio(setup, {"data": 8}, 0.4, "DP=8")


def test_tp_wallclock_canary(setup):
    assert len(jax.devices()) >= 8
    # CPU-mesh TP collectives cost real time (0.5-0.6x idle, 0.21x
    # under heavy load — both healthy); only an orders-of-magnitude
    # collapse indicates serialization.
    _assert_ratio(setup, {"model": 2}, 0.1, "TP=2")
