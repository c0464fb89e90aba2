"""Headline benchmark: decode throughput (tokens/sec/chip) on the
flagship tiny11-shaped INT8 model.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured tokens/sec/chip divided by the driver target of
1e4 (BASELINE.md — the reference publishes no numbers of its own).

The workload mirrors the reference's instrumented words-per-second
meter (slimt/Frontend.cc:44-59): batched greedy decode at the service
defaults' batch budget. EOS is set to an id the synthetic model never
emits so every sentence decodes the full `limit_factor * T` steps —
worst-case full-occupancy throughput, no early-exit flattery.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_params
    from slimt_tpu.models.decode import translate_batch

    params, config = _flagship_params()

    # Batch shaped by the service defaults: max_words=1024 budget at
    # wrap_length-ish sequences (slimt/Frontend.hh:23-27) — scaled up
    # batch for TPU occupancy (the reference budget targets 1 CPU core;
    # one TPU chip replaces many workers).
    batch, seq = 64, 64
    rng = np.random.default_rng(0)
    indices = rng.integers(3, 32000, (batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.float32)
    max_steps = int(1.5 * seq)

    provider = config.qmm_provider
    if len(sys.argv) > 1:
        provider = sys.argv[1]

    fn = jax.jit(
        lambda p, i, m: translate_batch(
            p, i, m,
            eos_id=-1,  # never emitted: full-length decode
            max_steps=max_steps,
            num_heads=config.num_heads,
            provider=provider,
        )
    )
    args = (params, jnp.asarray(indices), jnp.asarray(mask))

    # Warmup/compile.
    out = fn(*args)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    tokens = batch * max_steps * iters
    tps = tokens / elapsed
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip_tiny11_int8",
                "value": round(tps, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tps / 1e4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
