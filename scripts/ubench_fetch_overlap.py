"""Result-fetch overlap experiment for the headline decode loop.

Round-3 measured the axon link's cost model: ~45-60 ms fixed per
fetched array + ~5-7 MB/s per stream, scaling to ~23-27 MB/s across 4
concurrent streams (scripts/ubench_transfer.py grouped: one k-stacked
array moves at 12.6 MB/s — WORSE than 4 overlapped streams, killing
the accumulate-and-fetch-once design). The remaining wall-vs-device
gap (~1.78M vs 2.7M tok/s at B=2048) is consistent with transfers
TAILING after all computes instead of overlapping them.

This measures the real headline decode (compact transport, declared
int16 config) under fetch schedules, same-process interleaved with
medians (tunnel drift discipline):

  pool4        — dispatch all, fetch on a 4-thread pool (round-3 bench)
  pool8        — same, 8 threads
  async_copy   — arr.copy_to_host_async() immediately after each
                 dispatch (D2H enqueued behind that batch's compute,
                 overlapping later batches' compute), then materialize
  async_pool4  — copy_to_host_async + 4-thread materialize

Run on the real TPU: python scripts/ubench_fetch_overlap.py
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.environ.get("UB_B", 2048))
SEQ = int(os.environ.get("UB_SEQ", 64))
ITERS = int(os.environ.get("UB_ITERS", 6))
ROUNDS = int(os.environ.get("UB_ROUNDS", 5))


def build():
    from slimt_tpu.config import ModelConfig
    from slimt_tpu.io import load_items
    from slimt_tpu.io.loader import load_weights, stack_layers
    from slimt_tpu.io.synthetic import synthetic_model_bytes
    from slimt_tpu.models.decode import compact_result, translate_batch

    config = ModelConfig(encoder_layers=6, decoder_layers=2)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=32000, emb_dim=256, ffn_dim=1536, seed=0
        )
    )
    params = jax.device_put(stack_layers(load_weights(items, config),
                                         decoder=False))
    max_steps = int(1.5 * SEQ)

    def run(p, i, m):
        return compact_result(
            translate_batch(
                p, i, m, eos_id=-1, max_steps=max_steps,
                num_heads=config.num_heads, provider=None, kv_dtype="int16",
                shortlist=None, with_alignment=False,
                argmax_method="packed_fp16",
            )
        )

    return jax.jit(run), params, max_steps


def mode_encoder_share():
    """Decompose the per-batch wall into encoder vs decode: the
    devstep slope method cancels the encoder by construction, so the
    headline's gap to 'device tok/s' includes an uncounted encoder
    pass per batch. Times encoder-only and full-translate call chains
    at two chain lengths (slope cancels per-call dispatch/fetch fixed
    costs), same process, interleaved."""
    from slimt_tpu.config import ModelConfig
    from slimt_tpu.io import load_items
    from slimt_tpu.io.loader import load_weights, stack_layers
    from slimt_tpu.io.synthetic import synthetic_model_bytes
    from slimt_tpu.models import transformer as tfm
    from slimt_tpu.models.decode import compact_result, translate_batch

    config = ModelConfig(encoder_layers=6, decoder_layers=2)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=32000, emb_dim=256, ffn_dim=1536, seed=0
        )
    )
    params = jax.device_put(stack_layers(load_weights(items, config),
                                         decoder=False))
    max_steps = int(1.5 * SEQ)

    def enc_only(p, i, m):
        x = tfm.transform_embedding(tfm.embed(p, i))
        out = tfm.encoder_forward(
            p, x, tfm.make_additive_mask(m), config.num_heads, None
        )
        return jnp.sum(out)

    def full(p, i, m):
        return compact_result(
            translate_batch(
                p, i, m, eos_id=-1, max_steps=max_steps,
                num_heads=config.num_heads, provider=None,
                kv_dtype="int16", shortlist=None, with_alignment=False,
                argmax_method="packed_fp16",
            )
        )

    enc_fn = jax.jit(enc_only)
    full_fn = jax.jit(full)
    rng = np.random.default_rng(0)
    mask = jnp.asarray(np.ones((B, SEQ), np.float32))

    def mk(n):
        return [
            jnp.asarray(rng.integers(3, 32000, (B, SEQ)).astype(np.int32))
            for _ in range(n)
        ]

    np.asarray(enc_fn(params, mk(1)[0], mask))
    np.asarray(full_fn(params, mk(1)[0], mask).packed)

    def chain(fn, n, is_full):
        vs = mk(n)
        t0 = time.perf_counter()
        outs = [fn(params, v, mask) for v in vs]
        last = outs[-1]
        np.asarray(last.packed if is_full else last)
        return time.perf_counter() - t0

    lo, hi = ITERS, 3 * ITERS
    rows = {"encoder": [], "full": []}
    for r in range(ROUNDS):
        for name, fn, is_full in (
            ("encoder", enc_fn, False), ("full", full_fn, True),
        ):
            t_lo = chain(fn, lo, is_full)
            t_hi = chain(fn, hi, is_full)
            rows[name].append((t_hi - t_lo) / (hi - lo))

    med = {
        k: sorted(v)[len(v) // 2] * 1e3 for k, v in rows.items()
    }
    decode_ms = med["full"] - med["encoder"]
    print(
        f"per-batch: full {med['full']:.1f} ms, encoder "
        f"{med['encoder']:.1f} ms ({100*med['encoder']/med['full']:.0f}%), "
        f"decode {decode_ms:.1f} ms -> {decode_ms/max_steps*1e3:.0f} "
        f"us/step at B={B}"
    )
    print(
        f"tokens/s: full-wall {B*max_steps/med['full']*1e3/1e6:.2f}M, "
        f"decode-only {B*max_steps/decode_ms*1e3/1e6:.2f}M"
    )


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "encoder_share":
        return mode_encoder_share()
    print(f"devices: {jax.devices()}  B={B} SEQ={SEQ} iters={ITERS}")
    fn, params, max_steps = build()
    rng = np.random.default_rng(0)
    mask = jnp.asarray(np.ones((B, SEQ), np.float32))

    def variants(n, salt):
        return [
            jnp.asarray(rng.integers(3, 32000, (B, SEQ)).astype(np.int32))
            for _ in range(n)
        ]

    # compile + transfer warmup
    out = fn(params, variants(1, 0)[0], mask)
    np.asarray(out.packed)

    def run_pool(n_threads, async_copy):
        vs = variants(ITERS, 1)
        t0 = time.perf_counter()
        outs = []
        for v in vs:
            o = fn(params, v, mask)
            if async_copy:
                o.packed.copy_to_host_async()
            outs.append(o)
        if n_threads <= 1:
            acc = sum(int(np.asarray(o.packed)[0, 0]) for o in outs)
        else:
            with ThreadPoolExecutor(max_workers=n_threads) as pool:
                acc = sum(
                    pool.map(lambda o: int(np.asarray(o.packed)[0, 0]), outs)
                )
        dt = time.perf_counter() - t0
        return dt, acc

    def run_last_only():
        # Compute floor probe: dispatch all ITERS batches, fetch only
        # the last one's buffer. The device executes every dispatch
        # (serial stream); wall = total compute + one transfer —
        # bounds what any fetch schedule could achieve.
        vs = variants(ITERS, 2)
        t0 = time.perf_counter()
        outs = [fn(params, v, mask) for v in vs]
        acc = int(np.asarray(outs[-1].packed)[0, 0])
        return time.perf_counter() - t0, acc

    schedules = {
        "pool4": lambda: run_pool(4, False),
        "pool8": lambda: run_pool(8, False),
        "async_copy": lambda: run_pool(1, True),
        "async_pool4": lambda: run_pool(4, True),
        "last_only": run_last_only,
    }
    times = {k: [] for k in schedules}
    for r in range(ROUNDS):
        for name, sched in schedules.items():
            dt, _ = sched()
            times[name].append(dt)
    tokens = B * max_steps * ITERS
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(
            f"{name:12s} median {med*1e3:8.1f} ms  "
            f"{tokens/med/1e6:6.2f}M tok/s  (all: "
            + " ".join(f"{t*1e3:.0f}" for t in ts) + ")"
        )


if __name__ == "__main__":
    main()
