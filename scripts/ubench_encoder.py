"""Encoder decomposition microbench (real TPU).

Round-4 finding (scripts/ubench_fetch_overlap.py encoder_share): the
encoder costs ~63 ms/batch at the headline shape (B=2048, T=64) — 47%
of the headline wall — while the fetch-schedule experiment showed
transfers fully hidden behind compute (last_only == pool4). The
headline's gap to decode-only "device tok/s" is the encoder, not the
link. This decomposes the encoder by ablation, slope-timed over chain
length (per-call dispatch/fetch fixed costs cancel), same-process
interleaved with a paired full measurement per ablation (tunnel-drift
discipline, as bench.py devstep).

Ablations:
  full       — embed + 6-layer encoder (the real thing)
  no_scores  — SDPA replaced by V passthrough (isolates QK^T + softmax
               + attn·V: the [B,H,T,T] f32 score path)
  no_attn    — whole attention block replaced by identity (adds QKVO
               int8 affines + residual/LN over no_scores)
  no_ffn     — FFN block replaced by identity (W1/relu/W2 + LN)
  embed_only — just embed + positional (bounds the non-layer cost)
  unrolled   — full, with the 6 layers as an unrolled list instead of
               lax.scan (scan-boundary fusion cost)

Run: python scripts/ubench_encoder.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from slimt_tpu.config import ModelConfig
from slimt_tpu.io import load_items
from slimt_tpu.io.loader import load_weights, stack_layers
from slimt_tpu.io.synthetic import synthetic_model_bytes
from slimt_tpu.models import transformer as tfm

B = int(os.environ.get("UB_B", 2048))
T = int(os.environ.get("UB_T", 64))
ITERS = int(os.environ.get("UB_ITERS", 6))
ROUNDS = int(os.environ.get("UB_ROUNDS", 3))
VOCAB = 32000


def build():
    config = ModelConfig(encoder_layers=6, decoder_layers=2)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=VOCAB, emb_dim=256, ffn_dim=1536, seed=0
        )
    )
    host = load_weights(items, config)
    stacked = jax.device_put(stack_layers(host, decoder=False))
    unstacked = jax.device_put(host)  # layers stay Python lists
    return config, stacked, unstacked


def patched(name):
    orig_sdpa = tfm.scaled_dot_product_attention
    orig_attn = tfm.attention_forward
    orig_ffn = tfm._ffn_block

    if name == "no_scores":
        def fake_sdpa(q, k, v, mask_add):
            return v, None

        tfm.scaled_dot_product_attention = fake_sdpa
    elif name == "no_attn":
        def fake_attn(att, q_in, k_in, v_in, mask_add, num_heads,
                      provider=None, kv_cache=None, flash=False,
                      attn_kernel=False, **kw):
            return q_in, None

        tfm.attention_forward = fake_attn
    elif name == "no_ffn":
        def fake_ffn(layer, x, provider, **kw):
            return x

        tfm._ffn_block = fake_ffn

    def restore():
        tfm.scaled_dot_product_attention = orig_sdpa
        tfm.attention_forward = orig_attn
        tfm._ffn_block = orig_ffn

    return restore


def main():
    print(f"devices: {jax.devices()}  B={B} T={T}")
    config, stacked, unstacked = build()
    rng = np.random.default_rng(0)
    mask = jnp.asarray(np.ones((B, T), np.float32))

    def make_fn(embed_only=False, flash=False, act=None, fused=False):
        adt = jnp.dtype(act) if act else None

        def run(p, i, m):
            x = tfm.transform_embedding(tfm.embed(p, i, dtype=adt))
            if embed_only:
                return jnp.sum(x)
            out = tfm.encoder_forward(
                p, x, tfm.make_additive_mask(m), config.num_heads, None,
                flash=flash, act_dtype=adt, fused_sdpa=fused,
            )
            return jnp.sum(out.astype(jnp.float32))

        return jax.jit(run)

    def mk(n):
        return [
            jnp.asarray(rng.integers(3, VOCAB, (B, T)).astype(np.int32))
            for _ in range(n)
        ]

    def slope(fn, params):
        def chain(n):
            vs = mk(n)
            t0 = time.perf_counter()
            outs = [fn(params, v, mask) for v in vs]
            np.asarray(outs[-1])
            return time.perf_counter() - t0

        chain(1)  # compile
        lo, hi = ITERS, 3 * ITERS
        t_lo, t_hi = chain(lo), chain(hi)
        return (t_hi - t_lo) / (hi - lo)

    cases = tuple(
        os.environ.get(
            "UB_CASES",
            "no_scores,no_attn,no_ffn,embed_only,unrolled,flash,f16,bf16,"
            "fused_sdpa",
        ).split(",")
    )
    fulls = []
    diffs = {c: [] for c in cases}
    for r in range(ROUNDS):
        for case in cases:
            base = slope(make_fn(), stacked)  # paired full
            if case == "embed_only":
                abl = slope(make_fn(embed_only=True), stacked)
            elif case == "unrolled":
                abl = slope(make_fn(), unstacked)
            elif case == "flash":
                abl = slope(make_fn(flash=True), stacked)
            elif case == "fused_sdpa":
                abl = slope(make_fn(fused=True), stacked)
            elif case == "f16":
                abl = slope(make_fn(act="float16"), stacked)
            elif case == "bf16":
                abl = slope(make_fn(act="bfloat16"), stacked)
            else:
                restore = patched(case)
                try:
                    abl = slope(make_fn(), stacked)
                finally:
                    restore()
            fulls.append(base)
            diffs[case].append(base - abl)

    def med(v):
        return sorted(v)[len(v) // 2]

    full_ms = med(fulls) * 1e3
    print(f"full encoder: {full_ms:.1f} ms/batch "
          f"({B*T/med(fulls)/1e6:.2f}M enc tok/s)")
    for case in cases:
        d = med(diffs[case]) * 1e3
        if case in ("unrolled", "flash", "f16", "bf16", "fused_sdpa"):
            print(f"  {case:10s} delta {d:+7.1f} ms (negative = variant "
                  "slower)")
        elif case == "embed_only":
            print(f"  layers     {d:7.1f} ms; embed+pos "
                  f"{full_ms - d:.1f} ms")
        else:
            print(f"  {case:10s} component {d:7.1f} ms "
                  f"({100*d/full_ms:.0f}% of full)")


if __name__ == "__main__":
    main()
