"""Encoder formulation experiments (real TPU).

The encoder is f32-activation-HBM-traffic-bound (ubench_encoder.py:
42-48 ms/batch at B=2048xT=64, scores path 16.2 ms, per-affine path at
its traffic floor). Before building a fused whole-layer Pallas kernel,
measure the cheap XLA-level reformulations, same-process slope A/B:

  base         — the shipped encoder (transpose-based split_heads +
                 einsum SDPA + jnp FFN)
  einsum_heads — SDPA contracted directly on [B,T,H,D]/[B,S,H,D]
                 layouts ("bqhd,bkhd->bhqk"); no explicit transposes —
                 does XLA fuse the layout into the matmul?
  ffn_pallas   — FFN block via the existing fused_blocks.ffn_block
                 kernel (saves the [BT,ffn] f32 h round-trip)
  qkv_merged   — Q/K/V projections as ONE [E, 3E] int8 matmul (one
                 quantized-x read instead of three; requires equal aq,
                 which holds per-layer for self-attention inputs)

Run: python scripts/ubench_encoder_variants.py
"""

import math
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
from slimt_tpu.ops import qmm

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
    stacked = dict(
        stacked,
        emb_f32=stacked["emb"]["q"].astype(jnp.float32)
        * (1.0 / stacked["emb"]["scale"]),
    )
    return config, stacked


def sdpa_einsum_heads(q, k, v, mask_add, num_heads):
    """q/k/v: [B, T, E] affine outputs; heads via reshape only."""
    b, t, e = q.shape
    d = e // num_heads
    qh = q.reshape(b, t, num_heads, d)
    kh = k.reshape(b, t, num_heads, d)
    vh = v.reshape(b, t, num_heads, d)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(d))
    scores = scores + mask_add
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", attn, vh, preferred_element_type=jnp.float32
    )
    return out.reshape(b, t, e)


def layer_einsum_heads(layer, x, mask_add, num_heads):
    att = layer["att"]
    yq = tfm._affine(att["q"], x, None)
    yk = tfm._affine(att["k"], x, None)
    yv = tfm._affine(att["v"], x, None)
    attn_out = sdpa_einsum_heads(yq, yk, yv, mask_add, num_heads)
    out = tfm._affine(att["o"], attn_out, None)
    x = tfm.layer_norm(x + out, att["ln"])
    return tfm._ffn_block(layer, x, None)


def layer_ffn_pallas(layer, x, mask_add, num_heads):
    from slimt_tpu.ops import fused_blocks

    out, _ = tfm.attention_forward(
        layer["att"], x, x, x, mask_add, num_heads, None
    )
    return fused_blocks.ffn_block(out, layer["ffn"], layer["ffn"]["ln"])


def layer_qkv_merged(layer, x, mask_add, num_heads):
    """One [E,3E] int8 matmul for Q/K/V (equal aq per layer holds: all
    three projections quantize the SAME x with the same stored
    QuantMultA in marian student models... if not, fall back)."""
    att = layer["att"]
    w3 = jnp.concatenate([att["q"]["q"], att["k"]["q"], att["v"]["q"]], axis=1)
    b3 = jnp.concatenate([att["q"]["b"], att["k"]["b"], att["v"]["b"]], axis=-1)
    aq = att["q"]["aq"]
    x_q = qmm.quantize_activations(x, aq)
    acc = jax.lax.dot_general(
        x_q, w3,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    e = x.shape[-1]
    scales = jnp.concatenate([
        jnp.full((e,), 1.0) / (aq * att["q"]["bq"]),
        jnp.full((e,), 1.0) / (att["k"]["aq"] * att["k"]["bq"]),
        jnp.full((e,), 1.0) / (att["v"]["aq"] * att["v"]["bq"]),
    ])
    y = acc * scales + b3
    yq, yk, yv = y[..., :e], y[..., e : 2 * e], y[..., 2 * e :]
    attn_out, _ = tfm.scaled_dot_product_attention(
        tfm._split_heads(yq, num_heads),
        tfm._split_heads(yk, num_heads),
        tfm._split_heads(yv, num_heads),
        mask_add,
    )
    out = tfm._affine(att["o"], tfm._join_heads(attn_out), None)
    x = tfm.layer_norm(x + out, att["ln"])
    return tfm._ffn_block(layer, x, None)


LAYER_FNS = {
    "einsum_heads": layer_einsum_heads,
    "ffn_pallas": layer_ffn_pallas,
    "qkv_merged": layer_qkv_merged,
}


def make_fn(config, variant=None):
    def run(p, i, m):
        if variant == "embed_f32":
            # Gather from a PRE-DEQUANTIZED f32 embedding table
            # (32 MB HBM for tiny11) instead of int8-gather+convert:
            # identical values (per-tensor scale commutes with the
            # row gather).
            rows = jnp.take(p["emb_f32"], i, axis=0)
            x = tfm.transform_embedding(rows)
        else:
            x = tfm.transform_embedding(tfm.embed(p, i))
        mask_add = tfm.make_additive_mask(m)
        if variant in (None, "embed_f32"):
            out = tfm.encoder_forward(p, x, mask_add, config.num_heads, None)
        else:
            fn = LAYER_FNS[variant]

            def step(x, layer):
                return fn(layer, x, mask_add, config.num_heads), None

            out, _ = jax.lax.scan(step, x, p["encoder"])
        return jnp.sum(out)

    return jax.jit(run)


def main():
    print(f"devices: {jax.devices()}  B={B} T={T}")
    config, stacked = build()
    rng = np.random.default_rng(0)
    mask = jnp.asarray(np.ones((B, T), np.float32))

    def mk(n):
        return [
            jnp.asarray(rng.integers(3, VOCAB, (B, T)).astype(np.int32))
            for _ in range(n)
        ]

    def slope(fn):
        def chain(n):
            vs = mk(n)
            t0 = time.perf_counter()
            outs = [fn(stacked, v, mask) for v in vs]
            np.asarray(outs[-1])
            return time.perf_counter() - t0

        chain(1)
        lo, hi = ITERS, 3 * ITERS
        t_lo, t_hi = chain(lo), chain(hi)
        return (t_hi - t_lo) / (hi - lo)

    # Parity gate before timing anything.
    base_fn = make_fn(config)
    v0 = mk(1)[0]
    want = float(base_fn(stacked, v0, mask))
    cases = os.environ.get(
        "UB_CASES", "einsum_heads,ffn_pallas,qkv_merged"
    ).split(",")
    fns = {}
    for case in cases:
        fns[case] = make_fn(config, case)
        got = float(fns[case](stacked, v0, mask))
        rel = abs(got - want) / max(1e-9, abs(want))
        print(f"  {case:14s} checksum rel-delta {rel:.2e}")

    results = {c: [] for c in cases}
    bases = []
    for r in range(ROUNDS):
        for case in cases:
            bases.append(slope(base_fn))
            results[case].append(slope(fns[case]))

    def med(v):
        return sorted(v)[len(v) // 2]

    base_ms = med(bases) * 1e3
    print(f"base encoder: {base_ms:.1f} ms/batch")
    for case in cases:
        v = med(results[case]) * 1e3
        print(f"  {case:14s} {v:6.1f} ms/batch ({v - base_ms:+.1f})")


if __name__ == "__main__":
    main()
