"""Fused-encoder kernel A/B (real TPU): SDPA kernel and whole-layer.

Everything rides ONE process (the axon tunnel charges a large, drainy
first-compile cost per process — and a killed TPU process wedges the
tunnel for the next one, so this script is written to run to
completion under a generous timeout and never be killed mid-compile).

Sections (each prints incrementally):
  sdpa   — raw fused_sdpa_joined loop-vs-stack variants vs the XLA
           einsum SDPA, device-resident inputs, slope-timed
  layer  — whole-encoder-layer kernel (ops/encoder_layer_pallas) vs
           the XLA encoder_layer_forward, same discipline
  enc    — full 6-layer encoder: lax.scan over fused layers vs the
           shipped encoder_forward

Run: python scripts/ubench_encoder_fused.py [sdpa,layer,enc]
"""

import os
import sys
import time
import math

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize force-sets jax_platforms at interpreter
# start; honor an explicit JAX_PLATFORMS (e.g. =cpu for smoke tests).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from slimt_tpu.config import ModelConfig
from slimt_tpu.io import load_items
from slimt_tpu.io.loader import load_weights, stack_layers
from slimt_tpu.io.synthetic import synthetic_model_bytes
from slimt_tpu.models import transformer as tfm
from slimt_tpu.ops.attention import fused_sdpa_joined
from slimt_tpu.ops.encoder_layer_pallas import encoder_layer_fused

B = int(os.environ.get("UB_B", 2048))
T = int(os.environ.get("UB_T", 64))
E = int(os.environ.get("UB_E", 256))  # 512 = base model
H = 8
FFN = int(os.environ.get("UB_FFN", 1536))  # 2048 = base model
ITERS = int(os.environ.get("UB_ITERS", 8))
ROUNDS = int(os.environ.get("UB_ROUNDS", 3))
VOCAB = 32000


def build():
    config = ModelConfig(encoder_layers=6, decoder_layers=2)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=VOCAB, emb_dim=E, ffn_dim=FFN, seed=0
        )
    )
    host = load_weights(items, config)
    return config, jax.device_put(host), jax.device_put(
        stack_layers(host, decoder=False)
    )


def variants_for(*arrs, n=4):
    """n device-resident scaled copies of each array (defeats dispatch
    dedup with zero host->device traffic in the timed loop)."""
    scal = jax.jit(lambda a, c: a * c)
    sets = [
        tuple(scal(a, 1.0 + 0.01 * i) for a in arrs) for i in range(n)
    ]
    for s in sets:
        for a in s:
            a.block_until_ready()
    return sets


def slope(fn, vsets, iters=ITERS):
    def chain(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(*vsets[i % len(vsets)])
        np.asarray(out)
        return time.perf_counter() - t0

    chain(2)
    lo, hi = iters, 3 * iters
    t_lo, t_hi = chain(lo), chain(hi)
    return (t_hi - t_lo) / (hi - lo)


def main():
    cases = (sys.argv[1] if len(sys.argv) > 1 else "sdpa,layer,enc").split(",")
    print(f"devices: {jax.devices()}  B={B} T={T}", flush=True)
    config, host, stacked = build()
    rng = np.random.default_rng(0)
    mask_np = np.ones((B, T), np.float32)
    mask_np[:, -3:] = 0.0
    mask_add = tfm.make_additive_mask(jnp.asarray(mask_np))
    layer0 = jax.device_put(host["encoder"][0])

    if "sdpa" in cases:
        q0 = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
        k0 = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
        v0 = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
        vsets = variants_for(q0, k0, v0)

        def einsum_sdpa(q, k, v):
            qh = q.reshape(B, T, H, E // H).transpose(0, 2, 1, 3)
            kh = k.reshape(B, T, H, E // H).transpose(0, 2, 1, 3)
            vh = v.reshape(B, T, H, E // H).transpose(0, 2, 1, 3)
            out, _ = tfm.scaled_dot_product_attention(qh, kh, vh, mask_add)
            return jnp.sum(out)

        fns = {"einsum": jax.jit(einsum_sdpa)}
        for impl in ("loop", "stack"):
            def f(q, k, v, impl=impl):
                os.environ["SLIMT_TPU_SDPA_IMPL"] = impl
                return jnp.sum(fused_sdpa_joined(q, k, v, mask_add, H))

            os.environ["SLIMT_TPU_SDPA_IMPL"] = impl
            fns[impl] = jax.jit(f)
            t0 = time.perf_counter()
            np.asarray(fns[impl](*vsets[0]))
            print(f"  sdpa/{impl} compiled {time.perf_counter()-t0:.1f}s",
                  flush=True)
        os.environ.pop("SLIMT_TPU_SDPA_IMPL", None)
        t0 = time.perf_counter()
        np.asarray(fns["einsum"](*vsets[0]))
        print(f"  sdpa/einsum compiled {time.perf_counter()-t0:.1f}s",
              flush=True)
        for r in range(ROUNDS):
            line = " ".join(
                f"{name} {slope(fn, vsets)*1e3:.2f}ms"
                for name, fn in fns.items()
            )
            print(f"sdpa round {r}: {line}", flush=True)

    if "layer" in cases:
        x0 = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
        vsets = variants_for(x0)

        base = jax.jit(lambda x: jnp.sum(tfm.encoder_layer_forward(
            layer0, x, mask_add, H)))
        t0 = time.perf_counter()
        np.asarray(base(*vsets[0]))
        print(f"  layer/xla compiled {time.perf_counter()-t0:.1f}s",
              flush=True)
        fns = {"xla": base}
        for g in (4, 8):
            def f(x, g=g):
                os.environ["SLIMT_TPU_ENC_LAYER_BLOCK"] = str(g)
                return jnp.sum(encoder_layer_fused(x, layer0, mask_add, H))

            os.environ["SLIMT_TPU_ENC_LAYER_BLOCK"] = str(g)
            fns[f"fused_g{g}"] = jax.jit(f)
            t0 = time.perf_counter()
            np.asarray(fns[f"fused_g{g}"](*vsets[0]))
            print(f"  layer/fused_g{g} compiled {time.perf_counter()-t0:.1f}s",
                  flush=True)
        os.environ.pop("SLIMT_TPU_ENC_LAYER_BLOCK", None)
        for r in range(ROUNDS):
            line = " ".join(
                f"{name} {slope(fn, vsets)*1e3:.2f}ms"
                for name, fn in fns.items()
            )
            print(f"layer round {r}: {line}", flush=True)

    if "enc" in cases:
        idx0 = jnp.asarray(rng.integers(3, VOCAB, (B, T)).astype(np.int32))
        idx_sets = [
            (jnp.asarray(rng.integers(3, VOCAB, (B, T)).astype(np.int32)),)
            for _ in range(4)
        ]

        def base_enc(i):
            x = tfm.transform_embedding(tfm.embed(stacked, i))
            return jnp.sum(tfm.encoder_forward(stacked, x, mask_add, H))

        def fused_enc(i):
            x = tfm.transform_embedding(tfm.embed(stacked, i))

            def step(x, layer):
                return encoder_layer_fused(x, layer, mask_add, H), None

            out, _ = jax.lax.scan(step, x, stacked["encoder"])
            return jnp.sum(out)

        fns = {"xla": jax.jit(base_enc), "fused": jax.jit(fused_enc)}
        for name, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(*idx_sets[0]))
            print(f"  enc/{name} compiled {time.perf_counter()-t0:.1f}s",
                  flush=True)
        for r in range(ROUNDS):
            line = " ".join(
                f"{name} {slope(fn, idx_sets)*1e3:.2f}ms"
                for name, fn in fns.items()
            )
            print(f"enc round {r}: {line}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
