"""Ablation microbench: where does the decode step's time go? (real TPU)

Runs the serving-shape decode loop (tiny11, B from UB_B env, T=64)
with pieces of the step ablated, and reports the per-step slope
between two max_steps values (cancels encoder/dispatch/compile fixed
costs). Protocol per memory/axon-tpu-measurement: time through
np.asarray, distinct inputs per call.

Ablations:
  full       — the real translate_batch (kv dtype from UB_KV, default bfloat16)
  no_attn    — cross-attention replaced by identity (isolates SSRU+FFN+logits)
  no_logits  — output projection replaced by a 32-wide slice matmul
  no_ffn     — decoder FFN blocks skipped
  bf16_argmax — argmax over bf16-cast logits (measured: only ~4% of the
               step at B=1024 — rejected; logits are argmax-consumed
               in-fusion, not written to HBM at f32)
  no_align   — the [B, max_steps, T_src] alignment-buffer update in the
               while_loop body skipped (isolates its carry/write cost;
               patches jax.lax.dynamic_update_slice, which in the decode
               body is used ONLY by the align write — tokens/valid go
               through dynamic_update_slice_in_dim's internal path)
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slimt_tpu.config import ModelConfig
from slimt_tpu.io import load_items
from slimt_tpu.io.loader import load_weights, stack_layers
from slimt_tpu.models import transformer as tfm
from slimt_tpu.models.decode import translate_batch
from slimt_tpu.io.synthetic import synthetic_model_bytes

B = int(os.environ.get("UB_B", 1024))
KV = os.environ.get("UB_KV", "bfloat16")
ALIGN = os.environ.get("UB_ALIGN", "0") == "1"  # serving default: off
ATTN_KERNEL = os.environ.get("UB_ATTN_KERNEL", "0") == "1"
ARGMAX = os.environ.get("UB_ARGMAX", "packed_fp16")
T = 64
STEPS_LO, STEPS_HI = 24, 96


def patched(name):
    """Context-manager-free monkey patches for one ablation.

    "skeleton" stacks every compute ablation at once (attention,
    logits, FFN, SSRU, embed all stubbed): what remains is the
    while_loop itself — carry threading, token/valid writes, EOS
    bookkeeping, the per-iteration fusion barrier. Its slope bounds
    the TRUE loop overhead; the decomposition's "other" bucket is
    misattributed fused work to the extent it exceeds this.
    """
    names = (
        {"no_attn", "no_logits", "no_ffn", "no_ssru", "no_embed"}
        if name == "skeleton"
        else {name}
    )
    orig_attn = tfm.attention_forward
    orig_logits = tfm.output_logits
    orig_ffn = tfm._ffn_block
    if "no_attn" in names:
        def fake_attn(att, q_in, k_in, v_in, mask_add, num_heads,
                      provider=None, kv_cache=None, flash=False,
                      attn_kernel=False, **kw):
            if kv_cache is not None:  # decode cross-attention only
                b = q_in.shape[0]
                tk = mask_add.shape[-1]
                attn = jnp.zeros((b, num_heads, 1, tk), jnp.float32)
                return q_in, attn
            return orig_attn(att, q_in, k_in, v_in, mask_add, num_heads,
                             provider, kv_cache, flash, attn_kernel, **kw)
        tfm.attention_forward = fake_attn
    orig_out_argmax = tfm.output_argmax
    if "no_logits" in names:
        def fake_logits(params, x, provider=None, shortlist=None,
                        projection=None):
            w, b = projection if projection is not None else (
                params["emb"]["q"].T, params["out"]["b"])
            from slimt_tpu.ops import qmm
            return qmm.affine(x, w[:, :32], b[:32], params["out"]["aq"],
                              params["emb"]["scale"], provider=provider)
        tfm.output_logits = fake_logits

        # packed_int computes the i32 accumulator directly (never via
        # output_logits) — narrow its projection the same way, or the
        # ablation removes nothing under the round-5 default.
        def narrow_argmax(params, x, provider=None, projection=None,
                          method="exact"):
            if projection is not None:
                w, b = projection
                projection = (w[:, :32], b[:32])
            return orig_out_argmax(
                params, x, provider, projection, method=method
            )
        tfm.output_argmax = narrow_argmax
    if "no_ffn" in names:
        tfm._ffn_block = lambda layer, x, provider, **kw: x
    orig_ssru = tfm.ssru_forward
    if "no_ssru" in names:
        tfm.ssru_forward = (
            lambda rnn, state, x, provider=None: (x, state)
        )
    orig_embed = tfm.embed
    if "no_embed" in names:
        # zeros_like(gather) lets XLA dead-code-eliminate the gather —
        # isolates the per-step [B,1,E] embedding-table lookup cost.
        def fake_embed(params, idx, dtype=None):
            return jnp.zeros_like(orig_embed(params, idx, dtype))

        tfm.embed = fake_embed
    orig_dus = jax.lax.dynamic_update_slice
    if "no_align" in names:
        jax.lax.dynamic_update_slice = lambda op, upd, idx: op
    if "bf16_argmax" in names:
        def bf16_argmax(params, x, provider=None, projection=None):
            logits = orig_logits(params, x, provider, None, projection)
            return jnp.argmax(
                logits.astype(jnp.bfloat16), axis=-1
            ).astype(jnp.int32)
        tfm.output_argmax = bf16_argmax
    return lambda: (
        setattr(tfm, "attention_forward", orig_attn),
        setattr(tfm, "output_logits", orig_logits),
        setattr(tfm, "_ffn_block", orig_ffn),
        setattr(tfm, "output_argmax", orig_out_argmax),
        setattr(tfm, "ssru_forward", orig_ssru),
        setattr(tfm, "embed", orig_embed),
        setattr(jax.lax, "dynamic_update_slice", orig_dus),
    )


_SEED = [0]  # process-global: NO dispatch is ever repeated — the


# tunnel dedupes identical (computation, input) dispatches, which
# made repeated measure() calls in one process report fake-fast
# numbers (477 -> 218 us/step observed for back-to-back identical
# skeleton runs).


def measure(params, config, name):
    # "name@K" runs the ablation with loop_unroll=K (e.g. full@2).
    label, unroll = name, 1
    if "@" in name:
        name, unroll = name.split("@")
        unroll = int(unroll)
    restore = patched(name)
    try:
        mask_j = jnp.ones((B, T), jnp.float32)

        def timed(steps):
            fn = jax.jit(lambda p, i, m: translate_batch(
                p, i, m, eos_id=-1, max_steps=steps,
                num_heads=config.num_heads, provider=config.qmm_provider,
                kv_dtype=KV, with_alignment=ALIGN, argmax_method=ARGMAX,
                loop_unroll=unroll, attn_kernel=ATTN_KERNEL))

            def fresh(k):
                _SEED[0] += 1
                r = np.random.default_rng(_SEED[0])
                return [
                    jnp.asarray(r.integers(3, 32000, (B, T)).astype(np.int32))
                    for _ in range(k)
                ]

            np.asarray(fn(params, fresh(1)[0], mask_j).tokens)
            best = 1e9
            for _ in range(3):
                variants = fresh(4)
                t0 = time.perf_counter()
                outs = [fn(params, i, mask_j) for i in variants]
                for o in outs:
                    np.asarray(o.tokens)
                best = min(best, (time.perf_counter() - t0) / 4)
            return best

        lo, hi = timed(STEPS_LO), timed(STEPS_HI)
        per_step = (hi - lo) / (STEPS_HI - STEPS_LO) * 1e6
        print(f"{label:10s} per-step {per_step:7.1f} us", flush=True)
        return per_step
    finally:
        restore()


def main():
    print(f"devices: {jax.devices()}  B={B} kv={KV}")
    config = ModelConfig(encoder_layers=6, decoder_layers=2)
    items = load_items(synthetic_model_bytes(
        config=config, vocab_size=32000, emb_dim=256, ffn_dim=1536, seed=0))
    params = jax.device_put(stack_layers(load_weights(items, config)))
    which = sys.argv[1:] or ["full", "no_attn", "no_logits", "no_ffn"]
    for name in which:
        measure(params, config, name)


if __name__ == "__main__":
    main()
