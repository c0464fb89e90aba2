"""Logits-projection + argmax microbench (real TPU).

The device trace attributes ~197 us/step at B=2048 to XLA's fused
int8 projection + argmax (fusion over s8[256,32000] emitting only the
[B] max/index pair — logits never materialize), vs an ~85 us pure-MXU
int8 floor. This isolates the op outside the decode loop to see where
the gap lives and whether an alternative formulation beats it.

Variants (each timed by the two-point fori_loop slope — the loop body
runs the op K or 2K times on iteration-dependent inputs, so tunnel
RTT/dispatch cancel and dedup cannot collapse iterations):
  xla_argmax   — quantize(x) @ W_int8 -> argmax  (the production path)
  xla_dot      — bare lax.dot_general int8 -> int32 (no epilogue)
  xla_logits   — full affine epilogue, logits materialized, no argmax
  pallas       — ops.logits_argmax fused kernel
  pallas_qmm   — ops.qmm_pallas.affine + jnp.argmax

Usage: python scripts/ubench_logits.py [variants...]   (UB_B env, default 2048)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from slimt_tpu.ops import qmm

B = int(os.environ.get("UB_B", 2048))
E, V = 256, 32000
K_LO, K_HI = 32, 128


def slope_us(step_fn, w, b, aq, bq):
    """Per-op device time: fori_loop running `step_fn` K times, two-point
    slope over K. The carry perturbs x each iteration so ops cannot be
    collapsed; the result folds into a scalar that is fetched."""

    def run(k):
        @jax.jit
        def body(x0):
            def it(i, carry):
                x, acc = carry
                out = step_fn(x, w, b, aq, bq)
                # fold the result back into x so iterations are a chain
                # (no reordering/elision) with negligible extra work
                bump = (out.astype(jnp.float32).sum() % 1.0) * 1e-6
                return (x + bump, acc + bump)

            x, acc = jax.lax.fori_loop(0, k, it, (x0, jnp.float32(0.0)))
            return acc + x[0, 0]

        rng = np.random.default_rng(0)
        xs = [
            jnp.asarray(rng.standard_normal((B, E)).astype(np.float32))
            for _ in range(4)
        ]
        float(body(xs[0]))  # compile
        times = []
        for x in xs:
            t0 = time.perf_counter()
            float(body(x))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]

    lo, hi = run(K_LO), run(K_HI)
    return max(hi - lo, 0.0) / (K_HI - K_LO) * 1e6


def main():
    rng = np.random.default_rng(7)
    w = jnp.asarray(
        rng.integers(-127, 128, (E, V)).astype(np.int8)
    )
    b = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    aq = jnp.float32(41.3)
    bq = jnp.float32(17.9)

    def xla_argmax(x, w, b, aq, bq):
        logits = qmm.affine(x, w, b, aq, bq, provider="xla_int8")
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def xla_dot(x, w, b, aq, bq):
        x_q = qmm.quantize_activations(x, aq)
        return jax.lax.dot_general(
            x_q, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def xla_logits(x, w, b, aq, bq):
        return qmm.affine(x, w, b, aq, bq, provider="xla_int8")

    def pallas(x, w, b, aq, bq):
        from slimt_tpu.ops import logits_argmax

        return logits_argmax.argmax_affine(x, w, b, aq, bq)

    def pallas_qmm(x, w, b, aq, bq):
        from slimt_tpu.ops import qmm_pallas

        logits = qmm_pallas.affine(x, w, b, aq, bq)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def packed(x, w, b, aq, bq):
        # argmax as ONE plain int32 max-reduce over packed
        # (sortable-bf16 logit || reversed column) keys — the
        # production implementation (models/transformer.py).
        from slimt_tpu.models.transformer import packed_argmax_bf16

        logits = qmm.affine(x, w, b, aq, bq, provider="xla_int8")
        return packed_argmax_bf16(logits)

    variants = {
        "xla_argmax": xla_argmax,
        "xla_dot": xla_dot,
        "xla_logits": xla_logits,
        "pallas": pallas,
        "pallas_qmm": pallas_qmm,
        "packed": packed,
    }
    which = sys.argv[1:] or ["xla_argmax", "xla_dot", "xla_logits", "pallas"]
    flops = 2.0 * B * E * V
    print(f"devices: {jax.devices()}  B={B} E={E} V={V}")
    for name in which:
        us = slope_us(variants[name], w, b, aq, bq)
        tops = flops / (us * 1e-6) / 1e12 if us else 0.0
        print(f"{name:11s} {us:7.1f} us/op  ({tops:5.1f} TOP/s effective)")


if __name__ == "__main__":
    main()
