"""Microbench: decode-step cross-attention formulations (real TPU).

The decode loop's per-step cost is dominated by re-reading the KV
cache from HBM (PERFORMANCE.md). The current formulation keeps K/V as
[B, H, T, D] with D=32 in the minor (lane) dimension — which the TPU
tiled layout pads to 128 lanes, inflating both HBM footprint and VPU
work up to 4x. Candidate fix (sketched in ops/decoder_step_pallas.py):
keep K/V in [B, T, E] layout (E=256 = 2 full lane tiles, no padding)
and reduce per-head with a block-diagonal selector matrix.

Variants (measured v5e, per-layer-step at B=1024 / B=512):
  a_vpu   — pre-rewrite: [B,H,T,D] bf16, broadcast-mul+reduce (148/72µs)
  b_sel   — [B,T,E] bf16, selector-matrix einsums (—/63µs)
  c_gemm  — [B,T,E] bf16, batched MXU GEMMs + diag extract (99/52µs)
            ← shipped as transformer._decode_attention_joined
  d_gemm_i8 — [B,T,E] int8, MXU int8×int8 (52/35µs) ← kv_dtype="int8"
  e_gemm_i8_dynaq — d + dynamic per-step aq: no measurable cost
  f_hybrid — b's score path + c's V path: ≈ c_gemm (97.6 vs 99.1µs at
            B=1024), i.e. the batched [B,E,H] q2 operand is already
            fused by XLA; bf16 attention sits ~1.2× over its 82µs HBM
            floor — exhausted as a lever

Protocol (memory: axon-tpu-measurement): chain iterations serially on
device via lax.fori_loop with a feedback carry (defeats dispatch dedup
and amortizes the ~27ms tunnel RTT); time through np.asarray; report
the slope between iters=N_LO and iters=N_HI to cancel fixed overhead.
"""

import math
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

B, T, E, H = int(os.environ.get("UB_B", 512)), 64, 256, 8
D = E // H
SCALE = 1.0 / math.sqrt(D)
N_LO, N_HI = 32, 512


def selector(dtype):
    s = np.zeros((E, H), np.float32)
    for h in range(H):
        s[h * D : (h + 1) * D, h] = 1.0
    return jnp.asarray(s, dtype)


def a_vpu(q, k, v, mask):
    # q [B,E] f32; k/v [B,H,T,D] bf16; mask [B,1,1,T]
    qb = q.reshape(B, H, D).astype(k.dtype)
    scores = (k * qb[:, :, None, :]).astype(jnp.float32).sum(-1) * SCALE
    scores = scores + mask[:, :, 0, :]
    attn = jax.nn.softmax(scores, axis=-1)
    out = (v.astype(jnp.float32) * attn[..., None]).sum(2)  # [B,H,D]
    return out.reshape(B, E)


def b_sel(q, k, v, mask):
    # k/v [B,T,E] bf16
    s = selector(k.dtype)
    prod = k * q[:, None, :].astype(k.dtype)  # [B,T,E]
    scores = (
        jnp.einsum("bte,eh->bht", prod, s, preferred_element_type=jnp.float32)
        * SCALE
        + mask[:, :, 0, :]
    )
    attn = jax.nn.softmax(scores, axis=-1)  # [B,H,T]
    a2 = jnp.einsum("bht,eh->bte", attn.astype(k.dtype), s)
    out = (a2 * v).astype(jnp.float32).sum(1)  # [B,E]
    return out


def c_gemm(q, k, v, mask):
    # k/v [B,T,E] bf16; scores/out via batched MXU GEMMs
    s = selector(k.dtype)
    q2 = q[:, :, None].astype(k.dtype) * s[None]  # [B,E,H]
    scores = (
        jnp.einsum("bte,beh->bht", k, q2, preferred_element_type=jnp.float32)
        * SCALE
        + mask[:, :, 0, :]
    )
    attn = jax.nn.softmax(scores, axis=-1)  # [B,H,T]
    res = jnp.einsum(
        "bht,bte->bhe", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )  # [B,H,E]
    out = (res * s.T[None].astype(jnp.float32)).sum(1)  # [B,E]
    return out


def d_gemm_i8(q, k, v, mask):
    # k/v [B,T,E] int8 with fixed per-tensor scales (set in run());
    # both attention GEMMs run int8 x int8 on the MXU.
    s = selector(jnp.bfloat16)
    kq, vq, aq = d_gemm_i8.kq, d_gemm_i8.vq, 127.0 / 4.0
    q2 = jnp.clip(
        jnp.rint(q[:, :, None] * s[None].astype(jnp.float32) * aq),
        -127, 127,
    ).astype(jnp.int8)  # [B,E,H]
    scores = jnp.einsum(
        "bte,beh->bht", k, q2, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (SCALE / (kq * aq))
    scores = scores + mask[:, :, 0, :]
    attn = jax.nn.softmax(scores, axis=-1)  # [B,H,T]
    attn_q = jnp.rint(attn * 127.0).astype(jnp.int8)
    res = jnp.einsum(
        "bht,bte->bhe", attn_q, v, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (1.0 / (127.0 * vq))
    out = (res * s.T[None].astype(jnp.float32)).sum(1)
    return out


def e_gemm_i8_dynaq(q, k, v, mask):
    # d_gemm_i8 but with the integrated path's dynamic per-step aq
    # (full [B,E] -> scalar reduce in the serial chain).
    s = selector(jnp.bfloat16)
    kq, vq = d_gemm_i8.kq, d_gemm_i8.vq
    aq = 127.0 / jnp.maximum(jnp.max(jnp.abs(q)), 1e-6)
    q_q = jnp.clip(jnp.rint(q * aq), -127.0, 127.0).astype(jnp.int8)
    sel_i8 = selector(jnp.float32).astype(jnp.int8)
    q2 = q_q[:, :, None] * sel_i8[None]
    scores = jnp.einsum(
        "bte,beh->bht", k, q2, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (SCALE / (kq * aq))
    scores = scores + mask[:, :, 0, :]
    attn = jax.nn.softmax(scores, axis=-1)
    attn_q = jnp.rint(attn * 127.0).astype(jnp.int8)
    res = jnp.einsum(
        "bht,bte->bhe", attn_q, v, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (1.0 / (127.0 * vq))
    out = (res * selector(jnp.float32).T[None]).sum(1)
    return out


def g_gemm_i8_row(q, k, v, mask):
    # d_gemm_i8 with PER-ROW (per b,t) K/V scales: the K dequant folds
    # into the existing scores elementwise (broadcast [B,1,T]), the V
    # per-row scale folds into attn before its quantization, with a
    # dynamic per-(b,h) attn scale. Candidate numerics fix to make
    # int8 KV the default (per-tensor scales measured 84-94% token
    # agreement vs f32; bf16 is 92-98%).
    s = selector(jnp.bfloat16)
    kqi, vqi = g_gemm_i8_row.kqi, g_gemm_i8_row.vqi  # [B,T] inverse scales
    aq = 127.0 / jnp.maximum(jnp.max(jnp.abs(q)), 1e-6)
    q_q = jnp.clip(jnp.rint(q * aq), -127.0, 127.0).astype(jnp.int8)
    sel_i8 = selector(jnp.float32).astype(jnp.int8)
    q2 = q_q[:, :, None] * sel_i8[None]
    scores = jnp.einsum(
        "bte,beh->bht", k, q2, preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (SCALE / aq) * kqi[:, None, :]
    scores = scores + mask[:, :, 0, :]
    attn = jax.nn.softmax(scores, axis=-1)  # [B,H,T]
    attn_v = attn * vqi[:, None, :]  # fold per-row V dequant
    s_a = 127.0 / jnp.maximum(
        jnp.max(attn_v, axis=-1, keepdims=True), 1e-9
    )  # [B,H,1]
    attn_q = jnp.rint(attn_v * s_a).astype(jnp.int8)
    res = jnp.einsum(
        "bht,bte->bhe", attn_q, v, preferred_element_type=jnp.int32
    ).astype(jnp.float32) / s_a
    out = (res * selector(jnp.float32).T[None]).sum(1)
    return out


def f_hybrid(q, k, v, mask):
    # b_sel's score path (elementwise K*q fused into a dot against the
    # CONSTANT [E,H] selector — no batched [B,E,H] operand that pads
    # H=8 to 128 lanes) + c_gemm's V path (batched MXU GEMM).
    s = selector(k.dtype)
    prod = k * q[:, None, :].astype(k.dtype)  # [B,T,E], fusable
    scores = (
        jnp.einsum("bte,eh->bht", prod, s, preferred_element_type=jnp.float32)
        * SCALE
        + mask[:, :, 0, :]
    )
    attn = jax.nn.softmax(scores, axis=-1)  # [B,H,T]
    res = jnp.einsum(
        "bht,bte->bhe", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    out = (res * selector(jnp.float32).T[None]).sum(1)
    return out


def run(name, fn, kv_layout):
    rng = np.random.default_rng(0)
    if kv_layout == "bhtd":
        k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    elif kv_layout == "bte_i8":
        kf = rng.standard_normal((B, T, E)).astype(np.float32)
        vf = rng.standard_normal((B, T, E)).astype(np.float32)
        kq = 127.0 / np.abs(kf).max()
        vq = 127.0 / np.abs(vf).max()
        d_gemm_i8.kq, d_gemm_i8.vq = float(kq), float(vq)
        k = jnp.asarray(np.clip(np.rint(kf * kq), -127, 127), jnp.int8)
        v = jnp.asarray(np.clip(np.rint(vf * vq), -127, 127), jnp.int8)
    elif kv_layout == "bte_i8_row":
        kf = rng.standard_normal((B, T, E)).astype(np.float32)
        vf = rng.standard_normal((B, T, E)).astype(np.float32)
        kqr = 127.0 / np.maximum(np.abs(kf).max(-1), 1e-6)  # [B,T]
        vqr = 127.0 / np.maximum(np.abs(vf).max(-1), 1e-6)
        g_gemm_i8_row.kqi = jnp.asarray(1.0 / kqr, jnp.float32)
        g_gemm_i8_row.vqi = jnp.asarray(1.0 / vqr, jnp.float32)
        k = jnp.asarray(
            np.clip(np.rint(kf * kqr[..., None]), -127, 127), jnp.int8
        )
        v = jnp.asarray(
            np.clip(np.rint(vf * vqr[..., None]), -127, 127), jnp.int8
        )
    else:
        k = jnp.asarray(rng.standard_normal((B, T, E)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, T, E)), jnp.bfloat16)
    mask = jnp.zeros((B, 1, 1, T), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((B, E)), jnp.float32)

    def loop(iters):
        def body(i, q):
            out = fn(q, k, v, mask)
            return q * 0.999 + out * 1e-3  # serial feedback, bounded

        return jax.jit(
            lambda q: jax.lax.fori_loop(0, iters, body, q)
        )

    lo, hi = loop(N_LO), loop(N_HI)
    np.asarray(lo(q0)), np.asarray(hi(q0))  # compile both
    ts = {N_LO: [], N_HI: []}
    for rep in range(4):
        for n, f in ((N_LO, lo), (N_HI, hi)):
            qv = q0 + rep * 0.01  # varied inputs (dedup trap)
            t0 = time.perf_counter()
            np.asarray(f(qv))
            ts[n].append(time.perf_counter() - t0)
    lo_s, hi_s = min(ts[N_LO]), min(ts[N_HI])
    per_step_us = (hi_s - lo_s) / (N_HI - N_LO) * 1e6
    print(
        f"{name:8s} per-step {per_step_us:8.1f} us   "
        f"(lo={lo_s*1e3:.1f}ms hi={hi_s*1e3:.1f}ms)"
    )
    return per_step_us


def main():
    print(f"devices: {jax.devices()}")
    which = sys.argv[1:] or ["a_vpu", "b_sel", "c_gemm", "d_gemm_i8"]
    table = {
        "a_vpu": (a_vpu, "bhtd"),
        "b_sel": (b_sel, "bte"),
        "c_gemm": (c_gemm, "bte"),
        "d_gemm_i8": (d_gemm_i8, "bte_i8"),
        "e_gemm_i8_dynaq": (e_gemm_i8_dynaq, "bte_i8"),
        "f_hybrid": (f_hybrid, "bte"),
        "g_gemm_i8_row": (g_gemm_i8_row, "bte_i8_row"),
    }
    hbm_floor_us = 2 * B * T * E * 2 / 819e9 * 1e6  # K+V bf16 once
    print(f"B={B} T={T} E={E} H={H}; K+V HBM floor ~{hbm_floor_us:.1f} us/layer-step")
    for name in which:
        fn, layout = table[name]
        run(name, fn, layout)


if __name__ == "__main__":
    main()
