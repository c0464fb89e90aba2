"""Configuration structs for models and the translation service.

Mirrors the reference's plain-struct config surface:
- service `Config` (reference slimt/Frontend.hh:21-39)
- `Model::Config` (reference slimt/Model.hh:33-51)
- presets tiny/base/nano (reference slimt/Model.cc:206-245)
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class ModelConfig:
    """Architecture hyperparameters of a Bergamot student model.

    Defaults are the `tiny` preset (6 encoder layers, 2 SSRU decoder
    layers, 8 heads; reference slimt/Model.cc:206-218).
    """

    encoder_layers: int = 6
    decoder_layers: int = 2
    feed_forward_depth: int = 2
    num_heads: int = 8
    split_mode: str = "sentence"

    # TPU-specific execution knobs (no reference equivalent).
    # Quantized-matmul provider: "pallas" (fused int8 kernels), "xla_int8"
    # (lax.dot_general int8), "f32" (dequantized float reference path),
    # or "fused_step" (whole decode step — all layers + shortlisted
    # logits + argmax — as ONE Pallas program; for the small-batch
    # latency regime on a single device, do not combine with mesh
    # sharding). Mirrors the reference's compile-time QMM provider
    # switch (QMM.cc:3-34).
    qmm_provider: str = "xla_int8"
    # The reference decoder adds the position-0 sinusoid at *every* decode
    # step (Transformer.cc:160 calls transform_embedding with start=0).
    # Keep True for output parity with the reference; False restores
    # marian's per-position signal.
    decoder_position_zero: bool = True
    # Cross-attention K/V cache dtype for the decode loop. The cache
    # is re-read from HBM every step, the dominant per-step cost at
    # serving batch. Reduced-precision dtypes also switch the cache to
    # the unpadded joined [B,T,E] layout with MXU-GEMM attention
    # (models/transformer._decode_attention_joined). The default
    # "int16" is the PARITY-PROVEN serving config: per-row (b,t)
    # scales at 2 bytes/elem — the same HBM traffic as fp16/bf16
    # (~1.6x decode over the f32 split layout) with a uniform absolute
    # error of rowmax/65534 (16x finer than fp16, ~256x finer than
    # bf16); converts to f32 inside the attention matmul operand read.
    # Measured vs the compiled reference binary on the adversarial
    # crosscheck serving sweep (crosscheck/serving_agreement.json,
    # 2048 sentences/config; the exact path's own ceiling there is
    # 99.92%): int16 99.7% tokens; fp16 99.0%; bf16 96.8%; int8
    # per-row 93.8% — all remain explicit opt-ins (int8 is ~15%
    # faster at B=2048 where its agreement suffices). "float32"
    # restores exact reference numerics (and the split-layout cache).
    kv_cache_dtype: str = "int16"
    # Greedy-sampling argmax implementation. "packed_int" (DEFAULT
    # since round 5) = one plain int32 max-reduce over INTEGER packed
    # keys in the accumulator domain: the projection's per-tensor
    # scale is a positive scalar, so the bias folds to i32 accumulator
    # units once (loop-invariant) and the whole float epilogue
    # (i32->f32 convert, scale, bias add, fp16 round, bitcast,
    # sortable map) collapses to an integer add + shift
    # (models/transformer.packed_int_argmax; first-index tie-break,
    # invariant-certified in tests/test_packed_argmax.py). MEASURED
    # (round 5): +10-19% full-vocab headline over packed_fp16
    # (2.48-2.49M vs 2.10-2.27M tok/s, 3 interleaved same-process
    # rounds; parity at shortlist widths where logits are small), AND
    # higher agreement vs the reference binary — packed_int alone
    # matches the exact path (99.92% tokens); the full default stack
    # (int16 KV + packed_int + alignment-free) measures 99.69% tokens
    # / 99.1% sentence-exact (= the int16 KV's own ceiling; the
    # previous packed_fp16 stack was 99.57%). The compared-value
    # truncation (2^shift accumulator units) and half-unit bias
    # rounding are the only numerics deltas; on the repeated-near-tie
    # STRESS cell it scores 98.42% vs the exact path's own 98.95%
    # (same as packed_fp16 there). "packed_fp16"/"packed_bf16" = the
    # 16-bit-float packed keys (99.79%/98.56% alone); "exact" = f32
    # variadic argmax (reference numerics; also the fallback when the
    # provider is f32, which has no integer accumulator).
    argmax_method: str = "packed_int"
    # Blockwise Pallas encoder self-attention: O(T·block) memory,
    # lifts the reference's hard 128-token wrap constraint for long
    # inputs. "auto" (DEFAULT) picks per T bucket from the measured
    # crossover (bench.py longctx / PERFORMANCE.md): einsum SDPA up to
    # T=768 (blockwise is up to ~52% slower in the wrap regime),
    # blockwise beyond (einsum is slower at T≥1024 and OOM-class
    # infeasible at T≥2048 — [B,H,T,T] f32 scores). True/False force
    # one path regardless of T.
    flash_attention: "str | bool" = "auto"
    # Fused encoder SDPA for the WRAP-LENGTH regime (T <= 256;
    # ops/attention.fused_sdpa_joined): one Pallas program per batch
    # block computes all heads' attention on joined [B,T,E] operands —
    # scores never touch HBM and there is no [*,H,T,D] lane-padded
    # split. Targets the measured 16 ms scores-path share of the
    # ~45 ms encoder at B=2048xT=64 (scripts/ubench_encoder.py).
    # Numerics: identical math to the einsum path (per-head selection
    # by exact-zero lane masking adds no error terms; f32 throughout)
    # — deviates only in dot-accumulation order (ulp-level;
    # tests/test_fused_sdpa.py pins the class). "off" =
    # einsum SDPA; "on" = force (errors under mesh sharding); "auto"
    # = on for TPU backends on an unsharded single-process model at
    # supported shapes.
    encoder_sdpa: str = "off"
    # WHOLE-encoder-layer Pallas kernel (ops/encoder_layer_pallas):
    # QKVO int8 affines + multi-head SDPA + residual/post-LN + FFN
    # pair in ONE program per batch block — the only HBM activation
    # traffic for a layer is x in/out, and the weights' block index
    # never changes so Pallas loads them once for the whole grid.
    # Supersedes encoder_sdpa when active. Numerics: int8 affines are
    # BIT-exact (i32 accumulation is associative); LN/softmax are the
    # same f32 formulas as the XLA path, differing only in
    # accumulation order — the same measured exact-class as
    # enc_sdpa=fused (crosscheck serving sweep). MEASURED (round-5
    # session 2026-08-21, same-process slope A/B,
    # scripts/ubench_encoder_fused.py): tiny11 B=2048xT=64 full
    # 6-layer encoder 20.3-20.6 ms vs 37.2-37.5 XLA (1.8x); BASE
    # shapes E=512/ffn=2048 B=1024xT=64: layer 2.5 vs 6.2 ms, full
    # encoder 16.1-17.5 vs 38.8-39.8 (2.3x), and T=128 wrap-regime at
    # base shapes compiles within VMEM and wins (2.3-3.3 vs 3.7-4.6).
    # Headline decode 1.88M -> 2.25M tok/s (+20%) — the first
    # Pallas-vs-XLA WIN outside the B=1 latency regime (the encoder
    # is a once-per-batch call, so the per-step pallas boundary that
    # sank the six in-loop kernels does not apply). "auto" (DEFAULT:
    # on for TPU backends at wrap-regime shapes, exact-f32 encoder,
    # int8 providers — incl. pure-DP meshes, where it runs under
    # shard_map on the "data" axis with replicated weights,
    # bit-identical per row) | "on" (force; errors on TP/seq-sharded
    # or multiprocess models) | "off" (XLA encoder).
    encoder_layer_kernel: str = "auto"
    # Pallas decode-attention kernel for the int16 joined KV cache
    # (ops/decode_attn_pallas): keeps everything but the K/V streams
    # in VMEM, to remove the [B,E,H] selector-operand buffer the XLA
    # formulation materializes. MEASURED AND REJECTED as the default
    # (2026-08-20, same-process interleaved headline A/B at
    # B=2048/int16: kernel 1.67-1.69M vs XLA 1.81-1.85M tok/s, -8%
    # both rounds): inside the decode while_loop the per-step
    # pallas_call boundary (launch + lost fusion with the surrounding
    # LN/residual/O-affine) costs more than the saved HBM traffic —
    # the third Pallas-vs-XLA loss in this engine (fused layer blocks,
    # fused_step at serving batch); XLA's in-loop fusion is strong on
    # these shapes. Kept as a tested variant: "off" (default) | "on" |
    # "auto" (= on for TPU backends on an unsharded single-process
    # model — alignment-free int16 requests only; parity:
    # tests/test_decode_attn_pallas.py).
    attn_kernel: str = "off"
    # LOSSLESS result-transport compaction: the decode jit returns
    # tokens as uint16 and the valid mask bit-packed (2.35x fewer
    # result bytes per batch over the host link; models/decode.
    # compact_result / unpack_compact). Bit-exact — a transport
    # encoding, not a numerics knob; auto-disabled when
    # vocab_size > 65535 (marian tiny/base vocabs are 32k).
    compact_transfer: bool = True
    # Reduced-precision ENCODER activations ("float16"/"bfloat16"):
    # the residual stream and SDPA operands between encoder blocks
    # ride this dtype (LN statistics and matmul accumulation stay
    # f32; the int8 affine inputs round through it before
    # quantization). STRICTLY DOMINATED on TPU since the whole-layer
    # kernel became the default (round-5 same-process A/B at B=2048:
    # kernel-f32 2.488-2.501M vs fp16-XLA 2.293-2.306M vs f32-XLA
    # 2.032-2.035M tok/s — the two levers are mutually exclusive
    # because the kernel requires exact-f32 activations, and the
    # kernel is ~8% FASTER than fp16 at exact numerics). MEASURED
    # AGREEMENT (adversarial crosscheck serving sweep): float16 92.8%
    # / bfloat16 92.5% token agreement — int8-CLASS (any reduced
    # dtype upstream of an int8 activation quantize flips rint() by
    # ±1 LSB on a few % of entries; six cascaded layers amplify it).
    # Only meaningful where the kernel is unavailable (TP/seq-sharded
    # meshes, multiprocess, non-TPU backends). None = exact f32
    # encoder (bit-identical reference numerics).
    encoder_dtype: "str | None" = None


@dataclasses.dataclass
class Config:
    """Service configuration (reference slimt/Frontend.hh:21-39)."""

    max_words: int = 1024  # max padded tokens per device batch
    cache_size: int = 1024  # translation cache entries; 0 disables
    workers: int = 1  # async worker threads
    tgt_length_limit_factor: float = 1.5  # max target len / source len
    wrap_length: int = 128  # hard wrap for long sentences (tokens)
    html: bool = False
    # Async batching window (seconds): how long a worker waits for
    # more segments once work exists. 0 = reference behavior (pack
    # immediately); a few ms greatly improves TPU batch occupancy
    # under streaming request loads.
    batch_latency: float = 0.0
    # Blocking-service completion pool: host-side response assembly
    # (detokenize + annotations) runs on this many executor threads,
    # overlapped with the device waits for later batches. 0 = strict
    # reference behavior (complete serially on the caller thread).
    completion_threads: int = 4
    # Bulk path (Blocking.translate_bulk) ingest chunk size in lines:
    # each chunk's device batches dispatch before the next chunk
    # tokenizes, hiding device compute behind host ingest. 0 = one
    # chunk (ingest everything first).
    bulk_chunk_lines: int = 2048
    # Bulk-path ingest worker processes: chunks tokenize in this many
    # spawned processes (each with its own TextProcessor), lifting the
    # GIL's one-core cap on host ingest. 0 = in-process ingest (the
    # right choice on few-core hosts — on the 4-core bench machine the
    # pool measured 10% slower because main-thread unpickling replaced
    # already-overlapped tokenization; worth enabling on many-core
    # serving hosts). The pool starts lazily on first multi-chunk
    # translate_bulk call and lives for the service's lifetime.
    ingest_processes: int = 0
    # Blocking.translate routes through the bulk lane by default: for
    # a known list of lines it produces byte-identical Responses to
    # the per-request path (differential-tested: annotations,
    # alignments, cache interplay, HTML) at ~2.7x the host
    # throughput. False pins the reference-style Request/Batcher
    # exhaust loop (slimt/Frontend.cc:91-145) for every call.
    prefer_bulk: bool = True
    # Raise Python's gen-0 garbage-collection threshold to this many
    # allocations while a service exists (0 = leave gc untouched).
    # JAX runs an XLA collect_garbage callback on EVERY gc pass; at
    # the default gen-0 threshold (700 allocations) a host-heavy
    # serving loop pays ~0.8 ms hundreds of times per second —
    # measured +28-44% end-to-end host throughput from this alone.
    # Only ever raises the threshold, never lowers it.
    gc_gen0_threshold: int = 50_000


class preset:
    """Model presets (reference slimt/Model.cc:206-245)."""

    @staticmethod
    def tiny() -> ModelConfig:
        return ModelConfig(encoder_layers=6, decoder_layers=2)

    @staticmethod
    def base() -> ModelConfig:
        return ModelConfig(encoder_layers=6, decoder_layers=2)

    @staticmethod
    def nano() -> ModelConfig:
        return ModelConfig(encoder_layers=4, decoder_layers=2)
