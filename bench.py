"""Benchmarks.

Default (driver) mode prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = measured tokens/sec/chip ÷ the 1e4 target from
BASELINE.md (the reference publishes no numbers of its own).

Modes (BASELINE.json configs):
    python bench.py            # headline: tiny11 INT8 batched decode
    python bench.py headline_shortlist  # device-level shortlisted decode
    python bench.py batch1     # tiny11 greedy batch=1 latency
    python bench.py shortlist  # shortlist through the full service
    python bench.py base       # base model (emb 512 / ffn 2048)
    python bench.py e2e        # full service pipeline (host + device)
    python bench.py devstep    # per-step device time, per-component
                               # ablation vs per-component rooflines
    python bench.py providers  # xla_int8 vs pallas vs f32
    python bench.py continuous # step-level continuous batching vs
                               # batch-at-a-time (online + offline)
    python bench.py latency    # open-loop Poisson serving latency
                               # (p50/p95/p99 vs offered load,
                               # batch_latency 0 vs 50 ms)

ONE declared numerics config across all modes (= ModelConfig defaults
= the parity table in crosscheck/serving_agreement.json): int16
per-row-scaled KV cache + packed_int argmax + alignment-free.
BENCH_KV / BENCH_ARGMAX / BENCH_ALIGN / BENCH_SHORTLIST override for
ablations.
"""

import json
import os
import sys
import time

import numpy as np

TARGET = 1e4  # tokens/sec/chip (BASELINE.md)

# KV-cache bytes/elem per dtype tag, for the HBM floor-bytes models —
# ONE copy (three bench modes consume it; a missed edit in a copied
# literal silently mis-sizes hbm_gbps/pct_peak for that mode).
KV_BYTES = {
    "int8": 1, "k8v16": 1.5, "k16v8": 1.5, "int16": 2,
    "float16": 2, "bfloat16": 2, "float32": 4,
}


def _model(vocab=32000, emb=256, ffn=1536, enc=6, dec=2, with_shortlist=False):
    from slimt_tpu.config import ModelConfig
    from slimt_tpu.io.shortlist import build_synthetic_shortlist
    from slimt_tpu.io.synthetic import synthetic_model_bytes
    from slimt_tpu.models.model import Model, Package
    from slimt_tpu.text import spm_proto
    from slimt_tpu.text.synthetic_vocab import DEFAULT_WORDS, build_spm_model

    config = ModelConfig(encoder_layers=enc, decoder_layers=dec)
    spm = build_spm_model(DEFAULT_WORDS, target_size=vocab)
    package = Package(
        model=synthetic_model_bytes(
            config=config, vocab_size=vocab, emb_dim=emb, ffn_dim=ffn, seed=0
        ),
        vocabulary=spm_proto.serialize_model(spm),
        shortlist=(
            build_synthetic_shortlist(vocab, best=20, frequent=100)
            if with_shortlist
            else None
        ),
    )
    return Model(config, package)


def _default_enc_dtype():
    """The service default (ModelConfig.encoder_dtype) so every bench
    mode runs THE declared numerics config unless BENCH_ENC_DTYPE
    overrides for an ablation."""
    from slimt_tpu.config import ModelConfig

    return ModelConfig.encoder_dtype


def _make_shortlist(vocab, width, rng):
    """Static sorted unique shortlist of `width` target ids — the
    device-side shape of the reference's flagship operating mode
    (Shortlist.cc:115-175: ~frequent+best*src_len candidates, padded;
    the engine buckets widths to multiples of 1024)."""
    import jax.numpy as jnp

    ids = np.sort(rng.choice(vocab, size=width, replace=False))
    return jnp.asarray(ids.astype(np.int32))


def _decode_bench(
    batch=64, seq=64, vocab=32000, emb=256, ffn=1536, enc=6, dec=2,
    provider=None, iters=5, metric="decode_tokens_per_sec_per_chip_tiny11_int8",
    kv=None, shortlist_width=0,
):
    import jax
    import jax.numpy as jnp

    from slimt_tpu.config import ModelConfig
    from slimt_tpu.io import load_items
    from slimt_tpu.io.loader import load_weights, stack_layers
    from slimt_tpu.io.synthetic import synthetic_model_bytes
    from slimt_tpu.models.decode import translate_batch

    config = ModelConfig(encoder_layers=enc, decoder_layers=dec)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=vocab, emb_dim=emb, ffn_dim=ffn, seed=0
        )
    )
    # ONE declared numerics config across every mode (BENCH headline =
    # service default = parity table): int16 per-row-scaled KV cache +
    # packed_int argmax + alignment-free — see
    # crosscheck/serving_agreement.json (config
    # "packedint+int16+noalign") for the measured token agreement vs
    # the compiled reference binary. BENCH_KV / BENCH_ARGMAX /
    # BENCH_ALIGN override for ablations (e.g. BENCH_KV=int8: ~15%
    # faster at B=2048 with looser agreement).
    kv = kv or os.environ.get("BENCH_KV", "int16")
    with_alignment = os.environ.get("BENCH_ALIGN") == "1"
    argmax_method = os.environ.get("BENCH_ARGMAX", "packed_int")
    # Reduced-precision encoder activations (ModelConfig.encoder_dtype
    # default); BENCH_ENC_DTYPE=float32 ablates the exact f32 encoder.
    enc_dtype = os.environ.get("BENCH_ENC_DTYPE", _default_enc_dtype())
    if enc_dtype in ("", "float32", "none"):
        enc_dtype = None
    # Decoder form matches the service's dtype-aware choice
    # (models/model.py): stacked under int8 KV, unrolled otherwise
    # (same-process A/B 2026-08-20: int16 829 stacked vs 755 unrolled;
    # int8 602 stacked vs 638 unrolled, µs/step at B=2048).
    # BENCH_STACK_DEC=1/0 forces it for ablations.
    stack_env = os.environ.get("BENCH_STACK_DEC")
    stack_dec = (kv == "int8") if stack_env is None else stack_env == "1"
    params = jax.device_put(stack_layers(
        load_weights(items, config), decoder=stack_dec,
    ))
    # BENCH_PROVIDER overrides the default (e.g. fused_step for the
    # batch1 latency config); an explicit provider argument (the
    # `providers` comparison mode) still wins.
    provider = provider or os.environ.get("BENCH_PROVIDER") or config.qmm_provider

    rng = np.random.default_rng(0)
    indices = rng.integers(3, vocab, (batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.float32)
    max_steps = int(1.5 * seq)
    shortlist_width = shortlist_width or int(
        os.environ.get("BENCH_SHORTLIST", 0)
    )
    sl = (
        _make_shortlist(vocab, shortlist_width, rng)
        if shortlist_width else None
    )

    # Transport compaction (uint16 tokens + bit-packed valid) is the
    # serving default (ModelConfig.compact_transfer) — the bench
    # matches it, including the host-side unpack cost.
    # BENCH_COMPACT=0 measures plain int32/bool transport.
    compact = os.environ.get("BENCH_COMPACT", "1") == "1"
    # Pallas decode-attention kernel — measured 8% SLOWER than the
    # XLA formulation in-loop (see ModelConfig.attn_kernel); off by
    # default, BENCH_ATTN_KERNEL=1 measures it.
    attn_kernel = os.environ.get("BENCH_ATTN_KERNEL", "0") == "1"
    # Fused wrap-regime encoder SDPA (ops/attention.fused_sdpa_joined;
    # ModelConfig.encoder_sdpa); BENCH_ENC_SDPA=1 measures it.
    fused_sdpa = os.environ.get("BENCH_ENC_SDPA", "0") == "1"
    # Whole-encoder-layer kernel (ops/encoder_layer_pallas) — the
    # service default (ModelConfig.encoder_layer_kernel="auto"; same
    # numerics class as the XLA encoder, headline +20%).
    # BENCH_ENC_LAYER=0 ablates back to the XLA encoder.
    fused_layer = os.environ.get("BENCH_ENC_LAYER", "1") == "1"
    from slimt_tpu.models.decode import compact_result, unpack_compact

    def _run(p, i, m):
        res = translate_batch(
            p, i, m,
            eos_id=-1,  # never emitted: full-length decode, no early exit
            max_steps=max_steps,
            num_heads=config.num_heads,
            provider=provider,
            kv_dtype=kv,
            shortlist=sl,
            with_alignment=with_alignment,
            argmax_method=argmax_method,
            attn_kernel=attn_kernel,
            encoder_dtype=enc_dtype,
            fused_sdpa=fused_sdpa,
            fused_layer=fused_layer,
        )
        return compact_result(res) if compact else res

    fn = jax.jit(_run)
    # Distinct inputs per iteration: identical dispatches can be
    # deduplicated by the runtime and flatter the numbers.
    variants = [
        jnp.asarray(
            rng.integers(3, vocab, (batch, seq)).astype(np.int32)
        )
        for _ in range(iters)
    ]
    mask_j = jnp.asarray(mask)
    warm_out = fn(params, variants[0], mask_j)  # warmup/compile
    np.asarray(warm_out.packed if compact else warm_out.tokens)
    # Pipelined like the serving exhaust loop (forward_async): dispatch
    # every batch, then materialize every result on the host — with
    # fetches on a small thread pool exactly like the service's
    # completion pool, so per-call tunnel round-trips overlap instead
    # of serializing into a tail (each call still transfers its full
    # [B, steps] token matrix: what serving pays).
    from concurrent.futures import ThreadPoolExecutor

    def materialize(out):
        if compact:
            tokens, valid = unpack_compact(np.asarray(out.packed), max_steps)
            return int(tokens[0, 0]) + int(valid.sum())
        return int(np.asarray(out.tokens)[0, 0]) + int(
            np.asarray(out.valid).sum()
        )

    with ThreadPoolExecutor(max_workers=4) as fetch_pool:
        t0 = time.perf_counter()
        outs = [fn(params, idx, mask_j) for idx in variants]
        checksum = sum(fetch_pool.map(materialize, outs))
        elapsed = time.perf_counter() - t0
    tps = batch * max_steps * iters / elapsed

    # Roofline audit: HBM floor-bytes per decode step (reads the step
    # cannot avoid — KV caches, decoder weights incl. the output
    # projection, recurrent state r/w; fused intermediates and logits
    # excluded, so this is a FLOOR and pct_peak is conservative).
    kv_bytes = KV_BYTES.get(kv, 2)
    kv_traffic = 2 * dec * batch * seq * emb * kv_bytes  # K+V, joined layout
    step_weights = dec * (4 * emb * emb + 2 * emb * ffn)  # int8: SSRU F/O, att Q/O, FFN
    logit_width = shortlist_width or vocab
    out_proj = emb * logit_width  # int8 tied embedding (gathered cols)
    state_rw = 2 * dec * batch * emb * 4  # f32 SSRU cell read+write
    embed_gather = batch * emb * 4
    bytes_per_step = kv_traffic + step_weights + out_proj + state_rw + embed_gather
    total_bytes = bytes_per_step * max_steps * iters
    hbm_gbps = total_bytes / elapsed / 1e9
    peak_gbps = float(os.environ.get("BENCH_HBM_PEAK_GBPS", 819.0))  # v5e

    result = {
        "metric": metric,
        "value": round(tps, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tps / TARGET, 3),
        "batch": batch,
        "kv": kv,
        "hbm_gbps": round(hbm_gbps, 1),
        "pct_peak": round(100.0 * hbm_gbps / peak_gbps, 1),
    }
    if shortlist_width:
        result["shortlist_width"] = shortlist_width
    return result


def bench_headline():
    # Peak-throughput serving batch (bulk-translation shape); per-call
    # host round-trip included. Smaller-batch and full-service numbers
    # are in PERFORMANCE.md / other modes. The numerics are THE
    # declared serving config (int16 KV + packed_int argmax +
    # noalign — same as ModelConfig defaults and the parity table in
    # crosscheck/serving_agreement.json); BENCH_BATCH / BENCH_KV
    # override for ablations (int8 KV: ~15% faster, looser agreement).
    batch = int(os.environ.get("BENCH_BATCH", 2048))
    kv = os.environ.get("BENCH_KV", "int16")
    print(json.dumps(_decode_bench(batch=batch, iters=6, kv=kv)))


def _step_slope_us(batch=1, seq=24, vocab=32000, emb=256, ffn=1536,
                   enc=6, dec=2, provider=None, kv=None, iters=12,
                   shortlist_width=0, ablate=None):
    """Per-decode-step DEVICE time via a two-point slope: time the
    same jitted translate_batch at max_steps=M and 2M and divide the
    difference by M.  Tunnel RTT, dispatch, host transfer, and the
    encoder pass are identical in both points and cancel exactly — no
    RTT estimate needed (the axon tunnel breaks block_until_ready-
    based timing; this is the trace-free way to resolve device-side
    step latency)."""
    import jax
    import jax.numpy as jnp

    from slimt_tpu.config import ModelConfig
    from slimt_tpu.io import load_items
    from slimt_tpu.io.loader import load_weights, stack_layers
    from slimt_tpu.io.synthetic import synthetic_model_bytes
    from slimt_tpu.models.decode import translate_batch

    config = ModelConfig(encoder_layers=enc, decoder_layers=dec)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=vocab, emb_dim=emb, ffn_dim=ffn, seed=0
        )
    )
    kv = kv or os.environ.get("BENCH_KV", "int16")
    # Decoder form: dtype-aware like the service (see _decode_bench).
    stack_env = os.environ.get("BENCH_STACK_DEC")
    stack_dec = (kv == "int8") if stack_env is None else stack_env == "1"
    params = jax.device_put(stack_layers(
        load_weights(items, config), decoder=stack_dec,
    ))
    provider = provider or os.environ.get("BENCH_PROVIDER") or config.qmm_provider
    with_alignment = os.environ.get("BENCH_ALIGN") == "1"
    argmax_method = os.environ.get("BENCH_ARGMAX", "packed_int")
    rng = np.random.default_rng(0)
    mask_j = jnp.asarray(np.ones((batch, seq), np.float32))
    shortlist_width = shortlist_width or int(
        os.environ.get("BENCH_SHORTLIST", 0)
    )
    sl = (
        _make_shortlist(vocab, shortlist_width, rng)
        if shortlist_width else None
    )

    m = int(os.environ.get("BENCH_SLOPE_M", int(1.5 * seq)))
    k = int(os.environ.get("BENCH_SLOPE_K", 8))  # wide second point:
    # (k-1)*m extra steps must clear tunnel jitter

    attn_kernel = os.environ.get("BENCH_ATTN_KERNEL", "0") == "1"

    def timed(steps):
        fn = jax.jit(
            lambda p, i, mk: translate_batch(
                p, i, mk, eos_id=-1, max_steps=steps,
                num_heads=config.num_heads, provider=provider, kv_dtype=kv,
                shortlist=sl,
                with_alignment=with_alignment, argmax_method=argmax_method,
                attn_kernel=attn_kernel,
            )
        )
        variants = [
            jnp.asarray(rng.integers(3, vocab, (batch, seq)).astype(np.int32))
            for _ in range(iters)
        ]
        np.asarray(fn(params, variants[0], mask_j).tokens)  # compile
        times = []
        for idx in variants:
            t0 = time.perf_counter()
            np.asarray(fn(params, idx, mask_j).tokens)
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]  # median: robust to tunnel hiccups

    if ablate:
        # Component ablation (scripts/ubench_decode_step.patched):
        # slope with one component stubbed; full - ablated = that
        # component's per-step device time.
        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts"),
        )
        from ubench_decode_step import patched

        restore = patched(ablate)
        try:
            t1, t2 = timed(m), timed(k * m)
        finally:
            restore()
    else:
        t1, t2 = timed(m), timed(k * m)
    return max(t2 - t1, 0.0) / ((k - 1) * m) * 1e6, t1, m


def bench_batch1():
    kv = os.environ.get("BENCH_KV", "int16")
    result = _decode_bench(
        batch=1, seq=24, iters=20,
        metric="decode_tokens_per_sec_batch1_tiny11_int8", kv=kv,
    )
    # Device-side per-step time from the two-point slope (RTT and
    # encoder cancel); sentence latency = 36 steps at that slope.
    slope_us, t_m, m = _step_slope_us(kv=kv)
    raw_ms = 36 / result["value"] * 1000  # wall-clock incl. tunnel RTT
    result["sentence_latency_ms"] = round(raw_ms, 2)
    result["step_device_us"] = round(slope_us, 1)
    result["device_latency_ms"] = round(slope_us * 36 / 1000, 2)
    print(json.dumps(result))


def _service_corpus(seed, lines, low=6, high=24):
    rng = np.random.default_rng(seed)
    words = (
        "hello world goodbye this is a test of the translation engine "
        "quick brown fox jumps over lazy dog sentence splitting works"
    ).split()
    return [
        " ".join(rng.choice(words, rng.integers(low, high)))
        for _ in range(lines)
    ]


def _best_service_rate(translate, lines, iters=3):
    """Warm on one corpus, then time `iters` runs on distinct corpora
    (distinct inputs defeat tunnel dispatch dedup; best-of drops runs
    hit by tunnel hiccups or a stray compile). Returns
    (tokens/s, source words/s, last responses)."""
    translate(_service_corpus(0, lines))  # warm all shape buckets
    best = (0.0, 0.0)
    for it in range(1, iters + 1):
        corpus = _service_corpus(it, lines)
        t0 = time.perf_counter()
        responses = translate(corpus)
        elapsed = time.perf_counter() - t0
        tokens = sum(
            r.target.word_count(s)
            for r in responses
            for s in range(r.target.sentence_count())
        )
        source_words = sum(len(line.split()) for line in corpus)
        best = max(best, (tokens / elapsed, source_words / elapsed))
    return best


def bench_shortlist(lines=2048):
    """Shortlisted output projection through the full Blocking service
    (pipelined batches, like the e2e mode but with the lexical
    shortlist restricting the logit matmul)."""
    from slimt_tpu.config import Config
    from slimt_tpu.runtime.service import Blocking

    model = _model(with_shortlist=True)
    # `value` is the public API (Blocking.translate — bulk-routed by
    # default, differential-tested identical outputs); the pinned
    # per-request exhaust loop (prefer_bulk=False, comparable with
    # recorded history) is reported alongside.
    service = Blocking(Config(cache_size=0, max_words=8192))
    tps, _ = _best_service_rate(
        lambda corpus: service.translate(model, corpus), lines
    )
    general = Blocking(Config(cache_size=0, max_words=8192, prefer_bulk=False))
    general_tps, _ = _best_service_rate(
        lambda corpus: general.translate(model, corpus), lines
    )
    print(
        json.dumps(
            {
                "general_path_tokens_per_sec": round(general_tps, 1),
                "metric": "shortlist_decode_tokens_per_sec_tiny11_int8",
                "value": round(tps, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tps / TARGET, 3),
            }
        )
    )


def bench_headline_shortlist():
    """The reference's flagship operating mode at device level:
    shortlisted output projection (slimt/Shortlist.cc:115-175) in the
    raw batched decode — the [B,E]x[E,32000] logit matmul (~40% of the
    full-vocab step) shrinks to [B,E]x[E,width]. Width defaults to
    1024 (the service's shortlist bucket; measured widths for
    wrap-128 batches land in the 512-2048 range — see
    bench.py realcorpus shortlist stats)."""
    batch = int(os.environ.get("BENCH_BATCH", 2048))
    kv = os.environ.get("BENCH_KV", "int16")
    width = int(os.environ.get("BENCH_SHORTLIST", 1024))
    print(
        json.dumps(
            _decode_bench(
                batch=batch, iters=6, kv=kv, shortlist_width=width,
                metric="decode_tokens_per_sec_per_chip_tiny11_int8_shortlist",
            )
        )
    )


def bench_base():
    print(
        json.dumps(
            _decode_bench(
                batch=1024, emb=512, ffn=2048,
                metric="decode_tokens_per_sec_per_chip_base_int8",
            )
        )
    )


def bench_e2e(lines=2048, workers=4):
    """Full pipeline: split → tokenize → batch → decode → detokenize."""
    from slimt_tpu.config import Config
    from slimt_tpu.runtime.service import Blocking

    model = _model()
    # `value` is the public API (Blocking.translate — bulk-routed by
    # default, differential-tested identical outputs); the pinned
    # per-request exhaust loop (prefer_bulk=False, comparable with
    # recorded history) is reported alongside.
    service = Blocking(Config(cache_size=0, max_words=8192))
    tps, swps = _best_service_rate(
        lambda corpus: service.translate(model, corpus), lines
    )
    general = Blocking(Config(cache_size=0, max_words=8192, prefer_bulk=False))
    general_tps, _ = _best_service_rate(
        lambda corpus: general.translate(model, corpus), lines
    )
    print(
        json.dumps(
            {
                "general_path_tokens_per_sec": round(general_tps, 1),
                "metric": "e2e_target_tokens_per_sec_tiny11_int8",
                "value": round(tps, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tps / TARGET, 3),
                "source_words_per_sec": round(swps, 1),
                "lines": lines,
            }
        )
    )


def _component_floors(batch, seq, kv, shortlist_width=0,
                      dec=2, emb=256, ffn=1536, vocab=32000):
    """Per-component device-time floors (µs/step): each component's
    own limit — max(its unavoidable HBM bytes / peak BW, its MXU MACs
    / peak int8 throughput). v5e defaults; override with
    BENCH_HBM_PEAK_GBPS / BENCH_INT8_TOPS."""
    peak_bw = float(os.environ.get("BENCH_HBM_PEAK_GBPS", 819.0)) * 1e9
    peak_int8 = float(os.environ.get("BENCH_INT8_TOPS", 394.0)) * 1e12
    kv_bytes = KV_BYTES.get(kv, 2)
    logit_width = shortlist_width or vocab

    def floor(hbm_bytes, macs):
        return max(hbm_bytes / peak_bw, 2.0 * macs / peak_int8) * 1e6

    return {
        # KV cache reads dominate attention; Q/O projection weights +
        # the [B,E] activations ride along.
        "attention": floor(
            2 * dec * batch * seq * emb * kv_bytes
            + dec * 2 * emb * emb  # int8 Q, O weights
            + 2 * batch * emb * 4,  # act in/out
            dec * (2 * batch * emb * emb  # Q, O projections
                   + batch * seq * emb * 2),  # scores + attn·V
        ),
        # Tied-embedding output projection [B,E]x[E,V or S] int8 +
        # fused argmax.
        "logits": floor(
            emb * logit_width + batch * emb,
            batch * emb * logit_width,
        ),
        # Decoder FFN W1/W2 int8 weights + activations.
        "ffn": floor(
            dec * 2 * emb * ffn + 2 * batch * emb * 4,
            dec * 2 * batch * emb * ffn,
        ),
        # SSRU gates (F, O affines) + f32 cell state r/w + embed
        # gather + token/valid bookkeeping.
        "other": floor(
            dec * 2 * emb * emb
            + 2 * dec * batch * emb * 4
            + batch * emb * 4,
            dec * 2 * batch * emb * emb,
        ),
    }


def bench_devstep():
    """Device-side decode-step time at serving batch via the
    two-point slope (tunnel RTT/dispatch/encoder cancel), DECOMPOSED
    per component by ablation (scripts/ubench_decode_step stubs), each
    against its own roofline (HBM floor or MXU int8 floor, whichever
    binds). BENCH_SHORTLIST=<width> measures the shortlisted step."""
    batch = int(os.environ.get("BENCH_BATCH", 2048))
    kv = os.environ.get("BENCH_KV", "int16")
    shortlist_width = int(os.environ.get("BENCH_SHORTLIST", 0))
    seq = 64
    # Ablation slopes: full - ablated = that component's share. Each
    # ablation is PAIRED with a fresh full-slope measurement taken
    # right beside it (tunnel-session drift, observed ±30% over tens
    # of minutes, cancels within the pair), and every pair is measured
    # BENCH_DEVSTEP_ROUNDS times (default 3) with the median
    # difference reported — single-pair differences of noisy slopes
    # produced incoherent decompositions (components below their own
    # floors) on drifting sessions.
    rounds = int(os.environ.get("BENCH_DEVSTEP_ROUNDS", 3))
    ablations = (
        ("attention", "no_attn"),
        ("logits", "no_logits"),
        ("ffn", "no_ffn"),
    )
    fulls = []
    diffs = {name: [] for name, _ in ablations}
    for _ in range(rounds):
        for name, ablation in ablations:
            paired_full, _, _ = _step_slope_us(
                batch=batch, seq=seq, iters=8, kv=kv,
                shortlist_width=shortlist_width)
            without, _, _ = _step_slope_us(
                batch=batch, seq=seq, iters=8, kv=kv,
                shortlist_width=shortlist_width, ablate=ablation)
            fulls.append(paired_full)
            diffs[name].append(paired_full - without)

    def median(xs):
        return sorted(xs)[len(xs) // 2]

    slope_us = median(fulls)
    parts_us = {
        name: max(median(vals), 0.0) for name, vals in diffs.items()
    }
    parts_us["other"] = max(
        slope_us - sum(parts_us.values()), 0.0
    )

    floors = _component_floors(batch, seq, kv, shortlist_width)
    components = {}
    for name, us in parts_us.items():
        floor_us = floors[name]
        components[name] = {
            "us": round(us, 1),
            "floor_us": round(floor_us, 1),
            "pct_of_floor": round(100.0 * floor_us / us, 1) if us else None,
        }
    composite_floor = sum(floors.values())

    kv_bytes = KV_BYTES.get(kv, 2)
    dec, emb, ffn, vocab = 2, 256, 1536, 32000
    bytes_per_step = (
        2 * dec * batch * seq * emb * kv_bytes
        + dec * (4 * emb * emb + 2 * emb * ffn)
        + emb * (shortlist_width or vocab)
        + 2 * dec * batch * emb * 4
        + batch * emb * 4
    )
    peak_gbps = float(os.environ.get("BENCH_HBM_PEAK_GBPS", 819.0))
    device_tps = batch / (slope_us / 1e6) if slope_us else 0.0
    hbm = bytes_per_step / (slope_us / 1e6) / 1e9 if slope_us else 0.0
    out = {
        "metric": "decode_step_device_us",
        "value": round(slope_us, 1),
        "unit": "us/step",
        "vs_baseline": round(device_tps / TARGET, 3),
        "batch": batch,
        "kv": kv,
        "device_tokens_per_sec": round(device_tps, 1),
        "hbm_gbps": round(hbm, 1),
        "pct_peak": round(100.0 * hbm / peak_gbps, 1),
        "components": components,
        "composite_floor_us": round(composite_floor, 1),
        "pct_of_composite_floor": (
            round(100.0 * composite_floor / slope_us, 1) if slope_us else None
        ),
    }
    if shortlist_width:
        out["shortlist_width"] = shortlist_width
    print(json.dumps(out))


def bench_realcorpus():
    """End-to-end on the checked-in NATURAL corpus (data/corpus.txt:
    648 mixed-length English lines, ~16.6 words/line, ~8% duplicate
    lines) with shortlist + translation cache enabled — the realism
    counterpart of the synthetic-sampler service modes.  Reports
    cache-hit and shortlist-width statistics alongside throughput; a
    single COLD pass, so the cache-hit rate reflects genuine corpus
    repetition, not warmup artifacts."""
    from slimt_tpu.config import Config
    from slimt_tpu.runtime.service import Blocking

    model = _model(with_shortlist=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "corpus.txt")
    with open(path) as f:
        corpus = [line.rstrip("\n") for line in f if line.strip()]

    # Warm ALL shape buckets with a cache-less full pass (jit cache is
    # per-model, shared across services), then measure one cold-CACHE
    # pass in chunks: a single blocking mega-call can never hit its
    # own cache (every segment is in flight before any completes —
    # reference semantics, slimt/Request.cc:29-85), so chunking is
    # what lets genuine corpus repetition show up, like a streaming
    # workload would.
    chunk = 64
    # Warm with the SAME chunking AND the same cache config as the
    # measured pass: chunked calls produce different (B, T,
    # shortlist-width) buckets than one mega-call, and cache hits
    # shrink device batches into yet other B buckets (hit segments
    # never reach the device) — the corpus and chunking are
    # deterministic, so an identically-configured warm service sees
    # the identical hit pattern and compiles the identical bucket
    # set. An unwarmed bucket means an XLA compile inside the timed
    # region (~1.4 s per 64-line chunk — what this bench used to
    # measure by accident).
    # Two chunks in flight (a 2-deep software pipeline): chunk i+1's
    # ingest+dispatch overlaps chunk i's device wait + assembly — a
    # streaming client would do the same — while chunk i+2 still sees
    # every cache entry chunk i produced. Fully-serial chunks measured
    # RTT-bound on the tunnel (each 64-line call pays the full
    # host↔device round trip with nothing overlapped). The warm pass
    # runs the IDENTICAL pipeline (pipelining shifts which cache
    # entries each chunk sees, hence which (B, T) buckets the misses
    # land in).
    from concurrent.futures import ThreadPoolExecutor

    def chunked_pass(service):
        starts = list(range(0, len(corpus), chunk))
        responses = []
        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = []
            for start in starts:
                futures.append(
                    pool.submit(
                        service.translate, model, corpus[start : start + chunk]
                    )
                )
                if len(futures) > 1:  # keep at most 2 in flight, in order
                    responses.extend(futures.pop(0).result())
            for future in futures:
                responses.extend(future.result())
        return responses

    chunked_pass(Blocking(Config(cache_size=4096, max_words=8192)))
    service = Blocking(Config(cache_size=4096, max_words=8192))
    t0 = time.perf_counter()
    responses = chunked_pass(service)
    elapsed = time.perf_counter() - t0

    tokens = sum(
        r.target.word_count(s)
        for r in responses
        for s in range(r.target.sentence_count())
    )
    source_words = sum(len(line.split()) for line in corpus)
    cache = service.cache
    hits, misses = (cache.hits, cache.misses) if cache else (0, 0)
    tps = tokens / elapsed
    print(
        json.dumps(
            {
                "metric": "realcorpus_tokens_per_sec",
                "value": round(tps, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tps / TARGET, 3),
                "lines": len(corpus),
                "source_words_per_sec": round(source_words / elapsed, 1),
                "cache_hit_rate": round(hits / max(1, hits + misses), 3),
                "cache_lookups": hits + misses,
                "chunk": chunk,
                "shortlist": model.shortlist_meter.snapshot(),
            }
        )
    )


def bench_bulk(lines=10000):
    """Corpus throughput through the bulk path
    (Blocking.translate_bulk): flattened segments, one packing pass,
    pipelined device dispatch, no per-request machinery — the
    TPU-native answer to the reference's async corpus workload
    (differential-tested equal outputs, ~2x the host ceiling)."""
    from slimt_tpu.config import Config
    from slimt_tpu.runtime.service import Blocking

    model = _model()
    # ingest_processes measured 10% SLOWER here (551k vs 611k, 4-core
    # host: IPC unpickle on the main thread beats nothing — in-process
    # tokenization already overlaps the pool's fetch waits).
    service = Blocking(Config(cache_size=2048, max_words=8192))
    tps, swps = _best_service_rate(
        lambda corpus: service.translate_bulk(model, corpus), lines
    )
    print(
        json.dumps(
            {
                "metric": "bulk_corpus_target_tokens_per_sec",
                "value": round(tps, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tps / TARGET, 3),
                "source_words_per_sec": round(swps, 1),
                "lines": lines,
            }
        )
    )


def bench_multipair(lines_per_model=2048):
    """Two resident models (en-de + de-en analog) served through one
    Async service — the multi-pair serving config (BASELINE.json #5,
    reference AggregateBatcher slimt/Batcher.hh:130-180). `value`
    uses batch submission per model (translate_many, the corpus
    ingest API); per-line submission (one Handle per request, the
    interactive pattern) and the bulk lane (both directions'
    corpora through Blocking.translate_bulk back to back — the
    throughput-scale multi-direction config) are reported
    alongside."""
    from slimt_tpu.config import Config
    from slimt_tpu.runtime.service import Async, Blocking

    model_a = _model()
    model_b = _model()

    def run(corpus, per_line):
        with Async(Config(
            cache_size=0, max_words=8192,
            workers=int(os.environ.get("BENCH_WORKERS", 8)),
            batch_latency=float(os.environ.get("BENCH_LATENCY", 0.05)),
        )) as svc:
            if per_line:
                handles = []
                for line in corpus:
                    handles.append(svc.translate(model_a, line))
                    handles.append(svc.translate(model_b, line))
            else:
                handles = svc.translate_many(model_a, corpus)
                handles += svc.translate_many(model_b, corpus)
            responses = [h.result(600) for h in handles]
        return responses

    def measure(per_line):
        best = 0.0
        responses = []
        for it in (1, 2, 3):
            corpus = _service_corpus(it, lines_per_model, low=6, high=20)
            t0 = time.perf_counter()
            responses = run(corpus, per_line)
            elapsed = time.perf_counter() - t0
            tokens = sum(
                r.target.word_count(s)
                for r in responses
                for s in range(r.target.sentence_count())
            )
            best = max(best, tokens / elapsed)
        return best, len(responses)

    def measure_bulk():
        # Same corpora and batch budget as the async runs above, so
        # the printed bulk/async numbers are directly comparable.
        service = Blocking(Config(cache_size=0, max_words=8192))

        def both(corpus):
            return service.translate_bulk(
                model_a, corpus
            ) + service.translate_bulk(model_b, corpus)

        both(_service_corpus(0, lines_per_model, low=6, high=20))  # warm
        best = 0.0
        for it in (1, 2, 3):
            corpus = _service_corpus(it, lines_per_model, low=6, high=20)
            t0 = time.perf_counter()
            responses = both(corpus)
            elapsed = time.perf_counter() - t0
            tokens = sum(
                r.target.word_count(s)
                for r in responses
                for s in range(r.target.sentence_count())
            )
            best = max(best, tokens / elapsed)
        return best

    run(_service_corpus(0, lines_per_model, low=6, high=20), False)  # warm
    tokens_per_sec, n = measure(per_line=False)
    per_line_tps, _ = measure(per_line=True)
    bulk_tps = measure_bulk()
    print(
        json.dumps(
            {
                "bulk_tokens_per_sec": round(bulk_tps, 1),
                "metric": "multipair_async_tokens_per_sec_two_models",
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tokens_per_sec / TARGET, 3),
                "per_line_tokens_per_sec": round(per_line_tps, 1),
                "models": 2,
                "requests": n,
            }
        )
    )


def bench_pivot(lines=2048):
    """Two-leg pivot translation (source→pivot→target, reference
    slimt/Frontend.cc:147-205) through Blocking.pivot: leg 1 rides the
    bulk lane (prefer_bulk), leg 2 re-tokenizes the pivot text
    preserving sentence boundaries. Tokens/s counts final-target
    tokens (one model-decode each on two models per token)."""
    from slimt_tpu.config import Config
    from slimt_tpu.runtime.service import Blocking

    first = _model()
    second = _model()
    service = Blocking(Config(cache_size=0, max_words=8192))
    tps, swps = _best_service_rate(
        lambda corpus: service.pivot(first, second, corpus), lines
    )
    print(
        json.dumps(
            {
                "metric": "pivot_target_tokens_per_sec_tiny11_int8",
                "value": round(tps, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tps / TARGET, 3),
                "source_words_per_sec": round(swps, 1),
                "lines": lines,
            }
        )
    )


def bench_corpus(path=None, workers=None):
    workers = workers or int(os.environ.get("BENCH_WORKERS", 8))
    """WNGT20-style corpus throughput: pipe a real file through the
    Async service (the reference's scripts/run.sh workload — 10k
    shuffled sources, N workers). Falls back to a synthetic corpus
    when no file is given (the WNGT20 sets need network access)."""
    from slimt_tpu.config import Config
    from slimt_tpu.runtime.service import Async

    model = _model()
    lines = 10000

    def make_corpus(seed):
        if path:
            with open(path, encoding="utf-8") as f:
                return [line.strip() for line in f if line.strip()][:lines]
        return _service_corpus(seed + 100, lines, low=5, high=30)

    def run(corpus):
        with Async(
            Config(
                cache_size=2048, max_words=8192, workers=workers,
                batch_latency=float(
                    os.environ.get("BENCH_LATENCY", 0.02)
                ),
            )
        ) as svc:
            handles = svc.translate_many(model, corpus)
            return [h.result(1200) for h in handles]

    run(make_corpus(0))  # warmup compiles
    best = (0.0, 0.0)
    for it in (1, 2):
        corpus = make_corpus(it)
        t0 = time.perf_counter()
        responses = run(corpus)
        elapsed = time.perf_counter() - t0
        source_words = sum(len(line.split()) for line in corpus)
        target_tokens = sum(
            r.target.word_count(s)
            for r in responses
            for s in range(r.target.sentence_count())
        )
        best = max(
            best, (target_tokens / elapsed, source_words / elapsed)
        )
    tps, swps = best
    print(
        json.dumps(
            {
                "metric": "corpus_async_target_tokens_per_sec",
                "value": round(tps, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tps / TARGET, 3),
                "source_words_per_sec": round(swps, 1),
                "lines": lines,
                "workers": workers,
                "elapsed_s": round(elapsed, 2),
            }
        )
    )


def bench_continuous():
    """Step-level continuous batching (models/continuous.py) vs the
    strongest batch-at-a-time baseline (offline shortest-first packing
    into full batches), same length-skewed workload, declared serving
    numerics.

    Fairness: "useful work" = Σ min-cap tokens per segment (1.5 x its
    OWN length), identical for both paths. The batch path decodes
    every row to its BATCH's cap (1.5 x batch-max source length,
    reference slimt/Model.cc:160) — tokens past a row's own cap are
    the straggler waste continuous batching exists to remove, so they
    count against its time, not its tokens. EOS is disabled (eos_id=1
    over 32k random-weight logits) so the comparison is deterministic;
    real workloads add EOS-time variance, which only helps the
    continuous side. BENCH_SLOTS / BENCH_CHUNK / BENCH_SEGMENTS
    override the defaults (2048 / 16 / 4x slots)."""
    import jax
    import jax.numpy as jnp

    from slimt_tpu.config import ModelConfig
    from slimt_tpu.io import load_items
    from slimt_tpu.io.loader import load_weights
    from slimt_tpu.io.synthetic import synthetic_model_bytes
    from slimt_tpu.models.continuous import ContinuousEngine
    from slimt_tpu.models.decode import translate_batch_jit

    slots = int(os.environ.get("BENCH_SLOTS", 2048))
    chunk = int(os.environ.get("BENCH_CHUNK", 16))
    nseg = int(os.environ.get("BENCH_SEGMENTS", 4 * slots))
    t_slot = 64
    vocab, emb, ffn = 32000, 256, 1536
    config = ModelConfig(encoder_layers=6, decoder_layers=2)
    params = jax.device_put(
        load_weights(
            load_items(
                synthetic_model_bytes(
                    config=config, vocab_size=vocab, emb_dim=emb,
                    ffn_dim=ffn, seed=0,
                )
            ),
            config,
        )
    )
    rng = np.random.default_rng(0)
    # Length-skewed mix (the continuous win case): lognormal over
    # [4, t_slot], shuffled arrival order.
    lengths = np.clip(
        np.rint(np.exp(rng.normal(3.0, 0.7, nseg))), 4, t_slot
    ).astype(int)
    segments = [
        rng.integers(3, vocab, n).astype(int).tolist() for n in lengths
    ]
    useful = int(sum(max(1, int(1.5 * n)) for n in lengths))
    eos_id = 1

    # --- batch-at-a-time baseline: full batches of `slots` rows, T
    # padded to a 16-multiple bucket. `sort=True` = OFFLINE (global
    # shortest-first — the strongest batch baseline); False = ONLINE
    # arrival order (the serving regime: the reference Batcher can
    # only sort what is queued, slimt/Batcher.cc:95-120, so a steady
    # stream packs mixed lengths and every row decodes to the batch
    # max cap).
    def run_batches(sort):
        order = (
            np.argsort(lengths, kind="stable")
            if sort else np.arange(nseg)
        )
        total = 0
        outs = []
        for start in range(0, nseg, slots):
            idxs = order[start : start + slots]
            t_max = int(lengths[idxs].max())
            t_pad = -(-t_max // 16) * 16
            b_pad = slots  # full batches by construction (nseg % slots == 0)
            indices = np.zeros((b_pad, t_pad), np.int32)
            mask = np.zeros((b_pad, t_pad), np.float32)
            for r, seg_i in enumerate(idxs):
                toks = segments[seg_i]
                indices[r, : len(toks)] = toks
                mask[r, : len(toks)] = 1.0
            cap = np.int32(max(1, int(1.5 * t_max)))
            out = translate_batch_jit(
                params,
                jnp.asarray(indices),
                jnp.asarray(mask),
                jnp.zeros((1024,), jnp.int32),
                cap,
                eos_id=eos_id,
                max_steps=int(1.5 * t_pad),
                num_heads=config.num_heads,
                with_shortlist=False,
                kv_dtype="int16",
                with_alignment=False,
                argmax_method="packed_int",
                compact_output=True,
            )
            outs.append(out)
            total += b_pad
        for out in outs:
            np.asarray(out.packed)
        return total

    run_batches(sort=True)  # warm/compile every bucket
    batch = {}
    for label, sort in (("offline_sorted", True), ("online_stream", False)):
        run_batches(sort=sort)  # warm the mode's buckets
        t0 = time.perf_counter()
        run_batches(sort=sort)
        batch[label] = useful / (time.perf_counter() - t0)

    # --- continuous engine (fresh pool; warm pass compiles its jits).
    def make_engine(order):
        return ContinuousEngine(
            params,
            eos_id=eos_id,
            num_heads=config.num_heads,
            slots=slots,
            chunk=chunk,
            t_slot=t_slot,
            admit_bucket=min(slots, 1024),
            admit_order=order,
        )

    make_engine("shortest").translate(segments[: slots // 2])  # compile
    cont = {}
    engines = {}
    for label, order in (
        ("offline_sorted", "shortest"), ("online_stream", "fifo")
    ):
        engine = make_engine(order)
        t0 = time.perf_counter()
        engine.translate(segments)
        cont[label] = useful / (time.perf_counter() - t0)
        engines[label] = engine

    stream = engines["online_stream"]
    print(
        json.dumps(
            {
                "metric": "continuous_batching_tokens_per_sec",
                "value": round(cont["online_stream"], 1),
                "unit": "useful tokens/s",
                "vs_baseline": round(cont["online_stream"] / TARGET, 3),
                "online_stream": {
                    "continuous": round(cont["online_stream"], 1),
                    "batch_at_a_time": round(batch["online_stream"], 1),
                    "ratio": round(
                        cont["online_stream"] / batch["online_stream"], 3
                    ),
                    "occupancy": round(stream.occupancy(), 3),
                    "chunks": stream.stats["chunks"],
                },
                "offline_sorted": {
                    "continuous": round(cont["offline_sorted"], 1),
                    "batch_at_a_time": round(batch["offline_sorted"], 1),
                    "ratio": round(
                        cont["offline_sorted"] / batch["offline_sorted"], 3
                    ),
                    "occupancy": round(
                        engines["offline_sorted"].occupancy(), 3
                    ),
                },
                "slots": slots,
                "chunk": chunk,
                "segments": nseg,
            }
        )
    )


def bench_longctx():
    """Long-context encoder (SURVEY §5 "long context"): the reference
    hard-wraps every input at 128 tokens because its SDPA materializes
    full [B,H,T,T] score matrices (slimt/Modules.cc:24-86,
    slimt/Frontend.hh:27). This engine lifts the constraint with the
    blockwise Pallas encoder attention (`flash_attention`,
    ops/attention.py — O(T·128) attention memory). Measures encoder
    throughput at growing T with the TOTAL token count fixed, einsum
    SDPA vs the blockwise kernel, on the tiny11 encoder. Results fetch
    as a device-side checksum (a [B,T,E] f32 fetch would be
    transfer-bound through the tunnel and time the link, not the
    encoder)."""
    import jax
    import jax.numpy as jnp

    from slimt_tpu.config import ModelConfig
    from slimt_tpu.io import load_items
    from slimt_tpu.io.loader import load_weights, stack_layers
    from slimt_tpu.io.synthetic import synthetic_model_bytes
    from slimt_tpu.models import transformer as tfm

    vocab, emb, ffn = 32000, 256, 1536
    config = ModelConfig(encoder_layers=6, decoder_layers=2)
    items = load_items(
        synthetic_model_bytes(
            config=config, vocab_size=vocab, emb_dim=emb, ffn_dim=ffn, seed=0
        )
    )
    params = jax.device_put(stack_layers(load_weights(items, config)))
    total = int(os.environ.get("BENCH_LONGCTX_TOKENS", 16384))
    lengths = [int(t) for t in os.environ.get(
        "BENCH_LONGCTX_T", "128,512,1024,2048,4096").split(",")]
    rng = np.random.default_rng(0)
    rows = {}
    flash_1024 = None
    for t in lengths:
        for flash in (False, True):
            # Two-point slope over batch size (4x total tokens vs 1x):
            # per-call dispatch/RTT through the tunnel (~20-30 ms) is
            # identical at both points and cancels — single-call
            # timings here measure the link, not the encoder.
            b_lo = max(1, total // t)
            b_hi = 4 * b_lo
            if (
                not flash
                and b_hi * t * t * config.num_heads * 4 > 2 << 30
            ):
                # einsum SDPA materializes [B,H,T,T] f32 — skip configs
                # whose score matrices exceed ~2 GiB (the point of the
                # blockwise kernel).
                rows[f"T={t} einsum"] = "skipped (scores > 2 GiB)"
                continue

            def run(p, idx, msk):
                x = tfm.transform_embedding(tfm.embed(p, idx))
                out = tfm.encoder_forward(
                    p, x, tfm.make_additive_mask(msk),
                    config.num_heads, None, flash=flash,
                )
                return jnp.sum(out)  # scalar fetch: don't time the link

            fn = jax.jit(run)

            def timed(batch):
                variants = [
                    jnp.asarray(
                        rng.integers(3, vocab, (batch, t)).astype(np.int32)
                    )
                    for _ in range(4)
                ]
                msk = jnp.asarray(np.ones((batch, t), np.float32))
                np.asarray(fn(params, variants[0], msk))  # compile
                times = []
                for idx in variants:
                    t0 = time.perf_counter()
                    np.asarray(fn(params, idx, msk))
                    times.append(time.perf_counter() - t0)
                return sorted(times)[len(times) // 2]

            lo, hi = timed(b_lo), timed(b_hi)
            if hi <= lo:
                rows[f"T={t} " + ("flash" if flash else "einsum")] = (
                    "unresolved (slope <= 0 under jitter)"
                )
                continue
            tps = (b_hi - b_lo) * t / (hi - lo)
            rows[f"T={t} " + ("flash" if flash else "einsum")] = round(tps, 1)
            if flash and t == 1024:
                flash_1024 = tps
    # flash_attention="auto" (the shipped default) must pick the
    # measured per-T winner — einsum through the crossover, blockwise
    # beyond it, and blockwise wherever einsum is infeasible.
    from slimt_tpu.models.model import resolve_flash

    auto_checks = {}
    for t in lengths:
        ein = rows.get(f"T={t} einsum")
        fla = rows.get(f"T={t} flash")
        auto = resolve_flash("auto", t)
        if not isinstance(ein, (int, float)):
            ok = auto  # einsum skipped/unresolved → auto must say flash
        elif not isinstance(fla, (int, float)):
            ok = not auto
        else:
            ok = auto == (fla > ein)
        auto_checks[f"T={t}"] = {
            "auto_picks": "flash" if auto else "einsum",
            "matches_winner": bool(ok),
        }
    print(
        json.dumps(
            {
                "metric": "longctx_encoder_tokens_per_sec_T1024_flash",
                "value": round(flash_1024 or 0.0, 1),
                "unit": "tokens/s",
                "vs_baseline": round((flash_1024 or 0.0) / TARGET, 3),
                "total_tokens_per_config": total,
                "rows": rows,
                "flash_auto": auto_checks,
            }
        )
    )


def bench_latency():
    """Open-loop serving latency: Poisson arrivals into the Async
    service at several offered loads, per-request end-to-end latency
    (tokenize → queue/batch → decode → detokenize) percentiles at each
    load, for batch_latency ∈ {0, 50 ms} — the latency side of the
    occupancy trade Config.batch_latency makes (reference
    slimt/Frontend.hh:21-39 exposes the same knobs; Response.cc:196-219
    is its live per-request wps metric).

    Latency is measured from the request's SCHEDULED arrival time
    (open-loop convention): if the engine falls behind, queueing shows
    up in the tail instead of silently stretching the arrival process.
    A closed-loop B=1 row (single-sentence Blocking round trip, the
    interactive floor) anchors the table."""
    import threading

    from slimt_tpu.config import Config
    from slimt_tpu.runtime.service import Async, Blocking

    model = _model()
    loads = [
        int(x)
        for x in os.environ.get(
            "BENCH_LOADS", "100,500,2000,8000,20000"
        ).split(",")
    ]
    duration = float(os.environ.get("BENCH_LAT_SECONDS", 6.0))
    windows = [0.0, 0.05]
    rows = {}
    knee = (0.0, None)  # (tok/s, row key) at the knee

    def run_load(service, load, seed, timed):
        n = min(int(load * duration), 30000)
        corpus = _service_corpus(seed, n)
        rng = np.random.default_rng(seed)
        gaps = rng.exponential(1.0 / load, n)
        sched = np.cumsum(gaps)
        done = np.zeros(n)
        pending = threading.Semaphore(0)

        t0 = time.perf_counter()
        for i, line in enumerate(corpus):
            now = time.perf_counter() - t0
            if sched[i] > now:
                time.sleep(sched[i] - now)
            handle = service.translate(model, line)

            def cb(fut, i=i):
                done[i] = time.perf_counter() - t0
                pending.release()

            handle.future.add_done_callback(cb)
        for _ in range(n):
            pending.acquire()
        wall = time.perf_counter() - t0
        if not timed:
            return None
        lat_ms = (done - sched) * 1e3
        tokens = sum(len(line.split()) for line in corpus)  # source words
        return {
            "offered_lps": load,
            "achieved_lps": round(n / wall, 1),
            "source_wps": round(tokens / wall, 1),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
            "n": n,
        }

    for window in windows:
        service = Async(
            Config(
                cache_size=0, max_words=8192, workers=4,
                batch_latency=window,
            )
        )
        # Warm every shape bucket the arrival process will touch (the
        # low-load regime decodes B=1..8 buckets the corpus modes never
        # compile) by running the same Poisson process once untimed.
        run_load(service, loads[0], seed=99, timed=False)
        run_load(service, max(loads), seed=98, timed=False)
        for load in loads:
            row = run_load(service, load, seed=load, timed=True)
            key = f"window={int(window * 1000)}ms load={load}/s"
            rows[key] = row
            # The knee: highest load this window sustains (≥95% of
            # offered admitted AND p99 under 250 ms).
            if (
                row["achieved_lps"] >= 0.95 * load
                and row["p99_ms"] <= 250.0
                and row["source_wps"] > knee[0]
            ):
                knee = (row["source_wps"], key)

    # Interactive floor: closed-loop single-sentence Blocking round
    # trip (per-request path, B=1 bucket) — median of 50.
    floor = Blocking(Config(cache_size=0, prefer_bulk=False))
    floor_corpus = _service_corpus(7, 64, low=8, high=16)
    floor.translate(model, floor_corpus[:8])  # warm B∈{1..8}, T buckets
    samples = []
    for line in floor_corpus[8:]:
        t0 = time.perf_counter()
        floor.translate(model, [line])
        samples.append((time.perf_counter() - t0) * 1e3)
    rows["closed-loop B=1 Blocking"] = {
        "p50_ms": round(float(np.percentile(samples, 50)), 2),
        "p95_ms": round(float(np.percentile(samples, 95)), 2),
        "n": len(samples),
    }

    print(
        json.dumps(
            {
                "metric": "serving_knee_source_words_per_sec",
                "value": round(knee[0], 1),
                "unit": "source words/s",
                "vs_baseline": round(knee[0] / TARGET, 3),
                "knee": knee[1],
                "rows": rows,
            }
        )
    )


def bench_providers():
    for provider in ("xla_int8", "pallas", "f32"):
        result = _decode_bench(provider=provider, iters=3)
        result["provider"] = provider
        print(json.dumps(result))


def _watchdog(mode, seconds):
    """If the TPU tunnel wedges (observed: device grant never arrives
    and the process sits at 0% CPU indefinitely), emit a JSON error
    line and exit instead of hanging the driver silently."""
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": mode,
                    "value": 0,
                    "unit": "tokens/s",
                    "vs_baseline": 0,
                    "error": (
                        f"watchdog: no result after {seconds}s "
                        "(TPU backend unavailable/wedged?)"
                    ),
                }
            ),
            flush=True,
        )
        os._exit(2)

    timer = threading.Timer(seconds, fire)
    timer.daemon = True
    timer.start()
    return timer


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    timer = _watchdog(mode, int(os.environ.get("BENCH_WATCHDOG_S", 2400)))
    {
        "headline": bench_headline,
        "headline_shortlist": bench_headline_shortlist,
        "batch1": bench_batch1,
        "shortlist": bench_shortlist,
        "base": bench_base,
        "e2e": bench_e2e,
        "bulk": bench_bulk,
        "multipair": bench_multipair,
        "pivot": bench_pivot,
        "corpus": bench_corpus,
        "realcorpus": bench_realcorpus,
        "devstep": bench_devstep,
        "providers": bench_providers,
        "longctx": bench_longctx,
        "continuous": bench_continuous,
        "latency": bench_latency,
    }[mode]()
    timer.cancel()


if __name__ == "__main__":
    main()
