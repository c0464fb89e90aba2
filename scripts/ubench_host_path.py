"""Host-path ceiling microbench (no TPU needed).

Stubs the device forward (segments echo back as hypotheses with zero
device time) and pushes the bench_corpus workload through the real
Async service — splitter, tokenizer, batcher, cache, completion,
detokenizer all run for real. The resulting tokens/s is the ceiling
the host pipeline imposes on the corpus bench regardless of how fast
decode gets; cProfile output shows where that ceiling comes from.

Usage: python scripts/ubench_host_path.py [--profile] [--workers N]
       [--lines N]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from slimt_tpu.config import Config, ModelConfig
from slimt_tpu.models.model import Model, Package
from slimt_tpu.runtime.request import Hypothesis
from slimt_tpu.io.synthetic import synthetic_model_bytes
from slimt_tpu.text import spm_proto
from slimt_tpu.text.synthetic_vocab import DEFAULT_WORDS, build_spm_model


def build_model():
    config = ModelConfig(encoder_layers=1, decoder_layers=1)
    spm = build_spm_model(DEFAULT_WORDS)
    vocab_size = max(len(spm.pieces), 64)
    vocab = spm_proto.serialize_model(spm)
    model_bytes = synthetic_model_bytes(
        config=config, vocab_size=vocab_size, emb_dim=32, ffn_dim=64, seed=0
    )
    return Model(config, Package(model=model_bytes, vocabulary=vocab))


def stub_forward(model):
    """Replace the device forward with an instant echo (tokens =
    source tokens) — now shared library code; see
    slimt_tpu.utils.stub_device_forward."""
    from slimt_tpu.utils import stub_device_forward

    stub_device_forward(model)


def corpus(lines):
    rng = np.random.default_rng(5)
    words = (
        "hello world goodbye this is a test of the translation engine "
        "quick brown fox jumps over lazy dog sentence splitting works "
        "numbers like 123 and punctuation are handled"
    ).split()
    return [
        " ".join(rng.choice(words, rng.integers(5, 30)))
        for _ in range(lines)
    ]


def run(model, lines, workers):
    from slimt_tpu.runtime.service import Async

    with Async(
        Config(
            cache_size=2048, max_words=8192, workers=workers,
            batch_latency=0.02,
        )
    ) as svc:
        handles = svc.translate_many(model, lines)
        return [h.result(600) for h in handles]


def run_bulk(model, lines, workers):
    from slimt_tpu.runtime.service import Blocking

    with Blocking(
        Config(
            cache_size=2048, max_words=8192,
            completion_threads=workers,
        )
    ) as svc:
        return svc.translate_bulk(model, lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--bulk", action="store_true",
                    help="profile translate_bulk instead of Async")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--lines", type=int, default=10000)
    args = ap.parse_args()

    model = build_model()
    stub_forward(model)
    lines = corpus(args.lines)

    runner = run_bulk if args.bulk else run
    runner(model, lines[:256], args.workers)  # warm imports/caches

    if args.profile:
        prof = cProfile.Profile()
        prof.enable()
    t0 = time.perf_counter()
    responses = runner(model, lines, args.workers)
    elapsed = time.perf_counter() - t0
    if args.profile:
        prof.disable()

    tokens = sum(
        r.target.word_count(s)
        for r in responses
        for s in range(r.target.sentence_count())
    )
    print(
        f"host ceiling: {tokens} target tokens in {elapsed:.2f}s = "
        f"{tokens / elapsed:,.0f} tok/s (workers={args.workers})"
    )
    if args.profile:
        s = io.StringIO()
        pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(35)
        print(s.getvalue())


if __name__ == "__main__":
    main()
