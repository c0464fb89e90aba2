"""Property/fuzz tests: pipeline invariants over random unicode text."""

import random
import string

import pytest

from slimt_tpu.config import Config
from slimt_tpu.runtime.service import Blocking
from slimt_tpu.text.processor import TextProcessor
from slimt_tpu.text.synthetic_vocab import build_vocabulary

from .helpers import make_model

ALPHABET = (
    string.ascii_letters + string.digits + " .,!?;:'\"()-\n"
    + "äöüéàñ中文日本語"
)


def _random_text(rng, max_len=200):
    n = rng.randint(0, max_len)
    return "".join(rng.choice(ALPHABET) for _ in range(n))


@pytest.fixture(scope="module")
def processor():
    vocab = build_vocabulary(["hello", "world", "test"], backend="none")
    return TextProcessor("sentence", vocab)


def test_processor_annotation_invariants(processor):
    rng = random.Random(42)
    for _ in range(60):
        text = _random_text(rng)
        source, segments = processor.process(text, wrap_length=16)
        # text preserved exactly
        assert source.text == text
        assert source.sentence_count() == len(segments)
        data = source.data
        # token ranges are monotone and within bounds
        assert source.token_begin == sorted(source.token_begin)
        assert source.token_begin[-1] == len(data)
        for s in range(source.sentence_count()):
            assert segments[s][-1] == processor.vocabulary.eos_id
            assert len(segments[s]) <= 16
            for w in range(source.word_count(s)):
                r = source.word_as_range(s, w)
                assert 0 <= r.begin <= r.end <= len(data)


def test_processor_utf8_conversion_fuzz(processor):
    from slimt_tpu.text.annotation import Encoding

    rng = random.Random(7)
    for _ in range(20):
        text = _random_text(rng, max_len=80)
        source, _ = processor.process(text, wrap_length=16)
        words_before = [
            source.word(s, w)
            for s in range(source.sentence_count())
            for w in range(source.word_count(s))
        ]
        source.to(Encoding.UTF8)
        words_utf8 = [
            source.word(s, w)
            for s in range(source.sentence_count())
            for w in range(source.word_count(s))
        ]
        source.to(Encoding.BYTE)
        assert words_before == words_utf8


def test_service_fuzz_random_lines():
    model = make_model()
    service = Blocking(Config(cache_size=16))
    rng = random.Random(3)
    lines = [_random_text(rng, max_len=60).replace("\n", " ") for _ in range(12)]
    responses = service.translate(model, lines)
    assert [r.source.text for r in responses] == lines
    for response in responses:
        # target annotation is internally consistent
        t = response.target
        assert t.token_begin == sorted(t.token_begin)
        assert t.token_begin[-1] == len(t.data)


def test_long_sentence_flash_attention():
    """Long-context capability: a single unwrapped long sentence
    through the flash encoder (wrap lifted)."""
    import jax.numpy as jnp
    import numpy as np

    from slimt_tpu.models.decode import translate_batch

    model = make_model()
    words = "hello world test quick brown " * 120  # ~600 tokens
    ids, _ = model.vocabulary.encode(words, add_eos=True)
    assert len(ids) > 400
    indices = np.asarray(ids, np.int32)[None, :]
    mask = np.ones_like(indices, np.float32)
    result = translate_batch(
        model.params, jnp.asarray(indices), jnp.asarray(mask),
        eos_id=model.vocabulary.eos_id, max_steps=8,
        num_heads=model.config.num_heads, provider="xla_int8",
        flash_attention=True,
    )
    assert np.asarray(result.valid).shape[1] == 8
