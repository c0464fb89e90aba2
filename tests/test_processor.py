"""TextProcessor tests: sentence → tokens → wrap → annotation."""

import pytest

from slimt_tpu.text.processor import TextProcessor
from slimt_tpu.text.synthetic_vocab import build_vocabulary


@pytest.fixture(scope="module")
def vocab():
    return build_vocabulary(
        ["hello", "world", "goodbye", "test", "one", "two", "three"],
        backend="none",
    )


@pytest.fixture(scope="module")
def processor(vocab):
    return TextProcessor("sentence", vocab)


def test_process_single_line(processor, vocab):
    source, segments = processor.process("hello world", wrap_length=128)
    assert len(segments) == 1
    assert segments[0][-1] == vocab.eos_id
    assert source.sentence_count() == 1
    assert source.sentence(0) == "hello world"
    # words reconstruct the sentence (incl. zero-width EOS slot)
    words = source.words(0)
    assert "".join(words) == "hello world"
    assert words[-1] == ""  # the EOS placeholder


def test_process_multi_line(processor, vocab):
    text = "hello world\ngoodbye test"
    source, segments = processor.process(text, wrap_length=128)
    assert len(segments) == 2
    assert source.sentence_count() == 2
    assert source.sentence(0) == "hello world"
    assert source.sentence(1) == "goodbye test"
    assert source.gap_text(1) == "\n"


def test_wrap_length(processor, vocab):
    # "one two three one two three" = 6 tokens; wrap_length=4 → chunks
    # of 3 tokens + EOS
    text = "one two three one two three"
    source, segments = processor.process(text, wrap_length=4)
    assert len(segments) == 2
    for seg in segments:
        assert len(seg) <= 4
        assert seg[-1] == vocab.eos_id
    assert source.sentence_count() == 2
    # both wrapped sentences reconstruct the full text
    assert (source.sentence(0) + source.sentence(1)) == text


def test_empty_lines_skipped(processor):
    source, segments = processor.process("\n\nhello\n\n", wrap_length=128)
    assert len(segments) == 1


def test_process_annotated_round(processor, vocab):
    source, segments = processor.process(
        "hello world\ngoodbye", wrap_length=128
    )
    replacement, new_segments = processor.process_annotated(source)
    assert len(new_segments) == len(segments)
    assert [s for s in new_segments] == [s for s in segments]
    assert replacement.text == source.text
    assert replacement.sentence(0) == source.sentence(0)


def test_unicode_offsets(processor, vocab):
    text = "héllo wörld"
    source, segments = processor.process(text, wrap_length=128)
    assert source.sentence_count() == 1
    assert source.sentence(0) == text
