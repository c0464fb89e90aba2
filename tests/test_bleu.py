"""scripts/bleu.py vs the real sacrebleu package.

The one-command BLEU harness (scripts/crosscheck.py bleu) must score
exactly like the tool the reference's README quotes
(/root/reference/README.md:64-67: sacrebleu on WNGT20). sacrebleu is
installed in this environment, so the self-contained implementation is
validated against it directly, corpus by corpus, to 4 decimals.
"""

import os
import subprocess
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), os.pardir, "scripts")
sys.path.insert(0, SCRIPTS)

from bleu import corpus_bleu, tokenize_13a  # noqa: E402

sacrebleu = pytest.importorskip("sacrebleu")


NATURAL = [
    ("the quick brown fox jumps over the lazy dog .",
     "the quick brown fox jumped over the lazy dog ."),
    ("hello , world !", "hello world !"),
    ("this is a test of the translation engine .",
     "this is a test of the translation engine ."),
    ("numbers like 3.14 and 1,000 stay joined",
     "numbers like 3.14 and 1,000 stay joined"),
    ("entities &amp; tags &lt;b&gt; are normalized",
     "entities & tags <b> are normalized"),
    ("punct!sticks?to-words \"quoted\" (parens)",
     "punct ! sticks ? to - words ' quoted ' ( parens )"),
]


def _compare(hyps, refs):
    want = sacrebleu.corpus_bleu(hyps, [refs]).score
    got, _ = corpus_bleu(hyps, refs)
    assert got == pytest.approx(want, abs=5e-4), (got, want)


def test_matches_sacrebleu_natural():
    hyps = [h for h, _ in NATURAL]
    refs = [r for _, r in NATURAL]
    _compare(hyps, refs)


def test_matches_sacrebleu_perfect():
    refs = [r for _, r in NATURAL]
    _compare(refs, refs)
    score, detail = corpus_bleu(refs, refs)
    assert score == pytest.approx(100.0)
    assert detail["bp"] == 1.0


def test_matches_sacrebleu_zero_overlap():
    hyps = ["aa bb cc dd ee", "ff gg hh"]
    refs = ["xx yy zz ww vv", "uu tt ss"]
    _compare(hyps, refs)


def test_matches_sacrebleu_short_hyps():
    # brevity penalty + exp smoothing both engaged
    hyps = ["the cat", "a dog sat", "x"]
    refs = [
        "the cat sat on the mat today",
        "a dog sat on a log by the river",
        "x y z w",
    ]
    _compare(hyps, refs)


def test_matches_sacrebleu_random_corpora():
    import random

    rng = random.Random(0)
    words = "a b c d e f g h i j k .".split()
    for trial in range(8):
        hyps, refs = [], []
        for _ in range(rng.randint(2, 30)):
            n = rng.randint(1, 18)
            hyps.append(" ".join(rng.choice(words) for _ in range(n)))
            m = rng.randint(1, 18)
            refs.append(" ".join(rng.choice(words) for _ in range(m)))
        _compare(hyps, refs)


def test_tokenizer_matches_sacrebleu():
    from sacrebleu.tokenizers.tokenizer_13a import Tokenizer13a

    tok = Tokenizer13a()
    cases = [h for h, _ in NATURAL] + [r for _, r in NATURAL] + [
        "dash-after-digit 7-8 but word-dash stays",
        "trailing dots... and {braces} [brackets] ~tilde~",
        "multi  spaces\tand\ttabs",
    ]
    for case in cases:
        assert tokenize_13a(case) == tok(case).split(), case


def test_cli_runs(tmp_path):
    hyp = tmp_path / "hyp.txt"
    ref = tmp_path / "ref.txt"
    hyp.write_text("hello world .\nsecond line here .\n")
    ref.write_text("hello world .\nsecond line there .\n")
    out = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "bleu.py"), str(hyp), str(ref)],
        capture_output=True, text=True, check=True,
    )
    import json

    parsed = json.loads(out.stdout)
    want = sacrebleu.corpus_bleu(
        ["hello world .", "second line here ."],
        [["hello world .", "second line there ."]],
    ).score
    assert parsed["bleu"] == pytest.approx(want, abs=5e-4)
