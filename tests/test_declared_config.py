"""Guards on the ONE-declared-serving-config discipline (CLAUDE.md):
ModelConfig's defaults, the bench defaults, and the committed parity
table must name the SAME configuration — and flash auto-selection
must match the measured crossover."""

import json
import os

from slimt_tpu.config import ModelConfig
from slimt_tpu.models.model import FLASH_AUTO_CROSSOVER_T, resolve_flash

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_declared_config_has_committed_parity_row():
    """The committed serving_agreement.json must contain BOTH the
    lone-argmax row and the full-stack row for the shipped defaults,
    and the stack must meet the stated >=99%/99% bar."""
    config = ModelConfig()
    assert config.kv_cache_dtype == "int16"
    assert config.argmax_method == "packed_int"
    table = json.load(
        open(os.path.join(REPO, "crosscheck", "serving_agreement.json"))
    )["configs"]
    assert "argmax=packed_int" in table
    stack = table["packedint+int16+noalign"]
    assert stack["token_agreement_pct"] >= 99.0
    assert stack["sentence_exact_pct"] >= 99.0
    # The shipped TPU encoder's parity row must also be committed.
    assert table["enc_layer=fused"]["token_agreement_pct"] >= 99.9


def test_bench_defaults_match_model_config():
    """bench.py's env-default numerics = ModelConfig defaults (the
    one-config discipline is enforced, not assumed)."""
    src = open(os.path.join(REPO, "bench.py")).read()
    config = ModelConfig()
    assert f'BENCH_ARGMAX", "{config.argmax_method}"' in src
    assert f'BENCH_KV", "{config.kv_cache_dtype}"' in src


def test_resolve_flash_auto_matches_crossover():
    assert FLASH_AUTO_CROSSOVER_T == 768
    for t in (16, 64, 128, 512, 768):
        assert resolve_flash("auto", t) is False
    for t in (769, 1024, 2048, 4096):
        assert resolve_flash("auto", t) is True
    # Explicit overrides win regardless of T.
    assert resolve_flash(True, 16) is True
    assert resolve_flash(False, 4096) is False
