"""CLI smoke tests (subprocess, like the reference's test_cmdline.py)."""

import os
import subprocess
import sys

import pytest

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    PYTHONPATH=os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep)
    ),
)


def _run(*argv, input_text=""):
    return subprocess.run(
        [sys.executable, "-m", "slimt_tpu", *argv],
        input=input_text,
        capture_output=True,
        text=True,
        env=ENV,
        timeout=300,
    )


def test_synth_and_translate(tmp_path):
    out = str(tmp_path / "pkg")
    result = _run("synth", "--out", out)
    assert result.returncode == 0, result.stderr
    assert os.path.exists(os.path.join(out, "model.bin"))

    result = _run(
        "translate",
        "--root", out,
        "--shortlist", "shortlist.bin",
        "--preset", "tiny",
        input_text="hello world\n",
    )
    assert result.returncode == 0, result.stderr
    assert result.stdout.endswith("\n")


def test_translate_async(tmp_path):
    out = str(tmp_path / "pkg")
    assert _run("synth", "--out", out).returncode == 0
    result = _run(
        "translate",
        "--root", out,
        "--async",
        "--workers", "2",
        "--text", "hello world",
    )
    assert result.returncode == 0, result.stderr


def test_download_stub():
    result = _run("download")
    assert result.returncode == 1
    assert "network" in result.stderr


def test_ls_empty(tmp_path):
    result = _run("ls", "--root", str(tmp_path))
    assert result.returncode == 0


def test_cli_inspect(tmp_path, capsys):
    from slimt_tpu.cli import main

    package = tmp_path / "pkg"
    assert main(["synth", "--out", str(package)]) == 0
    capsys.readouterr()
    assert main(["inspect", str(package / "model.bin")]) == 0
    out = capsys.readouterr().out
    assert "Wemb" in out and "intgemm8" in out and "scale=" in out
    assert "tensors" in out.splitlines()[-1]


def test_ci_smoke_sample_txt(tmp_path):
    """The reference CI smoke (scripts/ci/ubuntu/03-test.sh): pipe
    data/sample.txt through the CLI, one translation per input line."""
    out = str(tmp_path / "pkg")
    assert _run("synth", "--out", out).returncode == 0
    sample = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "data", "sample.txt"
    )
    with open(sample, encoding="utf-8") as f:
        text = f.read()
    result = _run("translate", "--root", out, input_text=text)
    assert result.returncode == 0, result.stderr
    lines = result.stdout.split("\n")
    assert len([l for l in lines if l]) == 2


def test_translate_remote_url():
    """--url turns the CLI into a fleet client (blocking + async job
    polling + error paths), against an in-process server."""
    import json
    import urllib.request

    from slimt_tpu.config import Config
    from slimt_tpu.server import TranslationServer, serve

    from .helpers import make_model

    server = TranslationServer(Config(workers=1, cache_size=0))
    server.add_model("en-de", make_model(seed=0))
    httpd = serve(server, host="127.0.0.1", port=0)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        result = _run(
            "translate", "--url", url, "--remote-model", "en-de",
            "--text", "hello world",
        )
        assert result.returncode == 0, result.stderr
        assert result.stdout.strip()

        result = _run(
            "translate", "--url", url, "--async", "--poll", "0.05",
            "--text", "hello world",
        )
        assert result.returncode == 0, result.stderr
        assert result.stdout.strip()

        result = _run(
            "translate", "--url", url, "--remote-model", "nope",
            "--text", "x",
        )
        assert result.returncode == 1
        assert "404" in result.stderr
    finally:
        httpd.shutdown()
        server.close()


def test_translate_remote_unreachable():
    result = _run(
        "translate", "--url", "http://127.0.0.1:1", "--text", "x",
    )
    assert result.returncode == 1
    assert "cannot reach" in result.stderr
