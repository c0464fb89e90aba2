"""Two-process jax.distributed SPMD serving (scripts/multihost_demo.py).

The fake-multi-host analog from SURVEY §4: N processes × 4 virtual CPU
devices each form one global mesh; all run the replicated host
pipeline and must produce identical translations.
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(__file__))
DEMO = os.path.join(ROOT, "scripts", "multihost_demo.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_spmd_translation():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, DEMO, str(i), "2", f"127.0.0.1:{port}"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=280)
        assert proc.returncode == 0, out
        outputs.append(out)

    def translations(text):
        return [
            line.split("->", 1)[1]
            for line in text.splitlines()
            if "->" in line
        ]

    t0, t1 = translations(outputs[0]), translations(outputs[1])
    assert len(t0) == 8
    assert t0 == t1  # SPMD processes agree exactly
    assert all("DONE devices=8 local=4" in out for out in outputs)
