"""CLI end-to-end smoke (subprocess, CPU backend, tiny sizes)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",  # overridden by the plugin; cli uses defaults
    JAX_COMPILATION_CACHE_DIR="/root/.cache/jax",
    JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0",
)


def test_cli_evaluate_smoke(tmp_path):
    out = tmp_path / "results.json"
    r = subprocess.run(
        [
            sys.executable, "-m", "thinktwice_tpu.cli", "evaluate",
            "--agent", "autopilot", "--n-routes", "2", "--batch", "2",
            "--vehicles", "0", "--out", str(out),
        ],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=850,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    doc = json.load(open(out))
    assert doc["labels"][0] == "Driving score"
    assert len(doc["_checkpoint"]["records"]) == 2
