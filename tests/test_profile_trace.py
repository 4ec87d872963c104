"""profile_trace tool: a serving step must produce a real XLA trace
(SURVEY.md §5 tracing row — the reference has no profiling subsystem)."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_profile_trace_resample(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=str(REPO / "build" / "jax_cache"))
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "profile_trace.py"),
         "--what", "resample", "--streams", "8", "--frames", "512",
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=560, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    captured = list((tmp_path / "resample").rglob("*.xplane.pb"))
    assert captured, "no xplane capture written"
