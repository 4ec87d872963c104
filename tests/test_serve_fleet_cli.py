"""serve_fleet CLI: the fleet-serving demonstration must be self-verifying.

Drives examples/serve_fleet.py as a subprocess in its three modes (ragged
MP3 run loop, whole-stream FLAC fleet, composed MP3 decode->resample over
the 8-device CPU mesh) and checks the emitted metrics JSON plus the
--verify cross-check against single-stream decode.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(args, n_devices=1):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=str(REPO / "build" / "jax_cache"))
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_devices}").strip()
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "serve_fleet.py"), *args],
        capture_output=True, text=True, timeout=580, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    lines = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    return lines


def test_serve_fleet_mp3_ragged_verified():
    lines = _run(["--codec", "mp3", "--streams", "5", "--min-frames", "3",
                  "--max-frames", "6", "--run-frames", "3", "--verify",
                  "--seed", "11"])
    agg = lines[-1]
    assert agg["aggregate"] == "mp3" and agg["verified"] is True
    runs = lines[:-1]
    # ragged lengths: the active count must shrink across runs
    assert runs[0]["active"] == 5
    assert runs[-1]["active"] < 5
    assert agg["samples"] == sum(r["samples"] for r in runs) > 0


def test_serve_fleet_mp3_continuous_batching_verified():
    """--total-streams > --streams: finished slots recycle via
    reset_stream; every admitted stream's PCM must still verify against a
    fresh single-stream decode (a stale carried-state row after recycle
    would corrupt the admitted stream's first frames)."""
    lines = _run(["--codec", "mp3", "--streams", "4", "--total-streams", "9",
                  "--min-frames", "3", "--max-frames", "6", "--run-frames",
                  "3", "--verify", "--seed", "11"])
    agg = lines[-1]
    assert agg["verified"] is True
    assert agg["streams"] == 9 and agg["slots"] == 4
    assert sum(r["recycled"] for r in lines[:-1]) == 9 - 4


def test_serve_fleet_flac_verified():
    lines = _run(["--codec", "flac", "--streams", "3", "--min-frames", "2",
                  "--max-frames", "3", "--seed", "4"])
    agg = lines[-1]
    assert agg["aggregate"] == "flac" and agg["verified"] is True
    assert agg["samples"] > 0


def test_serve_fleet_mp3_composed_mesh_verified():
    """Composed decode->resample (PCM device-resident between stages) over
    the 8-device CPU stream mesh, cross-checked against single-stream
    decode."""
    lines = _run(["--codec", "mp3", "--streams", "8", "--min-frames", "4",
                  "--max-frames", "4", "--run-frames", "2", "--rate",
                  "16000", "--mesh", "8", "--verify", "--seed", "9"],
                 n_devices=8)
    agg = lines[-1]
    assert agg["verified"] is True
    assert agg["samples"] == 8 * 4 * 2 * 576 * 2   # B x frames x gr x 576 x ch
