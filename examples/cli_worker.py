#!/usr/bin/env python3
"""Persistent warm CLI worker for the conformance runners.

The conformance suites drive the real user CLIs (flac_to_wav / mp3_to_wav)
per corpus file.  A fresh ``python flac_to_wav.py`` subprocess per file pays
the JAX import + backend init (~5-10 s) every time, which put the cold
FLAC+MP3 suites at many minutes of pure startup (VERDICT r3 #8).  This
worker keeps ONE process alive per pool slot: it imports the CLI module
once (inheriting the persistent XLA compile cache), then serves jobs over
stdin/stdout as JSON lines, calling the CLI's ``convert()`` — the same code
path the standalone CLI runs after argparse — with stdout captured so the
runner can scrape it exactly as it scraped the subprocess output.

Protocol: one JSON object per line on stdin
    {"in": path, "out": path, "kw": {...}}
answered by one JSON line
    {"rc": int, "stdout": str}
EOF on stdin ends the worker.

Run: python examples/cli_worker.py flac|mp3
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys
import threading
from contextlib import redirect_stdout
from pathlib import Path

HERE = Path(__file__).resolve().parent


def _serve(codec: str) -> int:
    sys.path.insert(0, str(HERE))
    if codec == "flac":
        from flac_to_wav import convert
    elif codec == "mp3":
        from mp3_to_wav import convert
    else:
        print(json.dumps({"error": f"unknown codec {codec}"}), flush=True)
        return 2
    print(json.dumps({"ready": True}), flush=True)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        job = json.loads(line)
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                rc = convert(job["in"], job["out"], **job.get("kw", {}))
        except SystemExit as e:   # convert() itself never raises this; belt
            rc = int(e.code or 0)
        except Exception as e:    # a crashed convert marks the FILE failed
            buf.write(f"worker exception: {e!r}\n")
            rc = 99
        print(json.dumps({"rc": rc, "stdout": buf.getvalue()}), flush=True)
    return 0


class WarmCliPool:
    """Pool of persistent CLI worker subprocesses for a conformance runner.

    ``drive(in_path, out_path)`` behaves like
    ``subprocess.run([python, cli, in, out])`` — returns (returncode,
    stdout) — but amortizes the JAX startup across every file.  Thread-safe:
    each worker is checked out under a lock, so the runner's existing
    ThreadPoolExecutor concurrency maps 1:1 onto pool slots."""

    def __init__(self, codec: str, n_workers: int = 2, timeout: float = 900.0):
        self.timeout = timeout
        self._free: "list[subprocess.Popen]" = []
        self._cv = threading.Condition()
        env = os.environ.copy()
        for _ in range(n_workers):
            p = subprocess.Popen(
                [sys.executable, str(HERE / "cli_worker.py"), codec],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL, text=True, env=env)
            self._free.append(p)
        # wait for the ready line so startup cost lands here, not in the
        # first file's timing
        for p in self._free:
            ready = p.stdout.readline()
            if not ready or "ready" not in ready:
                raise RuntimeError("cli worker failed to start")

    def drive(self, in_path, out_path, **kw):
        with self._cv:
            while not self._free:
                self._cv.wait()
            p = self._free.pop()
        try:
            p.stdin.write(json.dumps(
                {"in": str(in_path), "out": str(out_path), "kw": kw}) + "\n")
            p.stdin.flush()
            line = p.stdout.readline()
            if not line:
                return 98, ""          # worker died: mark this file failed
            r = json.loads(line)
            return int(r["rc"]), r["stdout"]
        finally:
            with self._cv:
                self._free.append(p)
                self._cv.notify()

    def close(self):
        with self._cv:
            for p in self._free:
                try:
                    p.stdin.close()
                    p.wait(timeout=10)
                except Exception:
                    p.kill()
            self._free.clear()


if __name__ == "__main__":
    sys.exit(_serve(sys.argv[1] if len(sys.argv) > 1 else "flac"))
