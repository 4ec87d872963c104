#!/usr/bin/env python3
"""Capture a JAX profiler trace of a serving step (SURVEY.md §5 tracing row).

The reference has no tracing/profiling subsystem at all (SURVEY §5: its
only artifacts are README notes).  Here one command records a full
XLA/TPU trace of a warm serving step — kernel timelines, fusion
boundaries, transfer overlap — viewable with TensorBoard or xprof
(`tensorboard --logdir <out>`):

    python tools/profile_trace.py --what resample --out build/trace
    python tools/profile_trace.py --what mp3
    python tools/profile_trace.py --what flac

The step is compiled and run once BEFORE tracing starts, so the capture
shows the steady-state program, not compilation.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO / "build" / "jax_cache"))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402


def _step_resample(B, frames):
    from esp_audio_libs_tpu.models.resampler import (Resampler,
                                                     ResamplerConfiguration)

    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 32)
    r = Resampler(batch=B, exact=False)
    r.initialize(cfg)
    pcm = (np.random.default_rng(1)
           .integers(-20000, 20000, (B, frames * 2)).astype(np.int16))
    data = pcm.view(np.uint8).reshape(B, -1)

    def step():
        out, gens, clips = r.resample_stream(data, frames, 1)
        jax.block_until_ready(out)

    return step


def _step_mp3(B, frames):
    from tests.test_mp3_coverage import craft_tonal_frame

    from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder

    rng = np.random.default_rng(2)
    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)
    blob = b"".join(craft_tonal_frame(cfg, rng) for _ in range(frames * 4))
    stream = np.frombuffer(blob, np.uint8)
    bat = BatchedMP3Decoder(B)
    pos = [0] * B

    def step():
        res = bat.decode_run([stream[p:] for p in pos], frames)
        for i in range(B):
            pos[i] += res.next_pos[i]

    return step


def _step_flac(B, frames):
    from flacgen import SubframePlan, make_flac

    from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder

    blob, _ = make_flac(rng_seed=4, depth=16, channels=2, block_size=4096,
                        n_frames=frames,
                        plans=[[SubframePlan("lpc", order=8, fit=True),
                                SubframePlan("lpc", order=8, fit=True)]] * frames)
    bat = BatchedFLACDecoder(B)
    bat.read_headers([blob] * B)
    bodies = [blob[d.get_bytes_index():] for d in bat.decoders]

    def step():
        bat.decode_streams(bodies, verify_md5=False)

    return step


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--what", choices=["resample", "mp3", "flac"],
                    default="resample")
    ap.add_argument("--out", default=str(REPO / "build" / "trace"))
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=2048,
                    help="chunk frames (resample) / run frames (mp3) / "
                    "stream frames (flac)")
    args = ap.parse_args()
    if args.what == "mp3":
        args.frames = min(args.frames, 8)
    if args.what == "flac":
        args.frames = min(args.frames, 16)

    step = {"resample": _step_resample, "mp3": _step_mp3,
            "flac": _step_flac}[args.what](args.streams, args.frames)
    step()                      # compile + warm OUTSIDE the trace
    out = Path(args.out) / args.what
    out.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(out)):
        step()
    print(f"trace written: {out}  (view: tensorboard --logdir {out})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
