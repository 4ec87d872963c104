#!/usr/bin/env python3
"""serve_fleet: fleet-serving demonstration — N compressed streams per chip.

This is the workflow the reference cannot express: its API is one decoder
instance per embedded core, one stream at a time (reference
include/mp3_decoder.h:303-336; SURVEY.md §2 DP row — parallelism is the
caller's problem).  Here a whole fleet decodes through shared batched device
kernels, ONE dispatch per format group per run:

  MP3:  BatchedMP3Decoder.decode_run loop — fixed-frame runs, the
        decode_run/next_pos continuation protocol (reservoir slack is
        skipped inside the run and is NOT part of any frame's consumed),
        ragged stream lengths (streams finish at different runs), and
        continuous batching: with --total-streams > --streams, finished
        slots recycle via reset_stream and admit pending streams, so a
        fixed-width fleet serves an open-ended queue. Mixed formats
        (stereo + mono) dispatch as separate groups.
  FLAC: BatchedFLACDecoder.decode_streams — whole-stream fleet decode with
        per-stream MD5 self-verification, ragged stream lengths.

Optional:
  --rate HZ   (MP3 uniform fleets) compose decode -> resample with PCM
              device-resident between the stages (only compressed frames go
              up; only resampled PCM would come down).
  --mesh N    serve SPMD over an N-device stream mesh (on a CPU host, set
              JAX_PLATFORMS=cpu and
              XLA_FLAGS=--xla_force_host_platform_device_count=N).
  --verify    cross-check every stream's fleet PCM against a single-stream
              decode with the reference caller protocol.

Prints one metrics JSON line per run and one aggregate line:
  {"run": i, "active": k, "samples": n, "ms": t, "msps": r}
  {"aggregate": ..., "streams": N, "samples": n, "msps": r,
   "realtime_streams": x, "verified": true|null}

Corpus is generated in-process (no encoder exists in this image): MP3 tonal
success frames (nonzero spectra) via the conformance generator; FLAC via
tools/flacgen.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import os

import jax

# honor an explicit JAX_PLATFORMS choice even where a site plugin pins a
# remote TPU (same pattern as the other example CLIs)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402


def _mesh(n):
    if not n:
        return None
    from esp_audio_libs_tpu.parallel.mesh import stream_mesh

    m = stream_mesh()
    if m.size != n:
        print(f"ERROR: --mesh {n} but {m.size} device(s) visible")
        sys.exit(1)
    return m


# ----------------------------------------------------------------- MP3 fleet


MP3_STEREO = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)
MP3_MONO = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=3)


def _mp3_corpus(n_streams, min_frames, max_frames, seed, uniform):
    """Tonal success-frame streams with ragged lengths; mixed stereo/mono
    formats unless uniform (composed mode needs one format group)."""
    from tests.test_mp3_coverage import craft_tonal_frame

    rng = np.random.default_rng(seed)
    streams, metas = [], []
    for i in range(n_streams):
        cfg = MP3_STEREO if (uniform or i % 3) else MP3_MONO
        n = (max_frames if uniform
             else int(rng.integers(min_frames, max_frames + 1)))
        streams.append(np.frombuffer(
            b"".join(craft_tonal_frame(cfg, rng) for _ in range(n)), np.uint8))
        metas.append((cfg, n))
    return streams, metas


def _mp3_single_decode(data: bytes, n_frames: int):
    """The reference caller protocol on one stream: decode, advance by
    consumed, then MP3FindSyncWord past reservoir slack (reference
    mp3_decoder.cpp:8533) — the per-stream ground truth for --verify."""
    from esp_audio_libs_tpu.models.mp3 import MP3Decoder

    dec = MP3Decoder()
    pos, out = 0, []
    data = bytes(data)
    while pos < len(data) and len(out) < n_frames:
        err, pcm, consumed = dec.decode(data[pos:])
        out.append((int(err), None if pcm is None else np.asarray(pcm)))
        pos += consumed
        if int(err) != 0:
            break
        nxt = MP3Decoder.find_sync_word(data[pos:])
        pos = pos + nxt if nxt >= 0 else len(data)
    return out


def serve_mp3(args) -> int:
    from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder

    uniform = args.rate is not None
    total = max(args.total_streams or args.streams, args.streams)
    if uniform and total != args.streams:
        print("ERROR: --total-streams recycling demo needs the ragged mode "
              "(composed --rate fleets run in lockstep)")
        return 1
    streams, metas = _mp3_corpus(total, args.min_frames,
                                 args.max_frames, args.seed, uniform)
    fleet = BatchedMP3Decoder(args.streams, mesh=_mesh(args.mesh))

    resampler = None
    if uniform:
        from esp_audio_libs_tpu.models.resampler import (
            Resampler, ResamplerConfiguration)

        resampler = Resampler(batch=args.streams, exact=False,
                              mesh=fleet.mesh)
        ok = resampler.initialize(ResamplerConfiguration(
            44100.0, float(args.rate), 16, 16, 2, True, True, 64, 32))
        assert ok

    # slot_of[i]: which stream occupies slot i (None = idle); finished
    # slots recycle via fleet.reset_stream and admit the next pending
    # stream — continuous batching over a fixed-width fleet
    slot_of = list(range(args.streams))
    next_admit = args.streams
    pos = [0] * args.streams
    per_stream_pcm = [[] for _ in range(total)]
    nch_of = [1 if m[0]["mode"] == 3 else 2 for m in metas]
    total_samples = 0
    audio_seconds = 0.0   # per-stream channel-aware realtime equivalence
    run = 0
    t_all = time.perf_counter()

    def finish_slot(i):
        nonlocal next_admit
        if next_admit < total:
            fleet.reset_stream(i)
            slot_of[i], pos[i] = next_admit, 0
            next_admit += 1
            return True   # recycled
        slot_of[i] = None
        return False

    while any(s is not None for s in slot_of):
        bufs = [None if slot_of[i] is None else streams[slot_of[i]][pos[i]:]
                for i in range(args.streams)]
        t0 = time.perf_counter()
        if uniform:
            # composed serving: PCM never visits the host between stages
            res = fleet.decode_run(bufs, args.run_frames, to_device=True)
            pcm_dev, _consumed = res
            nb = pcm_dev.shape[1] * 2
            pcm_u8 = jax.lax.bitcast_convert_type(
                pcm_dev, jax.numpy.uint8).reshape(args.streams, nb)
            out, gens, _clips = resampler.resample_stream(
                pcm_u8, nb // 4, 1)
            jax.block_until_ready(out)
            samples = int(pcm_dev.shape[0]) * int(pcm_dev.shape[1])
            audio_seconds += samples / (44100.0 * 2)   # uniform = stereo
            if args.verify:
                host = np.asarray(pcm_dev)
                for i in range(args.streams):
                    per_stream_pcm[slot_of[i]].append(host[i])
            next_pos = res.next_pos
            errored = [False] * args.streams
        else:
            res = fleet.decode_run(bufs, args.run_frames)
            samples = 0
            errored = [False] * args.streams
            for i in range(args.streams):
                if bufs[i] is None:
                    continue
                for err, pcm, _c in res[i]:
                    if pcm is not None:
                        samples += pcm.size
                        audio_seconds += pcm.size / (44100.0 * nch_of[slot_of[i]])
                        if args.verify:
                            per_stream_pcm[slot_of[i]].append(np.asarray(pcm))
                    if int(err) != 0:
                        errored[i] = True   # run ends a stream at first error
            next_pos = res.next_pos
        dt = time.perf_counter() - t0
        active = sum(1 for b in bufs if b is not None)
        recycled = 0
        for i in range(args.streams):
            if bufs[i] is None:
                continue
            pos[i] += next_pos[i]
            if errored[i] or pos[i] >= streams[slot_of[i]].size:
                recycled += int(finish_slot(i))
        total_samples += samples
        print(json.dumps({"run": run, "active": active, "samples": samples,
                          "recycled": recycled, "ms": round(dt * 1e3, 2),
                          "msps": round(samples / dt / 1e6, 2)}))
        run += 1
    dt_all = time.perf_counter() - t_all

    verified = None
    if args.verify:
        verified = True
        for i, (meta_cfg, n) in enumerate(metas):
            want = _mp3_single_decode(streams[i], n)
            got = np.concatenate(per_stream_pcm[i]) if per_stream_pcm[i] \
                else np.zeros(0, np.int16)
            ref = [p for e, p in want if p is not None]
            refcat = np.concatenate(ref) if ref else np.zeros(0, np.int16)
            if got.size < refcat.size or not np.array_equal(
                    got[:refcat.size], refcat):
                verified = False
                print(f"VERIFY FAIL: stream {i}", file=sys.stderr)
    # realtime equivalence: decoded audio seconds per wall second (each
    # stream weighted by its own channel count — a mono stream producing
    # 44100 interleaved samples/s is one realtime stream, not half)
    sps = total_samples / dt_all
    rt = audio_seconds / dt_all
    print(json.dumps({"aggregate": "mp3", "streams": total,
                      "slots": args.streams,
                      "samples": total_samples, "runs": run,
                      "msps": round(sps / 1e6, 2),
                      "realtime_streams": round(rt, 1),
                      "verified": verified}))
    return 0 if verified in (True, None) else 1


# ---------------------------------------------------------------- FLAC fleet


def serve_flac(args) -> int:
    from flacgen import SubframePlan, make_flac

    from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder
    from esp_audio_libs_tpu.utils.errors import FLACDecoderResult

    rng = np.random.default_rng(args.seed)
    blobs = []
    for i in range(args.streams):
        n_frames = int(rng.integers(args.min_frames, args.max_frames + 1))
        blob, _pcm = make_flac(
            rng_seed=args.seed * 1000 + i, depth=16, channels=2,
            block_size=1024, n_frames=n_frames,
            plans=[[SubframePlan("lpc", order=8, fit=True),
                    SubframePlan("lpc", order=8, fit=True)]] * n_frames)
        blobs.append(blob)

    fleet = BatchedFLACDecoder(args.streams, mesh=_mesh(args.mesh))
    t0 = time.perf_counter()
    hdrs = fleet.read_headers(blobs)
    assert all(h == FLACDecoderResult.SUCCESS for h in hdrs)
    results = fleet.decode_streams(
        [b[d.get_bytes_index():] for b, d in zip(blobs, fleet.decoders)])
    dt = time.perf_counter() - t0

    # num_samples is already interleaved (channels included)
    total_samples = sum(info["num_samples"] for _pcm, info in results)
    verified = all(info["md5_ok"] for _pcm, info in results)
    sps = total_samples / dt
    print(json.dumps({"aggregate": "flac", "streams": args.streams,
                      "samples": total_samples,
                      "msps": round(sps / 1e6, 2),
                      "realtime_streams": round(sps / (44100 * 2), 1),
                      "verified": verified}))
    return 0 if verified else 1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--codec", choices=["mp3", "flac"], default="mp3")
    ap.add_argument("--streams", type=int, default=8,
                    help="fleet width (concurrent serving slots)")
    ap.add_argument("--total-streams", type=int, default=None,
                    help="MP3: total streams to serve; slots recycle via "
                    "reset_stream as streams finish (continuous batching)")
    ap.add_argument("--min-frames", type=int, default=4)
    ap.add_argument("--max-frames", type=int, default=10)
    ap.add_argument("--run-frames", type=int, default=4,
                    help="frames decoded per serving run (MP3)")
    ap.add_argument("--rate", type=float, default=None,
                    help="MP3 only: composed decode->resample to this rate "
                    "(uniform fleet, PCM device-resident between stages)")
    ap.add_argument("--mesh", type=int, default=None,
                    help="serve SPMD over an N-device stream mesh")
    ap.add_argument("--verify", action="store_true",
                    help="cross-check fleet PCM against single-stream decode")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    if args.codec == "flac" and args.rate is not None:
        print("ERROR: --rate composition is demonstrated for --codec mp3 "
              "(FLAC composition: models/flac.decode_streams_to_device)")
        return 1
    if args.codec == "flac" and args.total_streams is not None:
        print("ERROR: --total-streams slot recycling is demonstrated for "
              "--codec mp3 (FLAC serves whole streams per decode_streams "
              "call; recycle with BatchedFLACDecoder.reset_stream)")
        return 1
    return serve_mp3(args) if args.codec == "mp3" else serve_flac(args)


if __name__ == "__main__":
    sys.exit(main())
