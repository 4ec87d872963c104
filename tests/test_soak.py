"""Serving-loop soak: repeated identical fleet cycles must not grow memory.

Production serving runs the same jitted programs for hours (SURVEY.md §2
parallelism table: the fleet API replaces the reference's
one-instance-per-stream caller loop, include/mp3_decoder.h:303-336).  Any
per-cycle allocation that escapes — a native front-end context that is not
destroyed, a device array pinned by host references, a cache keyed on
per-call state — shows up as monotone growth across cycles.  These tests run
identical-shape cycles after a warmup and assert:

  1. the set of live JAX device arrays returns to its baseline count
     (sharp: catches any leaked device buffer), and
  2. the resident set stays flat within an allowance that covers allocator
     jitter but not a real per-cycle leak.
"""

import gc
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder, BatchedMP3Decoder
from esp_audio_libs_tpu.models.flac import FLACDecoder
from esp_audio_libs_tpu.models.mp3 import MP3Decoder
from esp_audio_libs_tpu.utils.errors import FLACDecoderResult


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    raise RuntimeError("no VmRSS in /proc/self/status")


def _mp3_streams(n, nf=6):
    from tests.test_mp3_coverage import craft_tonal_frame

    out = []
    for i in range(n):
        rng = np.random.default_rng(700 + i)
        cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)
        out.append(b"".join(craft_tonal_frame(cfg, rng) for _ in range(nf)))
    return out


def _flac_streams():
    from flacgen import SubframePlan, make_flac

    cfgs = [
        dict(rng_seed=61, depth=16, channels=2, block_size=1024, n_frames=2,
             plans=[[SubframePlan("lpc", order=8), SubframePlan("fixed", order=2)]] * 2),
        dict(rng_seed=62, depth=16, channels=2, block_size=1024, n_frames=2,
             plans=[[SubframePlan("lpc", order=4), SubframePlan("constant")]] * 2),
    ]
    return [make_flac(**c)[0] for c in cfgs]


def test_fleet_serving_cycles_leak_free():
    mp3_bufs = _mp3_streams(4)
    flac_bufs = _flac_streams()

    mp3 = BatchedMP3Decoder(len(mp3_bufs))
    flac = BatchedFLACDecoder(len(flac_bufs))
    hdrs = flac.read_headers(flac_bufs)
    assert all(h == FLACDecoderResult.SUCCESS for h in hdrs)
    flac_frames = [b[d.get_bytes_index():] for b, d in zip(flac_bufs, flac.decoders)]

    def cycle():
        for s in range(len(mp3_bufs)):   # slot recycling: same fleet, "new" streams
            mp3.reset_stream(s)
        r = mp3.decode_run(mp3_bufs, 3)
        res = flac.decode_streams(flac_frames)
        assert all(info["md5_ok"] for _, info in res)
        return r

    for _ in range(5):                  # warmup: compiles, pools, caches
        cycle()
    gc.collect()
    base_live = len(jax.live_arrays())
    base_rss = _rss_mb()

    n_cycles = 40
    for _ in range(n_cycles):
        cycle()
    gc.collect()

    live = len(jax.live_arrays())
    # the decoder's carried state tensors are rebuilt by reset_stream, so the
    # count is stable, not merely bounded
    assert live <= base_live + 4, (
        f"live device arrays grew {base_live} -> {live} over {n_cycles} "
        "identical cycles: a device buffer is leaking per cycle")

    grown = _rss_mb() - base_rss
    assert grown < 64.0, (
        f"RSS grew {grown:.1f} MB over {n_cycles} identical serving cycles "
        f"(from {base_rss:.1f} MB): host memory is leaking per cycle")


def test_native_context_churn_bounded():
    """Create/destroy churn of the native front-end contexts (the
    continuous-batching admission path) must not accumulate host memory:
    every eal_flac_create/eal_mp3_create is balanced by its destroy in
    __del__."""
    blob = _flac_streams()[0]
    mp3_blob = _mp3_streams(1, nf=2)[0]

    def churn():
        d = FLACDecoder()
        assert d.read_header(blob) == FLACDecoderResult.SUCCESS
        m = MP3Decoder()
        m.decode(mp3_blob)
        del d, m

    for _ in range(20):                 # warmup
        churn()
    gc.collect()
    base = _rss_mb()
    for _ in range(300):
        churn()
    gc.collect()
    grown = _rss_mb() - base
    assert grown < 16.0, (
        f"RSS grew {grown:.1f} MB over 300 native context create/destroy "
        "cycles: a front-end context or its buffers leak")
