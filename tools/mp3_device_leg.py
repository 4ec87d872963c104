#!/usr/bin/env python
"""Pin the MP3 device-leg cost with a granule-count scaling fit.

Single isolated-dispatch timings through this box's tunneled TPU are
untrustworthy (PROFILES.md "measurement tooling notes": the same program
reads both ~0.1 ms and ~364 ms in different process states).  Steady-state
e2e loops ARE trustworthy — so this tool times the fused granule scan
(`mp3_pipeline._granules_scan_for`, the whole device leg of decode_run) at
several run lengths G with all inputs DEVICE-RESIDENT, one dispatch per
call, many reps, and fits time-vs-G: the slope is the per-granule device
cost with the tunnel's fixed per-dispatch noise cancelled out.

Usage: python tools/mp3_device_leg.py [B] [reps] [tier]
``tier`` = exact (default) | fast (the opt-in f32 tier, ops/mp3fast.py).
Prints one JSON line with the fit and derived throughput.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "build", "jax_cache"))

import numpy as np


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    tier = sys.argv[3] if len(sys.argv) > 3 else "exact"

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from esp_audio_libs_tpu.models import mp3_pipeline

    nch = 2
    ver, sr_idx, cutoff = 0, 0, 576 // 18   # MPEG-1 44.1k stereo
    cw = 2 * 22 + 2 * 39 + 2 * 6 + 23 + 39 + 23 + 13 + 3
    scan = (mp3_pipeline._granules_scan_fast_for if tier == "fast"
            else mp3_pipeline._granules_scan_for)(ver, sr_idx, nch, cutoff)

    rng = np.random.default_rng(0)
    results = {}
    Gs = [32, 128, 512]
    for G in Gs:
        # realistic magnitudes (int16-packed spectra); values don't change the
        # compute path (no data-dependent control flow inside the scan)
        huff = rng.integers(-8000, 8000, (G, B, nch, 576)).astype(np.int16)
        side = np.zeros((G, B, 3 * nch + cw), np.int32)
        huff_d = jax.device_put(jnp.asarray(huff))
        side_d = jax.device_put(jnp.asarray(side))
        state = (jnp.zeros((B, 2, 288), jnp.int32), jnp.zeros((B, 2), jnp.int32),
                 jnp.zeros((B, 2), jnp.int32), jnp.zeros((B, 2), jnp.int32),
                 jnp.zeros((B, 2176), jnp.int32))
        jax.block_until_ready((huff_d, side_d, state))

        # warm compile + first run
        out = scan(huff_d, side_d, *state, jnp.int32(0))
        jax.block_until_ready(out)

        # steady-state loop: chain state through reps so no rep can be
        # elided, and FETCH a tiny output slice every rep — on this tunnel
        # block_until_ready is not a trustworthy completion signal (the same
        # program reads 0.16 ms for G=32 and G=512 alike, a physical
        # impossibility), but a D2H of real output bytes cannot return until
        # the executable finished.  The per-rep fetch latency is fixed
        # overhead; the time-vs-G slope cancels it.
        t0 = time.perf_counter()
        st = state
        for _ in range(reps):
            pcm, st, ru = scan(huff_d, side_d, *st, jnp.int32(0))
            _ = np.asarray(ru)   # [B] bool: 256-byte D2H completion barrier
        dt = (time.perf_counter() - t0) / reps
        results[G] = dt
        print(f"G={G}: {dt*1e3:.2f} ms/run  ({G*576*nch*B/dt/1e6:.0f} Ms/s)",
              file=sys.stderr)

    # slope from the two LARGEST G points: the first-measured G absorbs any
    # residual warm-up/tunnel-congestion transient (observed: a 39 s/run
    # outlier at G=32 in one session while G=128/512 agreed to 2%)
    gs = np.array(Gs[-2:], float)
    ts = np.array([results[g] for g in Gs[-2:]])
    slope, intercept = np.polyfit(gs, ts, 1)
    per_granule_us = slope * 1e6
    msps = 576 * nch * B / slope / 1e6 if slope > 0 else float("inf")
    streams_rt = msps * 1e6 / (2 * 44100)
    print(json.dumps({
        "B": B, "reps": reps, "tier": tier,
        "times_s": {str(g): results[g] for g in Gs},
        "per_granule_us": per_granule_us, "intercept_ms": intercept * 1e3,
        "device_msamples_per_s": msps,
        "realtime_stereo_streams_per_chip": streams_rt,
        "method": "time-vs-G least squares over device-resident fused scans",
    }))


if __name__ == "__main__":
    main()
