#!/usr/bin/env python3
"""Benchmark harness covering ALL of BASELINE.json's benchmark configs.

The driver's contract benchmark is ``bench.py`` (one JSON line, the
headline 44.1k->16k resample). This script reports the full config list —
one JSON line per config — plus the north-star aggregate (decode+resample
realtime-stream equivalents per chip):

  1. flac_to_wav e2e: 44.1kHz/16-bit stereo FLAC -> PCM (batched streams)
  2. WAV header parse + quantized<->float convert + de/interleave
  3. ART resample 44.1k->16k stereo (the headline; same as bench.py)
  4. biquad IIR cascade over batched PCM streams
  5. Helix MP3 decode (dequant+IMDCT+subband batched across streams)

Each line: {"metric", "value", "unit", "realtime_streams"} where
realtime_streams = how many concurrent 44.1kHz streams this throughput
sustains in real time.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

# Persistent XLA compilation cache: repeat bench runs skip the multi-minute
# recompiles (fresh clones still pay them once).
import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       str(__import__("pathlib").Path(__file__).resolve().parent / "build" / "jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))

RT = 44100.0

# ---- roofline accounting (VERDICT r4 #7) -----------------------------------
# Public TPU v5e (v5 lite) per-chip peaks: 197 TFLOP/s bf16 MXU,
# ~819 GB/s HBM.  Device-leg rows carry analytic op/byte counts (formulas at
# each call site) so the JSON states what fraction of chip peak each
# flagship kernel achieves and which wall it is against; PROFILES.md
# explains each kernel's bound.
V5E_BF16_PEAK = 197e12
V5E_HBM_BPS = 819e9


def roofline(flops_per_sample, bytes_per_sample, samples_per_s, kind="mxu"):
    """mfu = achieved FLOP/s over bf16 MXU peak; bw_frac = achieved HBM
    traffic over peak bandwidth.  ``kind='vpu-int'`` marks kernels whose
    "flops" are int32 VPU ops (FLAC LPC) — mfu is then indicative only
    (the MXU peak is not the right numerator for integer scans)."""
    mfu = flops_per_sample * samples_per_s / V5E_BF16_PEAK
    bwf = bytes_per_sample * samples_per_s / V5E_HBM_BPS
    return {"mfu": round(mfu, 5), "bw_frac": round(bwf, 5),
            "flops_per_sample": round(float(flops_per_sample), 1),
            "bytes_per_sample": round(float(bytes_per_sample), 2),
            "compute_kind": kind,
            "bound": "hbm" if bwf > mfu else "compute"}


def report(metric, samples_per_s, unit="Msamples/s/chip", ch=2, extra=None):
    row = {
        "metric": metric,
        "value": round(samples_per_s / 1e6, 2),
        "unit": unit,
        "realtime_streams": int(samples_per_s / (RT * ch)),
    }
    if extra:
        row.update(extra)
    print(json.dumps(row))


def bench_flac_e2e(B=256, n_frames=16, block=4096):
    """Config 1: batched FLAC decode to PCM, 16-bit stereo 44.1k.

    The corpus uses encoder-grade fitted LPC (flacgen fit=True) so the
    residual statistics — and therefore the int16 upload fast path — match
    real audio.  Also reports the host-parse and device-only legs: on this
    box the axon tunnel's H2D/D2H bandwidth is the e2e wall (PROFILES.md),
    so the split shows what co-located serving hardware would sustain.
    """
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from flacgen import SubframePlan, make_flac
    from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder
    from esp_audio_libs_tpu.models.flac import _decode_streams, _parse_streams, _frame_kernel

    blob, _ = make_flac(rng_seed=1, depth=16, channels=2, block_size=block,
                        n_frames=n_frames,
                        plans=[[SubframePlan("lpc", order=8, fit=True),
                                SubframePlan("lpc", order=8, fit=True)]] * n_frames)
    blobs = [blob] * B
    bat = BatchedFLACDecoder(B)
    bat.read_headers(blobs)
    bodies = [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)]
    bat.decode_streams(bodies, verify_md5=False)   # warm compile
    t0 = time.perf_counter()
    results = bat.decode_streams(bodies, verify_md5=False)
    dt = time.perf_counter() - t0
    samples = sum(r[1]["num_samples"] for r in results)
    report("flac_decode_e2e_16b_stereo", samples / dt)

    # escape-tier link A/B (VERDICT r4 #10): the SAME corpus with the
    # int8+sideband transport tier force-disabled (int16 upload) in the
    # same process/session — the delta is the sideband's real e2e win on
    # this link (PROFILES.md records the pair)
    from esp_audio_libs_tpu.models import flac as _flac_model
    saved_density = _flac_model.ESC_MAX_DENSITY
    _flac_model.ESC_MAX_DENSITY = -1.0
    try:
        bat.decode_streams(bodies, verify_md5=False)   # warm int16-tier shape
        t0 = time.perf_counter()
        results_ab = bat.decode_streams(bodies, verify_md5=False)
        dt_ab = time.perf_counter() - t0
    finally:
        _flac_model.ESC_MAX_DENSITY = saved_density
    report("flac_decode_e2e_16b_stereo_sideband_off",
           sum(r[1]["num_samples"] for r in results_ab) / dt_ab,
           unit="Msamples/s (A/B: int8+escape sideband disabled)")

    # serving-shaped e2e: host parse + int8 residual upload + device decode
    # with the PCM LEFT ON DEVICE (what the composed serving chain consumes
    # — the PCM-download row above pays a D2H this path never does).
    # Completion barrier: a device-side reduction over every PCM byte whose
    # 4-byte result is fetched — the sum cannot exist before the whole
    # array does (block_until_ready is not trustworthy on this tunnel).
    import jax.numpy as _jnp

    def run_td():
        pcm_dev, res_td = bat.decode_streams_to_device(bodies)
        digest = int(_jnp.sum(pcm_dev.astype(_jnp.uint32)))
        return res_td, digest

    res_td, _ = run_td()   # warm
    t0 = time.perf_counter()
    res_td, _ = run_td()
    dt_td = time.perf_counter() - t0
    report("flac_decode_e2e_to_device",
           sum(r["num_samples"] for r in res_td) / dt_td,
           unit="Msamples/s (e2e, PCM device-resident, digest-verified)")

    # host front-end leg (native parse) at 1/2/4 pool threads — the
    # threaded parse pool is part of the production path (VERDICT r4 #3),
    # so the bench engages it explicitly instead of relying on the
    # auto-size heuristic
    import os as _os
    for nthr in (1, 2, 4):
        _os.environ["EAL_PARSE_THREADS"] = str(nthr)
        try:
            t0 = time.perf_counter()
            groups, _, _ = _parse_streams(bat.decoders, bodies)
            host_dt = time.perf_counter() - t0
        finally:
            _os.environ.pop("EAL_PARSE_THREADS", None)
        suffix = "" if nthr == 1 else f"_{nthr}thr"
        print(json.dumps({"metric": f"flac_host_parse{suffix}",
                          "value": round(samples / host_dt / 1e6, 2),
                          "unit": f"Msamples/s (host leg, {nthr} threads)"}))

    # device-only leg: residuals resident, PCM left on device (dominant
    # width class of the corpus: int8 for fitted-LPC residuals)
    g = next(iter(groups.values()))
    widths = (g.data8, g.data16, g.data32)
    wsel = int(np.bincount(g.wide[: g.nf], minlength=3).argmax())
    rows = np.nonzero(g.wide[: g.nf] == wsel)[0]
    slots = g.slot[rows]
    nw = len(rows)
    dev = [jnp.asarray(x) for x in (widths[wsel][slots], g.coeffs[rows],
                                    g.order[rows], g.shift[rows],
                                    g.wasted[rows], g.ca[rows])]
    jax.block_until_ready(dev)
    acc64 = bool(g.use64[rows].any())
    from esp_audio_libs_tpu.models.flac import _order_class
    morder = _order_class(g.order[rows])
    n16 = nw
    out = _frame_kernel(*dev, depth=16, nch=2, mode32=False, use64=acc64,
                        max_order=morder)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = _frame_kernel(*dev, depth=16, nch=2, mode32=False, use64=acc64,
                            max_order=morder)
    jax.block_until_ready(out)
    dev_dt = (time.perf_counter() - t0) / reps
    dev_samples = n16 * 2 * block
    # LPC scan: 2*W int32 MACs per sample (W = order-class window) + shift/
    # select; bytes: residual read (upload width) + int32 restore write +
    # decorrelate r/w + pack read + s16 write, per channel-sample.
    in_b = (1, 2, 4)[wsel]
    rl = roofline(2.0 * morder, in_b + 4 + 8 + 4 + 2,
                  dev_samples / dev_dt, kind="vpu-int")
    report("flac_decode_device_only", dev_samples / dev_dt,
           unit="Msamples/s/chip (device leg)", extra=rl)


def bench_wav_quant(B=2048, frames=65536):
    """Config 2: WAV header parse + packed s16 <-> float + de/interleave."""
    import struct
    import jax
    import jax.numpy as jnp
    from esp_audio_libs_tpu.models.wav import WAVDecoder
    from esp_audio_libs_tpu.ops import quantization as q

    # header parse rate (host state machine; per-stream)
    payload = np.zeros(64, np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + 64) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 64) + payload.tobytes())
    t0 = time.perf_counter()
    n = 20000
    for _ in range(n):
        d = WAVDecoder()
        d.decode_header(wav)
    hdr_rate = n / (time.perf_counter() - t0)

    rng = np.random.default_rng(0)
    data = jax.device_put(rng.integers(0, 256, (B, frames * 4), dtype=np.uint8))

    @jax.jit
    def roundtrip(data):
        x = q.int_to_float(q.unpack_pcm16_planar2(data), np.float32(1 / 32768.0))
        s, clip = q.float_to_int(x, 16)
        return q.pack_pcm16_interleave2(s), jnp.sum(clip)

    out = roundtrip(data)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = roundtrip(data)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    report("quantize_roundtrip_s16_stereo", B * frames * 2 / dt)
    print(json.dumps({"metric": "wav_header_parse", "value": round(hdr_rate),
                      "unit": "headers/s (host)"}))


def bench_resample(B=2048, frames=8192, n_chunks=8):
    """Config 3: the headline (same path as bench.py)."""
    import jax
    from esp_audio_libs_tpu.models.resampler import Resampler, ResamplerConfiguration

    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 32)
    r = Resampler(batch=B, exact=False)
    r.initialize(cfg)
    rng = np.random.default_rng(0)
    data = jax.device_put(rng.integers(0, 256, (B, n_chunks * frames * 4), dtype=np.uint8))
    packed, gens, clipped = r.resample_stream(data, frames, n_chunks)
    jax.block_until_ready(packed)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        packed, gens, clipped = r.resample_stream(data, frames, n_chunks)
    jax.block_until_ready(packed)
    dt = (time.perf_counter() - t0) / reps
    rate = B * frames * n_chunks * 2 / dt
    # banded MXU contraction (ops/polyphase.py): per chunk of `frames` input
    # frames, nt = ceil((frames*ratio+8)/128) output tiles each contract
    # K=768 folded taps x 128 outputs over B*ch lines -> flops/input-sample
    # = 2*nt*K*128/frames; bytes: nt*K f32 slab reads + f32ified input (8B)
    # + s16 output (~0.73B) per input sample, weights amortized over B.
    ratio = 16000.0 / 44100.0
    K, tile = 768, 128
    nt = int(frames * ratio + 8 + tile - 1) // tile
    fl = 2.0 * nt * K * tile / frames
    by = 4.0 * nt * K / frames + 8.0 + 2.0 * ratio
    report("resample_44k1_to_16k_stereo_s16", rate,
           extra=roofline(fl, by, rate))


def bench_biquad(B=2048, T=65536):
    """Config 4: 2x lowpass biquad cascade over batched streams (fast conv
    path; the exact scan path is the parity mode, not the serving mode)."""
    import jax
    import jax.numpy as jnp
    from esp_audio_libs_tpu.ops import biquad as bq

    coeffs = bq.biquad_init(bq.biquad_lowpass(0.18), 1.0)
    fir_len = bq.fir_len_for(coeffs)
    x = jax.device_put(np.random.default_rng(0).standard_normal((B, 2, T)).astype(np.float32))
    state = [bq.BiquadState.zeros((B, 2)) for _ in range(2)]

    @jax.jit
    def cascade(x, s0, s1):
        y, ns0 = bq.biquad_apply(x, jnp.asarray(coeffs), s0, exact=False, fir_len=fir_len)
        y, ns1 = bq.biquad_apply(y, jnp.asarray(coeffs), s1, exact=False, fir_len=fir_len)
        return y, ns0, ns1

    out = cascade(x, state[0], state[1])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = cascade(x, state[0], state[1])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    report("biquad_cascade_2x_stereo", B * 2 * T / dt)


def bench_mp3(B=256, n_frames=8):
    """Config 5: Helix MP3 decode batched across streams (silence frames:
    every stage incl. IMDCT + subband runs).  Reports the per-frame API,
    the serving-rate decode_run API (whole run -> one dispatch per group),
    and the device-only leg — on this box the tunnel's per-transfer latency
    and bandwidth are the e2e wall (PROFILES.md)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder
    from esp_audio_libs_tpu.models import mp3_pipeline
    from esp_audio_libs_tpu.runtime.tables import mp3_tables

    T = mp3_tables()
    total = int(T["slotTab"][0][0][11])
    frame = bytes([0xFF, 0xE0 | (3 << 3) | 2 | 1, 11 << 4, 0]) + bytes(total - 4)
    stream = frame * (3 * n_frames + 4)
    bat = BatchedMP3Decoder(B)
    pos = [0] * B
    for _ in range(2):   # warm both vbuf parities
        got = bat.decode([stream[p:] for p in pos])
        pos = [p + g[2] for p, g in zip(pos, got)]
    t0 = time.perf_counter()
    samples = 0
    for _ in range(n_frames):
        got = bat.decode([stream[p:] for p in pos])
        pos = [p + g[2] for p, g in zip(pos, got)]
        samples += sum(len(g[1]) for g in got)
    dt = time.perf_counter() - t0
    report("mp3_decode_batched_stereo", samples / dt)

    # serving-rate API: the whole n_frames run is one dispatch per group
    runs = bat.decode_run([stream[p:] for p in pos], n_frames)   # warm G=2*n_frames
    pos = [p + np_ for p, np_ in zip(pos, runs.next_pos)]
    t0 = time.perf_counter()
    runs = bat.decode_run([stream[p:] for p in pos], n_frames)
    dt = time.perf_counter() - t0
    samples = sum(len(x[1]) for rr in runs for x in rr if x[1] is not None)
    report("mp3_decode_run_stereo", samples / dt)

    # host front-end leg (the MP3 analog of flac_host_parse): native sync +
    # header/side-info + scalefactors + Huffman for the whole fleet, no
    # device work — what bounds e2e once transport is free.  A fresh fleet
    # keeps the timed parses independent of the run rows' reservoir state.
    bat_p = BatchedMP3Decoder(B)
    pviews = [bat_p._as_view(stream)] * B
    bat_p._parse_run(pviews, [0] * B, n_frames)   # warm (allocators, pools)
    t0 = time.perf_counter()
    preps = 3
    pframes = 0
    for _ in range(preps):
        parsed = bat_p._parse_run(pviews, [0] * B, n_frames)
        pframes += sum(len(ps) for ps in parsed["perstream"])
    host_dt = time.perf_counter() - t0
    psamples = pframes * 1152 * 2
    print(json.dumps({"metric": "mp3_host_parse",
                      "value": round(psamples / host_dt / 1e6, 2),
                      "unit": "Msamples/s (host leg: sync+side-info+"
                              "scalefactors+Huffman, fleet batch, same "
                              "silence corpus as the other mp3 rows)"}))

    # device-only leg: granule inputs RESIDENT on device, PCM left on device
    # (times the fused _granules_scan alone — what co-located serving
    # hardware would sustain per chip)
    import jax.numpy as jnp
    pa = bat._parse_batch([np.frombuffer(stream, np.uint8)] * B)
    G = 2 * n_frames
    reps_g = [pa["huff"][:, g % 2] for g in range(G)]
    huff_gs = jnp.asarray(np.stack([mp3_pipeline._pack_huff16(h[:, :2]) for h in reps_g]))
    nch = 2
    side = None
    for g in range(G):
        # the compact blob is a persistent per-B buffer: consume per call
        blob = mp3_pipeline.granule_params_compact_blob(
            pa["params"][:, g % 2], pa["sf"][:, g % 2], pa["frame"], pa["sfjs"],
            pa["params"][:, g % 2, :nch, 18].astype(np.int32), nch)
        if side is None:
            side = np.empty((G, B, 3 * nch + blob.shape[-1]), np.int32)
        side[g, :, 0:nch] = pa["params"][:, g % 2, :nch, 18]
        side[g, :, nch:2 * nch] = pa["params"][:, g % 2, :nch, 5]
        side[g, :, 2 * nch:3 * nch] = pa["params"][:, g % 2, :nch, 6]
        side[g, :, 3 * nch:] = blob
    side_gs = jnp.asarray(side)
    state = bat._gather_state(list(range(B)))
    T0 = mp3_tables()
    cutoff = int(T0["sfBandLong"][0][0][8] // 18)
    scan_fn = mp3_pipeline._granules_scan_for(0, 0, nch, cutoff)
    jax.block_until_ready((huff_gs, side_gs))

    # Time-vs-G slope with a per-rep D2H completion barrier: on this box
    # block_until_ready is NOT a trustworthy completion signal (PROFILES.md
    # measurement notes: the same program read 0.16 ms for G=32 and G=512
    # alike in one process state), but a D2H of real output bytes cannot
    # return early; the per-rep fetch latency is a fixed cost the slope
    # cancels.  Method: tools/mp3_device_leg.py.
    def time_at(fn, glen, reps=6):
        h = jnp.asarray(np.ascontiguousarray(
            np.broadcast_to(np.asarray(huff_gs)[:1], (glen,) + huff_gs.shape[1:])))
        s = jnp.asarray(np.ascontiguousarray(
            np.broadcast_to(side[:1], (glen,) + side.shape[1:])))
        st = state
        out = fn(h, s, *st, jnp.int32(0))
        _ = np.asarray(out[2])   # warm + barrier
        t0 = time.perf_counter()
        for _ in range(reps):
            pcm, st, ru = fn(h, s, *st, jnp.int32(0))
            _ = np.asarray(ru)
        return (time.perf_counter() - t0) / reps

    g_lo, g_hi = 48, 144
    slope = (time_at(scan_fn, g_hi) - time_at(scan_fn, g_lo)) / (g_hi - g_lo)
    dev_rate = B * 576 * nch / slope
    print(json.dumps({"metric": "mp3_decode_device_only",
                      "value": round(dev_rate / 1e6, 2),
                      "unit": "Msamples/s/chip (device leg, G-slope method)",
                      "realtime_streams": int(dev_rate / (RT * 2))}))

    # FAST tier (ops/mp3fast.py): same schedule, f32 value-mirror granule
    # body — the VERDICT r3 north-star row (10k realtime stereo streams
    # needs >= 882 Msamples/s on this leg)
    fast_fn = mp3_pipeline._granules_scan_fast_for(0, 0, nch, cutoff)
    slope_f = (time_at(fast_fn, g_hi) - time_at(fast_fn, g_lo)) / (g_hi - g_lo)
    fast_rate = B * 576 * nch / slope_f
    print(json.dumps({"metric": "mp3_decode_device_only_fast",
                      "value": round(fast_rate / 1e6, 2),
                      "unit": "Msamples/s/chip (device leg, G-slope method, "
                              "opt-in f32 fast tier <=1 LSB)",
                      "realtime_streams": int(fast_rate / (RT * 2))}))

    # MXU tier (ops/mp3mxu.py): probed-operator matmul form — the round-4
    # production fast path.  VERDICT r4 #2: this row was missing.
    mxu_fn = mp3_pipeline._granules_scan_mxu_for(0, 0, nch, cutoff)
    slope_m = (time_at(mxu_fn, g_hi) - time_at(mxu_fn, g_lo)) / (g_hi - g_lo)
    mxu_rate = B * 576 * nch / slope_m
    # probed-operator matmuls per granule-channel (ops/mp3mxu.py shapes):
    # AX 32x[18,99], PX 32x[9,72], S [1664,576], W [576,1088]; operator
    # reads amortize across the B-stream batch, vbuf state r/w per channel.
    fl_g = 2.0 * (32 * 18 * 99 + 32 * 9 * 72 + 1664 * 576 + 576 * 1088)
    by_g = 4.0 * (1664 * 576 + 576 * 1088 + 32 * (18 * 99 + 9 * 72)) / B \
        + 4.0 * 1088 * 2
    rl_m = roofline(fl_g / 576, by_g / 576, mxu_rate)
    report("mp3_decode_device_only_mxu", mxu_rate,
           unit="Msamples/s/chip (device leg, G-slope method, "
                "opt-in MXU matmul tier <=1 LSB)", extra=rl_m)

    # e2e serving-rate with the MXU tier engaged (same corpus as the exact
    # decode_run row above, same process)
    bat_m = BatchedMP3Decoder(B, fast="mxu")
    pos_m = [0] * B
    runs = bat_m.decode_run([stream[p:] for p in pos_m], n_frames)   # warm
    pos_m = [p + np_ for p, np_ in zip(pos_m, runs.next_pos)]
    t0 = time.perf_counter()
    runs = bat_m.decode_run([stream[p:] for p in pos_m], n_frames)
    dt = time.perf_counter() - t0
    samples = sum(len(x[1]) for rr in runs for x in rr if x[1] is not None)
    report("mp3_decode_run_stereo_mxu", samples / dt)


def bench_mp3_mxu_accuracy(n_frames=12):
    """MXU-tier accuracy row (VERDICT r4 #2): max int16 LSB error vs the
    exact tier on real tonal/window-transition content (the fast-tier test
    corpus generators), reported as data not asserted — the tier contract
    (<= 1 LSB) is enforced by tests/test_mp3_fast.py."""
    from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder
    from tests.test_mp3_coverage import (WINDOWS, craft_tonal_frame,
                                         crafted_frame)

    rng = np.random.default_rng(7)
    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0, mode_ext=0)
    frames = []
    for bt, mixed in WINDOWS:
        frames.append(craft_tonal_frame(cfg, rng))
        frames.append(crafted_frame(cfg, bt, mixed, rng))
    stream = b"".join(frames)

    def pcm_of(dec):
        rr = dec.decode_run([stream], n_frames)[0]
        return np.concatenate([p for (e, p, c) in rr if p is not None])

    pcm_e = pcm_of(BatchedMP3Decoder(1))
    max_err = 0
    for tier in ("mirror", "mxu"):
        pcm_t = pcm_of(BatchedMP3Decoder(1, fast=tier))
        err = int(np.abs(pcm_t.astype(np.int32)
                         - pcm_e.astype(np.int32)).max(initial=0))
        print(json.dumps({"metric": f"mp3_{tier}_tier_max_lsb_err",
                          "value": err,
                          "unit": "int16 LSB vs exact tier "
                                  "(window-matrix tonal corpus)"}))
        max_err = max(max_err, err)
    return max_err


def bench_flac_e2e_24b(B=128, n_frames=8, block=4096):
    """Config 1b: 24-bit stereo FLAC decode — the reference's other
    published decode number (~5% CPU ≈ 20x realtime on ESP32-S3, always
    the 64-bit LPC path: BASELINE.md row 2, reference
    src/decode/flac/README.md:325).  24-bit fitted-LPC residuals overflow
    the int8 tier, so this row also exercises the wider transport classes
    and the int64-accumulator LPC path end to end."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from flacgen import SubframePlan, make_flac

    from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder

    blob, _ = make_flac(rng_seed=3, depth=24, channels=2, block_size=block,
                        n_frames=n_frames,
                        plans=[[SubframePlan("lpc", order=8, fit=True),
                                SubframePlan("lpc", order=8, fit=True)]] * n_frames)
    blobs = [blob] * B
    bat = BatchedFLACDecoder(B)
    bat.read_headers(blobs)
    bodies = [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)]
    bat.decode_streams(bodies, verify_md5=False)   # warm compile
    t0 = time.perf_counter()
    results = bat.decode_streams(bodies, verify_md5=False)
    dt = time.perf_counter() - t0
    samples = sum(r[1]["num_samples"] for r in results)
    report("flac_decode_e2e_24b_stereo", samples / dt)

    # device-only 24-bit leg (VERDICT r4 #8): the int64-accumulator LPC
    # scan with residuals resident — isolates the kernel the order-class
    # specialization (ops/lpc.py max_order) targets from the transport.
    import jax.numpy as jnp
    from esp_audio_libs_tpu.models.flac import (_frame_kernel, _order_class,
                                                _parse_streams)
    groups, _, _ = _parse_streams(bat.decoders, bodies)
    g = next(iter(groups.values()))
    widths = (g.data8, g.data16, g.data32)
    wsel = int(np.bincount(g.wide[: g.nf], minlength=3).argmax())
    rows = np.nonzero(g.wide[: g.nf] == wsel)[0]
    dev = [jnp.asarray(x) for x in (widths[wsel][g.slot[rows]],
                                    g.coeffs[rows], g.order[rows],
                                    g.shift[rows], g.wasted[rows],
                                    g.ca[rows])]
    jax.block_until_ready(dev)
    morder = _order_class(g.order[rows])
    kw = dict(depth=24, nch=2, mode32=False, use64=True, max_order=morder)
    out = _frame_kernel(*dev, **kw)
    _ = int(jnp.sum(out.astype(jnp.uint32)))   # completion barrier
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = _frame_kernel(*dev, **kw)
        _ = int(jnp.sum(out.astype(jnp.uint32)))
    dev_dt = (time.perf_counter() - t0) / reps
    dev_samples = len(rows) * 2 * block
    rl = roofline(2.0 * morder, (1, 2, 4)[wsel] + 4 + 8 + 4 + 3,
                  dev_samples / dev_dt, kind="vpu-int")
    report("flac_decode_device_only_24b", dev_samples / dev_dt,
           unit="Msamples/s/chip (device leg, int64 LPC)", extra=rl)


def bench_flac_resample_composed(B=256, n_frames=16, block=4096):
    """Composed serving pipeline: FLAC fleet decode -> 44.1k->16k resample,
    PCM staying ON DEVICE between stages (decode_streams_to_device).  The
    north-star serving chain: only the compressed FLAC goes up and only the
    resampled PCM comes down."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from flacgen import SubframePlan, make_flac
    from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder
    from esp_audio_libs_tpu.models.resampler import Resampler, ResamplerConfiguration

    blob, _ = make_flac(rng_seed=1, depth=16, channels=2, block_size=block,
                        n_frames=n_frames,
                        plans=[[SubframePlan("lpc", order=8, fit=True)] * 2] * n_frames)
    bat = BatchedFLACDecoder(B)
    bat.read_headers([blob] * B)
    bodies = [blob[d.get_bytes_index():] for d in bat.decoders]
    frames = n_frames * block
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 32)
    r = Resampler(batch=B, exact=False)
    r.initialize(cfg)

    def run():
        pcm_dev, res = bat.decode_streams_to_device(bodies)
        out, gens, _ = r.resample_stream(pcm_dev, frames, 1)
        return out, res

    out, res = run()
    jax.block_until_ready(out)   # warm compiles
    # best of 2: the first timed run after a fresh compile intermittently
    # absorbs a multi-second tunnel stall (same artifact the G-slope method
    # dodges); transport noise only ever ADDS time, so min is the honest
    # steady-state figure
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        out, res = run()
        jax.block_until_ready(out)   # resampled PCM ready on device
        dts.append(time.perf_counter() - t0)
    samples = sum(x["num_samples"] for x in res)
    report("flac_decode_resample_composed", samples / min(dts))

    # serving-shaped TRUE e2e: same chain but the 16 kHz PCM is FETCHED to
    # the host (compressed FLAC up, resampled s16 down — what a deployment
    # moves through the link; block_until_ready alone is not a trustworthy
    # completion signal on this tunnel, a real D2H is).  Compare with the
    # same-run flac_decode_resample_host_reference row.
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        out, res = run()
        _ = np.asarray(out)                    # D2H of the 16 kHz PCM
        dts.append(time.perf_counter() - t0)
    report("flac_decode_resample_e2e_16k", samples / min(dts))


def bench_flac_resample_composed_mixed(B=256, n_frames=16):
    """Composed chain for a MIXED fleet (VERDICT r4 #5): half the streams
    4096-sample blocks, half 2048x2 (same total PCM per stream class not
    required) — decode_streams_to_device_grouped keeps each signature
    group's PCM on device and per-group Resamplers consume the blocks
    group-wise.  Target: within 20% of the uniform-fleet composed row."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from flacgen import SubframePlan, make_flac
    from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder
    from esp_audio_libs_tpu.models.resampler import Resampler, ResamplerConfiguration

    blob_a, _ = make_flac(rng_seed=1, depth=16, channels=2, block_size=4096,
                          n_frames=n_frames,
                          plans=[[SubframePlan("lpc", order=8, fit=True)] * 2]
                          * n_frames)
    blob_b, _ = make_flac(rng_seed=2, depth=16, channels=2, block_size=2048,
                          n_frames=2 * n_frames,
                          plans=[[SubframePlan("lpc", order=8, fit=True)] * 2]
                          * (2 * n_frames))
    blobs = [blob_a if i % 2 == 0 else blob_b for i in range(B)]
    bat = BatchedFLACDecoder(B)
    bat.read_headers(blobs)
    bodies = [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)]
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 32)

    # per-group Resamplers live across reps (keyed by group batch size) —
    # exactly like the uniform composed bench's single long-lived instance;
    # constructing + initializing per call re-runs host filter design and
    # re-traces the chunk fns inside the timed region
    resamplers = {}

    def run():
        group_list, res = bat.decode_streams_to_device_grouped(bodies)
        outs = []
        for ids, pcm_dev in group_list:
            frames = res[ids[0]]["num_samples"] // 2
            key = (len(ids), frames)
            r = resamplers.get(key)
            if r is None:
                r = Resampler(batch=len(ids), exact=False)
                r.initialize(cfg)
                resamplers[key] = r
            out, _, _ = r.resample_stream(pcm_dev, frames, 1)
            outs.append(out)
        return outs, res

    outs, res = run()
    jax.block_until_ready(outs)   # warm compiles (both group shapes)
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs, res = run()
        jax.block_until_ready(outs)
        dts.append(time.perf_counter() - t0)
    samples = sum(x["num_samples"] for x in res)
    report("flac_decode_resample_composed_mixed", samples / min(dts))


def bench_flac_resample_composed_host_reference(n_reps=3, n_frames=16,
                                                block=4096):
    """The host-C counterpart of flac_decode_resample_composed/e2e_16k: the
    REFERENCE decoder feeding the REFERENCE Resampler (44.1k->16k s16,
    same taps/filters config) on one host core — the chain a real
    deployment of the reference runs, measured in the same snapshot so the
    composed TPU rows have an apples-to-apples baseline (VERDICT r3 #5)."""
    import ctypes as C
    from tests.oracle import load
    try:
        lib = load().lib
    except Exception:
        print(json.dumps({"metric": "flac_decode_resample_host_reference",
                          "value": None, "note": "reference not available"}))
        return
    from flacgen import SubframePlan, make_flac

    blob, _ = make_flac(rng_seed=1, depth=16, channels=2, block_size=block,
                        n_frames=n_frames,
                        plans=[[SubframePlan("lpc", order=8, fit=True)] * 2] * n_frames)
    buf = np.frombuffer(blob, np.uint8)
    u8p = C.POINTER(C.c_uint8)
    frames_total = n_frames * block

    def once():
        d = lib.ref_flac_create()
        try:
            assert lib.ref_flac_read_header(d, buf.ctypes.data_as(u8p), buf.size) == 0
            pos = lib.ref_flac_bytes_index(d)
            out = np.zeros(lib.ref_flac_output_buffer_size_bytes(d) + 64, np.uint8)
            pcm = np.zeros(frames_total * 2 * 2 + 64, np.uint8)
            w = 0
            while pos < buf.size:
                ns = C.c_uint32(0)
                chunk = buf[pos:]
                if lib.ref_flac_decode_frame(
                        d, chunk.ctypes.data_as(u8p), chunk.size,
                        out.ctypes.data_as(u8p), C.byref(ns)) != 0:
                    break
                nb = ns.value * 2
                pcm[w:w + nb] = out[:nb]
                w += nb
                pos += lib.ref_flac_bytes_index(d)
        finally:
            lib.ref_flac_destroy(d)

        # Resampler(input_buffer_samples, output_buffer_samples) sizes its
        # internal float buffers in SAMPLES (frames x channels), not frames
        # (reference include/resampler.h:36-37 -> resampler.cpp:113-119
        # writes frames_to_process * channels_ floats into them).
        r = lib.ref_resampler_create((frames_total + 1024) * 2,
                                     (frames_total + 1024) * 2)
        try:
            assert lib.ref_resampler_initialize(
                r, 44100.0, 16000.0, 16, 16, 2, 1, 1, 64, 32) == 1
            res_out = np.zeros(frames_total * 2 * 2, np.uint8)
            used = C.c_size_t(0)
            gen = C.c_size_t(0)
            pred = C.c_size_t(0)
            clipped = C.c_uint32(0)
            lib.ref_resampler_resample(
                r, pcm.ctypes.data_as(u8p), res_out.ctypes.data_as(u8p),
                w // 4, frames_total, np.float32(0.0),
                C.byref(used), C.byref(gen), C.byref(pred), C.byref(clipped))
        finally:
            lib.ref_resampler_destroy(r)
        return w // 4 * 2   # decoded input samples (frames * ch)

    ns = once()
    t0 = time.perf_counter()
    for _ in range(n_reps):
        ns = once()
    rate = ns * n_reps / (time.perf_counter() - t0)
    ctx = _host_cpu_context()
    print(json.dumps({"metric": "flac_decode_resample_host_reference",
                      "value": round(rate / 1e6, 2),
                      "unit": "Msamples/s (reference C decode + reference "
                              "Resampler 44.1->16k, 1 host core)",
                      "realtime_streams": int(rate / (RT * 2)), **ctx}))


def bench_mp3_resample_composed(B=256, n_frames=8):
    """Composed serving pipeline for MP3: fleet decode_run(to_device=True)
    -> 44.1k->16k resample, PCM staying ON DEVICE between the stages (the
    MP3 analog of bench_flac_resample_composed — only the compressed frames
    go up and only the resampled PCM would come down)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder
    from esp_audio_libs_tpu.models.resampler import Resampler, ResamplerConfiguration
    from esp_audio_libs_tpu.runtime.tables import mp3_tables

    T = mp3_tables()
    total = int(T["slotTab"][0][0][11])
    frame = bytes([0xFF, 0xE0 | (3 << 3) | 2 | 1, 11 << 4, 0]) + bytes(total - 4)
    reps = 2
    stream = frame * ((reps + 2) * n_frames + 6)
    bat = BatchedMP3Decoder(B)
    pos = [0] * B
    for _ in range(2):   # warm both vbuf parities
        got = bat.decode([stream[p:] for p in pos])
        pos = [p + g[2] for p, g in zip(pos, got)]

    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 32)
    r = Resampler(batch=B, exact=False)
    r.initialize(cfg)

    def run(pos):
        res = bat.decode_run(
            [stream[p:] for p in pos], n_frames, to_device=True)
        pcm_dev, _consumed = res
        nb = pcm_dev.shape[1] * 2              # int16 -> bytes
        pcm_u8 = jax.lax.bitcast_convert_type(
            pcm_dev, jnp.uint8).reshape(B, nb)
        frames = nb // (2 * 2)                 # stereo s16
        out, gens, _ = r.resample_stream(pcm_u8, frames, 1)
        # next_pos, not summed consumed: the reservoir-slack bytes skipped
        # by the run's internal syncs are part of the advance (MP3RunResult)
        return out, res.next_pos, frames

    out, consumed, _ = run(pos)                # warm compiles
    jax.block_until_ready(out)
    pos = [p + c for p, c in zip(pos, consumed)]
    # per-rep min: transport stalls only ever ADD time (same methodology and
    # rationale as bench_flac_resample_composed above)
    dts, rep_samples = [], 0
    for _ in range(reps):
        t0 = time.perf_counter()
        out, consumed, frames = run(pos)
        jax.block_until_ready(out)             # resampled PCM ready on device
        dts.append(time.perf_counter() - t0)
        pos = [p + c for p, c in zip(pos, consumed)]
        rep_samples = frames * 2 * B
    report("mp3_decode_resample_composed", rep_samples / min(dts))


def _host_cpu_context():
    """Same-run CPU-weather context for the host-reference rows, so
    cross-snapshot readers can normalize instead of misreading host load /
    frequency scaling as a codec regression (PROFILES.md documents 2-3x
    weather across sessions).  ``spin_ms`` is the min-of-5 wall time of a
    FIXED single-core workload (256x256 f64 matmul x4) — a machine-speed
    calibration constant: compare two snapshots' host rows only after
    scaling by their spin_ms ratio."""
    a = np.random.default_rng(0).standard_normal((256, 256))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        b = a
        for _ in range(4):
            b = b @ a
        b.sum()
        best = min(best, time.perf_counter() - t0)
    try:
        load1 = round(_os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    return {"loadavg_1m": load1, "spin_ms": round(best * 1e3, 3)}


def bench_host_reference(n_reps=3):
    """Decode the SAME corpora with the reference C library compiled on THIS
    host (single core) — so matching-or-beating is measured where the
    machines actually are, not against the ESP32 numbers in BASELINE.md.
    Skips silently when /root/reference isn't mounted (CI)."""
    from pathlib import Path as _P
    import ctypes as C

    if not (_P(_os.environ.get("REF", "/root/reference")) / "src").is_dir():
        return
    sys.path.insert(0, str(_P(__file__).resolve().parent))
    from tests.oracle import load
    lib = load().lib

    # ---- FLAC: same fitted-LPC stream as bench_flac_e2e ----
    from flacgen import SubframePlan, make_flac
    blob, _ = make_flac(rng_seed=1, depth=16, channels=2, block_size=4096,
                        n_frames=16,
                        plans=[[SubframePlan("lpc", order=8, fit=True)] * 2] * 16)
    buf = np.frombuffer(blob, np.uint8)
    u8p = C.POINTER(C.c_uint8)

    def flac_once():
        d = lib.ref_flac_create()
        try:
            rc = lib.ref_flac_read_header(d, buf.ctypes.data_as(u8p), buf.size)
            assert rc == 0
            pos = lib.ref_flac_bytes_index(d)
            out = np.zeros(lib.ref_flac_output_buffer_size_bytes(d) + 64, np.uint8)
            ns_total = 0
            while pos < buf.size:
                ns = C.c_uint32(0)
                chunk = buf[pos:]
                rc = lib.ref_flac_decode_frame(
                    d, chunk.ctypes.data_as(u8p), chunk.size,
                    out.ctypes.data_as(u8p), C.byref(ns))
                if rc != 0:
                    break
                ns_total += ns.value
                pos += lib.ref_flac_bytes_index(d)
            return ns_total
        finally:
            lib.ref_flac_destroy(d)

    ns = flac_once()   # warm page cache
    t0 = time.perf_counter()
    for _ in range(n_reps):
        ns = flac_once()
    flac_rate = ns * n_reps / (time.perf_counter() - t0)
    ctx = _host_cpu_context()
    print(json.dumps({"metric": "flac_decode_host_reference",
                      "value": round(flac_rate / 1e6, 2),
                      "unit": "Msamples/s (reference C, 1 host core)",
                      "realtime_streams": int(flac_rate / (RT * 2)), **ctx}))

    # ---- MP3: same silence-frame stream as bench_mp3 ----
    from esp_audio_libs_tpu.runtime.tables import mp3_tables
    total = int(mp3_tables()["slotTab"][0][0][11])
    frame = bytes([0xFF, 0xE0 | (3 << 3) | 2 | 1, 11 << 4, 0]) + bytes(total - 4)
    mbuf = np.frombuffer(frame * 28, np.uint8)

    def mp3_once():
        h = lib.ref_mp3_init()
        try:
            pcm = np.zeros(1152 * 2, np.int16)
            consumed = C.c_int(0)
            pos, n = 0, 0
            while pos + total <= mbuf.size:
                err = lib.ref_mp3_decode(
                    h, mbuf[pos:].ctypes.data_as(u8p), mbuf.size - pos,
                    pcm.ctypes.data_as(C.POINTER(C.c_int16)), 0, C.byref(consumed))
                if err != 0:
                    break
                n += 1152 * 2
                pos += consumed.value
            return n
        finally:
            lib.ref_mp3_free(h)

    n = mp3_once()
    t0 = time.perf_counter()
    for _ in range(n_reps * 3):
        n = mp3_once()
    mp3_rate = n * n_reps * 3 / (time.perf_counter() - t0)
    ctx = _host_cpu_context()
    print(json.dumps({"metric": "mp3_decode_host_reference",
                      "value": round(mp3_rate / 1e6, 2),
                      "unit": "Msamples/s (reference C, 1 host core)",
                      "realtime_streams": int(mp3_rate / (RT * 2)), **ctx}))


def main():
    bench_resample()
    bench_wav_quant()
    bench_biquad()
    bench_flac_e2e()
    bench_flac_e2e_24b()
    bench_flac_resample_composed()
    bench_flac_resample_composed_mixed()
    bench_mp3()
    bench_mp3_mxu_accuracy()
    bench_mp3_resample_composed()
    bench_host_reference()
    bench_flac_resample_composed_host_reference()


if __name__ == "__main__":
    main()
