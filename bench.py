#!/usr/bin/env python3
"""Benchmark: batched audio resampling throughput on one TPU chip.

Headline config from BASELINE.json: 44.1 kHz -> 16 kHz, 16-bit stereo,
sinc resample (interpolated filterbank) with the full wrapper pipeline
(quantized->float, biquads when engaged, float->quantized, clip counts).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s/chip", "vs_baseline": N}

vs_baseline = our per-chip throughput / the reference C library's
single-core throughput on this host (the reference is a single-stream
serial library; SURVEY.md §6).
"""

import json
import sys
import time

import numpy as np

# Persistent XLA compilation cache: repeat bench runs skip the multi-minute
# recompiles (fresh clones still pay them once).
import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       str(__import__("pathlib").Path(__file__).resolve().parent / "build" / "jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def bench_ours(B=2048, frames_per_chunk=8192, n_chunks=8, taps=64, filters=32):
    """Steady-state device throughput of the streaming path: the multi-chunk
    schedule ships in one transfer and a device-side scan processes all
    chunks; input is staged on device once (as a production feed would be
    double-buffered over DMA)."""
    import jax
    import jax.numpy as jnp
    from esp_audio_libs_tpu.models.resampler import Resampler, ResamplerConfiguration

    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, taps, filters)
    r = Resampler(batch=B, exact=False)
    r.initialize(cfg)

    rng = np.random.default_rng(0)
    data = jax.device_put(
        rng.integers(0, 256, (B, n_chunks * frames_per_chunk * 2 * 2), dtype=np.uint8))
    jax.block_until_ready(data)

    # warmup / compile
    packed, gens, clipped = r.resample_stream(data, frames_per_chunk, n_chunks)
    jax.block_until_ready(packed)

    reps = 3
    t0 = time.perf_counter()
    frames = 0
    for _ in range(reps):
        packed, gens, clipped = r.resample_stream(data, frames_per_chunk, n_chunks)
        frames += n_chunks * frames_per_chunk
    jax.block_until_ready(packed)
    dt = time.perf_counter() - t0
    samples = frames * 2 * B  # input samples (frames x channels) across batch
    return samples / dt / 1e6


def bench_reference(frames_per_chunk=4096, n_chunks=8, taps=64, filters=32):
    """Single-stream reference wrapper throughput on this host (C, one core)."""
    import ctypes as C

    sys.path.insert(0, ".")
    from tests import oracle as O

    o = O.load()
    h = o.lib.ref_resampler_create(1 << 22, 1 << 22)
    assert o.lib.ref_resampler_initialize(h, 44100.0, 16000.0, 16, 16, 2, 1, 1, taps, filters) == 1
    rng = np.random.default_rng(0)
    chunk = rng.integers(0, 256, frames_per_chunk * 2 * 2, dtype=np.uint8)
    out = np.zeros(frames_per_chunk * 2 * 2, np.uint8)
    used = C.c_size_t(0); gen = C.c_size_t(0); pred = C.c_size_t(0); clip = C.c_uint32(0)
    out_free = int(frames_per_chunk * 16000 / 44100) + 16

    # warmup
    o.lib.ref_resampler_resample(h, chunk.ctypes.data_as(C.POINTER(C.c_uint8)),
                                 out.ctypes.data_as(C.POINTER(C.c_uint8)),
                                 frames_per_chunk, out_free, 0.0,
                                 C.byref(used), C.byref(gen), C.byref(pred), C.byref(clip))
    t0 = time.perf_counter()
    frames = 0
    for _ in range(n_chunks):
        o.lib.ref_resampler_resample(h, chunk.ctypes.data_as(C.POINTER(C.c_uint8)),
                                     out.ctypes.data_as(C.POINTER(C.c_uint8)),
                                     frames_per_chunk, out_free, 0.0,
                                     C.byref(used), C.byref(gen), C.byref(pred), C.byref(clip))
        frames += used.value
    dt = time.perf_counter() - t0
    o.lib.ref_resampler_destroy(h)
    return frames * 2 / dt / 1e6


def main():
    ours = bench_ours()
    try:
        # best-of-3: the single-core C measurement is noisy on a 1-CPU host
        # that also runs the device transport threads
        ref = max(bench_reference() for _ in range(3))
    except Exception:
        ref = None
    vs = (ours / ref) if ref else None
    print(json.dumps({
        "metric": "resample_44k1_to_16k_stereo_s16_throughput",
        "value": round(ours, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
