#!/usr/bin/env python
"""In-scan stage ablation for the fast resample_stream pipeline.

Rebuilds the production scan body (models/resampler.py:_get_fast_stream_fn)
with individual stages stubbed — same shapes, same scan, same D2H barrier —
and times each variant steady-state on the real device.  Differences vs the
full body attribute the per-chunk cost to stages; this is the only method
that survives this tunnel's dispatch-latency noise (see PROFILES.md).

Variants (stubbed stage keeps all downstream shapes identical):
  full         the production body
  no_quantize  sum(out) instead of round/clip/pack     -> quantize+pack cost
  no_unpack    xext = zeros const                      -> unpack+concat+pad cost
  no_weights   Wt = const                              -> barrel-shifter build cost
  no_poly      out = broadcast of cheap xext reduce    -> contraction+slab cost

Prints one JSON line per variant.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "build", "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main(B=2048, frames=8192, n_chunks=8):
    import jax
    import jax.numpy as jnp

    from esp_audio_libs_tpu.models.resampler import (Resampler,
                                                     ResamplerConfiguration)
    from esp_audio_libs_tpu.ops import quantization as q
    from esp_audio_libs_tpu.ops.polyphase import (banded_weights_device,
                                                  polyphase_banded)
    from esp_audio_libs_tpu.runtime.phase_grid import phase_grid

    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 32)
    r = Resampler(batch=B, exact=False)
    r.initialize(cfg)

    ch, in_bits = r.channels, r.input_bits
    bps_in = q.bytes_per_sample(in_bits)
    hist_len = r.hist_len
    out_max = int(np.ceil(frames * float(r.sample_ratio))) + 8
    filt_dev, direct_dev, taps_p, K, _ = r._fast_consts()
    use_pallas = False  # ablate the XLA path (what this box actually runs)
    from esp_audio_libs_tpu.ops.polyphase import banded_K
    K = banded_K(float(r.sample_ratio), taps_p, aligned=False)
    L = -(-max(hist_len + frames, K) // 128) * 128

    # authentic phase grids, packed exactly as resample_stream does
    T = -(-out_max // 128) * 128
    gi = np.zeros((n_chunks, 4, T), np.int32)
    gw = np.zeros((n_chunks, T), np.float32)
    gens = []
    off = hist_len - r._fold_offset
    for c in range(n_chunks):
        g = phase_grid(r.phase, cfg.number_of_filters, r.bank_flags,
                       r.sample_ratio, frames, out_max)
        assert g.input_used == frames
        gens.append(g.output_generated)
        n = min(out_max, g.win0.shape[0])
        gi[c, 0, :n] = g.win0[:n] + off
        gi[c, 0, n:] = gi[c, 0, n - 1] if n else 0
        gi[c, 1, :n] = g.idx1[:n]
        gi[c, 2, :n] = g.idx2[:n]
        gi[c, 3, :n] = g.mode[:n]
        gw[c, :n] = g.weight[:n]

    rng = np.random.default_rng(0)
    data = jax.device_put(rng.integers(
        0, 256, (B, n_chunks * frames * ch * bps_in), dtype=np.uint8))
    hist0 = jnp.zeros((B, ch, hist_len), jnp.float32)
    gi_d, gw_d = jnp.asarray(gi), jnp.asarray(gw)
    gens_d = jnp.asarray(np.asarray(gens, np.int32))
    jax.block_until_ready(data)

    from esp_audio_libs_tpu.ops.polyphase_pallas import polyphase_banded_pallas
    K_al = banded_K(float(r.sample_ratio), taps_p, aligned=True)
    L_al = -(-max(hist_len + frames, K_al) // 128) * 128

    def make(variant):
        pallas = variant == "pallas_full"
        Kv, Lv = (K_al, L_al) if pallas else (K, L)

        @jax.jit
        def fn(data, factor, hist, gi, gw, gens):
            chunk_bytes = frames * ch * bps_in

            def body(carry, xs):
                i, hist = carry
                gi_c, weight, gen = xs
                win0x, idx1, idx2, mode = gi_c[0], gi_c[1], gi_c[2], gi_c[3]
                chunk = jax.lax.dynamic_slice_in_dim(
                    data, i * chunk_bytes, chunk_bytes, axis=1)
                if variant == "no_unpack":
                    # consume chunk cheaply; constant xext, same shape
                    tick = chunk[:, :1].astype(jnp.float32) * jnp.float32(1e-30)
                    xext = jnp.zeros((B, ch, Lv), jnp.float32) + tick[:, :, None]
                    new_hist = xext[..., :hist_len]
                else:
                    xc = r._unpack_fast(chunk, factor, frames)
                    xext = jnp.concatenate([hist, xc], axis=-1)
                    new_hist = xext[..., -hist_len:]
                    if Lv > hist_len + frames:
                        xext = jnp.pad(
                            xext, [(0, 0), (0, 0), (0, Lv - hist_len - frames)])
                if variant == "no_weights":
                    st = jnp.minimum(win0x.reshape(-1, 128)[:, 0], Lv - Kv)
                    Wt = jnp.broadcast_to(
                        (weight[:Kv, None] * jnp.float32(1e-3) +
                         jnp.float32(1e-3)), (T // 128, Kv, 128))
                else:
                    Wt, st = banded_weights_device(
                        filt_dev, direct_dev, win0x, idx1, idx2, weight, mode,
                        gen, K=Kv, taps_p=taps_p, L=Lv, aligned=pallas)
                if variant == "no_poly":
                    # consume xext + Wt cheaply, emit same-shaped out
                    v = (xext[..., ::512].sum() + Wt[:, ::256].sum()) * 1e-30
                    out = jnp.zeros((B, ch, out_max), jnp.float32) + v
                elif pallas:
                    out = polyphase_banded_pallas(xext, Wt, st, T=out_max)
                else:
                    out = polyphase_banded(xext, Wt, st, T=out_max)
                if variant == "no_quantize":
                    packed_c = out.sum(axis=-1).sum(axis=-1)  # [B]
                    per_stream = jnp.zeros((B,), jnp.uint32)
                else:
                    packed_c, per_stream = r._quantize_fast(out, gen, out_max)
                return (i + 1, new_hist), (packed_c, per_stream)

            (_, new_hist), (packed, clipped) = jax.lax.scan(
                body, (jnp.int32(0), hist), (gi, gw, gens))
            # one scalar D2H barrier regardless of variant
            if variant == "no_quantize":
                return packed.sum() + clipped.sum()
            return (packed[..., ::4097].astype(jnp.uint32).sum()
                    + clipped.sum())

        return fn

    factor = q.gain_factor(in_bits, 0.0)
    results = {}
    import sys
    want = sys.argv[1].split(",") if len(sys.argv) > 1 else (
        "full", "pallas_full", "no_quantize", "no_unpack", "no_weights",
        "no_poly")
    for variant in want:
        fn = make(variant)
        _ = float(fn(data, factor, hist0, gi_d, gw_d, gens_d))  # warm
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            _ = float(fn(data, factor, hist0, gi_d, gw_d, gens_d))
        ms = (time.perf_counter() - t0) / (reps * n_chunks) * 1e3
        results[variant] = ms
        print(json.dumps({"variant": variant, "ms_per_chunk": round(ms, 3)}),
              flush=True)

    if "full" in results:
        full = results["full"]
        for variant, ms in results.items():
            if variant.startswith("no_"):
                print(json.dumps({"stage": variant[3:],
                                  "attributed_ms": round(full - ms, 3)}),
                      flush=True)


if __name__ == "__main__":
    main()
