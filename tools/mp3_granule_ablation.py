#!/usr/bin/env python
"""Stage ablation for the fused MP3 granule scan (the device decode leg).

Same method as tools/resampler_ablation.py adapted to the granule pipeline:
rebuild the production scan (models/mp3_pipeline._granules_scan_for) with ONE
stage stubbed — the stub returns zero tensors with the real stage's exact
output shapes (jax.eval_shape) plus a non-foldable data dependency on the
stage inputs, so the scan's carry threading and every OTHER stage's compute
are unchanged (no data-dependent control flow anywhere in the leg, so zero
values do not change the instruction stream).  Each variant is timed at two
run lengths and the per-granule cost comes from the SLOPE (G-slope method,
tools/mp3_device_leg.py) — the only timing that survives this tunnel's
dispatch noise.  full_slope - variant_slope attributes the cost to the stage.

Variants:
  full         the production scan
  no_expand    stub expand_hp_device (compact-blob -> per-sample params)
  no_dequant   stub mp3dsp.dequantize_granule (pow43 dequant + stereo)
  no_imdct     stub mp3imdct.imdct_granule (antialias + hybrid IMDCT)
  no_subband   stub mp3subband.subband_granule (FDCT32 + PQMF, int64 MACs)

Usage: python tools/mp3_granule_ablation.py [B] [reps] [variants,comma,sep] [tier]
``tier`` = exact (default) | fast — ablates the opt-in f32 tier's stages
(ops/mp3fast.py) through the same harness.
Prints one JSON line per variant plus attributed per-granule costs.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "build", "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def _stubbed(real_fn):
    """Wrap a stage fn: same signature, zero outputs of the real shapes,
    with a dependency on the first array argument that XLA cannot fold
    (equality against INT_MIN of a runtime sum) so the carried-state chain
    through the scan stays intact."""
    import jax
    import jax.numpy as jnp

    def stub(*args, **kwargs):
        # abstract ONLY the traced jax arrays; static numpy tables / python
        # ints must reach the real fn concretely (they drive static slicing)
        from jax import core
        traced_i = [i for i, a in enumerate(args)
                    if isinstance(a, (jax.Array, core.Tracer))]

        def call(*tr):
            full = list(args)
            for i, v in zip(traced_i, tr):
                full[i] = v
            return real_fn(*full, **kwargs)

        shapes = jax.eval_shape(call, *(args[i] for i in traced_i))
        dep = jnp.sum(args[traced_i[0]].astype(jnp.int32) & 0x7FFF
                      ).astype(jnp.int32)
        flag = jnp.where(dep == jnp.int32(-2147483648), 1, 0)

        def mk(s):
            if s.dtype == jnp.bool_:
                return jnp.zeros(s.shape, s.dtype) | (flag > 0)
            return jnp.zeros(s.shape, s.dtype) + flag.astype(s.dtype)

        return jax.tree_util.tree_map(mk, shapes)

    return stub


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".."))
    from esp_audio_libs_tpu.models import mp3_pipeline
    from esp_audio_libs_tpu.ops import mp3dsp, mp3fast, mp3imdct, mp3subband

    tier = sys.argv[4] if len(sys.argv) > 4 else "exact"
    nch = 2
    ver, sr_idx, cutoff = 0, 0, 576 // 18   # MPEG-1 44.1k stereo
    cw = 2 * 22 + 2 * 39 + 2 * 6 + 23 + 39 + 23 + 13 + 3

    if tier == "fast":
        PATCHES = {
            "full": None,
            "no_expand": (mp3_pipeline, "expand_hp_device"),
            "no_dequant": (mp3fast, "dequantize_granule_fast"),
            "no_imdct": (mp3fast, "imdct_granule_fast"),
            "no_subband": (mp3fast, "subband_granule_fast"),
        }
    else:
        PATCHES = {
            "full": None,
            "no_expand": (mp3_pipeline, "expand_hp_device"),
            "no_dequant": (mp3dsp, "dequantize_granule"),
            "no_imdct": (mp3imdct, "imdct_granule"),
            "no_subband": (mp3subband, "subband_granule"),
        }
    want = (sys.argv[3].split(",") if len(sys.argv) > 3 and sys.argv[3]
            else list(PATCHES))

    rng = np.random.default_rng(0)
    Gs = [128, 512]
    inputs = {}
    for G in Gs:
        huff = rng.integers(-8000, 8000, (G, B, nch, 576)).astype(np.int16)
        side = np.zeros((G, B, 3 * nch + cw), np.int32)
        inputs[G] = (jax.device_put(jnp.asarray(huff)),
                     jax.device_put(jnp.asarray(side)))
    state0 = (jnp.zeros((B, 2, 288), jnp.int32), jnp.zeros((B, 2), jnp.int32),
              jnp.zeros((B, 2), jnp.int32), jnp.zeros((B, 2), jnp.int32),
              jnp.zeros((B, 2176), jnp.int32))
    jax.block_until_ready((inputs, state0))

    slopes = {}
    for variant in want:
        patch = PATCHES[variant]
        saved = None
        if patch is not None:
            mod, name = patch
            saved = getattr(mod, name)
            setattr(mod, name, _stubbed(saved))
        mp3_pipeline._SCAN_JIT.clear()
        mp3_pipeline._SCAN_FAST_JIT.clear()
        try:
            scan = (mp3_pipeline._granules_scan_fast_for if tier == "fast"
                    else mp3_pipeline._granules_scan_for)(
                ver, sr_idx, nch, cutoff)
            times = {}
            for G in Gs:
                huff_d, side_d = inputs[G]
                out = scan(huff_d, side_d, *state0, jnp.int32(0))
                jax.block_until_ready(out)
                # chain state through reps + fetch a tiny output per rep:
                # block_until_ready is not a trustworthy completion signal
                # on this tunnel (see tools/mp3_device_leg.py), a real D2H
                # is; the fixed fetch latency cancels in the G-slope.
                t0 = time.perf_counter()
                st = state0
                for _ in range(reps):
                    pcm, st, ru = scan(huff_d, side_d, *st, jnp.int32(0))
                    _ = np.asarray(ru)
                times[G] = (time.perf_counter() - t0) / reps
            slope_us = (times[Gs[1]] - times[Gs[0]]) / (Gs[1] - Gs[0]) * 1e6
            slopes[variant] = slope_us
            print(json.dumps({"variant": variant,
                              "per_granule_us": round(slope_us, 1),
                              "ms_per_run": {str(g): round(t * 1e3, 2)
                                             for g, t in times.items()}}),
                  flush=True)
        finally:
            if saved is not None:
                setattr(mod, name, saved)
    mp3_pipeline._SCAN_JIT.clear()
    mp3_pipeline._SCAN_FAST_JIT.clear()

    if "full" in slopes:
        full = slopes["full"]
        for variant, s in slopes.items():
            if variant.startswith("no_"):
                print(json.dumps({"stage": variant[3:],
                                  "attributed_us_per_granule":
                                      round(full - s, 1)}), flush=True)
        sps = B * nch * 576 / (full * 1e-6)
        print(json.dumps({"full_device_msamples_per_s": round(sps / 1e6, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
