#!/usr/bin/env python
"""Real-backend numeric contract checks (run on the actual TPU).

The pytest suite pins JAX_PLATFORMS=cpu (tests/conftest.py) where matmul
``precision`` is ignored, so contracts that only bind on TPU — where default
matmuls are bf16-based — are never exercised by CI.  This script runs them on
whatever real backend the environment provides (axon TPU on this box):

1. fast-vs-exact resampler contract at ``Precision.HIGH``: the banded MXU
   contraction (ops/polyphase.py:196) must track the exact tap-scan path to
   rtol 2e-5 / atol 2e-6 (the documented fast-path contract) on hardware,
   where HIGH actually means 3-pass bf16 rather than f32.
2. one-hot expansion exactness at ``Precision.HIGHEST``: the MP3 param
   expansion (models/mp3.expand_hp_device) relies on integer-valued f32
   matmuls staying exact for values > 256 — exact only at HIGHEST on TPU
   (the repo's documented bf16-on-TPU failure class).
3. the MP3 FAST-tier tolerance contract (ops/mp3fast.py): <= 1 LSB int16 vs
   the bit-exact tier on non-saturating streams, <= 4 LSB on massively
   clipping content.  The fast tier's dequantizer runs exp2/log2 on the
   backend's transcendental units, so CPU-CI passing does NOT pin the TPU
   behavior — this is where the contract is pinned on hardware.

Usage: python tools/tpu_checks.py   (exits nonzero on any failure)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", "build", "jax_cache"))

import numpy as np


def check_fast_path_precision_high() -> str:
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from esp_audio_libs_tpu.models.art_resampler import BatchedResample
    from esp_audio_libs_tpu.ops import sinc

    failures = []
    for taps, nf, lp, flags, ratio in [
        (64, 16, 0.9, sinc.BLACKMAN_HARRIS | sinc.SUBSAMPLE_INTERPOLATE, 0.37),
        (256, 64, 0.95, sinc.BLACKMAN_HARRIS, 0.71),
    ]:
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 500)).astype(np.float32)
        exact = BatchedResample((2,), taps, nf, lp, flags, exact=True)
        fast = BatchedResample((2,), taps, nf, lp, flags, exact=False)
        oe, _ = exact.process(jnp.asarray(x), 300, ratio)
        of, _ = fast.process(jnp.asarray(x), 300, ratio)
        oe, of = np.asarray(oe), np.asarray(of)
        err = np.abs(of - oe)
        tol = 2e-5 * np.abs(oe) + 2e-6
        if not (err <= tol).all():
            failures.append(f"taps={taps} max_rel={float((err / (np.abs(oe) + 1e-12)).max()):.3e}")
    if failures:
        return "FAIL fast-path @HIGH: " + "; ".join(failures)
    return "PASS fast-path @HIGH tracks exact path to rtol 2e-5 on this backend"


def check_onehot_highest_exact() -> str:
    import jax
    import jax.numpy as jnp

    # integer-valued one-hot contraction with values well above the bf16
    # exact range (>256): must stay exact at HIGHEST
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 1 << 15, size=(512,)).astype(np.float32)
    idx = rng.integers(0, 512, size=(1024,))
    onehot = np.zeros((1024, 512), np.float32)
    onehot[np.arange(1024), idx] = 1.0

    @jax.jit
    def f(oh, v):
        return jnp.matmul(oh, v, precision=jax.lax.Precision.HIGHEST)

    got = np.asarray(f(jnp.asarray(onehot), jnp.asarray(vals)))
    want = vals[idx]
    if not np.array_equal(got, want):
        bad = int((got != want).sum())
        return f"FAIL one-hot @HIGHEST: {bad}/1024 mismatches on this backend"
    return "PASS one-hot matmul exact at HIGHEST on this backend"


def check_mp3_fast_tier() -> str:
    import jax
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_mp3_coverage import (WINDOWS, craft_reservoir_stream,
                                         craft_tonal_frame, crafted_frame)

    from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder

    def pcm_of(dec, stream, n=16):
        res = dec.decode_run([stream], n)
        parts = [p for (e, p, c) in res[0] if p is not None]
        return np.concatenate(parts) if parts else np.zeros(0, np.int16)

    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=1, mode_ext=2)
    rng = np.random.default_rng(11)
    frames = []
    for bt, mixed in WINDOWS:
        frames.append(craft_tonal_frame(cfg, rng))
        frames.append(crafted_frame(cfg, bt, mixed, rng))
    windows_stream = b"".join(frames)
    res_stream = craft_reservoir_stream(
        [dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)] * 5,
        np.random.default_rng(7), gains=(150, 180))
    hot_stream = craft_reservoir_stream(
        [dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)] * 5,
        np.random.default_rng(7), gains=(230, 250))

    failures = []
    for name, stream, tol in [("windows+joint-ms", windows_stream, 1),
                              ("reservoir", res_stream, 1),
                              ("hot-clipping", hot_stream, 4)]:
        pe = pcm_of(BatchedMP3Decoder(1), stream)
        pf = pcm_of(BatchedMP3Decoder(1, fast=True), stream)
        if pe.shape != pf.shape:
            failures.append(f"{name}: shape {pe.shape} vs {pf.shape}")
            continue
        d = np.abs(pe.astype(np.int32) - pf.astype(np.int32))
        if d.max(initial=0) > tol:
            failures.append(f"{name}: max {int(d.max())} LSB > {tol}")
    if failures:
        return "FAIL mp3 fast tier: " + "; ".join(failures)
    return ("PASS mp3 fast tier within contract tolerance "
            "(1 LSB / 4 LSB hot) on this backend")


def main() -> int:
    import jax

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    results = [check_onehot_highest_exact(), check_fast_path_precision_high(),
               check_mp3_fast_tier()]
    ok = True
    for r in results:
        print(r)
        ok &= r.startswith("PASS")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
