"""Differential tests: BatchedResample vs the reference ART resampler."""

import ctypes as C

import numpy as np
import pytest

import jax.numpy as jnp

from esp_audio_libs_tpu.models.art_resampler import BatchedResample
from esp_audio_libs_tpu.ops import sinc
from esp_audio_libs_tpu.runtime.native import design_filterbank_native


def ref_process(oracle, cxt, x, n_out, ratio):
    out = np.zeros(n_out, np.float32)
    used = C.c_uint(0)
    gen = C.c_uint(0)
    oracle.lib.ref_resample_process_interleaved(
        cxt, x.ctypes.data_as(C.POINTER(C.c_float)), len(x),
        out.ctypes.data_as(C.POINTER(C.c_float)), n_out, np.float32(ratio),
        C.byref(used), C.byref(gen))
    return out[: gen.value], used.value, gen.value


CONFIGS = [
    # (taps, filters, lowpass, flags, ratio)
    (16, 8, 1.0, sinc.BLACKMAN_HARRIS, 0.5),
    (64, 16, 0.9, sinc.BLACKMAN_HARRIS | sinc.SUBSAMPLE_INTERPOLATE, 16000 / 44100),
    (64, 16, 1.0, 0, 2.0),                                   # Hann upsample, no interp
    (128, 64, 0.84, sinc.SUBSAMPLE_INTERPOLATE, 16000 / 48000),  # Hann + interp (wrapper-style)
    (32, 4, 1.0, sinc.SUBSAMPLE_INTERPOLATE, 1.0),            # unity ratio
    # ---- reference acceptance envelope (art_resampler.cpp:89-97:
    # 4..1024 taps, 2..1024 filters) ----
    (4, 2, 1.0, 0, 0.5),                                      # minimum config
    (256, 256, 0.9, sinc.BLACKMAN_HARRIS | sinc.SUBSAMPLE_INTERPOLATE, 16000 / 44100),
    (1024, 64, 0.95, sinc.BLACKMAN_HARRIS, 0.5),              # max taps
    (128, 1024, 0.9, sinc.SUBSAMPLE_INTERPOLATE, 44100 / 16000),  # max filters, upsample
    (1024, 1024, 0.84, sinc.BLACKMAN_HARRIS | sinc.SUBSAMPLE_INTERPOLATE, 8000 / 96000),  # max both, extreme down
]


@pytest.mark.parametrize("taps,nf,lp,flags,ratio", CONFIGS)
def test_filterbank_bitexact(oracle, taps, nf, lp, flags, ratio):
    lpn, fl = sinc.normalize_lowpass(lp, flags)
    ours = design_filterbank_native(taps, nf, lpn, fl)
    cxt = oracle.lib.ref_resample_init(1, taps, nf, np.float32(lp), flags)
    ref = np.zeros((nf + 1, taps), np.float32)
    for i in range(nf + 1):
        oracle.lib.ref_resample_get_filter(cxt, i, ref[i].ctypes.data_as(C.POINTER(C.c_float)))
    oracle.lib.ref_resample_free(cxt)
    np.testing.assert_array_equal(ours.view(np.uint32), ref.view(np.uint32))


@pytest.mark.parametrize("taps,nf,lp,flags,ratio", CONFIGS)
def test_filterbank_native_vs_numpy_crosscheck(taps, nf, lp, flags, ratio):
    """The numpy re-derivation (ops/sinc.py) is the independent cross-check
    of the production native design (native/src/eal_host.cpp): a structural
    bug in either shows up as a gross mismatch here, no oracle needed (so
    this also runs where the reference tree isn't mounted).

    Tolerance note: numpy's f64-then-truncate sin/cos round differently from
    glibc's true-f32 calls by ~1 ulp per tap magnitude, and the sequential
    error diffusion then REDISTRIBUTES that difference across the row — tiny
    tail taps can differ by many of their own ulps while the absolute design
    agreement stays at a few 1e-7 (measured: <= 3.6e-7 across the whole
    4-1024 envelope).  Assert the absolute envelope; the oracle bit-exact
    test above is the normative check."""
    lpn, fl = sinc.normalize_lowpass(lp, flags)
    native = design_filterbank_native(taps, nf, lpn, fl)
    numpy_ = sinc.design_filterbank(taps, nf, lpn, fl)
    d = np.abs(native - numpy_).max()
    assert d <= 1e-6, f"native/numpy filterbank drift: max abs diff {d}"


@pytest.mark.parametrize("taps,nf,lp,flags,ratio", CONFIGS)
def test_process_bitexact_mono(oracle, taps, nf, lp, flags, ratio):
    rng = np.random.default_rng(taps + nf)
    n_in_total = 700
    x = rng.standard_normal(n_in_total).astype(np.float32) * 0.5

    cxt = oracle.lib.ref_resample_init(1, taps, nf, np.float32(lp), flags)
    ours = BatchedResample((1,), taps, nf, lp, flags, exact=True)

    # process in uneven chunks, both sides identically
    pos = 0
    for chunk_len, n_out in [(100, 300), (57, 10), (343, 500), (200, 1000)]:
        cx = x[pos: pos + chunk_len]
        pos += len(cx)
        ref_out, ref_used, ref_gen = ref_process(oracle, cxt, cx.copy(), n_out, ratio)
        got_out, res = ours.process(jnp.asarray(cx[None, :]), n_out, ratio)
        assert (res.input_used, res.output_generated) == (ref_used, ref_gen), (chunk_len, n_out)
        got = np.asarray(got_out)[0]
        if not np.array_equal(got.view(np.uint32), ref_out.view(np.uint32)):
            # XLA:CPU FMA-contracts the two-filter interpolation (see
            # ops/polyphase.py) — bit-exact on TPU, <=1 ulp on CPU hosts.
            ulp = np.abs(got.view(np.int32).astype(np.int64) - ref_out.view(np.int32).astype(np.int64))
            assert ulp.max() <= 1, ulp.max()
        # reference consumed everything (chunks here are sized to be consumed)
        if ref_used < len(cx):
            pos -= len(cx) - ref_used  # resend unconsumed, like a real caller
    oracle.lib.ref_resample_free(cxt)


def test_process_batch_consistency(oracle):
    """Every stream in a batch gets the identical per-stream result."""
    taps, nf, lp, flags, ratio = 64, 16, 0.9, sinc.BLACKMAN_HARRIS | sinc.SUBSAMPLE_INTERPOLATE, 0.37
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((5, 400)).astype(np.float32)

    batched = BatchedResample((5,), taps, nf, lp, flags, exact=True)
    out_b, res_b = batched.process(jnp.asarray(xb), 256, ratio)

    for s in range(5):
        single = BatchedResample((1,), taps, nf, lp, flags, exact=True)
        out_s, res_s = single.process(jnp.asarray(xb[s: s + 1]), 256, ratio)
        np.testing.assert_array_equal(
            np.asarray(out_b)[s].view(np.uint32), np.asarray(out_s)[0].view(np.uint32))


@pytest.mark.parametrize("taps,nf,lp,flags,ratio", CONFIGS)
def test_fast_mode_close(oracle, taps, nf, lp, flags, ratio):
    """Fast (banded/Pallas) path tracks the exact path across the whole
    acceptance envelope, incl. 1024-tap/1024-filter extremes."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 500)).astype(np.float32)
    exact = BatchedResample((2,), taps, nf, lp, flags, exact=True)
    fast = BatchedResample((2,), taps, nf, lp, flags, exact=False)
    oe, re_ = exact.process(jnp.asarray(x), 300, ratio)
    of, rf = fast.process(jnp.asarray(x), 300, ratio)
    assert (re_.input_used, re_.output_generated) == (rf.input_used, rf.output_generated)
    np.testing.assert_allclose(np.asarray(of), np.asarray(oe), rtol=2e-5, atol=2e-6)


def test_queries_match_reference(oracle):
    taps, nf, lp, flags = 64, 16, 0.9, sinc.BLACKMAN_HARRIS
    ratio = 0.61
    cxt = oracle.lib.ref_resample_init(1, taps, nf, np.float32(lp), flags)
    ours = BatchedResample((1,), taps, nf, lp, flags)
    for n in [1, 10, 100, 1000]:
        assert ours.get_required_samples(n, ratio) == oracle.lib.ref_resample_get_required_samples(cxt, n, np.float32(ratio))
        assert ours.get_expected_output(n, ratio) == oracle.lib.ref_resample_get_expected_output(cxt, n, np.float32(ratio))
    # advance + position parity
    oracle.lib.ref_resample_advance_position(cxt, np.float32(taps / 2.0))
    ours.advance_position(taps / 2.0)
    assert ours.get_position() == oracle.lib.ref_resample_get_position(cxt)
    oracle.lib.ref_resample_free(cxt)
