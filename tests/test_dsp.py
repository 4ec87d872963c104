"""Bit-exact differential tests: ops.dsp vs the reference ANSI DSP kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from esp_audio_libs_tpu.ops import dsp


def test_dotprod_f32_exact(oracle):
    rng = np.random.default_rng(0)
    for n in [4, 17, 256, 1024]:
        a = rng.standard_normal(n).astype(np.float32)
        b = rng.standard_normal(n).astype(np.float32)
        ref = oracle.dotprod_f32(a, b)
        got = np.asarray(dsp.dotprod_f32(jnp.asarray(a), jnp.asarray(b), exact=True))
        assert got.astype(np.float32).view(np.uint32) == np.float32(ref).view(np.uint32), n


def test_dotprod_f32_fast_close():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((8, 512)).astype(np.float32)
    b = rng.standard_normal((8, 512)).astype(np.float32)
    exact = np.asarray(dsp.dotprod_f32(jnp.asarray(a), jnp.asarray(b), exact=True))
    fast = np.asarray(dsp.dotprod_f32(jnp.asarray(a), jnp.asarray(b), exact=False))
    np.testing.assert_allclose(fast, exact, rtol=1e-5, atol=1e-5)


def test_biquad_f32_exact(oracle):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(512).astype(np.float32)
    coef = np.array([0.2, 0.3, 0.2, -0.5, 0.25], np.float32)  # stable
    w = np.array([0.1, -0.05], np.float32)
    ref_y, ref_w = oracle.dsps_biquad_f32(x, coef, w)
    y, new_w = dsp.biquad_f32(jnp.asarray(x), jnp.asarray(coef), jnp.asarray(w), exact=True)
    np.testing.assert_array_equal(np.asarray(y).view(np.uint32), ref_y.view(np.uint32))
    np.testing.assert_array_equal(np.asarray(new_w).view(np.uint32), ref_w.view(np.uint32))


def test_biquad_f32_fast_close(oracle):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    coef = np.array([0.097631, 0.195262, 0.097631, -0.942809, 0.333333], np.float32)
    w = np.zeros((4, 2), np.float32)
    y_exact, w_exact = dsp.biquad_f32(jnp.asarray(x), jnp.asarray(coef), jnp.asarray(w), exact=True)
    y_fast, w_fast = dsp.biquad_f32(jnp.asarray(x), jnp.asarray(coef), jnp.asarray(w), exact=False)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_exact), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(w_fast), np.asarray(w_exact), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shift", [0, 1, 4, 15])
def test_add_s16(oracle, shift):
    rng = np.random.default_rng(4)
    a = rng.integers(-32768, 32768, 2048, dtype=np.int16)
    b = rng.integers(-32768, 32768, 2048, dtype=np.int16)
    ref = oracle.add_s16(a, b, shift)
    got = np.asarray(dsp.add_s16(jnp.asarray(a), jnp.asarray(b), shift))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("c", [0, 1, -1, 16384, 32767, -32768])
def test_mulc_s16(oracle, c):
    rng = np.random.default_rng(5)
    x = rng.integers(-32768, 32768, 2048, dtype=np.int16)
    ref = oracle.mulc_s16(x, c)
    got = np.asarray(dsp.mulc_s16(jnp.asarray(x), np.int16(c)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("n_streams,shift", [(1, 0), (2, 0), (2, 1), (4, 2), (5, 0)])
def test_mix_s16_matches_chained_kernels(oracle, n_streams, shift):
    """mix_s16 == the chained C kernels (mulc per stream, left-fold add).

    Full-scale inputs at shift=0 exercise the int16 wraparound path of the
    adds (reference dsps_add_s16_ansi.c:23-26 has no saturation)."""
    rng = np.random.default_rng(6 + n_streams)
    x = rng.integers(-32768, 32768, (n_streams, 1024), dtype=np.int16)
    gains = rng.integers(-32768, 32768, n_streams, dtype=np.int16)

    ref = oracle.mulc_s16(x[0], gains[0])
    for s in range(1, n_streams):
        ref = oracle.add_s16(ref, oracle.mulc_s16(x[s], gains[s]), shift)

    got = np.asarray(dsp.mix_s16(jnp.asarray(x), jnp.asarray(gains), shift=shift))
    np.testing.assert_array_equal(got, ref)
