"""ART biquad differential tests vs the reference (design + application)."""

import numpy as np
import pytest

import jax.numpy as jnp

from esp_audio_libs_tpu.ops import biquad as bq


@pytest.mark.parametrize("freq", [0.01, 0.05, 0.1, 0.2, 0.25, 0.4, 0.49])
def test_lowpass_design_bitexact(oracle, freq):
    ref = oracle.biquad_lowpass(freq)
    got = bq.biquad_lowpass(freq)
    np.testing.assert_array_equal(got.view(np.uint32), ref.view(np.uint32))


@pytest.mark.parametrize("freq", [0.01, 0.1, 0.25, 0.45])
def test_highpass_design_bitexact(oracle, freq):
    ref = oracle.biquad_highpass(freq)
    got = bq.biquad_highpass(freq)
    np.testing.assert_array_equal(got.view(np.uint32), ref.view(np.uint32))


@pytest.mark.parametrize("gain", [1.0, 0.5, 2.0])
def test_apply_bitexact(oracle, gain):
    rng = np.random.default_rng(11)
    coef = oracle.biquad_lowpass(0.15)
    x = rng.standard_normal(777).astype(np.float32)
    state = rng.standard_normal(4).astype(np.float32) * 0.1
    ref_y, ref_state = oracle.biquad_apply_buffer(coef, gain, state, x)
    folded = bq.biquad_init(coef, gain)
    got_y, got_state = bq.biquad_apply(
        jnp.asarray(x), jnp.asarray(folded),
        tuple(jnp.asarray(s) for s in state), exact=True)
    np.testing.assert_array_equal(np.asarray(got_y).view(np.uint32), ref_y.view(np.uint32))
    np.testing.assert_array_equal(
        np.stack([np.asarray(s) for s in got_state]).view(np.uint32), ref_state.view(np.uint32))


def test_apply_streaming_chunks_bitexact(oracle):
    """Splitting the buffer across calls resumes identically (state carry)."""
    rng = np.random.default_rng(12)
    coef = oracle.biquad_lowpass(0.08)
    x = rng.standard_normal(600).astype(np.float32)
    ref_y, _ = oracle.biquad_apply_buffer(coef, 1.0, np.zeros(4, np.float32), x)
    folded = bq.biquad_init(coef, 1.0)
    state = tuple(jnp.zeros(()) for _ in range(4))
    outs = []
    for chunk in np.split(x, [100, 357]):
        y, state = bq.biquad_apply(jnp.asarray(chunk), jnp.asarray(folded), state, exact=True)
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    np.testing.assert_array_equal(got.view(np.uint32), ref_y.view(np.uint32))


def test_apply_fast_close(oracle):
    rng = np.random.default_rng(13)
    coef = oracle.biquad_lowpass(0.12)
    folded = bq.biquad_init(coef, 1.0)
    x = rng.standard_normal((8, 2048)).astype(np.float32)
    state = tuple(jnp.zeros((8,)) for _ in range(4))
    y_exact, st_exact = bq.biquad_apply(jnp.asarray(x), jnp.asarray(folded), state, exact=True)
    y_fast, st_fast = bq.biquad_apply(jnp.asarray(x), jnp.asarray(folded), state, exact=False)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_exact), rtol=1e-4, atol=1e-5)
    for a, b in zip(st_fast, st_exact):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_first_order_branch(oracle):
    """a2 == b2 == 0 takes the reference's first-order shortcut."""
    rng = np.random.default_rng(14)
    coef = np.array([0.3, 0.3, 0.0, -0.4, 0.0], np.float32)
    x = rng.standard_normal(256).astype(np.float32)
    ref_y, ref_state = oracle.biquad_apply_buffer(coef, 1.0, np.zeros(4, np.float32), x)
    got_y, _ = bq.biquad_apply(
        jnp.asarray(x), jnp.asarray(coef), tuple(jnp.zeros(()) for _ in range(4)),
        exact=True, first_order=True)
    np.testing.assert_array_equal(np.asarray(got_y).view(np.uint32), ref_y.view(np.uint32))
