"""Bit-exact differential tests: ops.quantization vs the C reference oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from esp_audio_libs_tpu.ops import quantization as q

BIT_DEPTHS = [8, 16, 24, 32]


def _random_packed(rng, n, bits):
    bps = q.bytes_per_sample(bits)
    return rng.integers(0, 256, size=n * bps, dtype=np.uint8)


@pytest.mark.parametrize("bits", BIT_DEPTHS)
@pytest.mark.parametrize("gain_db", [0.0, -6.0, 3.5, 12.0])
def test_quantized_to_float_bitexact(oracle, bits, gain_db):
    rng = np.random.default_rng(42 + bits)
    data = _random_packed(rng, 4096, bits)
    ref = oracle.quantized_to_float(data, bits, gain_db)
    got = np.asarray(q.quantized_to_float(jnp.asarray(data), bits, gain_db))
    np.testing.assert_array_equal(got.view(np.uint32), ref.view(np.uint32))


@pytest.mark.parametrize("bits", [12, 20, 28])
def test_quantized_to_float_odd_depths(oracle, bits):
    rng = np.random.default_rng(7)
    data = _random_packed(rng, 1024, bits)
    ref = oracle.quantized_to_float(data, bits, 0.0)
    got = np.asarray(q.quantized_to_float(jnp.asarray(data), bits, 0.0))
    np.testing.assert_array_equal(got.view(np.uint32), ref.view(np.uint32))


@pytest.mark.parametrize("bits", BIT_DEPTHS + [12, 20])
def test_float_to_quantized_bitexact(oracle, bits):
    rng = np.random.default_rng(1 + bits)
    # Mix of in-range, clipping, and extreme values.
    x = np.concatenate([
        rng.uniform(-1.0, 1.0, 2048),
        rng.uniform(-2.0, 2.0, 512),
        np.array([0.0, 1.0, -1.0, 0.999999, -0.999999, 1e9, -1e9]),
    ]).astype(np.float32)
    ref_bytes, ref_clipped = oracle.float_to_quantized(x, bits)
    got_bytes, got_clipped = q.float_to_quantized(jnp.asarray(x), bits)
    np.testing.assert_array_equal(np.asarray(got_bytes), ref_bytes)
    assert int(got_clipped) == ref_clipped


@pytest.mark.parametrize("bits", BIT_DEPTHS)
def test_roundtrip_through_reference(oracle, bits):
    """our float_to_quantized output, decoded by the REFERENCE, matches our decode."""
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.9, 0.9, 1000).astype(np.float32)
    got_bytes, _ = q.float_to_quantized(jnp.asarray(x), bits)
    ref = oracle.quantized_to_float(np.asarray(got_bytes), bits, 0.0)
    ours = np.asarray(q.quantized_to_float(got_bytes, bits, 0.0))
    np.testing.assert_array_equal(ours.view(np.uint32), ref.view(np.uint32))


def test_batched_shape():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(4, 7, 32), dtype=np.uint8)
    out = q.quantized_to_float(jnp.asarray(data), 16, 0.0)
    assert out.shape == (4, 7, 16)
    packed, clipped = q.float_to_quantized(out, 16)
    assert packed.shape == (4, 7, 32)
    assert int(clipped) == 0
