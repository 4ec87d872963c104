"""checkify-based NaN/fault accounting (SURVEY §5 sanitizers, device side):
clean pipelines pass unchanged; injected NaN input raises instead of
propagating silently into PCM."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import checkify

from esp_audio_libs_tpu.ops import quantization as q
from esp_audio_libs_tpu.ops.polyphase import polyphase_banded
from esp_audio_libs_tpu.utils.debug import checked


def _pipeline(x, Wt, starts):
    out = polyphase_banded(x, Wt, starts, T=128)
    samples, clipped = q.float_to_int(out.reshape(out.shape[0], -1), 16)
    return q.pack_pcm(samples, 16), jnp.sum(clipped.astype(jnp.uint32))


def _args(poison=False):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 512)).astype(np.float32) * 0.2
    if poison:
        x[1, 0, 37] = np.nan
    Wt = rng.standard_normal((1, 256, 128)).astype(np.float32) * 0.01
    starts = np.zeros(1, np.int32)
    return jnp.asarray(x), jnp.asarray(Wt), jnp.asarray(starts)


def test_clean_pipeline_passes_and_matches():
    args = _args()
    ref = _pipeline(*args)
    got = checked(_pipeline)(*args)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))


def test_nan_input_raises():
    wrapped = checked(_pipeline)
    with pytest.raises(checkify.JaxRuntimeError):
        wrapped(*_args(poison=True))
