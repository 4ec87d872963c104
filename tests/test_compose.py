"""Device-resident composition: FLAC fleet decode -> resampler, no host hop.

The serving pipeline chains stages with the PCM staying on device; output
must be byte-identical to the host-roundtrip chain (download the PCM,
re-upload, resample)."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from flacgen import SubframePlan, make_flac  # noqa: E402

from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder  # noqa: E402
from esp_audio_libs_tpu.models.resampler import (  # noqa: E402
    Resampler, ResamplerConfiguration)


def test_flac_to_resampler_on_device():
    B, n_frames, block = 4, 4, 1024
    blob, _ = make_flac(rng_seed=21, depth=16, channels=2, block_size=block,
                        n_frames=n_frames,
                        plans=[[SubframePlan("lpc", order=6, fit=True)] * 2] * n_frames)
    bat = BatchedFLACDecoder(B)
    bat.read_headers([blob] * B)
    bodies = [blob[d.get_bytes_index():] for d in bat.decoders]

    # host-roundtrip chain
    host_res = bat.decode_streams(bodies, verify_md5=True)
    assert all(r[1]["md5_ok"] for r in host_res)
    pcm_host = np.stack([np.frombuffer(r[0], np.uint8) for r in host_res])

    # device-resident chain
    bat2 = BatchedFLACDecoder(B)
    bat2.read_headers([blob] * B)
    pcm_dev, res = bat2.decode_streams_to_device(bodies)
    assert all(r["num_samples"] == host_res[i][1]["num_samples"]
               for i, r in enumerate(res))
    np.testing.assert_array_equal(np.asarray(pcm_dev), pcm_host)

    # feed both into the resampler; outputs must be byte-identical
    frames = n_frames * block
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 32)
    r1 = Resampler(batch=B, exact=False)
    r1.initialize(cfg)
    out_dev, gens1, _ = r1.resample_stream(pcm_dev, frames, 1)
    r2 = Resampler(batch=B, exact=False)
    r2.initialize(cfg)
    out_host, gens2, _ = r2.resample_stream(jax.device_put(pcm_host), frames, 1)
    assert list(gens1) == list(gens2)
    np.testing.assert_array_equal(np.asarray(out_dev), np.asarray(out_host))


def test_mp3_decode_run_to_device():
    """decode_run(to_device=True) leaves PCM on device and matches the
    host-returning path bit-for-bit."""
    from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder
    from esp_audio_libs_tpu.runtime.tables import mp3_tables

    B, F = 4, 3
    T = mp3_tables()
    total = int(T["slotTab"][0][0][11])
    frame = bytes([0xFF, 0xE0 | (3 << 3) | 2 | 1, 11 << 4, 0]) + bytes(total - 4)
    stream = frame * (F + 2)

    ref = BatchedMP3Decoder(B)
    host = ref.decode_run([stream] * B, F)
    pcm_host = np.stack([np.concatenate([np.asarray(x[1]).reshape(-1) for x in rr])
                         for rr in host])
    cons_host = [sum(x[2] for x in rr) for rr in host]

    bat = BatchedMP3Decoder(B)
    pcm_dev, consumed = bat.decode_run([stream] * B, F, to_device=True)
    assert consumed == cons_host
    np.testing.assert_array_equal(np.asarray(pcm_dev), pcm_host)
    assert bat.last_frame_reference_defined == ref.last_frame_reference_defined
