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


def test_mixed_fleet_to_device_grouped():
    """VERDICT r4 #5: a NON-uniform fleet (two block sizes interleaved)
    keeps its PCM on device via signature groups; each group's device block
    is byte-identical to the host-roundtrip decode of its streams, and the
    uniform wrapper raises with a pointer at the grouped API."""
    import pytest

    n_frames = 3
    blobs_by_kind = {}
    for block in (1024, 2048):
        blob, _ = make_flac(rng_seed=31 + block, depth=16, channels=2,
                            block_size=block, n_frames=n_frames,
                            plans=[[SubframePlan("lpc", order=6, fit=True)] * 2]
                            * n_frames)
        blobs_by_kind[block] = blob
    # interleave: 1024, 2048, 1024, 2048, 1024, 2048
    blobs = [blobs_by_kind[1024] if i % 2 == 0 else blobs_by_kind[2048]
             for i in range(6)]

    bat = BatchedFLACDecoder(6)
    bat.read_headers(blobs)
    bodies = [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)]

    host = BatchedFLACDecoder(6)
    host.read_headers(blobs)
    host_res = host.decode_streams(bodies, verify_md5=True)
    assert all(r[1]["md5_ok"] for r in host_res)

    with pytest.raises(ValueError, match="grouped"):
        bat.decode_streams_to_device(bodies)

    bat2 = BatchedFLACDecoder(6)
    bat2.read_headers(blobs)
    group_list, results = bat2.decode_streams_to_device_grouped(bodies)
    assert sorted(sum((ids for ids, _ in group_list), [])) == list(range(6))
    assert len(group_list) == 2
    for ids, pcm_dev in group_list:
        got = np.asarray(pcm_dev)
        for k, s in enumerate(ids):
            want = np.frombuffer(host_res[s][0], np.uint8)
            np.testing.assert_array_equal(got[k], want)
            assert results[s]["num_samples"] == host_res[s][1]["num_samples"]


def test_mixed_fleet_grouped_resample_chain():
    """The composed consumer: per-group Resamplers run group-wise on the
    device blocks; outputs match resampling the host-roundtrip PCM."""
    n_frames = 3
    specs = [(1024, 0), (2048, 1), (1024, 2), (1024, 3)]
    blobs = []
    for block, seed in specs:
        blob, _ = make_flac(rng_seed=41 + seed, depth=16, channels=2,
                            block_size=block, n_frames=n_frames,
                            plans=[[SubframePlan("lpc", order=6, fit=True)] * 2]
                            * n_frames)
        blobs.append(blob)

    bat = BatchedFLACDecoder(4)
    bat.read_headers(blobs)
    bodies = [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)]
    host = BatchedFLACDecoder(4)
    host.read_headers(blobs)
    host_res = host.decode_streams(bodies, verify_md5=False)

    bat2 = BatchedFLACDecoder(4)
    bat2.read_headers(blobs)
    group_list, results = bat2.decode_streams_to_device_grouped(bodies)

    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 32)
    for ids, pcm_dev in group_list:
        frames = results[ids[0]]["num_samples"] // 2
        r_dev = Resampler(batch=len(ids), exact=False)
        r_dev.initialize(cfg)
        out_dev, gens_d, _ = r_dev.resample_stream(pcm_dev, frames, 1)

        pcm_host = np.stack([np.frombuffer(host_res[s][0], np.uint8)
                             for s in ids])
        r_h = Resampler(batch=len(ids), exact=False)
        r_h.initialize(cfg)
        out_h, gens_h, _ = r_h.resample_stream(jax.device_put(pcm_host),
                                               frames, 1)
        assert list(gens_d) == list(gens_h)
        np.testing.assert_array_equal(np.asarray(out_dev), np.asarray(out_h))
