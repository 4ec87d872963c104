"""Sharded serving layer: BatchedFLAC/MP3Decoder on a stream mesh must be
bit-identical to the unsharded path, and carried device state must STAY
stream-sharded across steps.

This is SURVEY.md §2's DP row at the level the user actually calls — the
serving classes, not hand-sharded kernels (the round-2 gap).  Runs on the
virtual 8-device CPU mesh (tests/conftest.py), exactly like the driver's
dryrun.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax

from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder, BatchedMP3Decoder
from esp_audio_libs_tpu.parallel.mesh import (axis_sharding, batch_sharding,
                                              stream_mesh)
from esp_audio_libs_tpu.utils.errors import MP3Error

from tests.test_batch import MP3_CFGS, _mp3_stream

N = 8  # one stream per virtual device


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N, "conftest should provide 8 virtual devices"
    return stream_mesh(jax.devices()[:N])


def _flac_fleet():
    from flacgen import SubframePlan, make_flac

    blobs = []
    for i in range(N):
        blob, _ = make_flac(
            rng_seed=100 + i, depth=16, channels=2, block_size=1024, n_frames=3,
            plans=[[SubframePlan("lpc", order=8), SubframePlan("fixed", order=2)]] * 3)
        blobs.append(blob)
    return blobs


def _mp3_fleet(n_frames=3):
    """N format-uniform streams of CRAFTED tonal frames: every frame decodes
    error-free with REAL nonzero spectra and per-stream-distinct PCM (a
    silent fleet would pass the sharding equality trivially even with lanes
    permuted).  Tonal frames carry reservoir slack, so these streams also
    exercise decode_run's inter-frame sync-skip (the reference caller
    protocol)."""
    from tests.test_mp3_coverage import craft_tonal_frame

    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0, mode_ext=0)
    out = []
    for i in range(N):
        rng = np.random.default_rng(300 + i)
        out.append(b"".join(craft_tonal_frame(cfg, rng, gains=(150 + i, 200))
                            for _ in range(n_frames)))
    return out


# ---------------------------------------------------------------- FLAC

def test_sharded_flac_decode_streams_bitexact(mesh):
    blobs = _flac_fleet()
    ref = BatchedFLACDecoder(N)
    shd = BatchedFLACDecoder(N, mesh=mesh)
    ref.read_headers(blobs)
    shd.read_headers(blobs)
    bodies = [b[d.get_bytes_index():] for b, d in zip(blobs, ref.decoders)]
    bodies2 = [b[d.get_bytes_index():] for b, d in zip(blobs, shd.decoders)]
    want = ref.decode_streams(bodies)
    got = shd.decode_streams(bodies2)
    for s in range(N):
        assert got[s][0] == want[s][0], f"stream {s} PCM differs under sharding"
        assert got[s][1]["md5_ok"] and want[s][1]["md5_ok"]
        assert got[s][1]["frame_results"] == want[s][1]["frame_results"]


def test_sharded_flac_to_device(mesh):
    blobs = _flac_fleet()
    ref = BatchedFLACDecoder(N)
    shd = BatchedFLACDecoder(N, mesh=mesh)
    ref.read_headers(blobs)
    shd.read_headers(blobs)
    pcm_ref, _ = ref.decode_streams_to_device(
        [b[d.get_bytes_index():] for b, d in zip(blobs, ref.decoders)])
    pcm_shd, _ = shd.decode_streams_to_device(
        [b[d.get_bytes_index():] for b, d in zip(blobs, shd.decoders)])
    # composition handoff contract: PCM leaves stream-sharded
    assert pcm_shd.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)
    np.testing.assert_array_equal(np.asarray(pcm_shd), np.asarray(pcm_ref))


def test_sharded_flac_int8_escape_sideband_bitexact(mesh, monkeypatch):
    """VERDICT r3 #4: the int8+escape-sideband transport tier must run
    UNDER A MESH (shard-local escape indices, _frame_kernel_esc_sharded) and
    stay byte-identical to the sharded int16 tier — the sharded serving path
    previously fell back to int16 and paid double the upload bytes.
    Fitted-LPC streams give realistic escape statistics; forcing the density
    ceiling to 1.0 engages the tier on every int16 bucket."""
    from flacgen import SubframePlan, make_flac
    from esp_audio_libs_tpu.models import flac as flac_model

    blobs = []
    for i in range(N):
        blob, _ = make_flac(
            rng_seed=700 + i, depth=16, channels=2, block_size=2048,
            n_frames=3, plans=[[SubframePlan("lpc", order=8, fit=True),
                                SubframePlan("lpc", order=12, fit=True)]] * 3)
        blobs.append(blob)

    calls = {"sharded_esc": 0}
    real = flac_model._frame_kernel_esc_sharded

    def counting(*a, **k):
        calls["sharded_esc"] += 1
        return real(*a, **k)

    def run():
        bat = BatchedFLACDecoder(N, mesh=mesh)
        bat.read_headers(blobs)
        return bat.decode_streams(
            [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)])

    monkeypatch.setattr(flac_model, "ESC_MAX_DENSITY", 0.0)   # tier disabled
    want = run()
    monkeypatch.setattr(flac_model, "ESC_MAX_DENSITY", 1.0)   # tier forced
    monkeypatch.setattr(flac_model, "_frame_kernel_esc_sharded", counting)
    got = run()
    assert calls["sharded_esc"] >= 1, (
        "no bucket took the sharded int8+sideband path — the mesh tier is "
        "not engaging (fell back to int16 or to the unsharded kernel)")
    for s in range(N):
        assert got[s][0] == want[s][0], f"stream {s}: mesh sideband changed PCM"
        assert got[s][1]["md5_ok"] and want[s][1]["md5_ok"]


# ----------------------------------------------------------------- MP3

def test_sharded_mp3_decode_run_bitexact(mesh):
    streams = _mp3_fleet()
    ref = BatchedMP3Decoder(N)
    shd = BatchedMP3Decoder(N, mesh=mesh)
    # initial carried state is placed sharded
    assert shd._vbuf.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)

    want = ref.decode_run(streams, 3)
    got = shd.decode_run(streams, 3)
    for s in range(N):
        assert len(got[s]) == len(want[s])
        for (eg, pg, cg), (ew, pw, cw) in zip(got[s], want[s]):
            assert (eg, cg) == (ew, cw)
            if pw is None:
                assert pg is None
            else:
                np.testing.assert_array_equal(pg, pw)
    # carried state must STILL be stream-sharded after the run (a regression
    # here silently serializes every later step onto one device)
    assert shd._vbuf.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)
    assert shd._over.sharding.is_equivalent_to(batch_sharding(mesh, 3), 3)


def test_sharded_mp3_int8_escape_sideband_bitexact(mesh, monkeypatch):
    """VERDICT r3 #4 (MP3 side): the int8+escape-sideband upload tier must
    run UNDER A MESH — escape positions are re-indexed per shard block
    (_pack_huff8_sharded) so the fixup scatter is shard-local and GSPMD
    partitions it without collectives — and stay bit-identical to the int16
    tier.  Forcing the density ceiling to 1.0 engages the tier on every run;
    0.0 disables it (int16 upload)."""
    from esp_audio_libs_tpu.models import mp3_pipeline as pipe

    streams = _mp3_fleet()
    calls = {"sharded_pack": 0}
    real = pipe._pack_huff8_sharded

    def counting(*a, **k):
        out = real(*a, **k)
        if out is not None:
            calls["sharded_pack"] += 1
        return out

    def run():
        shd = BatchedMP3Decoder(N, mesh=mesh)
        return shd.decode_run(streams, 3)

    monkeypatch.setattr(pipe, "ESC_MAX_DENSITY", 0.0)   # tier disabled
    want = run()
    monkeypatch.setattr(pipe, "ESC_MAX_DENSITY", 1.0)   # tier forced
    monkeypatch.setattr(pipe, "_pack_huff8_sharded", counting)
    got = run()
    assert calls["sharded_pack"] >= 1, (
        "no run took the sharded int8+sideband pack — the mesh tier is not "
        "engaging (fell back to int16 or the unsharded pack)")
    for s in range(N):
        for (eg, pg, cg), (ew, pw, cw) in zip(got[s], want[s]):
            assert (eg, cg) == (ew, cw)
            np.testing.assert_array_equal(pg, pw)


def test_sharded_mp3_to_device(mesh):
    streams = _mp3_fleet()
    ref = BatchedMP3Decoder(N)
    shd = BatchedMP3Decoder(N, mesh=mesh)
    pcm_ref, con_ref = ref.decode_run(streams, 3, to_device=True)
    pcm_shd, con_shd = shd.decode_run(streams, 3, to_device=True)
    assert con_ref == con_shd
    np.testing.assert_array_equal(np.asarray(pcm_shd), np.asarray(pcm_ref))


def test_sharded_mp3_decode_single_frames(mesh):
    """The per-frame decode API also rides the mesh (whole-batch group)."""
    streams = _mp3_fleet()
    ref = BatchedMP3Decoder(N)
    shd = BatchedMP3Decoder(N, mesh=mesh)
    pos = [0] * N
    for step in range(2):
        bufs = [s[p:] for s, p in zip(streams, pos)]
        want = ref.decode(bufs)
        got = shd.decode(bufs)
        for s in range(N):
            assert (got[s][0], got[s][2]) == (want[s][0], want[s][2])
            if want[s][1] is None:
                assert got[s][1] is None
            else:
                np.testing.assert_array_equal(got[s][1], want[s][1])
        pos = [p + r[2] for p, r in zip(pos, want)]
    assert shd._vbuf.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)


def test_sharded_mp3_checkpoint_replaces_state_on_mesh(mesh):
    streams = _mp3_fleet()
    shd = BatchedMP3Decoder(N, mesh=mesh)
    shd.decode_run(streams, 2)
    st = shd.get_state()
    restored = BatchedMP3Decoder(N, mesh=mesh)
    restored.set_state(st)
    assert restored._vbuf.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)


def test_mesh_requires_even_division():
    with pytest.raises(ValueError):
        BatchedMP3Decoder(3, mesh=stream_mesh(jax.devices()[:2]))


# --------------------------------------------- to_device precondition rollback

def test_mp3_to_device_failure_rolls_back_native_state():
    """decode_run(to_device=True) on a non-uniform / error fleet must leave
    the fleet exactly as it was: the parse advances native bit reservoirs
    before the precondition check can run, so the serving layer snapshots
    and restores them (ADVICE r2: silent corruption otherwise)."""
    streams = _mp3_fleet()
    bad = b"\x00" * 64  # no sync anywhere -> error frame
    dec = BatchedMP3Decoder(2)
    # establish real reservoir state first
    dec.decode_run([streams[0], streams[1]], 1)
    snap = [d._native_snapshot() for d in dec.decoders]
    vindex = list(dec._vindex)
    with pytest.raises(ValueError):
        dec.decode_run([streams[0], bad], 2, to_device=True)
    assert [d._native_snapshot() for d in dec.decoders] == snap
    assert list(dec._vindex) == vindex
    # fleet still decodes cleanly afterwards
    r = dec.decode_run([streams[0], streams[1]], 1)
    assert all(e == MP3Error.NONE for e, _, _ in r[0])


# ------------------------------------------- composed chain on the mesh

@pytest.mark.parametrize("exact", [True, False])
def test_sharded_composed_flac_resample(mesh, exact):
    """The full composed serving chain — FLAC parse -> sharded device decode
    -> stream-sharded PCM -> mesh-aware Resampler — must match the unsharded
    chain, with the PCM handoff, the resampler's carried state, and the
    resampled output all staying stream-sharded (no resharding collective
    between the stages).

    Equality contract: the exact path is bit-identical sharded vs unsharded
    (measured on both the CPU mesh and real TPU).  The fast path is
    bit-identical on TPU but may differ by 1 LSB at isolated float rounding
    boundaries on the virtual CPU mesh (XLA:CPU fuses/contracts FMAs
    differently under SPMD partitioning — a cross-compilation artifact, well
    inside the fast path's 2e-5 accuracy contract), so it gets a <=1 LSB
    tolerance here."""
    from esp_audio_libs_tpu.models.resampler import (Resampler,
                                                     ResamplerConfiguration)

    blobs = _flac_fleet()
    frames = 3 * 1024
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 32)

    def chain(m):
        bat = BatchedFLACDecoder(N, mesh=m)
        bat.read_headers(blobs)
        pcm, _ = bat.decode_streams_to_device(
            [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)])
        r = Resampler(batch=N, exact=exact, mesh=m)
        r.initialize(cfg)
        out, gens, clips = r.resample_stream(pcm, frames, 1)
        return pcm, r, out, gens, clips

    pcm_ref, _, out_ref, gens_ref, clips_ref = chain(None)
    pcm_shd, r_shd, out_shd, gens_shd, clips_shd = chain(mesh)

    # handoff and output sharding: PCM arrives sharded, state stays sharded
    assert pcm_shd.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)
    assert r_shd.history.sharding.is_equivalent_to(
        batch_sharding(mesh, r_shd.history.ndim), r_shd.history.ndim)
    # output is [num_chunks, batch, bytes] — batch is axis 1; a shard-count
    # check would also pass for a replicated output, so pin the layout
    assert out_shd.sharding.is_equivalent_to(
        axis_sharding(mesh, out_shd.ndim, 1), out_shd.ndim)

    assert list(gens_shd) == list(gens_ref)
    a = np.asarray(out_ref).view(np.int16).astype(np.int32)
    b = np.asarray(out_shd).view(np.int16).astype(np.int32)
    if exact:
        np.testing.assert_array_equal(b, a)
        np.testing.assert_array_equal(np.asarray(clips_shd), np.asarray(clips_ref))
    else:
        assert np.abs(a - b).max() <= 1, "fast path drifted past 1 LSB"


def test_resampler_mesh_requires_even_division():
    from esp_audio_libs_tpu.models.resampler import Resampler

    with pytest.raises(ValueError):
        Resampler(batch=3, mesh=stream_mesh(jax.devices()[:2]))


def test_sharded_reset_stream_preserves_layout(mesh):
    """Slot recycling on a sharded fleet: the in-place row scatter must
    keep every carried-state tensor stream-sharded (a replicated or
    gathered result would silently serialize later steps), and decode
    after the reset must stay bit-exact vs an unsharded fleet doing the
    same recycle."""
    streams = _mp3_fleet()
    ref = BatchedMP3Decoder(N)
    shd = BatchedMP3Decoder(N, mesh=mesh)
    ref.decode_run(streams, 2)
    shd.decode_run(streams, 2)

    ref.reset_stream(1)
    shd.reset_stream(1)
    assert shd._vbuf.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)
    assert shd._over.sharding.is_equivalent_to(batch_sharding(mesh, 3), 3)
    assert shd._pt.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)

    # recycled slot restarts its stream; the others continue
    bufs = [streams[1] if s == 1 else None for s in range(N)]
    want = ref.decode_run(bufs, 1)
    got = shd.decode_run(bufs, 1)
    for (eg, pg, cg), (ew, pw, cw) in zip(got[1], want[1]):
        assert (eg, cg) == (ew, cw)
        np.testing.assert_array_equal(pg, pw)
    assert shd._vbuf.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)
