"""FAST-tier contract tests: the relaxed f32 MP3 granule pipeline
(ops/mp3fast.py) vs the bit-exact int pipeline.

The contract (mirrors the resampler exact/fast duality,
models/resampler.py): opt-in via ``BatchedMP3Decoder(fast=True)``, output
within <= 1 LSB int16 of the exact path on decodable streams, identical
frame-level control behavior (errors, consumed, next_pos), and checkpoint
interconversion by value between tiers.  Reference being accelerated: the
Helix granule pipeline, mp3_decoder.cpp:550-795 (dequant), :1783-2617
(hybrid IMDCT), :798-1120,7707-8019 (subband synthesis).
"""

import numpy as np
import pytest

from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder

from .test_mp3_coverage import (WINDOWS, craft_reservoir_stream,
                                craft_tonal_frame, crafted_frame)

TOL = 1  # int16 LSB


def _run_pcm(dec, stream, n_frames=16):
    res = dec.decode_run([stream], n_frames)
    frames = res[0]
    pcm = [p for (e, p, c) in frames if p is not None]
    errs = [e for (e, p, c) in frames]
    cons = [c for (e, p, c) in frames]
    return (np.concatenate(pcm) if pcm else np.zeros(0, np.int16),
            errs, cons, res.next_pos[0])


def _assert_tol(a, b, what):
    assert a.shape == b.shape, (what, a.shape, b.shape)
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert d.max(initial=0) <= TOL, (what, int(d.max()), float(d.mean()))


def _windows_stream(cfg, seed):
    """Tonal success frames interleaved with every window shape, so the
    carried overlap/FIFO state is charged with nonzero values when the
    window transitions fire."""
    rng = np.random.default_rng(seed)
    frames = []
    for bt, mixed in WINDOWS:
        frames.append(craft_tonal_frame(cfg, rng))
        frames.append(crafted_frame(cfg, bt, mixed, rng))
    return b"".join(frames)


STEREO_CASES = [
    ("stereo", dict(mode=0, mode_ext=0)),
    ("joint_is", dict(mode=1, mode_ext=1)),
    ("joint_ms", dict(mode=1, mode_ext=2)),
    ("joint_ms_is", dict(mode=1, mode_ext=3)),
    ("mono", dict(mode=3, mode_ext=0)),
]


@pytest.mark.parametrize("name,mm", STEREO_CASES)
def test_fast_tier_window_matrix_mpeg1(name, mm):
    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, **mm)
    stream = _windows_stream(cfg, seed=10 * mm["mode"] + mm["mode_ext"])
    pcm_e, errs_e, cons_e, np_e = _run_pcm(BatchedMP3Decoder(1), stream)
    pcm_f, errs_f, cons_f, np_f = _run_pcm(BatchedMP3Decoder(1, fast=True),
                                           stream)
    # identical control flow: same error codes, same byte accounting
    assert errs_e == errs_f and cons_e == cons_f and np_e == np_f
    _assert_tol(pcm_e, pcm_f, name)


@pytest.mark.parametrize("ver_bits,sr_idx,mm", [
    (2, 0, dict(mode=0, mode_ext=0)),
    (2, 1, dict(mode=1, mode_ext=1)),     # MPEG-2 intensity (ISFMpeg2 path)
    (2, 2, dict(mode=3, mode_ext=0)),
])
def test_fast_tier_mpeg2(ver_bits, sr_idx, mm):
    cfg = dict(ver_bits=ver_bits, bitrate_idx=7, sr_idx=sr_idx, **mm)
    stream = _windows_stream(cfg, seed=99 + sr_idx)
    pcm_e, errs_e, *_ = _run_pcm(BatchedMP3Decoder(1), stream)
    pcm_f, errs_f, *_ = _run_pcm(BatchedMP3Decoder(1, fast=True), stream)
    assert errs_e == errs_f
    _assert_tol(pcm_e, pcm_f, f"mpeg2 sr{sr_idx}")


def test_fast_tier_reservoir():
    """Real mainDataBegin backreferences across frames (the reservoir slack
    protocol exercises next_pos too).  Moderate gains: the PCM doesn't
    saturate, so the <= 1 LSB tier contract applies."""
    rng = np.random.default_rng(7)
    cfgs = [dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)] * 5
    stream = craft_reservoir_stream(cfgs, rng, gains=(150, 180))
    pcm_e, errs_e, _, np_e = _run_pcm(BatchedMP3Decoder(1), stream)
    pcm_f, errs_f, _, np_f = _run_pcm(BatchedMP3Decoder(1, fast=True), stream)
    assert errs_e == errs_f and np_e == np_f
    assert len(pcm_e) > 0
    _assert_tol(pcm_e, pcm_f, "reservoir")


def test_fast_tier_hot_clipping_bound():
    """On massively-clipping content (globalGain so hot that >70% of PCM
    saturates int16), the EXACT tier consumes guard bits and truncates
    ``es`` low bits per sample in the hybrid IMDCT (reference
    FreqInvertRescale, mp3_decoder.cpp:1937-2030; our ops/mp3imdct.py
    ``es = max(7-gb, 0)`` paths) — a truncation the f32 tier has no reason
    to mirror (it keeps the real value; measured: divergence >1 LSB appears
    ONLY when saturation appears, cf. the moderate-gain tests above).  The
    contract there is a measured bound: <= 4 LSB, on a vanishing fraction
    of samples."""
    rng = np.random.default_rng(7)
    cfgs = [dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)] * 5
    stream = craft_reservoir_stream(cfgs, rng, gains=(230, 250))
    pcm_e, errs_e, *_ = _run_pcm(BatchedMP3Decoder(1), stream)
    pcm_f, errs_f, *_ = _run_pcm(BatchedMP3Decoder(1, fast=True), stream)
    assert errs_e == errs_f
    sat = np.mean(np.abs(pcm_e.astype(np.int32)) >= 32767)
    assert sat > 0.5          # this test is specifically about clipping audio
    d = np.abs(pcm_e.astype(np.int32) - pcm_f.astype(np.int32))
    assert d.max(initial=0) <= 4, int(d.max())
    assert np.mean(d > TOL) < 0.005, float(np.mean(d > TOL))


def test_fast_tier_batched_matches_per_stream():
    """The fast tier composes with cross-stream batching: fleet decode
    tracks per-stream decode within the tier tolerance.  Unlike the exact
    tier (integer math — bit-identical at any batch shape, pinned by
    tests/test_batch.py), f32 reduction order is batch-shape-dependent
    under XLA, so the cross-shape contract here is <= 1 LSB, not
    equality (measured: ~0.03% of samples flip by 1)."""
    cfg_a = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0, mode_ext=0)
    cfg_b = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=1, mode_ext=2)
    streams = [_windows_stream(cfg_a, 1), _windows_stream(cfg_b, 2)]
    fleet = BatchedMP3Decoder(2, fast=True)
    res = fleet.decode_run(streams, 16)
    for i, s in enumerate(streams):
        solo_pcm, *_ = _run_pcm(BatchedMP3Decoder(1, fast=True), s)
        fleet_pcm = np.concatenate(
            [p for (e, p, c) in res[i] if p is not None])
        _assert_tol(solo_pcm, fleet_pcm, f"stream {i} fleet-vs-solo")


def test_fast_tier_checkpoint_interconverts():
    """Snapshots cross tiers BY VALUE: exact-tier state restored into a
    fast fleet (and back) keeps decoding within tolerance."""
    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0, mode_ext=0)
    rng = np.random.default_rng(5)
    frames = [craft_tonal_frame(cfg, rng) for _ in range(6)]
    head, tail = b"".join(frames[:3]), b"".join(frames[3:])

    exact = BatchedMP3Decoder(1)
    exact.decode_run([head], 3)
    snap = exact.get_state()
    pcm_ref, *_ = _run_pcm(exact, tail, 3)

    fast = BatchedMP3Decoder(1, fast=True)
    fast.set_state(snap)
    import jax.numpy as jnp
    assert fast._vbuf.dtype == jnp.float32       # rides f32 in the fast tier
    pcm_fast, *_ = _run_pcm(fast, tail, 3)
    _assert_tol(pcm_ref, pcm_fast, "exact->fast restore")

    # and fast -> exact: a fast fleet that decoded `head` snapshots, and the
    # snapshot rounds (not truncates) back to int32 in an exact fleet
    fast2 = BatchedMP3Decoder(1, fast=True)
    fast2.decode_run([head], 3)
    snap_f = fast2.get_state()
    exact2 = BatchedMP3Decoder(1)
    exact2.set_state(snap_f)
    assert exact2._vbuf.dtype == jnp.int32
    pcm_back, *_ = _run_pcm(exact2, tail, 3)
    _assert_tol(pcm_ref, pcm_back, "fast->exact restore")


def test_fast_tier_ref_undef_inert():
    """The fast tier has no guard-bit machinery, so the reference-UB
    detector must be inert (True), never falsely flagging."""
    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0, mode_ext=0)
    stream = _windows_stream(cfg, seed=3)
    dec = BatchedMP3Decoder(1, fast=True)
    dec.decode_run([stream], 16)
    assert dec.last_frame_reference_defined == [True]


@pytest.mark.parametrize("tier", [False, "mirror", "mxu"])
@pytest.mark.parametrize("density", [-1.0, 1.0])
def test_esc_sideband_every_tier(tier, density, monkeypatch):
    """VERDICT r4 #1: the int8+escape-sideband transport path crossed with
    EVERY granule tier (exact / mirror / mxu).  density=1.0 forces the
    sideband pack on every run; -1.0 disables it (int16 upload;
    0.0 would NOT disable: zero-escape content passes `0 > 0*size`).  Both must
    decode identically to the exact-tier int16 baseline (bit-exact for the
    exact tier, <= 1 LSB for the relaxed tiers) — the round-4 regression
    (probe-under-jit in the esc wrapper) crashed exactly this combination."""
    from esp_audio_libs_tpu.models import mp3_pipeline as pipe

    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0, mode_ext=0)
    stream = _windows_stream(cfg, seed=42)

    monkeypatch.setattr(pipe, "ESC_MAX_DENSITY", -1.0)
    pcm_ref, errs_ref, cons_ref, np_ref = _run_pcm(BatchedMP3Decoder(1),
                                                   stream)

    monkeypatch.setattr(pipe, "ESC_MAX_DENSITY", density)
    calls = {"pack": 0}
    real = pipe._pack_huff8

    def counting(*a, **k):
        out = real(*a, **k)
        if out is not None:
            calls["pack"] += 1
        return out

    monkeypatch.setattr(pipe, "_pack_huff8", counting)
    pcm, errs, cons, nxt = _run_pcm(BatchedMP3Decoder(1, fast=tier), stream)
    if density == 1.0:
        assert calls["pack"] >= 1, "sideband tier did not engage at density 1"
    else:
        assert calls["pack"] == 0, "sideband tier engaged while disabled"
    assert errs == errs_ref and cons == cons_ref and nxt == np_ref
    if tier is False:
        np.testing.assert_array_equal(pcm, pcm_ref)
    else:
        _assert_tol(pcm, pcm_ref, f"esc x {tier}")
