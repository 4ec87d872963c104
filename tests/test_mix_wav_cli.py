"""mix_wav CLI: differential vs the chained reference DSP kernels.

The CLI (examples/mix_wav.py) is the downstream-consumer chain the reference
exports dsps_mulc_s16/dsps_add_s16 for (reference include/dsp.h:45-94; the
kernels have no in-repo caller — ESPHome's mixer/volume stages are the
consumers).  These tests drive the CLI subprocess and pin the WAV payload
against the C kernels chained in the same order, including the optional
resample leg (same chunk policy as test_resample_wav_cli).
"""

import os
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "examples"))

from tests.test_resampler import RefResampler  # noqa: E402

from esp_audio_libs_tpu.models.resampler import ResamplerConfiguration  # noqa: E402


def _make_wav(path: Path, rate: int, ch: int, frames: int, seed: int,
              amp: float = 18000.0):
    from flac_to_wav import write_wav_header

    rng = np.random.default_rng(seed)
    t = np.arange(frames * ch)
    pcm = (np.sin(t * (0.011 + 0.003 * seed)) * amp
           + rng.integers(-64, 64, frames * ch)).astype(np.int16)
    with open(path, "wb") as f:
        write_wav_header(f, rate, ch, 16, frames, 2)
        f.write(pcm.tobytes())
    return pcm


def _wav_payload(path: Path):
    raw = path.read_bytes()
    pos = 12
    while pos + 8 <= len(raw):
        tag, size = raw[pos:pos + 4], struct.unpack("<I", raw[pos + 4:pos + 8])[0]
        if tag == b"data":
            return raw[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no data chunk")


def _run_cli(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "mix_wav.py"), *args],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc


def _ref_mix(oracle, streams, gains_db, shift):
    """The C kernels chained exactly as the CLI composes them."""
    def q15(db):
        return np.int16(max(-32768, min(32767, int(round(10 ** (db / 20) * 32768)))))

    n = max(len(s) for s in streams)
    padded = [np.pad(s, (0, n - len(s))) for s in streams]
    acc = oracle.mulc_s16(padded[0], q15(gains_db[0]))
    for s, g in zip(padded[1:], gains_db[1:]):
        acc = oracle.add_s16(acc, oracle.mulc_s16(s, q15(g)), shift)
    return acc


def test_mix_wav_cli_matches_chained_kernels(oracle, tmp_path):
    """Three unequal-length inputs, per-input gains, headroom shift."""
    rate, ch = 22050, 2
    paths, streams = [], []
    for i, frames in enumerate([6000, 4500, 5200]):
        p = tmp_path / f"in{i}.wav"
        streams.append(_make_wav(p, rate, ch, frames, seed=i))
        paths.append(str(p))
    out = tmp_path / "mix.wav"
    # attenuation only: Q15 cannot amplify and the CLI now rejects +dB
    # (test_positive_gain_rejected covers that path)
    gains = [0.0, -6.0, -3.5]

    _run_cli([str(out), *paths, "--shift", "1",
              *sum((["--gain-db", str(g)] for g in gains), [])])

    want = _ref_mix(oracle, streams, gains, shift=1)
    got = np.frombuffer(_wav_payload(out), np.int16)
    np.testing.assert_array_equal(got, want)


def test_mix_wav_cli_wraparound_shift0(oracle, tmp_path):
    """Full-scale inputs at shift=0 must wrap exactly like the C kernel
    (dsps_add_s16_ansi.c:23-26 has no saturation)."""
    rate, ch, frames = 16000, 1, 3000
    paths, streams = [], []
    for i in range(2):
        p = tmp_path / f"loud{i}.wav"
        streams.append(_make_wav(p, rate, ch, frames, seed=10 + i, amp=32000.0))
        paths.append(str(p))
    out = tmp_path / "mix.wav"

    _run_cli([str(out), *paths])

    want = _ref_mix(oracle, streams, [0.0, 0.0], shift=0)
    got = np.frombuffer(_wav_payload(out), np.int16)
    # wraparound must actually occur for this test to mean anything
    assert (np.abs(want.astype(np.int32)) > 20000).any()
    np.testing.assert_array_equal(got, want)


def test_mix_wav_cli_resampled_input(oracle, tmp_path):
    """Second input at a different rate: the CLI resamples it to --rate
    first (resampler.cpp:100-160 caller contract), then mixes."""
    ch = 2
    p0 = tmp_path / "a.wav"
    p1 = tmp_path / "b.wav"
    s0 = _make_wav(p0, 16000, ch, 4000, seed=20)
    s1 = _make_wav(p1, 44100, ch, 9000, seed=21)
    out = tmp_path / "mix.wav"

    _run_cli([str(out), str(p0), str(p1), "--rate", "16000"])

    # reference resample of input b with the CLI's chunk policy
    from resample_wav import CHUNK_FRAMES  # mix_wav shares this loop

    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, ch, True, True, 64, 32)
    ref = RefResampler(oracle, cfg)
    try:
        ratio = 16000.0 / 44100.0
        out_free = int(CHUNK_FRAMES * ratio) + 16
        raw = s1.view(np.uint8)
        frame_bytes = ch * 2
        pos, parts = 0, []
        frames = len(s1) // ch
        while pos < frames:
            avail = min(CHUNK_FRAMES, frames - pos)
            chunk = np.ascontiguousarray(
                raw[pos * frame_bytes:(pos + avail) * frame_bytes])
            o, used, gen, _pred, _clip = ref.resample(
                chunk, avail, out_free, 0.0, out_free * frame_bytes + 64)
            parts.append(o[:gen * frame_bytes].tobytes())
            if used <= 0:
                break
            pos += used
    finally:
        ref.close()
    s1r = np.frombuffer(b"".join(parts), np.int16)

    want = _ref_mix(oracle, [s0, s1r], [0.0, 0.0], shift=0)
    got = np.frombuffer(_wav_payload(out), np.int16)
    assert len(got) == len(want)
    if not np.array_equal(got, want):
        # XLA:CPU FMA contraction in the resample leg: allow exactly the
        # 1-LSB policy of test_resample_wav_cli; the mix itself is integer.
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, diff.max()
        assert (diff != 0).mean() < 0.02, (diff != 0).mean()


def test_positive_gain_rejected(tmp_path):
    """Q15 cannot amplify (dsps_mulc_s16 domain limit): a +dB request must
    be rejected up front, not silently clamped to ~0 dB."""
    a = tmp_path / "a.wav"
    _make_wav(a, 16000, 1, 256, seed=3)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "mix_wav.py"),
         str(tmp_path / "out.wav"), str(a), "--gain-db", "6"],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 1
    assert "only attenuate" in proc.stdout
