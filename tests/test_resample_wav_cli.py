"""resample_wav CLI: end-to-end differential vs the reference wrapper.

The CLI (examples/resample_wav.py) plays the reference's downstream-consumer
role: WAV header parse -> Resampler::initialize -> feed/throttle loop
(reference resampler.cpp:100-160 caller contract).  This test drives the
compiled C reference with the CLI's exact chunking policy and pins the
emitted WAV data payload byte-for-byte.
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


def _make_wav(path: Path, rate: int, ch: int, bits: int, frames: int, seed=5):
    from flac_to_wav import write_wav_header

    rng = np.random.default_rng(seed)
    t = np.arange(frames * ch)
    pcm = (np.sin(t * 0.013) * 18000 + rng.integers(-64, 64, frames * ch)
           ).astype(np.int16)
    with open(path, "wb") as f:
        write_wav_header(f, rate, ch, bits, frames, bits // 8)
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


def test_resample_wav_cli_matches_reference(oracle, tmp_path):
    rate_in, rate_out, ch, frames = 44100, 16000, 2, 12000
    in_wav = tmp_path / "in.wav"
    out_wav = tmp_path / "out.wav"
    pcm = _make_wav(in_wav, rate_in, ch, 16, frames)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "resample_wav.py"),
         str(in_wav), str(out_wav), "--rate", str(rate_out)],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    got = _wav_payload(out_wav)

    # reference driven with the CLI's exact loop: CHUNK_FRAMES slices,
    # out_free = int(CHUNK_FRAMES * ratio) + 16, resend unconsumed frames
    from resample_wav import CHUNK_FRAMES

    cfg = ResamplerConfiguration(float(rate_in), float(rate_out), 16, 16, ch,
                                 True, True, 64, 32)
    ref = RefResampler(oracle, cfg)
    try:
        ratio = rate_out / rate_in
        out_free = int(CHUNK_FRAMES * ratio) + 16
        raw = pcm.view(np.uint8)
        frame_bytes = ch * 2
        pos, parts = 0, []
        while pos < frames:
            avail = min(CHUNK_FRAMES, frames - pos)
            chunk = np.ascontiguousarray(
                raw[pos * frame_bytes:(pos + avail) * frame_bytes])
            out, used, gen, _pred, _clip = ref.resample(
                chunk, avail, out_free, 0.0, out_free * frame_bytes + 64)
            parts.append(out[:gen * frame_bytes].tobytes())
            if used <= 0:
                break
            pos += used
    finally:
        ref.close()
    want = b"".join(parts)

    assert len(got) == len(want)
    if got != want:
        # XLA:CPU FMA-contracts the filter interpolation (ops/polyphase.py
        # exact-path note); exact mode is bit-identical on TPU but may
        # differ by 1 output LSB on CPU hosts. Allow exactly that.
        gs = np.frombuffer(got, np.int16).astype(np.int32)
        ws = np.frombuffer(want, np.int16).astype(np.int32)
        diff = np.abs(gs - ws)
        assert diff.max() <= 1, diff.max()
        assert (diff != 0).mean() < 0.02, (diff != 0).mean()


def test_resample_wav_cli_passthrough_depth(oracle, tmp_path):
    """Equal rates: pass-through bit-depth conversion (16 -> 8)."""
    in_wav = tmp_path / "in.wav"
    out_wav = tmp_path / "out.wav"
    frames, ch = 5000, 2
    pcm = _make_wav(in_wav, 22050, ch, 16, frames, seed=9)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "resample_wav.py"),
         str(in_wav), str(out_wav), "--rate", "22050", "--bits", "8"],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    got = _wav_payload(out_wav)

    cfg = ResamplerConfiguration(22050.0, 22050.0, 16, 8, ch, True, True, 64, 32)
    ref = RefResampler(oracle, cfg)
    try:
        out, used, gen, _pred, _clip = ref.resample(
            np.ascontiguousarray(pcm.view(np.uint8)), frames, frames, 0.0,
            frames * ch + 64)
        want = out[:gen * ch].tobytes()
    finally:
        ref.close()
    assert got == want
