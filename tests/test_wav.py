"""WAVDecoder differential tests vs the reference parser."""

import struct

import numpy as np
import pytest

from esp_audio_libs_tpu.models.wav import WAVDecoder, parse_wav
from esp_audio_libs_tpu.utils.errors import WAVDecoderResult, WAVDecoderState


def make_wav(sample_rate=44100, channels=2, bits=16, n_frames=64, extra_chunks=(), fmt_extra=b""):
    """Build a RIFF/WAVE byte blob with optional junk chunks before fmt/data."""
    payload = np.random.default_rng(0).integers(0, 255, n_frames * channels * (bits // 8), dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * channels * bits // 8,
                      channels * bits // 8, bits) + fmt_extra
    chunks = b""
    for name, data in extra_chunks:
        chunks += name + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    body = b"WAVE" + chunks + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", payload.size) + payload.tobytes()
    return b"RIFF" + struct.pack("<I", len(body)) + body


CASES = [
    {},
    {"sample_rate": 16000, "channels": 1, "bits": 8},
    {"bits": 24, "channels": 2},
    {"extra_chunks": [(b"LIST", b"INFOsomething here")]},
    {"extra_chunks": [(b"JUNK", b"x" * 33)]},  # odd size -> pad byte
    {"fmt_extra": b"\x00\x00"},  # 18-byte fmt chunk
]


@pytest.mark.parametrize("kwargs", CASES)
def test_header_parse_matches_reference(oracle, kwargs):
    blob = make_wav(**kwargs)
    ref = oracle.wav_parse(blob)
    dec = WAVDecoder()
    res = dec.decode_header(blob)
    assert int(res) == ref["result"]
    assert int(dec.state) == ref["state"]
    assert dec.bytes_processed == ref["bytes_processed"]
    assert dec.chunk_bytes_left == ref["chunk_bytes_left"]
    assert dec.sample_rate == ref["sample_rate"]
    assert dec.num_channels == ref["num_channels"]
    assert dec.bits_per_sample == ref["bits_per_sample"]


def test_bad_magic(oracle):
    blob = b"RIFX" + b"\x00" * 64
    ref = oracle.wav_parse(blob)
    dec = WAVDecoder()
    assert int(dec.decode_header(blob)) == ref["result"] == int(WAVDecoderResult.ERROR_NO_RIFF)


def test_incomplete_data(oracle):
    blob = make_wav()[:10]
    ref = oracle.wav_parse(blob)
    dec = WAVDecoder()
    assert int(dec.decode_header(blob)) == ref["result"] == int(WAVDecoderResult.WARNING_INCOMPLETE_DATA)


def test_streaming_chunked_parse():
    """Feeding the header in two pieces resumes identically (streaming protocol)."""
    blob = make_wav(extra_chunks=[(b"LIST", b"INFO" + b"y" * 40)])
    dec = WAVDecoder()
    res1 = dec.decode_header(blob[:16])
    assert res1 == WAVDecoderResult.WARNING_INCOMPLETE_DATA
    # restart from scratch on the full buffer must still succeed
    dec.reset()
    assert dec.decode_header(blob) == WAVDecoderResult.SUCCESS_IN_DATA
    assert dec.state == WAVDecoderState.IN_DATA


def test_parse_wav_payload():
    blob = make_wav(n_frames=32, channels=1, bits=16)
    dec, pcm = parse_wav(blob)
    assert dec.sample_rate == 44100
    assert len(pcm) == 64
