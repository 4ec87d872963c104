"""Streaming-chunking invariance properties (SURVEY.md §4 item c).

Buffer boundaries must not change behavior: header parsing split at random
points follows the same resume protocol (and result codes) as the reference
at the same splits, and frame decoding is invariant to how much extra data
trails each frame.
"""

import ctypes as C
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from esp_audio_libs_tpu.models.flac import FLACDecoder
from esp_audio_libs_tpu.models.mp3 import MP3Decoder
from esp_audio_libs_tpu.utils.errors import FLACDecoderResult


def _flac_with_metadata():
    from flacgen import SubframePlan, make_flac

    return make_flac(
        rng_seed=91, depth=16, channels=2, block_size=512, n_frames=3,
        metadata=[(1, bytes(64)), (4, b"\x00" * 40), (1, bytes(128))],
        plans=[[SubframePlan("lpc", order=6), SubframePlan("fixed", order=2)]] * 3)[0]


def test_flac_header_random_splits_match_reference(oracle):
    """For ANY split point in the header region, the (part1, part2) feed must
    produce the same result-code pair as the reference, and a successful
    resume must decode the stream identically."""
    blob = _flac_with_metadata()
    probe = FLACDecoder()
    assert probe.read_header(blob) == FLACDecoderResult.SUCCESS
    header_len = probe.get_bytes_index()
    full_pcm, _ = probe.decode_stream(blob[header_len:])

    # NOTE: splits before the end of STREAMINFO (byte 42) ABORT the
    # reference outright (assert bit_buffer_length % 8 == 0 in
    # reset_bit_buffer, flac_decoder.cpp:912) — its resume protocol only
    # supports interruption inside the metadata-block region. Ours returns
    # an error code instead of crashing (checked below); the differential
    # property runs over the region the reference survives.
    streaminfo_end = 4 + 4 + 34
    rng = np.random.default_rng(3)
    for s in range(1, streaminfo_end):
        ours = FLACDecoder()
        rc1 = ours.read_header(blob[:s])          # must not crash
        assert rc1 in (FLACDecoderResult.HEADER_OUT_OF_DATA,
                       FLACDecoderResult.ERROR_BAD_MAGIC_NUMBER,
                       FLACDecoderResult.ERROR_BAD_HEADER), (s, rc1)
    splits = sorted(set(rng.integers(streaminfo_end, header_len, 25).tolist()))
    for s in splits:
        ours = FLACDecoder()
        rc1 = int(ours.read_header(blob[:s]))
        rc2 = int(ours.read_header(blob[s:]))

        ref = oracle.lib.ref_flac_create()
        b1 = np.frombuffer(blob[:s], np.uint8)
        b2 = np.frombuffer(blob[s:], np.uint8)
        r1 = oracle.lib.ref_flac_read_header(ref, b1.ctypes.data_as(C.POINTER(C.c_uint8)), b1.size)
        r2 = oracle.lib.ref_flac_read_header(ref, b2.ctypes.data_as(C.POINTER(C.c_uint8)), b2.size)
        rbi = oracle.lib.ref_flac_bytes_index(ref)
        oracle.lib.ref_flac_destroy(ref)
        assert (rc1, rc2) == (r1, r2), f"split {s}: ours ({rc1},{rc2}) ref ({r1},{r2})"

        if rc2 == int(FLACDecoderResult.SUCCESS):
            # bytes_index parity INCLUDING the reference's quirk: when the
            # header completes right at the resume buffer's start, both
            # report bytes_index 2 bytes PAST the true header end (bit-buffer
            # accounting, flac_decoder.cpp reset_bit_buffer) — so a caller
            # following the protocol may clip the first frame. We mirror the
            # reference exactly rather than "fixing" the protocol.
            assert ours.get_bytes_index() == rbi, f"split {s}"
            rest = blob[s:][ours.get_bytes_index():]
            pcm, _ = ours.decode_stream(rest)
            if rbi == header_len - s:        # index is truthful -> full decode
                assert pcm == full_pcm, f"split {s}: resumed decode differs"
            else:                            # quirk split: same loss as reference
                assert full_pcm.endswith(pcm) and len(pcm) < len(full_pcm), s


def test_wav_header_random_splits():
    """Splitting the WAV header at any point and restarting on the full
    buffer must always land in the same final state as a one-shot parse."""
    import struct

    from esp_audio_libs_tpu.models.wav import WAVDecoder
    from esp_audio_libs_tpu.utils.errors import WAVDecoderResult

    payload = bytes(range(250)) * 2
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    chunks = b""
    for name, data in [(b"LIST", b"INFO" + b"z" * 31), (b"JUNK", b"j" * 10)]:
        chunks += name + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    body = (b"WAVE" + chunks + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    one = WAVDecoder()
    assert one.decode_header(blob) == WAVDecoderResult.SUCCESS_IN_DATA

    rng = np.random.default_rng(7)
    for s in sorted(set(rng.integers(1, one.bytes_processed, 20).tolist())):
        dec = WAVDecoder()
        r = dec.decode_header(blob[:s])
        assert r in (WAVDecoderResult.WARNING_INCOMPLETE_DATA,
                     WAVDecoderResult.SUCCESS_IN_DATA), (s, r)
        dec.reset()
        assert dec.decode_header(blob) == WAVDecoderResult.SUCCESS_IN_DATA
        assert (dec.sample_rate, dec.num_channels, dec.bits_per_sample,
                dec.bytes_processed) == (one.sample_rate, one.num_channels,
                                         one.bits_per_sample, one.bytes_processed)


def test_mp3_trailing_length_invariance():
    """MP3Decode consumes one frame regardless of how much data follows:
    feeding [frame | k extra bytes] for any k yields identical output."""
    from esp_audio_libs_tpu.runtime.tables import mp3_tables

    T = mp3_tables()
    total = int(T["slotTab"][0][0][9])
    frame = bytes([0xFF, 0xE0 | (3 << 3) | 2 | 1, 9 << 4, 0xC0]) + bytes(total - 4)
    follow = bytes(range(256)) * 4

    base = MP3Decoder()
    e0, p0, c0 = base.decode(frame + follow)
    for k in (0, 1, 7, 100, len(follow)):
        dec = MP3Decoder()
        e, p, c = dec.decode(frame + follow[:k])
        assert (int(e), c) == (int(e0), c0), k
        np.testing.assert_array_equal(np.asarray(p), np.asarray(p0), err_msg=str(k))


def test_flac_frame_trailing_length_invariance():
    """decode_frame must parse exactly one frame regardless of trailing data."""
    blob = _flac_with_metadata()
    dec = FLACDecoder()
    dec.read_header(blob)
    body = blob[dec.get_bytes_index():]
    res0, pcm0, n0 = dec.decode_frame(body)
    consumed = dec.get_bytes_index()
    for k in (0, 3, 17):
        d = FLACDecoder()
        d.read_header(blob)
        res, pcm, n = d.decode_frame(body[:consumed + k])
        assert (res, n) == (res0, n0), k
        assert pcm == pcm0, k
        assert d.get_bytes_index() == consumed, k
