"""End-to-end MP3Decode differential tests: full frames vs the reference.

No MP3 encoder exists in this image, so coverage comes from structured
fuzzing: syntactically valid frame headers with randomized side-info/main
data.  The Helix design decodes-or-rejects ANY byte stream deterministically
(error codes + zero-fill, resync-and-continue — SURVEY.md §5), so the
reference and our pipeline must agree bit-for-bit on PCM, error codes, and
consumed bytes for every input — valid or garbage.  Multi-frame streams
exercise the bit reservoir.
"""

import ctypes as C

import numpy as np
import pytest

from esp_audio_libs_tpu.models.mp3 import MP3Decoder
from esp_audio_libs_tpu.utils.errors import MP3Error


def make_header(ver_bits=3, layer_bits=1, bitrate_idx=9, sr_idx=0, padding=0,
                mode=0, mode_ext=0, crc=1):
    """4-byte MPEG audio frame header. ver_bits: 3=MPEG1, 2=MPEG2, 0=MPEG2.5;
    layer_bits: 1=Layer III. crc=1 means NO crc (protection bit)."""
    b0 = 0xFF
    b1 = 0xE0 | (ver_bits << 3) | (layer_bits << 1) | crc
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = (mode << 6) | (mode_ext << 4)
    return bytes([b0, b1, b2, b3])


def frame_sizes(ver_bits, bitrate_idx, sr_idx, mode):
    """(total frame bytes, side info bytes) from the standard tables."""
    from esp_audio_libs_tpu.runtime.tables import mp3_tables

    T = mp3_tables()
    ver = {3: 0, 2: 1, 0: 2}[ver_bits]
    slots = int(T["slotTab"][ver][sr_idx][bitrate_idx])
    side = int(T["sideBytesTab"][ver][0 if mode == 3 else 1])
    return slots, side


def ref_decode(oracle, data: bytes, n_frames: int):
    from tests.oracle import mp3_decode_frame

    h = oracle.lib.ref_mp3_init()
    try:
        buf = np.frombuffer(data, np.uint8)
        results = []
        pos = 0
        for _ in range(n_frames):
            err, pcm, consumed = mp3_decode_frame(oracle, h, buf, pos)
            results.append((err, pcm, consumed))
            pos += consumed
            if pos >= buf.size:
                break
        return results
    finally:
        oracle.lib.ref_mp3_free(h)


def our_decode(data: bytes, n_frames: int):
    dec = MP3Decoder()
    results = []
    pos = 0
    defined = True
    for _ in range(n_frames):
        err, pcm, consumed = dec.decode(data[pos:])
        defined = defined and dec.last_frame_reference_defined
        results.append((int(err), pcm, consumed, defined))
        pos += consumed
        if pos >= len(data):
            break
    return results


def compare_streams(oracle, data: bytes, n_frames: int):
    ref = ref_decode(oracle, data, n_frames)
    got = our_decode(data, n_frames)
    assert len(ref) == len(got), (len(ref), len(got))
    for i, ((re, rp, rc), (ge, gp, gc, gdef)) in enumerate(zip(ref, got)):
        assert ge == re, f"frame {i}: error {MP3Error(ge).name} != ref {re}"
        assert gc == rc, f"frame {i}: consumed {gc} != ref {rc}"
        if re == 0 and gdef:
            # gdef False = the reference hit __builtin_clz(0) (UB) in this
            # stream's guard-bit tracking and its PCM is nondeterministic
            # garbage; comparing against it is meaningless.
            assert gp is not None
            np.testing.assert_array_equal(gp, rp[: len(gp)], err_msg=f"frame {i} pcm")


CONFIGS = [
    dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=3),               # MPEG1 mono 128k
    dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0),              # MPEG1 stereo 192k
    dict(ver_bits=3, bitrate_idx=11, sr_idx=1, mode=1, mode_ext=2),  # joint ms
    dict(ver_bits=3, bitrate_idx=11, sr_idx=2, mode=1, mode_ext=3),  # joint ms+is
    dict(ver_bits=2, bitrate_idx=8, sr_idx=0, mode=0),               # MPEG2 stereo
    dict(ver_bits=2, bitrate_idx=8, sr_idx=1, mode=1, mode_ext=1),   # MPEG2 intensity
    dict(ver_bits=0, bitrate_idx=8, sr_idx=0, mode=3),               # MPEG2.5 mono
]


CONFIGS.append(dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=1, mode_ext=2))
CONFIGS.append(dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=1, mode_ext=1))


@pytest.mark.parametrize("cfg", CONFIGS)
@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_fuzz_frames_match_reference(oracle, cfg, seed):
    rng = np.random.default_rng(seed * 17 + cfg["bitrate_idx"] + cfg["sr_idx"] + 31 * cfg.get("mode_ext", 0))
    hdr = make_header(**cfg)
    total, side = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"], cfg["sr_idx"], cfg["mode"])
    stream = b""
    n_frames = 4
    for f in range(n_frames):
        body = rng.integers(0, 256, total - 4, dtype=np.uint8).tobytes()
        # keep mainDataBegin == 0 so frames are self-contained: zero the
        # first side-info byte's top bits (9-bit mainDataBegin for MPEG1,
        # 8-bit for MPEG2)
        body = bytearray(body)
        body[0] = 0
        if cfg["ver_bits"] == 3:
            body[1] &= 0x7F
        body = bytes(body)
        stream += hdr + body
    compare_streams(oracle, stream, n_frames)


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_with_reservoir(oracle, seed):
    """Random mainDataBegin exercises the bit-reservoir path (including
    MAINDATA_UNDERFLOW on early frames)."""
    rng = np.random.default_rng(100 + seed)
    cfg = dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)
    hdr = make_header(**cfg)
    total, side = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"], cfg["sr_idx"], cfg["mode"])
    stream = b""
    n_frames = 5
    for f in range(n_frames):
        body = rng.integers(0, 256, total - 4, dtype=np.uint8).tobytes()
        stream += hdr + body
    compare_streams(oracle, stream, n_frames)


@pytest.mark.parametrize("seed", [0, 3])
def test_vbr_bitrate_changes_match_reference(oracle, seed):
    """VBR streams (the common LAME shape): the bitrate index changes frame
    to frame, so the frame slot size changes mid-stream. The reference
    re-parses the header every frame and follows along — PCM, consumed, and
    error codes must match exactly, including the reservoir interaction
    (mainDataBegin left random so backreferences cross differently-sized
    slots)."""
    rng = np.random.default_rng(300 + seed)
    base = dict(ver_bits=3, sr_idx=0, mode=0)
    stream = b""
    n_frames = 6
    for f, br in enumerate([9, 13, 7, 11, 5, 12]):
        cfg = dict(base, bitrate_idx=br)
        hdr = make_header(**cfg)
        total, side = frame_sizes(cfg["ver_bits"], br, cfg["sr_idx"], cfg["mode"])
        body = bytearray(rng.integers(0, 256, total - 4, dtype=np.uint8).tobytes())
        if f == 0:
            body[0] = 0            # self-contained first frame
            body[1] &= 0x7F
        stream += hdr + bytes(body)
    compare_streams(oracle, stream, n_frames)


def test_all_zero_main_data(oracle):
    """Silence frame: all-zero side info + main data decodes to silence."""
    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=3)
    hdr = make_header(**cfg)
    total, side = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"], cfg["sr_idx"], cfg["mode"])
    stream = (hdr + bytes(total - 4)) * 3
    compare_streams(oracle, stream, 3)


def test_invalid_header(oracle):
    data = b"\x00\x11\x22\x33" * 100
    ref = ref_decode(oracle, data, 1)
    got = our_decode(data, 1)
    assert got[0][0] == ref[0][0] == int(MP3Error.INVALID_FRAMEHEADER)




@pytest.mark.parametrize("cfg", CONFIGS[:6])
@pytest.mark.parametrize("seed", [4, 11])
def test_compact_device_expansion_matches_python(oracle, cfg, seed):
    """The device-side per-sample expansion (compact blob + static maps,
    production path) must reproduce the Python reference expansion exactly
    for every hp array."""
    import jax.numpy as jnp
    from esp_audio_libs_tpu.models.mp3 import (
        expand_hp_device, format_maps, granule_params,
        granule_params_compact_blob)

    rng = np.random.default_rng(seed * 13 + cfg["bitrate_idx"])
    hdr = make_header(**cfg)
    total, _ = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"], cfg["sr_idx"], cfg["mode"])
    dec = MP3Decoder()
    checked = 0
    for f in range(8):
        if f == 0:
            body = bytearray(total - 4)
        else:
            body = bytearray(rng.integers(0, 256, total - 4, dtype=np.uint8).tobytes())
            body[0] = 0
            if cfg["ver_bits"] == 3:
                body[1] &= 0x7F
        err, huff, params, sf, frame, sfjs, *_ = dec.parse_frame(hdr + bytes(body))
        if int(err) != 0:
            continue
        ngr, nch = int(frame[6]), int(frame[5])
        ver, sr_idx = int(frame[0]), int(frame[4])
        maps = {k: jnp.asarray(v) for k, v in format_maps(ver, sr_idx).items()}
        for gr in range(ngr):
            nzb = params[gr, :nch, 18].astype(np.int32)
            py = granule_params(params[gr, :nch], sf[gr, :nch], frame, sfjs, nzb)
            compact = granule_params_compact_blob(
                params[gr][None], sf[gr][None], frame[None], sfjs[None],
                nzb[None], nch)
            dev = expand_hp_device(jnp.asarray(compact), maps, nch)
            for k in py:
                if k.startswith("_"):   # static trace-time constants
                    np.testing.assert_array_equal(np.asarray(dev[k]),
                                                  np.asarray(py[k]), err_msg=k)
                    continue
                got = np.asarray(dev[k])[0]
                np.testing.assert_array_equal(got, np.asarray(py[k]),
                                              err_msg=f"{k} gr={gr} f={f}")
            checked += 1
    assert checked > 0


def test_get_last_frame_info(oracle):
    """MP3GetLastFrameInfo parity: zeros before any parse, stored header
    state after decode (reference mp3_decoder.cpp:8613-8634)."""
    dec = MP3Decoder()
    h = oracle.lib.ref_mp3_init()
    try:
        ref_info = np.zeros(7, np.int32)
        oracle.lib.ref_mp3_get_last_frame_info(h, ref_info.ctypes.data_as(C.POINTER(C.c_int32)))
        got = dec.get_last_frame_info()
        assert list(got.values()) == list(int(x) for x in ref_info)  # all zeros

        cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=3)
        total, _ = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"], cfg["sr_idx"], cfg["mode"])
        stream = make_header(**cfg) + bytes(total - 4)
        buf = np.frombuffer(stream, np.uint8)
        pcm = np.zeros(1152 * 2, np.int16)
        consumed = C.c_int(0)
        oracle.lib.ref_mp3_decode(h, buf.ctypes.data_as(C.POINTER(C.c_uint8)), buf.size,
                                  pcm.ctypes.data_as(C.POINTER(C.c_int16)), 0, C.byref(consumed))
        dec.decode(stream)
        oracle.lib.ref_mp3_get_last_frame_info(h, ref_info.ctypes.data_as(C.POINTER(C.c_int32)))
        got = dec.get_last_frame_info()
        assert got["bitrate"] == ref_info[0] and got["nChans"] == ref_info[1]
        assert got["samprate"] == ref_info[2] and got["outputSamps"] == ref_info[4]
        assert got["layer"] == ref_info[5] and got["version"] == ref_info[6]
    finally:
        oracle.lib.ref_mp3_free(h)


def test_find_sync_and_frame_info(oracle):
    hdr = make_header(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=3)
    blob = b"\x12\x34" * 10 + hdr + bytes(100)
    assert MP3Decoder.find_sync_word(blob) == oracle.lib.ref_mp3_find_sync_word(
        np.frombuffer(blob, np.uint8).ctypes.data_as(C.POINTER(C.c_uint8)), len(blob)) == 20

    dec = MP3Decoder()
    err, info = dec.get_next_frame_info(hdr + bytes(40))
    h = oracle.lib.ref_mp3_init()
    ref_info = np.zeros(7, np.int32)
    rerr = oracle.lib.ref_mp3_get_next_frame_info(
        h, ref_info.ctypes.data_as(C.POINTER(C.c_int32)),
        np.frombuffer(hdr + bytes(40), np.uint8).ctypes.data_as(C.POINTER(C.c_uint8)))
    oracle.lib.ref_mp3_free(h)
    assert int(err) == rerr == 0
    assert info["samprate"] == ref_info[2] and info["bitrate"] == ref_info[0]
    assert info["outputSamps"] == ref_info[4]
