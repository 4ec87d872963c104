"""Differential suites for the two untested MP3 frame-layer modes:
RTP/useSize (reference mp3_decoder.cpp:8755-8772) and free-bitrate
(MP3FindFreeSync, :8570-8610, :8737-8751).

Both were implemented (and hardened) in round 2 but had no deterministic
tests — an untested hardening divergence is the riskiest code in a parity
project.  Every case here pins PCM / error code / consumed-bytes parity
against the compiled reference, except where the reference path is
memory-unsafe (noted inline) — those assert this repo's documented hardened
behavior instead, and their generators feed the ASan corpus.
"""

import ctypes as C
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax

jax.config.update("jax_enable_x64", True)

from esp_audio_libs_tpu.models.mp3 import MP3Decoder
from esp_audio_libs_tpu.utils.errors import MP3Error

from tests.test_mp3_decode import frame_sizes, make_header
from tests.test_mp3_coverage import craft_tonal_frame

MAINBUF_SIZE = 1940  # reference include/mp3_decoder.h:16-21


# ---------------------------------------------------------------- helpers

def ref_decode_packets(oracle, packets, use_size):
    """Oracle loop in RTP style: each packet is one self-contained buffer
    passed with useSize (reference callers do exactly this for RFC 3119
    streams)."""
    h = oracle.lib.ref_mp3_init()
    try:
        out = []
        for pkt in packets:
            buf = np.frombuffer(pkt, np.uint8)
            pcm = np.zeros(1152 * 2, np.int16)
            consumed = C.c_int(0)
            err = oracle.lib.ref_mp3_decode(
                h, buf.ctypes.data_as(C.POINTER(C.c_uint8)), buf.size,
                pcm.ctypes.data_as(C.POINTER(C.c_int16)), int(use_size),
                C.byref(consumed))
            info = np.zeros(7, np.int32)
            oracle.lib.ref_mp3_get_last_frame_info(
                h, info.ctypes.data_as(C.POINTER(C.c_int32)))
            out.append((err, pcm[: int(info[4])].copy(), consumed.value,
                        int(info[0])))  # info[0] = bitrate
        return out
    finally:
        oracle.lib.ref_mp3_free(h)


def our_decode_packets(packets, use_size):
    dec = MP3Decoder()
    out = []
    for pkt in packets:
        err, pcm, consumed = dec.decode(pkt, use_size=use_size)
        info = dec.get_last_frame_info()
        out.append((int(err), pcm, consumed, int(info["bitrate"]),
                    dec.last_frame_reference_defined))
    return out


def compare_packets(oracle, packets, use_size):
    ref = ref_decode_packets(oracle, packets, use_size)
    got = our_decode_packets(packets, use_size)
    assert len(ref) == len(got)
    for i, ((re, rp, rc, rbr), (ge, gp, gc, gbr, gdef)) in enumerate(zip(ref, got)):
        assert ge == re, f"packet {i}: error {ge} != ref {re}"
        assert gc == rc, f"packet {i}: consumed {gc} != ref {rc}"
        assert gbr == rbr, f"packet {i}: bitrate {gbr} != ref {rbr}"
        if re == 0 and gdef:
            assert gp is not None
            np.testing.assert_array_equal(gp, rp[: len(gp)],
                                          err_msg=f"packet {i} pcm")


# --------------------------------------------------------------- useSize

TONAL_CFG = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0, mode_ext=0)


def test_use_size_valid_packets(oracle):
    """Self-contained tonal frames decode identically through the RTP path:
    useSize consumes the WHOLE packet as this frame's slot (nSlots =
    bytesLeft after header+side, reference :8761-8772) regardless of the
    nominal bitrate's slot count."""
    rng = np.random.default_rng(11)
    packets = [craft_tonal_frame(TONAL_CFG, rng, gains=(140 + 10 * i, 210))
               for i in range(4)]
    compare_packets(oracle, packets, use_size=True)


def test_use_size_padded_packet_sizes(oracle):
    """useSize packets of arbitrary size (trailing padding beyond the coded
    main data) — nSlots must track the caller-declared size exactly."""
    rng = np.random.default_rng(12)
    base = craft_tonal_frame(TONAL_CFG, rng)
    packets = [base, base + bytes(37), base + bytes(512)]
    compare_packets(oracle, packets, use_size=True)


def test_use_size_rejects_reservoir_frames(oracle):
    """mainDataBegin != 0 in a useSize packet -> INVALID_FRAMEHEADER with
    zero-filled PCM (reference :8762-8767): RTP reformatting requires
    self-contained frames."""
    rng = np.random.default_rng(13)
    frame = bytearray(craft_tonal_frame(TONAL_CFG, rng))
    frame[4] = 0x80  # 9-bit mainDataBegin: MSB of first side-info byte
    good = craft_tonal_frame(TONAL_CFG, np.random.default_rng(14))
    packets = [good, bytes(frame), good]
    ref = ref_decode_packets(oracle, packets, use_size=True)
    got = our_decode_packets(packets, use_size=True)
    assert got[1][0] == ref[1][0] == -6  # ERR_MP3_INVALID_FRAMEHEADER
    compare_packets(oracle, packets, use_size=True)


def test_use_size_empty_slot_rejected(oracle):
    """A packet that is exactly header+side (nSlots == 0) is rejected the
    reference way (nSlots <= 0 -> INVALID_FRAMEHEADER, :8762)."""
    _, side = frame_sizes(3, 9, 0, 0)
    pkt = make_header(**TONAL_CFG) + bytes(side)
    compare_packets(oracle, [pkt], use_size=True)


def test_use_size_clamp_boundary_differential(oracle):
    """Packets right at the MAINBUF boundary (1940 B of main data): the
    hardening clamp (mp3_frontend.cpp useSize path) is a no-op at and below
    the boundary, so parity with the reference must hold exactly."""
    rng = np.random.default_rng(15)
    base = bytearray(craft_tonal_frame(TONAL_CFG, rng))
    _, side = frame_sizes(3, 9, 0, 0)
    hdr_side = 4 + side
    for slot in (MAINBUF_SIZE - 1, MAINBUF_SIZE):
        pkt = bytes(base[:hdr_side]) + bytes(base[hdr_side:]).ljust(slot, b"\x00")
        assert len(pkt) == hdr_side + slot
        compare_packets(oracle, [pkt], use_size=True)


def test_use_size_oversized_slot_hardened():
    """A useSize packet with main data LARGER than the 1940-byte reservoir:
    the reference stores nSlots unclamped and the next useSize=0 frame's
    reservoir memmove reads far out of bounds (memory-unsafe — the oracle
    cannot be driven here; found by native/sanitize_check.sh).  This repo
    clamps the carried accounting: the oversized packet itself must decode
    (it reads from the caller's buffer, not mainBuf) and the fleet must
    stay usable afterwards."""
    rng = np.random.default_rng(16)
    base = bytearray(craft_tonal_frame(TONAL_CFG, rng))
    _, side = frame_sizes(3, 9, 0, 0)
    hdr_side = 4 + side
    big = bytes(base[:hdr_side]) + bytes(base[hdr_side:]).ljust(3000, b"\x00")

    dec = MP3Decoder()
    err, pcm, consumed = dec.decode(big, use_size=True)
    assert err == MP3Error.NONE
    assert consumed == len(big)
    assert pcm is not None and np.any(pcm != 0)
    # follow-up normal frame (reservoir accounting was clamped, not corrupted)
    nxt = craft_tonal_frame(TONAL_CFG, np.random.default_rng(17))
    err2, pcm2, _ = dec.decode(nxt)
    assert err2 == MP3Error.NONE and pcm2 is not None


# ----------------------------------------------------------- free bitrate

def make_free_frame(payload_slots, padding=0, mode=3, sr_idx=0, tonal_rng=None):
    """One free-bitrate (bitrate_idx=0) MPEG-1 frame of ``payload_slots``
    main-data bytes.  With ``tonal_rng``, real Huffman spectra fill the
    frame (craft_tonal_frame emits a valid body; we re-head it with
    bitrate_idx=0 and re-pad to the requested size)."""
    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=sr_idx, mode=mode,
               mode_ext=0)
    _, side = frame_sizes(3, 9, sr_idx, mode)
    if tonal_rng is not None:
        body = craft_tonal_frame(cfg, tonal_rng)[4:]          # side+main
    else:
        body = bytes(side)                                    # silent frame
    hdr = make_header(ver_bits=3, bitrate_idx=0, sr_idx=sr_idx,
                      padding=padding, mode=mode)
    data = body[: side + payload_slots].ljust(side + payload_slots, b"\x00")
    return hdr + data


def test_free_bitrate_stream(oracle):
    """True free-bitrate stream: constant frame size discovered from the
    next matching header on the first frame, then reused (free mode is CBR
    by spec).  PCM, consumed, and the derived bitrate report must match."""
    rng = np.random.default_rng(20)
    F = 416  # payload slots; total frame = 4 + 32 + 416
    frames = [make_free_frame(F, mode=0, tonal_rng=rng) for _ in range(4)]
    stream = b"".join(frames)
    # per-frame caller loop over one continuous stream
    packets, pos = [], 0
    for _ in range(4):
        packets.append(stream[pos:])
        pos += len(frames[0])
    compare_packets(oracle, packets, use_size=False)


def test_free_bitrate_padding_transitions(oracle):
    """Padded free-bitrate frames carry one extra slot (nSlots =
    freeBitrateSlots + padBit, reference :8750); the discovery frame's own
    pad bit is subtracted inside MP3FindFreeSync (:8587-8590).  Alternating
    padding must keep both decoders frame-aligned."""
    rng = np.random.default_rng(21)
    F = 300
    pads = [1, 0, 1, 1, 0]
    frames = []
    for i, p in enumerate(pads):
        frames.append(make_free_frame(F + p, padding=p, mode=0, tonal_rng=rng))
    stream = b"".join(frames)
    packets, pos = [], 0
    for f in frames:
        packets.append(stream[pos:])
        pos += len(f)
    compare_packets(oracle, packets, use_size=False)


def test_free_bitrate_no_second_sync(oracle):
    """No matching next header inside the buffer -> ERR_FREE_BITRATE_SYNC
    with zero-filled PCM (reference :8743-8746).  Safe to compare: the
    reference errors out before any reservoir copy."""
    frame = make_free_frame(200, mode=3)
    lone = frame[: 4 + 17 + 60]  # truncated before any second header
    compare_packets(oracle, [lone], use_size=False)


def test_free_bitrate_false_far_sync_hardened():
    """A false free-bitrate sync far away: the discovered slot count
    overflows the reference's int bitrate arithmetic (UB) AND exceeds the
    1940-byte reservoir, where the reference memcpy corrupts the heap
    (memory-unsafe — oracle not drivable; ASan-verified).  This repo
    computes the wrapped bitrate the reference's binaries produce and
    rejects the oversized frame with INVALID_FRAMEHEADER."""
    sr = 44100
    far = 7000  # payload: freeFrameBytes*samprate*8 > 2^31 -> int overflow
    first = make_free_frame(far, mode=3)
    second = make_free_frame(100, mode=3)
    stream = first + second
    dec = MP3Decoder()
    err, pcm, consumed = dec.decode(stream)
    assert err == MP3Error.INVALID_FRAMEHEADER
    info = dec.get_last_frame_info()
    free_frame_bytes = 4 + 17 + far
    want = int(np.int64(free_frame_bytes) * sr * 8 // (2 * 576))
    want = int(np.array(want & 0xFFFFFFFF, np.uint32).astype(np.int32))
    assert info["bitrate"] == want, (info["bitrate"], want)


def test_free_bitrate_generator_in_sanitize_corpus(tmp_path):
    """The mode generators feed the ASan corpus: write one file of each
    class where native/sanitize_check.sh picks up corpus args (CI passes
    build/mode_corpus/* too)."""
    out = Path("build/mode_corpus")
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(30)
    (out / "free_bitrate.mp3").write_bytes(
        b"".join(make_free_frame(416, mode=0, tonal_rng=rng) for _ in range(3)))
    (out / "free_false_far.mp3").write_bytes(
        make_free_frame(7000, mode=3) + make_free_frame(100, mode=3))
    big = craft_tonal_frame(TONAL_CFG, rng)
    (out / "use_size_oversized.mp3").write_bytes(big.ljust(3000, b"\x00"))
    assert all(p.stat().st_size > 0 for p in out.iterdir())
