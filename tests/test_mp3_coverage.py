"""MP3 format-coverage matrix: every (version, samplerate index, block type,
mixed flag, mode_ext) combination decodes bit-exactly vs the reference.

The fuzz suite (test_mp3_decode) hits side-info combinations statistically;
this suite CRAFTS them (a bit-exact side-info writer mirroring ISO/IEC
11172-3 §2.4.1.7 / 13818-3) so every window type and joint-stereo mode is
guaranteed exercised at all 9 version x samplerate formats — including
window-type transitions with non-zero carried overlap state (crafted frames
interleave with random-payload fuzz frames). Asserts the coverage matrix is
complete at the end."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from flacgen import BitWriter  # noqa: E402  (MSB-first bit writer)

from tests.test_mp3_decode import (  # noqa: E402
    make_header, frame_sizes, compare_streams)


def craft_side_info(ver_bits, mode, block_type, mixed, rng):
    """Side info with part23Length=0 (no main data) but real window fields."""
    mpeg1 = ver_bits == 3
    mono = mode == 3
    nch = 1 if mono else 2
    ngr = 2 if mpeg1 else 1
    w = BitWriter()
    w.write(0, 9 if mpeg1 else 8)            # mainDataBegin
    w.write(0, (5 if mono else 3) if mpeg1 else (1 if mono else 2))
    if mpeg1:
        for _ in range(nch * 4):
            w.write(0, 1)                     # scfsi
    for _ in range(ngr):
        for _ in range(nch):
            w.write(0, 12)                    # part23Length
            w.write(0, 9)                     # nBigvals
            w.write(int(rng.integers(0, 256)), 8)   # globalGain
            w.write(0, 4 if mpeg1 else 9)     # sfCompress
            if block_type == 0 and not mixed:
                w.write(0, 1)                 # winSwitch off
                for _ in range(3):
                    w.write(0, 5)             # tableSelect
                w.write(0, 4)                 # region0
                w.write(0, 3)                 # region1
            else:
                w.write(1, 1)                 # winSwitch on
                w.write(block_type, 2)
                w.write(int(mixed), 1)
                for _ in range(2):
                    w.write(0, 5)
                for _ in range(3):
                    w.write(0, 3)             # subBlockGain
            if mpeg1:
                w.write(0, 1)                 # preFlag
            w.write(0, 1)                     # sfactScale
            w.write(0, 1)                     # count1TableSelect
    w.align()
    return w.getvalue()


def fuzz_frame(cfg, rng):
    # slotTab is the TOTAL frame size (reference mp3_decoder.cpp:106-109),
    # so the body after the 4-byte header is slots-4: frames butt together
    # exactly and a consumed-advancing caller stays frame-aligned.
    slots, _ = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"], cfg["sr_idx"], cfg["mode"])
    body = bytearray(rng.integers(0, 256, slots - 4, dtype=np.uint8).tobytes())
    body[0] = 0                               # mainDataBegin = 0
    if cfg["ver_bits"] == 3:
        body[1] &= 0x7F
    return make_header(**cfg) + bytes(body)


def crafted_frame(cfg, block_type, mixed, rng):
    slots, side = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"], cfg["sr_idx"], cfg["mode"])
    si = craft_side_info(cfg["ver_bits"], cfg["mode"], block_type, mixed, rng)
    assert len(si) == side, (len(si), side)
    pad = bytes(int(x) for x in rng.integers(0, 256, slots - 4 - side))
    return make_header(**cfg) + si + pad


WINDOWS = [(0, 0), (1, 0), (2, 0), (2, 1), (3, 0)]      # (blockType, mixed)
FORMATS = [(vb, sr) for vb in (3, 2, 0) for sr in (0, 1, 2)]
MODES = [(0, 0), (1, 1), (1, 2), (1, 3), (3, 0)]         # (mode, mode_ext)

# Decode-parity and reject-parity are DIFFERENT verification strengths and
# are tracked separately: a cell lands in COVERED_DECODE only when its
# crafted frame actually decoded (err == 0, PCM compared), and in
# COVERED_REJECT when both decoders rejected it identically.  MPEG-2.5
# (ver_bits == 0) is reject-only BY REFERENCE DESIGN: Helix's sync mask
# requires 12 set bits (reference include/mp3_decoder.h:41-42 SYNCWORDH/L;
# mp3_decoder.cpp:8309-8318), so a header whose version bit is 0 never
# passes sync and verIdx==0 is dead code in the reference itself — see
# PARITY.md "MPEG-2.5".
COVERED_DECODE = set()
COVERED_REJECT = set()


@pytest.mark.parametrize("ver_bits,sr_idx", FORMATS)
@pytest.mark.parametrize("mode,mode_ext", MODES)
def test_window_matrix(oracle, ver_bits, sr_idx, mode, mode_ext):
    from tests.test_mp3_decode import our_decode

    cfg = dict(ver_bits=ver_bits, bitrate_idx=9 if ver_bits == 3 else 7,
               sr_idx=sr_idx, mode=mode, mode_ext=mode_ext)
    rng = np.random.default_rng(1000 * ver_bits + 100 * sr_idx + 10 * mode + mode_ext)
    frames = []
    for bt, mixed in WINDOWS:
        # a tonal SUCCESS frame charges the carried overlap/FIFO state with
        # nonzero values (a fuzz frame usually errors, and ClearBadFrame
        # zeroes the state — that would test every window from silence)
        frames.append(craft_tonal_frame(cfg, rng))
        frames.append(crafted_frame(cfg, bt, mixed, rng))
        frames.append(fuzz_frame(cfg, rng))          # random side-info parity
    stream = b"".join(frames)
    compare_streams(oracle, stream, len(frames))

    # classify each crafted frame's cell by its ACTUAL decode outcome
    got = our_decode(stream, len(frames))
    for i, (bt, mixed) in enumerate(WINDOWS):
        cell = (ver_bits, sr_idx, bt, mixed, mode_ext)
        err = got[3 * i + 1][0]               # the crafted frame's row
        if err == 0:
            COVERED_DECODE.add(cell)
        else:
            COVERED_REJECT.add(cell)
        if ver_bits != 0:
            assert err == 0, (
                f"crafted frame for cell {cell} was intended to DECODE but "
                f"errored ({err}) — reject-parity must not count as window "
                f"coverage")
        else:
            assert err != 0, (
                "an MPEG-2.5 frame decoded — the reference's 12-bit sync "
                "mask made verIdx==0 unreachable; if that changed, promote "
                "vb=0 cells to decode-coverage and update PARITY.md")


def test_matrix_complete():
    """All (ver, srIdx, blockType, mixed, modeExt) combinations exercised —
    MPEG-1/2 cells at DECODE parity (PCM compared), MPEG-2.5 cells at
    reject parity only (dead code in the reference, see module comment)."""
    want_decode = {(vb, sr, bt, mx, me)
                   for vb, sr in FORMATS if vb != 0
                   for me in {m[1] for m in MODES}
                   for bt, mx in WINDOWS}
    want_reject = {(0, sr, bt, mx, me)
                   for vb, sr in FORMATS if vb == 0
                   for me in {m[1] for m in MODES}
                   for bt, mx in WINDOWS}
    missing = want_decode - COVERED_DECODE
    assert not missing, (
        f"{len(missing)} cells lack decode-parity coverage: "
        f"{sorted(missing)[:5]}...")
    missing = want_reject - COVERED_REJECT
    assert not missing, (
        f"{len(missing)} MPEG-2.5 cells lack reject-parity coverage: "
        f"{sorted(missing)[:5]}...")


def craft_tonal_parts(cfg, rng, gains=(120, 200), nb_pairs=16,
                      main_data_begin=0):
    """(side_info_bytes, main_data_bytes) for a frame whose granules carry
    REAL nonzero Huffman spectra with DIFFERENT global gains.

    Uses ISO/IEC 11172-3 Table B.7 table 1 codes: (0,0)='1', (1,0)='01',
    (0,1)='001', (1,1)='000'; each nonzero value carries a sign bit.
    ``main_data_begin`` is written into the side info verbatim — the
    reservoir stream builder computes it from packing."""
    from flacgen import BitWriter

    mpeg1 = cfg["ver_bits"] == 3
    mono = cfg["mode"] == 3
    nch = 1 if mono else 2
    ngr = 2 if mpeg1 else 1

    def huff_bits(w, rng):
        bits = 0
        for p in range(nb_pairs):
            if p % 2 == 0:
                w.write(0b000, 3)            # (1,1)
                w.write(int(rng.integers(0, 2)), 1)
                w.write(int(rng.integers(0, 2)), 1)
                bits += 5
            else:
                w.write(0b01, 2)             # (1,0)
                w.write(int(rng.integers(0, 2)), 1)
                bits += 3
        return bits

    # main data first (to know part23 bit counts), then side info
    main = BitWriter()
    part23 = []
    for _ in range(ngr * nch):
        part23.append(huff_bits(main, rng))
    main.align()
    main_bytes = main.getvalue()

    si = BitWriter()
    si.write(main_data_begin, 9 if mpeg1 else 8)
    si.write(0, (5 if mono else 3) if mpeg1 else (1 if mono else 2))
    if mpeg1:
        for _ in range(nch * 4):
            si.write(0, 1)                   # scfsi
    k = 0
    for g in range(ngr):
        for _ in range(nch):
            si.write(part23[k], 12)          # part23Length (all huffman bits)
            si.write(nb_pairs, 9)            # nBigvals
            si.write(gains[g % len(gains)], 8)
            si.write(0, 4 if mpeg1 else 9)   # sfCompress 0 -> zero sf bits
            si.write(0, 1)                   # winSwitch off
            si.write(1, 5)                   # tableSelect[0] = table 1
            si.write(0, 5)
            si.write(0, 5)
            si.write(0, 4)                   # region0
            si.write(0, 3)                   # region1
            if mpeg1:
                si.write(0, 1)               # preFlag
            si.write(0, 1)                   # sfactScale
            si.write(0, 1)                   # count1TableSelect
            k += 1
    si.align()
    return si.getvalue(), main_bytes


def craft_tonal_frame(cfg, rng, gains=(120, 200), nb_pairs=16):
    """A self-contained (mainDataBegin=0) crafted tonal frame — success-path
    decode with audible PCM (the fuzz suite's success frames are almost
    always silent, which once hid a bug where every granule synthesized
    with the last granule's parameters)."""
    side, main_bytes = craft_tonal_parts(cfg, rng, gains, nb_pairs)
    slots, side_bytes = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"],
                                    cfg["sr_idx"], cfg["mode"])
    assert len(side) == side_bytes, (len(side), side_bytes)
    body = side + main_bytes
    assert len(body) <= slots - 4   # slotTab is the TOTAL frame size
    body = body + bytes(slots - 4 - len(body))
    return make_header(**cfg) + body


def craft_reservoir_stream(cfgs, rng, gains=(200, 235), nb_pairs=16):
    """Frames whose main data GENUINELY lives in the bit reservoir and
    decodes: the concatenated main-data byte stream packs tightly into the
    frames' main regions (real-encoder layout), so frame i's
    ``mainDataBegin`` points back into bytes carried by earlier frames —
    the path the reference assembles via the mainBuf memmove/memcpy
    (reference mp3_decoder.cpp:8774-8802).  ``cfgs`` may vary bitrate_idx
    per frame (VBR reservoir: backreferences cross differently-sized
    slots).  Returns the stream; every frame is decodable (asserted by the
    conformance-corpus generator at build time)."""
    mains, sides_meta, caps = [], [], []
    for cfg in cfgs:
        # draw main data now (rng order!), side info written after packing
        side, main_bytes = craft_tonal_parts(cfg, rng, gains, nb_pairs)
        slots, side_bytes = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"],
                                        cfg["sr_idx"], cfg["mode"])
        assert len(side) == side_bytes
        region = slots - 4 - side_bytes   # nSlots: the main-data region
        mains.append(main_bytes)
        sides_meta.append((cfg, region, side_bytes))
        caps.append(region)

    # Lay the main-data byte stream G over the concatenated regions: frame
    # i's main data lands at p_i = q_i - mdb_i (mdb_i bytes back into the
    # previous frames' regions); the gaps are stuffing bytes, exactly like a
    # real encoder's ancillary padding keeps mainDataBegin inside its field.
    G = bytearray(sum(caps))
    frames_meta = []
    q = 0           # region i's start in G
    prev_end = 0    # end of previous frame's main data in G
    for i, ((cfg, slots, side_bytes), main_bytes) in enumerate(zip(sides_meta, mains)):
        mdb_max = 511 if cfg["ver_bits"] == 3 else 255
        # as deep into the reservoir as the field and available bytes allow,
        # growing across the stream (frame 0 is self-contained by q=0)
        mdb = min(q - prev_end + len(main_bytes) + 23 * i, mdb_max,
                  q - prev_end)
        p = q - mdb
        assert p >= prev_end, (i, p, prev_end)
        G[p: p + len(main_bytes)] = main_bytes
        prev_end = p + len(main_bytes)
        frames_meta.append((cfg, slots, mdb))
        q += slots
    assert any(m[2] > 0 for m in frames_meta[1:]), \
        "reservoir stream degenerated to self-contained frames"

    frames = []
    q = 0
    for cfg, slots, mdb in frames_meta:
        # Re-emit the side info with the packed mainDataBegin.  The throwaway
        # rng only affects the (discarded) main-data sign bits; every side
        # info field (part23Length bit counts, nBigvals, gains) is
        # rng-independent, so this side info matches the stored main data.
        side, _ = craft_tonal_parts(cfg, np.random.default_rng(0), gains,
                                    nb_pairs, main_data_begin=mdb)
        frames.append(make_header(**cfg) + side + bytes(G[q: q + slots]))
        q += slots
    return b"".join(frames)


@pytest.mark.parametrize("cfg", [
    dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0),   # MPEG1 stereo, 2 granules
    dict(ver_bits=3, bitrate_idx=9, sr_idx=1, mode=3),   # MPEG1 mono
    dict(ver_bits=2, bitrate_idx=7, sr_idx=0, mode=0),   # MPEG2 (1 granule)
])
def test_tonal_success_frames_match_reference(oracle, cfg):
    """Success frames with NONZERO spectra and per-granule-distinct gains
    must be bit-exact vs the oracle — and must actually be nonzero."""
    from tests.test_mp3_decode import our_decode

    rng = np.random.default_rng(1234)
    stream = b"".join(craft_tonal_frame(cfg, rng, gains=(200, 235)) for _ in range(3))
    compare_streams(oracle, stream, 3)

    got = our_decode(stream, 3)
    assert any(g[0] == 0 and g[1] is not None and np.any(np.asarray(g[1]))
               for g in got), "crafted frames must decode to nonzero PCM"
