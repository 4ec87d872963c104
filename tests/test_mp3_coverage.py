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
    slots, _ = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"], cfg["sr_idx"], cfg["mode"])
    body = bytearray(rng.integers(0, 256, slots, dtype=np.uint8).tobytes())
    body[0] = 0                               # mainDataBegin = 0
    if cfg["ver_bits"] == 3:
        body[1] &= 0x7F
    return make_header(**cfg) + bytes(body)


def crafted_frame(cfg, block_type, mixed, rng):
    slots, side = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"], cfg["sr_idx"], cfg["mode"])
    si = craft_side_info(cfg["ver_bits"], cfg["mode"], block_type, mixed, rng)
    assert len(si) == side, (len(si), side)
    pad = bytes(int(x) for x in rng.integers(0, 256, slots - side))
    return make_header(**cfg) + si + pad


WINDOWS = [(0, 0), (1, 0), (2, 0), (2, 1), (3, 0)]      # (blockType, mixed)
FORMATS = [(vb, sr) for vb in (3, 2, 0) for sr in (0, 1, 2)]
MODES = [(0, 0), (1, 1), (1, 2), (1, 3), (3, 0)]         # (mode, mode_ext)

COVERED = set()


@pytest.mark.parametrize("ver_bits,sr_idx", FORMATS)
@pytest.mark.parametrize("mode,mode_ext", MODES)
def test_window_matrix(oracle, ver_bits, sr_idx, mode, mode_ext):
    cfg = dict(ver_bits=ver_bits, bitrate_idx=9 if ver_bits == 3 else 7,
               sr_idx=sr_idx, mode=mode, mode_ext=mode_ext)
    rng = np.random.default_rng(1000 * ver_bits + 100 * sr_idx + 10 * mode + mode_ext)
    frames = []
    for bt, mixed in WINDOWS:
        frames.append(fuzz_frame(cfg, rng))          # non-zero carried state
        frames.append(crafted_frame(cfg, bt, mixed, rng))
        COVERED.add((ver_bits, sr_idx, bt, mixed, mode_ext))
    stream = b"".join(frames)
    compare_streams(oracle, stream, len(frames))


def test_matrix_complete():
    """All (ver, srIdx, blockType, mixed, modeExt) combinations exercised."""
    want = {(vb, sr, bt, mx, me)
            for vb, sr in FORMATS for me in {m[1] for m in MODES}
            for bt, mx in WINDOWS}
    missing = want - COVERED
    assert not missing, f"{len(missing)} uncovered: {sorted(missing)[:5]}..."


def craft_tonal_frame(cfg, rng, gains=(120, 200), nb_pairs=16):
    """A frame whose granules carry REAL nonzero Huffman spectra with
    DIFFERENT global gains — success-path decode with audible PCM (the fuzz
    suite's success frames are almost always silent, which once hid a bug
    where every granule synthesized with the last granule's parameters).

    Uses ISO/IEC 11172-3 Table B.7 table 1 codes: (0,0)='1', (1,0)='01',
    (0,1)='001', (1,1)='000'; each nonzero value carries a sign bit."""
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
    si.write(0, 9 if mpeg1 else 8)           # mainDataBegin
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
    side = si.getvalue()

    slots, side_bytes = frame_sizes(cfg["ver_bits"], cfg["bitrate_idx"],
                                    cfg["sr_idx"], cfg["mode"])
    assert len(side) == side_bytes, (len(side), side_bytes)
    body = side + main_bytes
    assert len(body) <= slots + side_bytes
    body = body + bytes(slots + side_bytes - len(body))
    return make_header(**cfg) + body


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
