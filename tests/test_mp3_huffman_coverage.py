"""Exhaustive MP3 Huffman table coverage: every non-reserved pair table
(ISO/IEC 11172-3 Table B.7, reference tables mp3_decoder.cpp:2651-7077),
every linbits width, and both count1 quad tables decode NONZERO values,
differentially against the compiled reference.

The format-coverage matrix (test_mp3_coverage) guarantees every window/mode
cell but hits Huffman tables statistically; this suite CRAFTS one frame per
table id with that table selected for region0 (and per quad table for the
count1 region), encodes known values with the table's own codes — recovered
from this repo's generated node trees (tools/gen_huffman_tables.py) — and
asserts (a) the front-end decodes exactly those values, (b) PCM parity with
the reference, (c) the coverage set is complete at session end.
"""

import ctypes as C
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax

jax.config.update("jax_enable_x64", True)

from flacgen import BitWriter

from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder
from esp_audio_libs_tpu.models.mp3 import MP3Decoder

from tests.test_mp3_decode import frame_sizes, make_header

GEN = Path(__file__).resolve().parent.parent / "native" / "gen"

RESERVED = {4, 14}       # pair_node_off == -1 (selecting them is an error)
VALUELESS = {0}          # table 0: region decodes to zeros
LINBITS = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
           1, 2, 3, 4, 6, 8, 10, 13, 4, 5, 6, 7, 8, 9, 11, 13]

_COVERED_PAIRS: set = set()
_COVERED_QUADS: set = set()
_COVERED_LINBITS: set = set()


def _tables():
    h = np.load(GEN / "mp3_huff.npz")
    return h["pair_nodes"], h["pair_node_off"], h["quad_lut"], h["quad_bits"], h["quad_offs"]


def pair_codes(tid):
    """(x, y) -> (codeword, length) by walking the generated node tree."""
    nodes, off, *_ = _tables()
    base = int(off[tid])
    assert base >= 0, f"table {tid} has no codes"
    out = {}

    def walk(node_off, prefix, plen):
        nbits = int(nodes[base + node_off])
        for i in range(1 << nbits):
            e = int(nodes[base + node_off + 1 + i])
            if e & 0x8000:
                ln = (e >> 8) & 0x7F
                xy = (e & 0xF, (e >> 4) & 0xF)
                code = (prefix << ln) | (i >> (nbits - ln))
                out.setdefault(xy, (code, plen + ln))
            else:
                walk(e, (prefix << nbits) | i, plen + nbits)

    walk(0, 0, 0)
    return out


def quad_codes(tid):
    """(v, w, x, y) -> (codeword, length) from the flat quad LUT."""
    *_, lut, bits, offs = _tables()
    nb = int(bits[tid])
    out = {}
    for i in range(1 << nb):
        e = int(lut[int(offs[tid]) + i])
        ln, val = (e >> 8) & 0xFF, e & 0xF
        key = ((val >> 3) & 1, (val >> 2) & 1, (val >> 1) & 1, val & 1)
        code = i >> (nb - ln)
        out.setdefault(key, (code, ln))
    return out


def encode_pairs(w: BitWriter, tid, values):
    """Encode |value| pairs with table ``tid``; returns bit count.  Escape
    magnitudes (>= 15 on escape tables) emit the 15-code + linbits extension;
    every nonzero component carries a sign bit (0 = positive here)."""
    codes = pair_codes(tid)
    lb = LINBITS[tid]
    bits = 0
    for (x, y) in values:
        cx, cy = min(x, 15), min(y, 15)
        code, ln = codes[(cx, cy)]
        w.write(code, ln)
        bits += ln
        for comp, ccomp in ((x, cx), (y, cy)):
            if ccomp == 15 and lb > 0:
                w.write(comp - 15, lb)
                bits += lb
            if comp != 0:
                w.write(0, 1)   # positive
                bits += 1
    return bits


def encode_quads(w: BitWriter, tid, values):
    codes = quad_codes(tid)
    bits = 0
    for q in values:
        code, ln = codes[q]
        w.write(code, ln)
        bits += ln
        for comp in q:
            if comp:
                w.write(0, 1)
                bits += 1
    return bits


CFG = dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=3)   # MPEG1 mono


def make_table_frame(tid, pairs, quad_tid=0, quads=()):
    """One MPEG-1 mono frame whose region0 uses pair table ``tid`` for
    ``pairs`` and whose count1 region (if ``quads``) uses ``quad_tid``.
    region0Count=15 puts every big-value pair in region0 (sfBand[16] covers
    far more than the few pairs encoded)."""
    slots, side_bytes = frame_sizes(**{k: CFG[k] for k in
                                       ("ver_bits", "bitrate_idx", "sr_idx", "mode")})
    main = BitWriter()
    part23 = []
    for _ in range(2):  # 2 granules, identical payload
        bits = encode_pairs(main, tid, pairs)
        if quads:
            bits += encode_quads(main, quad_tid, quads)
        part23.append(bits)
    main.align()

    si = BitWriter()
    si.write(0, 9)           # mainDataBegin
    si.write(0, 5)           # private (mono MPEG1)
    for _ in range(4):
        si.write(0, 1)       # scfsi
    for gr in range(2):
        si.write(part23[gr], 12)
        si.write(len(pairs), 9)     # nBigvals (pairs)
        si.write(180, 8)            # globalGain
        si.write(0, 4)              # sfCompress
        si.write(0, 1)              # winSwitch off
        si.write(tid, 5)            # tableSelect[0]
        si.write(0, 5)
        si.write(0, 5)
        si.write(15, 4)             # region0Count: everything in region0
        si.write(0, 3)              # region1Count
        si.write(0, 1)              # preFlag
        si.write(0, 1)              # sfactScale
        si.write(int(quad_tid), 1)  # count1TableSelect
    si.align()
    side = si.getvalue()
    assert len(side) == side_bytes, (len(side), side_bytes)
    body = side + main.getvalue()
    assert len(body) <= slots + side_bytes, (tid, len(body))
    return make_header(**CFG) + body + bytes(slots + side_bytes - len(body))


def decode_both(oracle, frame):
    """(our huff values [2, 576], our pcm, ref pcm, errs)."""
    bat = BatchedMP3Decoder(1)
    pa = bat._parse_batch([np.frombuffer(frame, np.uint8)])
    dec = MP3Decoder()
    err, pcm, _ = dec.decode(frame)

    h = oracle.lib.ref_mp3_init()
    try:
        buf = np.frombuffer(frame, np.uint8)
        rpcm = np.zeros(1152 * 2, np.int16)
        consumed = C.c_int(0)
        rerr = oracle.lib.ref_mp3_decode(
            h, buf.ctypes.data_as(C.POINTER(C.c_uint8)), buf.size,
            rpcm.ctypes.data_as(C.POINTER(C.c_int16)), 0, C.byref(consumed))
    finally:
        oracle.lib.ref_mp3_free(h)
    return pa["huff"][0, :, 0, :], pcm, rpcm, (int(err), int(rerr)), int(pa["rc"][0])


def expected_mags(pairs):
    out = []
    for x, y in pairs:
        out.extend([x, y])
    return out


PAIR_IDS = sorted(set(range(32)) - RESERVED - VALUELESS)


@pytest.mark.parametrize("tid", PAIR_IDS)
def test_pair_table(oracle, tid):
    codes = pair_codes(tid)
    # the largest in-table (x, y): escape tables include (15, 15) -> linbits
    big = max(codes, key=lambda xy: (xy[0] + xy[1], xy))
    lb = LINBITS[tid]
    pairs = [big if lb == 0 else (15 + (1 << lb) - 1, 15 + 1)]  # max extension
    # add a small nonzero pair when the table has one
    for cand in ((1, 1), (0, 1), (1, 0)):
        if cand in codes:
            pairs.append(cand)
            break
    frame = make_table_frame(tid, pairs)
    huff, pcm, rpcm, (err, rerr), rc = decode_both(oracle, frame)
    assert err == rerr == 0, (tid, err, rerr)
    mags = np.abs(np.where(huff < 0, -(huff & 0x7FFFFFFF), huff))
    want = expected_mags(pairs)
    got = [int(m) for m in (huff[0, : len(want)] & 0x7FFFFFFF)]
    assert got == want, (tid, got, want)
    np.testing.assert_array_equal(pcm, rpcm[: len(pcm)], err_msg=f"table {tid} pcm")
    assert np.any(pcm != 0), f"table {tid}: silent frame proves nothing"
    _COVERED_PAIRS.add(tid)
    if lb:
        _COVERED_LINBITS.add(lb)


@pytest.mark.parametrize("qid", [0, 1])
def test_quad_table(oracle, qid):
    codes = quad_codes(qid)
    quads = [q for q in codes if sum(q) >= 3][:2] or [max(codes, key=sum)]
    frame = make_table_frame(1, [(1, 1)], quad_tid=qid, quads=quads)
    huff, pcm, rpcm, (err, rerr), rc = decode_both(oracle, frame)
    assert err == rerr == 0, (qid, err, rerr)
    want = [1, 1] + [c for q in quads for c in q]
    got = [int(m) for m in (huff[0, : len(want)] & 0x7FFFFFFF)]
    assert got == want, (qid, got, want)
    np.testing.assert_array_equal(pcm, rpcm[: len(pcm)], err_msg=f"quad {qid} pcm")
    assert np.any(pcm != 0)
    _COVERED_QUADS.add(qid)


def test_reserved_tables_rejected(oracle):
    """Selecting a reserved table id must error identically to the
    reference (no silent zeros)."""
    for tid in sorted(RESERVED):
        frame = make_table_frame(1, [(1, 1)])
        # patch tableSelect[0] of both granules to the reserved id: rebuild
        frame = make_table_frame_reserved(tid)
        _, pcm, rpcm, (err, rerr), rc = decode_both(oracle, frame)
        assert err == rerr, (tid, err, rerr)
        assert err != 0, f"reserved table {tid} decoded without error"


def make_table_frame_reserved(tid):
    return make_table_frame_raw(tid, n_pairs=1, part23_bits=8)


def make_table_frame_raw(tid, n_pairs, part23_bits):
    """Frame selecting ``tid`` with claimed pairs but arbitrary body bits
    (used for reserved-table rejection, where no codes exist)."""
    slots, side_bytes = frame_sizes(**{k: CFG[k] for k in
                                       ("ver_bits", "bitrate_idx", "sr_idx", "mode")})
    si = BitWriter()
    si.write(0, 9)
    si.write(0, 5)
    for _ in range(4):
        si.write(0, 1)
    for _ in range(2):
        si.write(part23_bits, 12)
        si.write(n_pairs, 9)
        si.write(180, 8)
        si.write(0, 4)
        si.write(0, 1)
        si.write(tid, 5)
        si.write(0, 5)
        si.write(0, 5)
        si.write(15, 4)
        si.write(0, 3)
        si.write(0, 1)
        si.write(0, 1)
        si.write(0, 1)
    si.align()
    side = si.getvalue()
    assert len(side) == side_bytes
    return (make_header(**CFG) + side
            + bytes(slots + side_bytes - len(side)))


def test_zzz_coverage_complete():
    """Runs last (alphabetical): every non-reserved pair table, every
    linbits width, and both quad tables were exercised with nonzero values.
    Fails loudly if a table silently stopped being covered."""
    assert _COVERED_PAIRS == set(PAIR_IDS), \
        f"uncovered pair tables: {sorted(set(PAIR_IDS) - _COVERED_PAIRS)}"
    assert _COVERED_QUADS == {0, 1}
    want_linbits = {1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13}
    assert _COVERED_LINBITS == want_linbits, \
        f"uncovered linbits widths: {sorted(want_linbits - _COVERED_LINBITS)}"
