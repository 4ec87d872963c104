#!/usr/bin/env python3
"""mp3mut — oracle-filtered structural mutation of MP3 streams.

The MP3 counterpart of tools/flacmut.py (same VERDICT r3 rationale: break
the single-author input loop).  Structure-aware mutations over crafted base
streams — frame reorder/transplant across streams, main-data bit flips
(Layer III ships no CRC by default, so flipped spectra decode as different
audio rather than being rejected), side-info byte perturbations, ancillary
junk between frames, cross-stream splices — filtered by the REFERENCE
decoder: a mutant is kept only when the reference decodes it (>= 1 PCM
frame) and this repo's decoder matches it frame-for-frame (same error
codes, same consumed bytes, identical PCM).  Divergence at generation time
raises loudly: the filter is a standing differential fuzzer.

Accepted mutants are committed (corpus/independent_mp3/) so the MP3
conformance runner's ``independent`` category is hermetic; the runner
re-checks the differential wherever the reference is mounted.

Reference behaviors exercised: sync re-search over junk
(mp3_decoder.cpp:8533-8568), bit-reservoir assembly across reordered
frames (:8774-8802), Huffman decode over spectra no encoder emits
(:7122-7555), bad-frame zero-fill + resync (:8677-8685).

Usage: python tools/mp3mut.py OUTDIR [n_target]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


MAX_FRAMES = 64


def frame_spans(blob: bytes):
    """Per-frame byte extents via this repo's front-end (positions from our
    parser; every mutant's acceptance from the reference)."""
    from tests.test_mp3_decode import our_decode

    spans = []
    pos = 0
    for err, _pcm, consumed, _d in our_decode(blob, MAX_FRAMES):
        if err != 0 or consumed <= 0:
            break
        spans.append((pos, pos + consumed))
        pos += consumed
    return spans


def mut_swap_frames(blob, rng):
    spans = frame_spans(blob)
    if len(spans) < 3:
        return None
    i, j = sorted(rng.choice(len(spans), 2, replace=False))
    if i == j:
        return None
    order = list(range(len(spans)))
    order[i], order[j] = order[j], order[i]
    return b"".join(blob[spans[k][0]:spans[k][1]] for k in order)


def mut_transplant(blob_a, blob_b, rng):
    sa, sb = frame_spans(blob_a), frame_spans(blob_b)
    n = min(len(sa), len(sb))
    if n < 2:
        return None
    i = int(rng.integers(0, n))
    return blob_a[:sa[i][0]] + blob_b[sb[i][0]:sb[i][1]] + blob_a[sa[i][1]:]


def mut_flip_maindata(blob, rng):
    """Flip 1-3 bits in one frame's main-data region (past the 4-byte
    header and side info — MPEG-1 stereo side info is 32 bytes): the
    Huffman stream decodes to different spectra, or errors and the decoder
    must resync — the oracle filter keeps whichever parses."""
    spans = frame_spans(blob)
    if not spans:
        return None
    i = int(rng.integers(0, len(spans)))
    s, e = spans[i]
    frame = bytearray(blob[s:e])
    lo = 4 + 32 + 4          # header + side info + margin
    if len(frame) - 4 <= lo:
        return None
    for _ in range(int(rng.integers(1, 4))):
        p = int(rng.integers(lo, len(frame) - 2))
        frame[p] ^= 1 << int(rng.integers(0, 8))
    return blob[:s] + bytes(frame) + blob[e:]


def mut_ancillary_junk(blob, rng):
    """Non-sync junk between frames: the reference caller protocol skips it
    via MP3FindSyncWord (values < 0xFF so no false sync)."""
    spans = frame_spans(blob)
    if len(spans) < 2:
        return None
    i = int(rng.integers(1, len(spans)))
    junk = bytes(int(x) for x in rng.integers(0, 0xFE, int(rng.integers(5, 48))))
    pos = spans[i][0]
    return blob[:pos] + junk + blob[pos:]


def mut_splice_streams(blob_a, blob_b, rng):
    sa, sb = frame_spans(blob_a), frame_spans(blob_b)
    if len(sa) < 2 or len(sb) < 2:
        return None
    ka = int(rng.integers(1, len(sa)))
    kb = int(rng.integers(1, len(sb)))
    return (blob_a[:sa[ka][0]]
            + b"".join(blob_b[s:e] for s, e in sb[-kb:]))


MUTATORS_1 = [mut_swap_frames, mut_flip_maindata, mut_ancillary_junk]
MUTATORS_2 = [mut_transplant, mut_splice_streams]


def signature(mutant: bytes) -> dict:
    """Oracle-anchored hermetic signature: accept() has already asserted our
    decode is frame-for-frame identical to the reference's, so hashing OUR
    PCM here pins the reference's bytes for runs without the oracle."""
    import hashlib

    from tests.test_mp3_decode import our_decode

    h = hashlib.sha256()
    errs, consumed, n_pcm = [], [], 0
    for err, pcm, c, _d in our_decode(mutant, MAX_FRAMES):
        errs.append(int(err))
        consumed.append(int(c))
        if err == 0 and pcm is not None:
            h.update(np.asarray(pcm, dtype="<i2").tobytes())
            n_pcm += len(pcm)
    return {"pcm_sha256": h.hexdigest(), "pcm_samples": n_pcm,
            "frame_errs": errs, "frame_consumed": consumed}


def accept(mutant: bytes, oracle) -> bool:
    """Keep a mutant iff the reference decodes >= 1 PCM frame from it AND
    this repo's decoder matches the reference frame-for-frame (error codes,
    consumed bytes, PCM).  A genuine mismatch raises — the filter doubles
    as a standing differential fuzzer.  Mutants whose spectra drive the
    reference into its own clz(0) guard-bit UB (detected by
    last_frame_reference_defined) are DISCARDED: the reference's PCM is
    nondeterministic there, so they cannot serve as conformance inputs."""
    from tests.test_mp3_decode import our_decode, ref_decode

    ours = our_decode(mutant, MAX_FRAMES)
    if any(not d for (_, _, _, d) in ours):
        return False                       # reference-UB stream: unusable
    ref_rows = ref_decode(oracle, mutant, MAX_FRAMES)
    n_ok = sum(1 for r in ref_rows if r[0] == 0)
    if n_ok < 1:
        return False
    assert len(ours) == len(ref_rows), (
        f"frame count differs: ours {len(ours)} vs ref {len(ref_rows)}")
    for k, ((oe, op, oc, _d), (re_, rp, rc)) in enumerate(zip(ours, ref_rows)):
        assert oe == re_ and oc == rc, (
            f"frame {k}: err/consumed differ ours=({oe},{oc}) ref=({re_},{rc})")
        if re_ == 0:
            assert op is not None and np.array_equal(op, rp[:len(op)]), (
                f"frame {k}: PCM differs")
    return True


def base_streams():
    from tests.test_mp3_coverage import (craft_reservoir_stream,
                                         craft_tonal_frame)

    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0, mode_ext=0)
    tonal = []
    for seed in (501, 502):
        rng = np.random.default_rng(seed)
        tonal.append(b"".join(craft_tonal_frame(cfg, rng) for _ in range(5)))
    rng = np.random.default_rng(503)
    res = craft_reservoir_stream(
        [dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)] * 5, rng,
        gains=(150, 180))
    m2 = []
    for seed in (504, 505):
        rng = np.random.default_rng(seed)
        m2.append(b"".join(craft_tonal_frame(
            dict(ver_bits=2, bitrate_idx=7, sr_idx=0, mode=0, mode_ext=0),
            rng) for _ in range(5)))
    return tonal + [res], m2


def main():
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "corpus" / "independent_mp3")
    n_target = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    outdir.mkdir(parents=True, exist_ok=True)

    from tests.oracle import load
    oracle = load()

    mpeg1, mpeg2 = base_streams()
    rng = np.random.default_rng(4096)
    kept = tried = 0
    counts = {}
    sigs = {}
    while kept < n_target and tried < 400:
        tried += 1
        if rng.random() < 0.7:
            op = MUTATORS_1[int(rng.integers(0, len(MUTATORS_1)))]
            pool = mpeg1 if rng.random() < 0.75 else mpeg2
            m = op(pool[int(rng.integers(0, len(pool)))], rng)
        else:
            op = MUTATORS_2[int(rng.integers(0, len(MUTATORS_2)))]
            pool = mpeg1 if rng.random() < 0.75 else mpeg2
            a, b = rng.choice(len(pool), 2, replace=False)
            m = op(pool[int(a)], pool[int(b)], rng)
        if m is None:
            continue
        if not accept(m, oracle):
            continue
        name = f"mut_{op.__name__[4:]}_{counts.get(op.__name__, 0):02d}.mp3"
        counts[op.__name__] = counts.get(op.__name__, 0) + 1
        (outdir / name).write_bytes(m)
        sigs[name] = signature(m)
        kept += 1
        print(f"kept {name} ({len(m)} B) after {tried} tries")
    if kept < n_target:
        print(f"WARNING: only {kept}/{n_target} accepted in {tried} tries")
        return 1
    import json
    (outdir / "signatures.json").write_text(
        json.dumps(sigs, indent=1, sort_keys=True))
    print(f"{kept} oracle-accepted MP3 mutants in {outdir} ({tried} tried)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
