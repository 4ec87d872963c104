#!/usr/bin/env python3
"""flacgen2 — a SECOND, structurally-independent FLAC encoder.

Why this exists: every conformance input this repo decoded before round 4
was authored by tools/flacgen.py, and an input-generation bias there (its
residual statistics, fixed per-plan partition orders, mean-heuristic Rice
parameters, caller-chosen stereo modes) could hide decoder paths that both
the corpus and the fuzz seeds miss (VERDICT r3 "what's missing").  This
encoder makes every structural choice DIFFERENTLY, the way real encoders
do — by measured bit cost — so the corpus statistics stop being
single-author:

  flacgen                              flacgen2 (this file)
  -------------------------------      --------------------------------
  caller-specified SubframePlan        cost-based mode decision per
  (kind/order fixed per frame)         subframe: constant detection,
                                       fixed 0-4 vs LPC vs verbatim by
                                       EXACT encoded size
  unwindowed autocorrelation fit       Welch-windowed autocorrelation,
  at one caller-given order            full Levinson order recursion,
                                       order chosen by predicted-error
                                       bit estimate then exact cost
  fixed precision=12 / shift=10        precision 14, shift derived from
                                       the fitted coefficients' dynamic
                                       range (per subframe)
  Rice param: mean heuristic,          Rice param: exact-cost argmin per
  one partition order per plan         partition; partition order 0..6
                                       searched by total exact cost
  caller-specified stereo mode         LR/LS/RS/MS chosen per frame by
                                       the smallest encoded frame
  sine+noise test signals              music-like program material:
                                       harmonic stacks with vibrato,
                                       attack transients, noise beds,
                                       silence, hard-panned + correlated
                                       stereo images
  wasted bits planned by caller        wasted bits DETECTED from the
                                       samples (trailing-zero scan)

The bitstream-format plumbing (BitWriter, CRCs, UTF-8 frame numbers, the
header field layouts) is shared with flacgen — those bytes are mandated by
the FLAC spec, not choices.  Everything decision-level is independent.

Reference parity target: the same decoder surface as flacgen's corpus
(reference src/decode/flac/flac_decoder.cpp); conformance category
``independent`` (examples/test_flac_decoder.py).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from flacgen import BitWriter, crc8, crc16, utf8_code, STANDARD_RATES

FIXED_COEFFS = {0: [], 1: [1], 2: [-1, 2], 3: [1, -3, 3], 4: [-1, 4, -6, 4]}


# ---------------------------------------------------------------------------
# signal synthesis: program material with music-like structure
# ---------------------------------------------------------------------------

def make_program(rng: np.random.Generator, n: int, depth: int, channels: int,
                 sample_rate: int = 44100) -> np.ndarray:
    """[n, channels] int samples at `depth` bits: harmonic voices with
    vibrato and envelopes over a noise bed, hard transients, a silent bar,
    and a stereo image mixing correlated (mid/side-friendly) and panned
    content."""
    t = np.arange(n) / sample_rate
    full = 2.0 ** (depth - 1)
    mid = np.zeros(n)
    side = np.zeros(n)

    n_voices = int(rng.integers(2, 5))
    for _ in range(n_voices):
        f0 = float(rng.uniform(55, 1200))
        vib = float(rng.uniform(0, 6)) * np.sin(2 * np.pi * rng.uniform(3, 7) * t)
        phase = 2 * np.pi * np.cumsum(np.full(n, f0) + vib) / sample_rate
        voice = np.zeros(n)
        for h in range(1, int(rng.integers(2, 6))):
            voice += np.sin(h * phase + rng.uniform(0, 6.28)) / h
        # ADSR-ish envelope with a sharp attack transient
        a = max(1, int(rng.uniform(0.001, 0.01) * sample_rate))
        env = np.minimum(np.arange(n) / a, 1.0) * np.exp(-t / rng.uniform(0.2, 2.0))
        amp = rng.uniform(0.05, 0.35)
        pan = float(rng.uniform(-1, 1))
        mid += amp * env * voice
        side += amp * env * voice * pan * 0.5

    # noise bed (decoders must see dense low-level residuals)
    mid += rng.normal(0, rng.uniform(0.002, 0.02), n)
    side += rng.normal(0, 0.004, n)
    # a transient click train
    for p in rng.integers(0, n, int(rng.integers(1, 5))):
        w = min(64, n - p)
        mid[p:p + w] += rng.uniform(0.3, 0.8) * np.exp(-np.arange(w) / 8.0)
    # a silent stretch (constant-subframe territory)
    if n > 512 and rng.random() < 0.7:
        s0 = int(rng.integers(0, n - 256))
        mid[s0:s0 + 256] = 0.0
        side[s0:s0 + 256] = 0.0

    peak = max(np.abs(mid + side).max(), np.abs(mid - side).max(), 1e-9)
    scale = 0.9 * full / peak
    left = np.clip(np.round((mid + side) * scale), -full, full - 1).astype(np.int64)
    right = np.clip(np.round((mid - side) * scale), -full, full - 1).astype(np.int64)
    if channels == 1:
        return left[:, None]
    cols = [left, right]
    for c in range(2, channels):
        extra = np.roll(left, 7 * c) // (c + 1) + rng.integers(-3, 4, n)
        cols.append(np.clip(extra, -full, full - 1).astype(np.int64))
    return np.stack(cols[:channels], axis=1)


# ---------------------------------------------------------------------------
# exact-cost entropy decisions
# ---------------------------------------------------------------------------

def rice_cost(vals: np.ndarray, p: int) -> int:
    """Exact encoded size in bits of `vals` under Rice parameter `p`."""
    v = np.asarray(vals, np.int64)
    u = np.where(v >= 0, v << 1, ((-v) << 1) - 1).astype(np.uint64)
    return int((u >> np.uint64(p)).sum()) + len(v) * (1 + p)


def best_rice(vals: np.ndarray) -> tuple[int, int]:
    """(param, bits) minimizing the EXACT cost (flacgen uses a mean
    heuristic instead)."""
    v = np.asarray(vals, np.int64)
    if len(v) == 0:
        return 0, 0
    u = np.where(v >= 0, v << 1, ((-v) << 1) - 1).astype(np.uint64)
    best_p, best_bits = 0, None
    for p in range(15):
        bits = int((u >> np.uint64(p)).sum()) + len(v) * (1 + p)
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
        elif bits > best_bits * 2:
            break
    # escape when even the best Rice code is worse than raw storage
    raw = int(np.abs(v).max(initial=0)).bit_length() + 1 if len(v) else 0
    if best_bits > len(v) * raw + 5 and raw <= 31:
        return -raw, len(v) * raw + 9   # negative param signals escape
    return best_p, best_bits


def partitioned_residual_plan(res: np.ndarray, bs: int, order: int,
                              max_po: int = 6):
    """Search partition orders 0..max_po by total exact cost; returns
    (partition_order, [(param_or_escape, values)], total_bits)."""
    best = None
    for po in range(0, max_po + 1):
        npart = 1 << po
        if bs % npart != 0:
            continue
        count = bs >> po
        if count <= order:
            break
        pos, parts, bits = order, [], 4  # 4 bits for the partition order
        ok = True
        for part in range(npart):
            n = count - order if part == 0 else count
            vals = res[pos:pos + n]
            pos += n
            p, b = best_rice(vals)
            if p >= 15:
                ok = False
                break
            parts.append((p, vals))
            bits += 4 + b
        if ok and (best is None or bits < best[2]):
            best = (po, parts, bits)
    return best


# ---------------------------------------------------------------------------
# predictor fitting (Welch window + full Levinson recursion)
# ---------------------------------------------------------------------------

def lpc_candidates(x: np.ndarray, max_order: int = 32):
    """Welch-windowed autocorrelation + Levinson over ALL orders at once;
    returns [(order, float_coeffs, est_bits_per_sample)] for a shortlist of
    orders picked by the predicted-error estimate (libFLAC-style
    0.5*log2(err) bits/sample guess)."""
    n = len(x)
    xf = x.astype(np.float64)
    w = 1.0 - (2.0 * np.arange(n) / (n - 1) - 1.0) ** 2   # Welch window
    xw = xf * w
    max_order = min(max_order, n - 1, 32)
    r = np.array([np.dot(xw[:n - k], xw[k:]) for k in range(max_order + 1)])
    if r[0] <= 0:
        return []
    a = np.zeros(max_order + 1)
    a[0] = 1.0
    e = r[0]
    out = []
    for m in range(1, max_order + 1):
        acc = r[m] + np.dot(a[1:m], r[m - 1:0:-1])
        k = -acc / e
        na = a.copy()
        na[1:m] = a[1:m] + k * a[m - 1:0:-1]
        na[m] = k
        a = na
        e *= (1.0 - k * k)
        if e <= 0:
            break
        est = 0.5 * np.log2(max(e / n, 1e-9)) + 0.5
        out.append((m, -a[m:0:-1].copy(), est))
    if not out:
        return []
    # shortlist: best estimate, its neighbors, plus a couple of spot orders
    best_m = min(out, key=lambda t: t[2] * len(x) + t[0] * 18)[0]
    picks = {best_m, max(1, best_m // 2), min(len(out), best_m + 2), 8, 2}
    return [out[m - 1] for m in sorted(picks) if 1 <= m <= len(out)]


def quantize_coeffs(cf: np.ndarray, precision: int = 14):
    """Shift chosen from the coefficients' dynamic range (flacgen fixes
    shift=10): the largest magnitude uses the full precision budget."""
    cmax = np.abs(cf).max() if len(cf) else 0.0
    if cmax <= 0:
        return np.zeros(len(cf), np.int64), 1
    shift = (precision - 1) - int(np.floor(np.log2(cmax))) - 1
    shift = max(1, min(shift, 15))
    lim = (1 << (precision - 1)) - 1
    q = np.clip(np.round(cf * (1 << shift)), -lim - 1, lim).astype(np.int64)
    return q, shift


# ---------------------------------------------------------------------------
# subframe encoding (cost-measured candidates)
# ---------------------------------------------------------------------------

def _residual(enc: np.ndarray, coeffs: np.ndarray, shift: int) -> np.ndarray:
    order = len(coeffs)
    res = np.zeros(len(enc), np.int64)
    if order == 0:
        return enc.copy()
    # vectorized prediction: stack lagged views
    n = len(enc)
    pred = np.zeros(n - order, np.int64)
    for j, c in enumerate(coeffs):
        pred += int(c) * enc[j:n - order + j]
    res[order:] = enc[order:] - (pred >> shift)
    return res


def _write_residual(w: BitWriter, plan, order: int):
    po, parts, _ = plan
    w.write(0, 2)            # method 0 (4-bit Rice)
    w.write(po, 4)
    for p, vals in parts:
        if p < 0:            # escape partition: raw at -p bits
            w.write(0xF, 4)
            w.write(-p, 5)
            for v in vals:
                w.write_signed(int(v), -p)
        else:
            w.write(p, 4)
            u = np.where(vals >= 0, vals << 1, ((-vals) << 1) - 1)
            for uv in u:
                uv = int(uv)
                q = uv >> p
                if q:
                    w.write(0, q)
                w.write(1, 1)
                if p:
                    w.write(uv & ((1 << p) - 1), p)


def encode_subframe2(samples: np.ndarray, depth: int):
    """Encode one channel by measured cost; returns the BitWriter bits as
    (bytes_fn, cost_bits).  Candidates: constant, fixed 0-4, LPC shortlist,
    verbatim fallback.  Wasted bits are DETECTED."""
    bs = len(samples)
    s = samples.astype(np.int64)

    # wasted-bits detection (trailing zero bits common to all samples)
    wasted = 0
    if np.any(s):
        ors = np.bitwise_or.reduce(s)
        while wasted < depth - 1 and not (ors >> wasted) & 1:
            wasted += 1
    eff_depth = depth - wasted
    enc = s >> wasted

    candidates = []   # (bits, kind, payload)

    if np.all(enc == enc[0]):
        candidates.append((eff_depth, "constant", None))
    else:
        # fixed predictors 0..4: exact residual cost
        for o in range(0, min(5, bs)):
            coeffs = np.array(FIXED_COEFFS[o], np.int64)
            res = _residual(enc, coeffs, 0)
            plan = partitioned_residual_plan(res, bs, o)
            if plan is None:
                continue
            bits = o * eff_depth + 2 + plan[2]
            candidates.append((bits, "fixed", (o, plan)))
        # LPC shortlist by windowed fit, exact cost per candidate
        for order, cf, _est in lpc_candidates(enc):
            if order >= bs:
                continue
            q, shift = quantize_coeffs(cf)
            res = _residual(enc, q, shift)
            plan = partitioned_residual_plan(res, bs, order)
            if plan is None:
                continue
            bits = order * eff_depth + 4 + 5 + order * 14 + 2 + plan[2]
            candidates.append((bits, "lpc", (order, q, shift, plan)))
    candidates.append((bs * eff_depth, "verbatim", None))
    bits, kind, payload = min(candidates, key=lambda c: c[0])

    w = BitWriter()
    w.write(0, 1)
    if kind == "constant":
        w.write(0, 6)
    elif kind == "verbatim":
        w.write(1, 6)
    elif kind == "fixed":
        w.write(8 + payload[0], 6)
    else:
        w.write(32 + payload[0] - 1, 6)
    if wasted:
        w.write(1, 1)
        if wasted > 1:
            w.write(0, wasted - 1)
        w.write(1, 1)
    else:
        w.write(0, 1)

    if kind == "constant":
        w.write_signed(int(enc[0]), eff_depth)
    elif kind == "verbatim":
        for v in enc:
            w.write_signed(int(v), eff_depth)
    elif kind == "fixed":
        o, plan = payload
        for v in enc[:o]:
            w.write_signed(int(v), eff_depth)
        _write_residual(w, plan, o)
    else:
        order, q, shift, plan = payload
        for v in enc[:order]:
            w.write_signed(int(v), eff_depth)
        w.write(14 - 1, 4)
        w.write_signed(shift, 5)
        for i in range(order):
            w.write_signed(int(q[order - 1 - i]), 14)
        _write_residual(w, plan, order)
    return w, bits


# ---------------------------------------------------------------------------
# stream assembly
# ---------------------------------------------------------------------------

def _encode_frame(chans: np.ndarray, depth: int, frame_no: int, bs: int,
                  sample_rate: int, n_channels: int) -> bytes:
    """Encode one frame, choosing the stereo decorrelation by measured
    cost (LR vs LS vs RS vs MS) when stereo."""
    cand_modes = [None]
    if n_channels == 2:
        cand_modes = [None, "ls", "rs", "ms"]

    best = None
    for mode in cand_modes:
        if n_channels == 2:
            left, right = chans[:, 0], chans[:, 1]
            if mode == "ls":
                parts = [(left, depth), (left - right, depth + 1)]
                ca = 8
            elif mode == "rs":
                parts = [(left - right, depth + 1), (right, depth)]
                ca = 9
            elif mode == "ms":
                parts = [((left + right) >> 1, depth), (left - right, depth + 1)]
                ca = 10
            else:
                parts = [(left, depth), (right, depth)]
                ca = 1
        else:
            parts = [(chans[:, c], depth) for c in range(n_channels)]
            ca = n_channels - 1
        writers, total_bits = [], 0
        for sig, d in parts:
            w, bits = encode_subframe2(sig, d)
            writers.append(w)
            total_bits += bits
        if best is None or total_bits < best[0]:
            best = (total_bits, ca, writers)
    _, ca, writers = best

    hdr = BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)
    hdr.write(0, 1)   # fixed blocking
    common = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
              1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}
    if bs in common:
        bs_code, bs_extra = common[bs], None
    elif bs <= 256:
        bs_code, bs_extra = 6, bs - 1
    else:
        bs_code, bs_extra = 7, bs - 1
    hdr.write(bs_code, 4)
    hdr.write(STANDARD_RATES.get(sample_rate, 0), 4)
    hdr.write(ca, 4)
    depth_codes = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
    hdr.write(depth_codes.get(depth, 0), 3)
    hdr.write(0, 1)
    hdr.align()
    hb = bytearray(hdr.getvalue())
    hb += utf8_code(frame_no)
    if bs_code == 6:
        hb.append(bs_extra)
    elif bs_code == 7:
        hb += struct.pack(">H", bs_extra)
    hb.append(crc8(bytes(hb)))

    body = BitWriter()
    for w in writers:
        # splice subframe bits (bit-level concat through the shared writer):
        # flushed whole bytes first, then the pending sub-byte remainder
        for byte in w.bytes:
            body.write(byte, 8)
        if w.nbits:
            body.write(w.acc, w.nbits)
    body.align()
    payload = bytes(hb) + body.getvalue()
    return payload + struct.pack(">H", crc16(payload))


def make_flac2(rng_seed=0, sample_rate=44100, depth=16, channels=2,
               block_size=4096, n_frames=4, last_block_size=None,
               metadata=()):
    """Encode a full stream of synthesized program material; returns
    (bytes, pcm [N, ch]).  All structural choices are cost-measured (see
    module docstring)."""
    rng = np.random.default_rng(rng_seed)
    sizes = [block_size] * n_frames
    if last_block_size is not None:
        sizes[-1] = last_block_size
    pcm = make_program(rng, sum(sizes), depth, channels, sample_rate)

    frames = []
    pos = 0
    for f, bs in enumerate(sizes):
        frames.append(_encode_frame(pcm[pos:pos + bs], depth, f, bs,
                                    sample_rate, channels))
        pos += bs

    bps = (depth + 7) // 8
    md5 = hashlib.md5()
    flat = pcm.astype(np.int64).ravel()
    buf = bytearray()
    for v in flat:
        buf += int(v & ((1 << (8 * bps)) - 1)).to_bytes(bps, "little")
    md5.update(bytes(buf))

    si = BitWriter()
    si.write(max(16, min(sizes)), 16)
    si.write(max(sizes), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(depth - 1, 5)
    si.write(0, 4)
    si.write(sum(sizes), 32)
    si_bytes = si.getvalue() + md5.digest()

    out = bytearray(b"fLaC")
    blocks = [(0, si_bytes)] + list(metadata)
    for i, (btype, bdata) in enumerate(blocks):
        out.append(((1 if i == len(blocks) - 1 else 0) << 7) | btype)
        out += len(bdata).to_bytes(3, "big")
        out += bdata
    for fb in frames:
        out += fb
    return bytes(out), pcm
