"""Test-vector FLAC encoder.

Generates valid FLAC streams exercising every decoder path: subframe types
(constant / verbatim / fixed 0-4 / LPC 1-32), Rice partitions and escape
codes, wasted bits, all stereo decorrelation modes, bit depths 8-32,
uncommon block-size/sample-rate codes, metadata blocks, and deliberately
corrupted streams for error-path tests.

This is test infrastructure only (the reference library has no encoder);
streams are verified by decoding with BOTH the compiled reference decoder
and the TPU pipeline and comparing byte-for-byte.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FIXED_COEFFS = [[], [1], [-1, 2], [1, -3, 3], [-1, 4, -6, 4]]

STANDARD_RATES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
                  24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, n: int):
        self.write(0, n) if n else None
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-like coded number."""
    if n < 0x80:
        return bytes([n])
    out = []
    if n < 0x800:
        lead, nbytes = 0xC0, 2
    elif n < 0x10000:
        lead, nbytes = 0xE0, 3
    elif n < 0x200000:
        lead, nbytes = 0xF0, 4
    elif n < 0x4000000:
        lead, nbytes = 0xF8, 5
    else:
        lead, nbytes = 0xFC, 6
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    out.append(lead | n)
    return bytes(reversed(out))


def rice_encode(w: BitWriter, values, param: int):
    for v in values:
        v = int(v)
        u = (v << 1) if v >= 0 else ((-v << 1) - 1)  # zigzag
        q = u >> param
        w.write(0, q) if q else None
        w.write(1, 1)
        w.write(u & ((1 << param) - 1), param) if param else None


def best_rice_param(values) -> int:
    a = np.abs(np.asarray(values, np.int64)).mean() if len(values) else 0
    p = 0
    while (1 << p) < a + 1 and p < 14:
        p += 1
    return p


class SubframePlan:
    """How to encode one channel of one frame."""

    def __init__(self, kind="lpc", order=8, wasted=0, precision=12, shift=10,
                 partition_order=0, escape=False, escape_bits=None, fit=False,
                 bad_residual_method=False, bad_partition_order=False):
        self.kind = kind            # constant | verbatim | fixed | lpc | reserved
        self.order = order
        self.wasted = wasted
        self.precision = precision
        self.shift = shift
        self.partition_order = partition_order
        self.escape = escape        # use escape code in partition 0
        self.escape_bits = escape_bits  # None -> derive; 0 -> all-zero escape
        # fit=True derives the LPC coefficients from the signal
        # (Levinson-Durbin + quantization) like a real encoder, giving
        # realistically small residuals; fit=False keeps adversarial random
        # coefficients (stress decode correctness, huge residuals).
        self.fit = fit
        # fault injection (conformance faulty corpus): emit a reserved
        # residual coding method (2), or a partition order whose first
        # partition has fewer samples than the predictor order
        self.bad_residual_method = bad_residual_method
        self.bad_partition_order = bad_partition_order


def _fit_lpc_coeffs(x: np.ndarray, order: int, precision: int, shift: int) -> np.ndarray:
    """Encoder-grade quantized LPC fit (autocorrelation + Levinson-Durbin),
    the method real FLAC encoders use; returns int coeffs c such that
    pred[m] = (sum_i c[i] * x[m-order+i]) >> shift tracks the signal."""
    xf = x.astype(np.float64)
    n = len(xf)
    r = np.array([np.dot(xf[: n - k], xf[k:]) for k in range(order + 1)])
    if r[0] <= 0:
        return np.zeros(order, np.int64)
    a = np.zeros(order + 1)
    a[0] = 1.0
    e = r[0]
    for i in range(1, order + 1):
        acc = r[i] + np.dot(a[1:i], r[i - 1 : 0 : -1])
        k = -acc / e
        new_a = a.copy()
        new_a[1:i] = a[1:i] + k * a[i - 1 : 0 : -1]
        new_a[i] = k
        a = new_a
        e *= 1.0 - k * k
        if e <= 0:
            break
    # pred[m] = -sum_j a[j] x[m-j]; c[i] pairs with x at lag (order - i)
    c_float = -a[order:0:-1]
    lim = (1 << (precision - 1)) - 1
    return np.clip(np.round(c_float * (1 << shift)), -lim - 1, lim).astype(np.int64)


def encode_subframe(w: BitWriter, samples: np.ndarray, depth: int, plan: SubframePlan,
                    rng: np.random.Generator):
    """Encode `samples` (int, fitting in `depth` bits) as one subframe."""
    bs = len(samples)
    wasted = plan.wasted
    samples = samples.astype(np.int64)
    if wasted:
        # incoming samples already carry `wasted` low zero bits
        # (_gen_channel_samples shifts them up); the coded channel is the
        # right-shifted value at the reduced depth
        assert not np.any(samples & ((1 << wasted) - 1)), \
            "wasted-bits subframe requires samples with low zero bits"
    eff_depth = depth - wasted
    enc = samples >> wasted

    w.write(0, 1)  # reserved
    kind = plan.kind
    if kind == "constant":
        w.write(0, 6)
    elif kind == "verbatim":
        w.write(1, 6)
    elif kind == "reserved":
        # fault injection: subframe type 000010 is reserved (FLAC spec §9.2.1;
        # reference rejects with BAD_SUBFRAME_TYPE) — emit it then stop, the
        # decoder must not read further
        w.write(2, 6)
        w.write(0, 1)
        return samples
    elif kind == "fixed":
        w.write(8 + plan.order, 6)
    else:
        w.write(32 + plan.order - 1, 6)
    if wasted:
        w.write(1, 1)
        w.write(0, wasted - 1) if wasted > 1 else None
        w.write(1, 1)
    else:
        w.write(0, 1)

    if kind == "constant":
        w.write_signed(int(enc[0]), eff_depth)
        return samples
    if kind == "verbatim":
        for v in enc:
            w.write_signed(int(v), eff_depth)
        return samples

    order = plan.order
    # warm-up samples
    for v in enc[:order]:
        w.write_signed(int(v), eff_depth)

    if kind == "fixed":
        coeffs = np.array(FIXED_COEFFS[order], np.int64)
        shift = 0
    else:
        precision, shift = plan.precision, plan.shift
        if plan.fit:  # encoder-grade fit: realistic small residuals
            coeffs = _fit_lpc_coeffs(enc, order, precision, shift)
        else:  # adversarial random coefficients: stress decode correctness
            coeffs = rng.integers(-(1 << (precision - 2)), 1 << (precision - 2), order).astype(np.int64)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for i in range(order):
            w.write_signed(int(coeffs[order - 1 - i]), precision)

    # residuals: res[m] = enc[m] - ((sum_j coeffs[j]*enc[m-order+j]) >> shift)
    res = np.zeros(bs, np.int64)
    for m in range(order, bs):
        pred = int(np.dot(enc[m - order:m], coeffs)) >> shift
        res[m] = int(enc[m]) - pred

    # residual coding (method 0 = 4-bit Rice)
    if plan.bad_residual_method:
        # fault injection: methods 2/3 are reserved (spec §9.2.7) — emit and
        # stop; the decoder must reject without consuming residuals
        w.write(2, 2)
        return samples
    if plan.bad_partition_order:
        # fault injection: a partition order that does not divide the block
        # size (reference rejects with BLOCK_SIZE_NOT_DIVISIBLE_RICE,
        # flac_decoder.cpp:858-861).  NOTE: the other invalid-po class —
        # divisible but first partition smaller than the predictor order —
        # underflows an unsigned count in the reference (memory-unsafe), so
        # it lives in the ASan corpus only, never the differential one.
        po = next(p for p in range(1, 16) if bs % (1 << p) != 0)
        w.write(0, 2)
        w.write(po, 4)
        return samples
    w.write(0, 2)
    po = plan.partition_order
    w.write(po, 4)
    npart = 1 << po
    assert bs % npart == 0
    count = bs >> po
    pos = order
    for part in range(npart):
        n = count - order if part == 0 else count
        vals = res[pos: pos + n]
        pos += n
        if plan.escape and part == 0:
            ebits = plan.escape_bits
            if ebits is None:
                ebits = int(max(2, np.max(np.abs(vals)) and int(np.ceil(np.log2(np.max(np.abs(vals)) + 1))) + 2)) if len(vals) else 0
                ebits = min(ebits, 31)
            w.write(0xF, 4)
            w.write(ebits, 5)
            if ebits:
                for v in vals:
                    w.write_signed(int(v), ebits)
            else:
                assert not np.any(vals), "escape_bits=0 requires all-zero residuals"
        else:
            param = best_rice_param(vals)
            param = min(param, 14)
            w.write(param, 4)
            rice_encode(w, vals, param)
    return samples


def _gen_channel_samples(rng, bs, depth, plan):
    """Random samples with headroom so encoding round-trips exactly."""
    eff = depth - plan.wasted
    if plan.kind == "constant":
        v = int(rng.integers(-(1 << (eff - 1)), 1 << (eff - 1)))
        base = np.full(bs, v, np.int64)
    elif plan.kind in ("fixed", "lpc"):
        # smooth-ish signal keeps residuals small (and within int ranges)
        amp = 1 << max(1, eff - 3)
        t = np.arange(bs)
        base = (amp * np.sin(t / rng.uniform(3, 40)) + rng.integers(-4, 5, bs)).astype(np.int64)
        base = np.clip(base, -(1 << (eff - 1)), (1 << (eff - 1)) - 1)
    else:
        base = rng.integers(-(1 << (eff - 1)), 1 << (eff - 1), bs).astype(np.int64)
    return base * (1 << plan.wasted)


def make_flac(
    rng_seed=0,
    sample_rate=44100,
    depth=16,
    channels=2,
    block_size=256,
    n_frames=4,
    plans=None,              # list per frame of (list per channel of SubframePlan) or None
    stereo_modes=None,       # list per frame: None/'ls'/'rs'/'ms'
    metadata=(),             # list of (type, bytes)
    last_block_size=None,    # uncommon trailing block
    block_sizes=None,        # per-frame sizes (variable-blocksize streams)
    uncommon_bs_code=False,  # force 8/16-bit explicit block size codes
    sr_code_override=None,   # fault/uncommon: force the frame sample-rate code
    ca_override=None,        # fault: force the frame channel-assignment code
    inter_frame_garbage=0,   # bytes of non-sync junk inserted between frames
):
    """Build a complete FLAC stream + return (bytes, original PCM [N, ch])."""
    rng = np.random.default_rng(rng_seed)
    frames_samples = []  # per frame [ch, bs]
    frame_bits = []

    total = 0
    # A per-frame block_sizes list makes the stream variable-blocksize: the
    # blocking-strategy bit flips to 1 and the coded number becomes the
    # frame's first SAMPLE index (spec 9.1.1-9.1.3; both decoders parse but
    # don't consume the number — no seeking — yet must walk its UTF-8 length
    # and CRC it).
    variable = block_sizes is not None
    if variable:
        assert len(block_sizes) == n_frames
    for f in range(n_frames):
        if variable:
            bs = block_sizes[f]
        else:
            bs = block_size if (last_block_size is None or f < n_frames - 1) else last_block_size
        mode = (stereo_modes[f] if stereo_modes else None) if channels == 2 else None
        chplans = (plans[f] if plans else None) or [
            SubframePlan(kind=rng.choice(["constant", "verbatim", "fixed", "lpc"]),
                         order=int(rng.integers(1, 5)) if True else 0)
            for _ in range(channels)]
        # normalize orders per kind
        for p in chplans:
            if p.kind == "fixed":
                p.order = min(p.order, 4)
            elif p.kind == "lpc":
                p.order = max(1, min(p.order, 32))

        w = BitWriter()
        # ---- frame header ----
        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)  # sync
        hdr.write(0, 1)  # reserved
        hdr.write(1 if variable else 0, 1)  # blocking strategy
        # block size code
        common = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
                  1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}
        if not uncommon_bs_code and bs in common:
            bs_code, bs_extra = common[bs], None
        elif bs <= 256:
            bs_code, bs_extra = 6, bs - 1
        else:
            bs_code, bs_extra = 7, bs - 1
        hdr.write(bs_code, 4)
        sr_code = STANDARD_RATES.get(sample_rate, 0)
        if sr_code_override is not None:
            sr_code = sr_code_override
        hdr.write(sr_code, 4)
        # channel assignment
        if mode == "ls":
            ca = 8
        elif mode == "rs":
            ca = 9
        elif mode == "ms":
            ca = 10
        else:
            ca = channels - 1
        hdr.write(ca if ca_override is None else ca_override, 4)
        depth_codes = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
        hdr.write(depth_codes.get(depth, 0), 3)
        hdr.write(0, 1)  # reserved
        hdr.align()
        hdr_bytes = bytearray(hdr.getvalue())
        hdr_bytes += utf8_code(total if variable else f)
        if bs_code == 6:
            hdr_bytes.append(bs_extra)
        elif bs_code == 7:
            hdr_bytes += struct.pack(">H", bs_extra)
        # explicit sample-rate codes carry the rate after the block size
        # (spec 9.1.5; decoder: flac_frontend.cpp sr_code 12/13/14 branch)
        if sr_code == 12:
            hdr_bytes.append(sample_rate // 1000)
        elif sr_code == 13:
            hdr_bytes += struct.pack(">H", sample_rate)
        elif sr_code == 14:
            hdr_bytes += struct.pack(">H", sample_rate // 10)
        hdr_bytes.append(crc8(bytes(hdr_bytes)))

        # ---- subframes ----
        body = BitWriter()
        if ca >= 8:
            # generate left/right then derive the coded pair
            pl, pr = chplans[0], chplans[1]
            left = _gen_channel_samples(rng, bs, depth, pl)
            right = _gen_channel_samples(rng, bs, depth, pr)
            if ca == 8:    # left/side
                c0, d0 = left, depth
                c1, d1 = left - right, depth + 1
            elif ca == 9:  # right/side
                c0, d0 = left - right, depth + 1
                c1, d1 = right, depth
            else:          # mid/side
                c0, d0 = (left + right) >> 1, depth
                c1, d1 = left - right, depth + 1
            # encode without wasted bits for coded channels (keep it simple)
            p0 = SubframePlan(kind="verbatim") if pl.kind == "constant" else pl
            p0 = SubframePlan(kind=p0.kind, order=p0.order, wasted=0,
                              precision=p0.precision, shift=p0.shift,
                              partition_order=p0.partition_order, escape=p0.escape)
            p1 = SubframePlan(kind=pr.kind, order=pr.order, wasted=0,
                              precision=pr.precision, shift=pr.shift,
                              partition_order=pr.partition_order, escape=pr.escape)
            if p0.kind == "constant":
                p0.kind = "verbatim"
            if p1.kind == "constant":
                p1.kind = "verbatim"
            encode_subframe(body, c0, d0, p0, rng)
            encode_subframe(body, c1, d1, p1, rng)
            chans = np.stack([left, right])
        else:
            chans = []
            for c in range(channels):
                s = _gen_channel_samples(rng, bs, depth, chplans[c])
                s = encode_subframe(body, s, depth, chplans[c], rng)
                chans.append(s)
            chans = np.stack(chans)
        body.align()
        frame_payload = bytes(hdr_bytes) + body.getvalue()
        frame_payload += struct.pack(">H", crc16(frame_payload))
        frame_bits.append(frame_payload)
        frames_samples.append(chans)
        total += bs

    pcm = np.concatenate([fs.T for fs in frames_samples])  # [N, ch]

    # ---- MD5 over original PCM, LE, ceil(depth/8) bytes, signed ----
    bps = (depth + 7) // 8
    md5 = hashlib.md5()
    flat = pcm.astype(np.int64).ravel()
    buf = bytearray()
    for v in flat:
        buf += int(v & ((1 << (8 * bps)) - 1)).to_bytes(bps, "little")
    md5.update(bytes(buf))

    # ---- STREAMINFO + metadata ----
    si = BitWriter()
    all_bs = list(block_sizes) if variable else \
        [block_size, last_block_size or block_size]
    si.write(max(16, min(all_bs)), 16)
    si.write(max(all_bs), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(depth - 1, 5)
    si.write(0, 4)
    si.write(total, 32)
    si_bytes = si.getvalue() + md5.digest()
    assert len(si_bytes) == 34

    out = bytearray(b"fLaC")
    blocks = [(0, si_bytes)] + list(metadata)
    for i, (btype, bdata) in enumerate(blocks):
        last = 1 if i == len(blocks) - 1 else 0
        out.append((last << 7) | btype)
        out += len(bdata).to_bytes(3, "big")
        out += bdata
    for fi, fb in enumerate(frame_bits):
        if inter_frame_garbage and fi > 0:
            # junk that can't alias a frame sync (no 0xFF bytes): both
            # decoders skip it via find_frame_sync and decode on —
            # "sync garbage between frames" is an ACCEPT-class faulty case
            out += bytes((37 * (fi + k)) % 0xFF for k in range(inter_frame_garbage))
        out += fb
    return bytes(out), pcm
