"""Relaxed-precision (f32) MP3 granule pipeline: the opt-in FAST tier.

The exact pipeline (ops/mp3dsp.py, ops/mp3imdct.py, ops/mp3subband.py) is
bit-identical to the Helix reference and is the measured optimum for exact
decode — but its defining operation is the int64 MAC (MULSHIFT32), which the
TPU VPU must emulate in multiple 32-bit issues, and its guard-bit machinery
(clz, es rescale shifts, CLIP_2N passes, mOut ORs) is pure fixed-point
headroom management with no information content.  PROFILES.md round-3 pinned
the granule cost to exactly that arithmetic (whole-granule static schedule:
tie; int8-limb MXU: 1.45x worse; Pallas: Mosaic has no int64).

This module is the remaining lever: the SAME measured-optimal elementwise
structure, value-mirrored in f32.  Every fixed-point op maps to its real
arithmetic meaning —

- ``MULSHIFT32(c, x) << s``  ->  ``x * (c * 2**(s-32))`` (constant folded),
- guard-bit ``es`` shifts cancel by construction (``x >> es`` early,
  ``<< es`` late conserve value modulo truncation) -> dropped,
- CLIP_2N / mOut / clz guard tracking -> dropped (f32 has the headroom),
- the dequantizer's table/polynomial branch zoo -> one closed form
  ``x^(4/3) * 2^(25 - scalei - scale_low/4)`` via exp2/log2 (the tables are
  that function sampled: pow43_14 at Q28/Q25, pow43 at Q23, pow14 = 2^(-k/4)
  Q31 — verified numerically against the vendored reference tables),

so each f32 tensor holds (approximately) the same NUMERIC VALUE as the
exact path's int32 tensor, and the final PCM quantization applies identical
rounding (+2^25 >> 26 == floor(x + 0.5) in PCM units) and int16 clipping.

Contract (the resampler fast/exact duality, models/resampler.py): opt-in,
tolerance-tested vs the exact path on decodable streams
(tests/test_mp3_fast.py, pinned on TPU hardware by tools/tpu_checks.py):
<= 1 LSB int16 on non-saturating audio; on massively-clipping content
(>70% of PCM at int16 full scale) the EXACT tier consumes guard bits and
truncates ``es`` low bits in the hybrid IMDCT (reference FreqInvertRescale)
— a truncation this tier does not mirror — so the measured bound there is
<= 4 LSB on <0.5% of samples.  NOT bit-exact, and intentionally undefined
on the reference's own UB streams (clz(0) guard-bit garbage — the exact
tier detects those, see decode_granules_batch_dev).  Exact stays the
default everywhere.

Reference being accelerated: the Helix granule pipeline,
mp3_decoder.cpp:550-795 (dequant), :1783-2617 (hybrid IMDCT),
:798-1120,7707-8019 (subband synthesis) — via the batched structures of the
exact modules, which carry the per-line reference citations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.tables import mp3_tables
from .mp3subband import _ROWS, _QROWS, _poly_coefs, CSHIFT, DEF_NFRACBITS

__all__ = ["dequantize_granule_fast", "imdct_granule_fast",
           "subband_granule_fast"]

MAX_NSAMP = 576
NBANDS = 32


def _f(x):
    return x.astype(jnp.float32)


def _c(v, s=0):
    """Q31/Q32 integer constant -> folded f32 coefficient ``v * 2**(s-32)``."""
    return np.float32(float(int(v)) * 2.0 ** (s - 32))


def const_lookup_f(idx, vals):
    """Float-leaf variant of ops.mp3dsp.const_lookup: ``vals[idx]`` as a
    binary select tree over compile-time float scalars (same no-gather
    rationale; idx pre-clipped to range)."""
    vals = np.asarray(vals, np.float64).ravel()
    n = vals.size
    nbits = max(1, int(n - 1).bit_length())

    def build(base: int, bit: int):
        if bit < 0:
            return jnp.float32(vals[min(base, n - 1)])
        lo = build(base, bit - 1)
        if base + (1 << bit) < n:
            hi = build(base + (1 << bit), bit - 1)
        else:
            return lo
        return jnp.where((idx >> bit) & 1 == 1, hi, lo)

    return build(0, nbits - 1)


# --------------------------------------------------------------------------
# dequant + stereo (value mirror of ops/mp3dsp.dequantize_granule)
# --------------------------------------------------------------------------

def _dequant_math_f32(sx, scale):
    """DequantBlock's value: ``x^(4/3) * 2^(25 - scalei - scale_low/4)``.

    Mirrors the exact path's clamping exactly where it differs from the
    closed form: scalei = min(scale >> 2, 31); the x < 4 branch shifts by
    clip(scalei + 3, 0, 31), the 4 <= x < 16 branch by clip(scalei, -31, 31),
    and the loud left-shift paths saturate at INT32_MAX.  Returns
    (signed value f32, magnitude f32).
    """
    xm = sx & 0x7FFFFFFF
    x = _f(xm)
    sl = _f(scale & 0x3)
    si = jnp.minimum(scale >> 2, 31)
    si_eff = jnp.where(xm < 4, jnp.clip(si + 3, 0, 31) - 3,
                       jnp.where(xm < 16, jnp.clip(si, -31, 31), si))
    e = (25.0 - _f(si_eff)) - 0.25 * sl
    lx = jnp.log2(jnp.maximum(x, 1.0))
    y = jnp.exp2(lx * np.float32(4.0 / 3.0) + e)
    y = jnp.minimum(y, np.float32(2147483647.0))
    y = jnp.where(x == 0, 0.0, y)
    return jnp.where(sx < 0, -y, y), y


@functools.partial(jax.jit, static_argnames=("nch", "sfb_s"))
def dequantize_granule_fast(huff, nzb, hp, *, nch, sfb_s):
    """f32 dequant + stereo; same (huff, nzb, hp) contract as the exact
    ``dequantize_granule`` but returns ``x`` f32 and no guard bits.  The
    critical-band bookkeeping mirrors the exact path's integer decisions:
    a sample is "nonzero" iff its exact value would truncate to a nonzero
    int, i.e. magnitude >= 1.0."""
    L = huff.shape[0]
    T = mp3_tables()

    dq, mag = _dequant_math_f32(huff, hp["gain"])
    processed = hp["processed"]
    dq = jnp.where(processed, dq, _f(huff))
    mag = jnp.where(processed, mag, 0.0)

    # critical-band bookkeeping on the exact path's truncation predicate
    # (mag is already zeroed where unprocessed, matching `& processed`)
    nonzero = mag >= 1.0
    band = hp["band_in"]
    win = hp["win_in"]
    is_long = hp["is_long_in"]

    def band_max(mask, init):
        b = jnp.where(mask, band, -1)
        return jnp.maximum(jnp.max(b, axis=-1), init)

    cb_end_l = band_max(nonzero & is_long, jnp.zeros_like(nzb))
    cb_start_s = hp["cb_start_s"]
    cb_end_s = jnp.stack(
        [band_max(nonzero & ~is_long & (win == w), cb_start_s)
         for w in range(3)], axis=-1)
    has_short = hp["has_short"]
    cb_end_s = jnp.where(has_short[..., None], cb_end_s, 0)
    cb_end_smax = jnp.max(cb_end_s, axis=-1)
    cb_type = hp["cb_type"]

    # short-block reorder: identical barrel-shift + static band transposes
    sfb_s_np = np.asarray(sfb_s)
    sb = hp["short_base"]
    row_mixed = (hp["cb_start_s"] == 3)[..., None]

    def _section_perm(seg, base_band):
        base = int(sfb_s_np[base_band])
        parts = []
        for cb in range(base_band, 13):
            s0 = 3 * (int(sfb_s_np[cb]) - base)
            n = int(sfb_s_np[cb + 1] - sfb_s_np[cb])
            piece = seg[..., s0:s0 + 3 * n]
            parts.append(piece.reshape(*piece.shape[:-1], 3, n)
                         .swapaxes(-1, -2).reshape(*piece.shape[:-1], 3 * n))
        out = jnp.concatenate(parts, axis=-1)
        if out.shape[-1] < seg.shape[-1]:
            out = jnp.concatenate([out, seg[..., out.shape[-1]:]], axis=-1)
        return out

    seg = dq
    for k in range(10):
        hit = (((sb >> k) & 1) == 1)[..., None]
        seg = jnp.where(hit, jnp.roll(seg, -(1 << k), axis=-1), seg)
    sec = jnp.where(row_mixed, _section_perm(seg, 3), _section_perm(seg, 0))
    for k in range(10):
        hit = (((sb >> k) & 1) == 1)[..., None]
        sec = jnp.where(hit, jnp.roll(sec, (1 << k), axis=-1), sec)

    idx576 = jnp.arange(MAX_NSAMP, dtype=jnp.int32)[None, None, :]
    short_mask = ((idx576 >= sb[..., None])
                  & (idx576 < hp["out_nzb_short"][..., None])
                  & has_short[..., None])
    x = jnp.where(short_mask, sec, dq)
    new_nzb = jnp.where(has_short, hp["out_nzb_short"], nzb)

    if nch == 1:
        return dict(x=x, nzb=new_nzb)

    # ---- joint stereo (value mirror; no guard-bit clip pass) ----
    mode_ext = hp["mode_ext"]
    midside_flag = mode_ext >> 1
    intensity_flag = mode_ext & 1
    sfb_l = hp["sfb_l"]
    sfb_s = hp["sfb_s"]
    idx = jnp.arange(MAX_NSAMP)

    cbi1_type = cb_type[:, 1]
    ms_n_long = jnp.take_along_axis(
        sfb_l, jnp.clip(cb_end_l[:, 1] + 1, 0, 22)[:, None], axis=-1)[:, 0]
    ms_n_short = 3 * jnp.take_along_axis(
        sfb_s, jnp.clip(cb_end_smax[:, 1] + 1, 0, 13)[:, None], axis=-1)[:, 0]
    ms_n_int = jnp.where(cbi1_type == 0, ms_n_long, ms_n_short)
    ms_n_free = jnp.maximum(new_nzb[:, 0], new_nzb[:, 1])
    ms_nsamps = jnp.where(intensity_flag == 1, ms_n_int, ms_n_free)

    ms_active = (midside_flag == 1)[:, None] & (idx[None, :] < ms_nsamps[:, None])
    xl, xr = x[:, 0], x[:, 1]
    x0 = jnp.where(ms_active, xl + xr, xl)
    x1 = jnp.where(ms_active, xl - xr, xr)

    ob_l = hp["band_out_l"]
    ob_s = hp["band_out_s"]
    ow = hp["win_out"]
    sf_r_l = hp["sf_right_l"]
    sf_r_s = hp["sf_right_s"]
    il_l = hp["il_out_l"]
    il_s = hp["il_out_s"]
    ver_is_m1 = hp["ver_is_mpeg1"]
    nsamps_in = new_nzb[:, 0]
    use_long = (cbi1_type == 0)[:, None]

    long_lo = (cb_end_l[:, 1] + 1)[:, None]
    long_hi = (cb_end_l[:, 0] + 1)[:, None]
    in_long = (ob_l >= long_lo) & (ob_l < long_hi) & (ob_l >= 0)
    in_long = in_long & (idx[None, :] < nsamps_in[:, None])

    s_lo_1 = (cb_end_smax[:, 1] + 1)[:, None]
    s_hi_1 = (cb_end_smax[:, 0] + 1)[:, None]
    in_short_1 = (ob_s >= s_lo_1) & (ob_s < s_hi_1) & (ob_s >= 0)
    i0_1 = 3 * jnp.take_along_axis(
        sfb_s, jnp.clip(cb_end_smax[:, 1] + 1, 0, 13)[:, None], axis=-1)
    trip_lim = i0_1 + 3 * ((nsamps_in[:, None] - i0_1) // 3)
    in_short_1 = in_short_1 & (idx[None, :] < trip_lim) & (idx[None, :] >= i0_1)
    s_lo_2 = (cb_end_s[:, 1, :] + 1)
    s_hi_2 = (cb_end_s[:, 0, :] + 1)

    def _sel3(tab, w):
        return jnp.where(w == 0, tab[:, 0:1],
                         jnp.where(w == 1, tab[:, 1:2], tab[:, 2:3]))

    lo_w = _sel3(s_lo_2, ow)
    hi_w = _sel3(s_hi_2, ow)
    in_short_2 = (ob_s >= lo_w) & (ob_s < hi_w) & (ob_s >= 0)
    in_short = jnp.where(ver_is_m1[:, None], in_short_1, in_short_2)

    region = jnp.where(use_long, in_long, in_short)
    int_active = (intensity_flag == 1)[:, None] & region

    # intensity factors: same select trees, float leaves at value fl/2^30
    # (the exact path computes MULSHIFT32(fl, x) << 2 == x * fl / 2^30)
    sf_r = jnp.where(use_long, sf_r_l, sf_r_s)
    il = jnp.where(use_long, il_l, il_s)
    isf_m1_np = np.asarray(T["ISFMpeg1"], np.float64) / 2.0 ** 30
    iip_np = np.asarray(T["ISFIIP"], np.float64) / 2.0 ** 30
    ms1 = (jnp.clip(midside_flag, 0, 1) == 1)[:, None]
    iip0 = jnp.where(ms1, np.float32(iip_np[1, 0]), np.float32(iip_np[0, 0]))
    iip1 = jnp.where(ms1, np.float32(iip_np[1, 1]), np.float32(iip_np[0, 1]))
    sf_c = jnp.clip(sf_r, 0, 6)
    fl_m1 = jnp.where(ms1, const_lookup_f(sf_c, isf_m1_np[1]),
                      const_lookup_f(sf_c, isf_m1_np[0]))
    isf6 = jnp.where(ms1, np.float32(isf_m1_np[1, 6]), np.float32(isf_m1_np[0, 6]))
    fr_m1 = isf6 - fl_m1
    is_iip_m1 = sf_r == 7
    fl_1 = jnp.where(is_iip_m1, iip0, fl_m1)
    fr_1 = jnp.where(is_iip_m1, iip1, fr_m1)

    isf_m2_flat = np.asarray(T["ISFMpeg2"], np.float64).reshape(4, 16).ravel() / 2.0 ** 30
    m2_row = ((jnp.clip(hp["intensity_scale"], 0, 1) << 1)
              | jnp.clip(midside_flag, 0, 1))[:, None] << 4
    isf2 = (sf_r + 1) >> 1
    odd = (sf_r & 1) == 1
    fl_m2 = const_lookup_f(m2_row | jnp.where(odd, jnp.clip(isf2, 0, 15), 0),
                           isf_m2_flat)
    fr_m2 = const_lookup_f(m2_row | jnp.where(odd, 0, jnp.clip(isf2, 0, 15)),
                           isf_m2_flat)
    is_iip_m2 = sf_r == il
    fl_2 = jnp.where(is_iip_m2, iip0, fl_m2)
    fr_2 = jnp.where(is_iip_m2, iip1, fr_m2)

    fl = jnp.where(ver_is_m1[:, None], fl_1, fl_2)
    fr = jnp.where(ver_is_m1[:, None], fr_1, fr_2)

    x1 = jnp.where(int_active, fr * x0, x1)
    x0 = jnp.where(int_active, fl * x0, x0)

    nz = jnp.maximum(new_nzb[:, 0], new_nzb[:, 1])
    any_stereo = mode_ext != 0
    nzb0 = jnp.where(any_stereo, nz, new_nzb[:, 0])
    nzb1 = jnp.where(any_stereo, nz, new_nzb[:, 1])
    return dict(x=jnp.stack([x0, x1], axis=1),
                nzb=jnp.stack([nzb0, nzb1], axis=-1))


# --------------------------------------------------------------------------
# hybrid IMDCT (value mirror of ops/mp3imdct.imdct_granule)
# --------------------------------------------------------------------------

def _antialias_f(x, nbfly, T):
    csa = np.asarray(T["csa"], np.float64)
    out = x
    b_ids = jnp.arange(1, NBANDS)
    j_ids = jnp.arange(8)
    li = (18 * b_ids[:, None] - 1 - j_ids[None, :]).reshape(-1)
    ri = (18 * b_ids[:, None] + j_ids[None, :]).reshape(-1)
    a0 = out[:, li]
    b0 = out[:, ri]
    # MULSHIFT32(c, v) << 1 == v * c / 2^31
    c0 = jnp.asarray(np.tile(csa[:, 0] / 2.0 ** 31, NBANDS - 1), jnp.float32)[None, :]
    c1 = jnp.asarray(np.tile(csa[:, 1] / 2.0 ** 31, NBANDS - 1), jnp.float32)[None, :]
    new_a = c0 * a0 - c1 * b0
    new_b = c0 * b0 + c1 * a0
    active = jnp.repeat(b_ids, 8)[None, :] <= nbfly[:, None]
    out = out.at[:, li].set(jnp.where(active, new_a, a0))
    out = out.at[:, ri].set(jnp.where(active, new_b, b0))
    return out


def _idct9_f(x, T):
    c = {k: _c(T[k], 1) for k in ("c9_0", "c9_1", "c9_2", "c9_3", "c9_4")}
    x0, x1, x2, x3, x4, x5, x6, x7, x8 = x
    a1 = x0 - x6
    a2 = x1 - x5
    a3 = x1 + x5
    a4 = x2 - x4
    a5 = x2 + x4
    a6 = x2 + x8
    a7 = x1 + x7
    a8 = a6 - a5
    a9 = a3 - a7
    a10 = a2 - x7
    a11 = a4 - x8
    # every (m << 1) use folds the shift into the constant (see _c(.., 1))
    m1 = c["c9_0"] * x3
    m3 = c["c9_0"] * a10
    a12 = x0 + x6 * 0.5
    a13 = a12 + m1
    a14 = a12 - m1
    a15 = a1 + a11 * 0.5
    a16 = c["c9_1"] * a5 + c["c9_2"] * a6
    a17 = c["c9_1"] * a8 - c["c9_2"] * a5
    a18 = a16 + a17
    a19 = c["c9_3"] * a9 + c["c9_4"] * a7
    a20 = c["c9_3"] * a3 - c["c9_4"] * a9
    a21 = a20 - a19
    a22 = a13 + a16
    a23 = a14 + a16
    a24 = a14 + a17
    a25 = a13 + a17
    a26 = a14 - a18
    a27 = a13 - a18
    return [a22 + a19, a15 + m3, a24 + a20, a26 - a21, a1 - a11,
            a27 + a21, a25 - a20, a15 - m3, a23 - a19]


def _win_previous_f(xprev, bt_prev, win_np):
    """Value mirror of _win_previous: returns xPrevWin = x * win / 2^32."""
    lo_rows = [jnp.asarray(win_np[bt, 18:27] / 2.0 ** 32, jnp.float32)
               for bt in range(4)]
    hi_rows = [jnp.asarray(win_np[bt, 35:26:-1].copy() / 2.0 ** 32, jnp.float32)
               for bt in range(4)]
    btb = bt_prev[..., None]

    def _sel4(rows):
        return jnp.where(btb == 0, rows[0],
                         jnp.where(btb == 1, rows[1],
                                   jnp.where(btb == 2, rows[2], rows[3])))

    x = xprev
    lo = _sel4(lo_rows) * x
    hi = _sel4(hi_rows) * x
    long_out = jnp.concatenate([lo, hi[..., ::-1]], axis=-1)

    w2 = win_np[2] / 2.0 ** 32
    s = [None] * 12
    pairs = [(6, 2, 0, 6), (7, 1, 1, 7), (8, 0, 2, 8),
             (9, 0, 3, 8), (10, 1, 4, 7), (11, 2, 5, 6)]
    for k, (wa, xa, wb, xb) in enumerate(pairs):
        s[k] = np.float32(w2[wa]) * x[..., xa] + np.float32(w2[wb]) * x[..., xb]
    for k, (wa, xa) in enumerate([(6, 5), (7, 4), (8, 3), (9, 3), (10, 4), (11, 5)]):
        s[6 + k] = np.float32(w2[wa]) * x[..., xa]
    zero = jnp.zeros_like(s[0])
    short_out = jnp.stack(s + [zero] * 6, axis=-1)
    return jnp.where((bt_prev == 2)[..., None], short_out, long_out)


def _imdct36_f(xs, xprev, bt_curr, bt_prev, blk, T, win_np):
    xbuf_e = [None] * 9
    xbuf_o = [None] * 9
    acc1 = jnp.zeros_like(xs[..., 0])
    acc2 = jnp.zeros_like(acc1)
    for i in range(8, -1, -1):
        acc1 = xs[..., 2 * i + 1] - acc1
        acc2 = acc1 - acc2
        acc1 = xs[..., 2 * i] - acc1
        xbuf_o[i] = acc2
        xbuf_e[i] = acc1
    xbuf_o[0] = xbuf_o[0] * 0.5
    xbuf_e[0] = xbuf_e[0] * 0.5

    even = _idct9_f(xbuf_e, T)
    odd = _idct9_f(xbuf_o, T)

    c18 = np.asarray(T["c18"], np.float64)
    fast_win = np.asarray(T["fastWin36"], np.float64)
    fast = (bt_prev == 0) & (bt_curr == 0)
    win_prev = _win_previous_f(xprev, bt_prev, win_np)

    y = [None] * 18
    new_prev = [None] * 9
    for i in range(9):
        xo = np.float32(c18[8 - i] / 2.0 ** 32) * odd[8 - i]
        xe = even[8 - i] * 0.25

        s_f = -xprev[..., i]
        d_f = -(xe - xo)
        t = s_f - d_f
        # MULSHIFT32(t, w) << 2 == t * w / 2^30
        ylo_f = d_f + t * np.float32(fast_win[2 * i] / 2.0 ** 30)
        yhi_f = s_f + t * np.float32(fast_win[2 * i + 1] / 2.0 ** 30)

        d_s = xe - xo
        wlo = jnp.where(bt_curr == 0, _c(win_np[0, i]),
                        jnp.where(bt_curr == 1, _c(win_np[1, i]),
                                  jnp.where(bt_curr == 2, _c(win_np[2, i]),
                                            _c(win_np[3, i]))))
        whi = jnp.where(bt_curr == 0, _c(win_np[0, 17 - i]),
                        jnp.where(bt_curr == 1, _c(win_np[1, 17 - i]),
                                  jnp.where(bt_curr == 2, _c(win_np[2, 17 - i]),
                                            _c(win_np[3, 17 - i]))))
        # (winPrev + MULSHIFT32(d, w)) << 2
        ylo_s = (win_prev[..., i] + d_s * wlo) * 4.0
        yhi_s = (win_prev[..., 17 - i] + d_s * whi) * 4.0

        y[i] = jnp.where(fast, ylo_f, ylo_s)
        y[17 - i] = jnp.where(fast, yhi_f, yhi_s)
        new_prev[i] = xe + xo

    y = jnp.stack(y, axis=-1)
    new_prev = jnp.stack(new_prev, axis=-1)

    # FreqInvert (no rescale in f32): negate odd samples of odd blocks
    odd_blk = (blk & 1) == 1
    odd_samp = (jnp.arange(18) & 1) == 1
    y = jnp.where(odd_blk[..., None] & odd_samp, -y, y)
    return y, new_prev


def _imdct12_f(x, T):
    c3_0 = _c(T["c9_0"], 1)
    c6_0, c6_1, c6_2 = (_c(0x7BA3751D, 2), _c(0x5A82799A, 2), _c(0x2120FB83, 2))
    x0, x1, x2, x3, x4, x5 = x
    x4 = x4 - x5
    x3 = x3 - x4
    x2 = x2 - x3
    x3 = x3 - x5
    x1 = x1 - x2
    x0 = x0 - x1
    x1 = x1 - x3
    x0 = x0 * 0.5
    x1 = x1 * 0.5

    a0 = c3_0 * x2
    a1 = x0 + x4 * 0.5
    a2 = x0 - x4
    o0 = a1 + a0
    o2 = a2
    o4 = a1 - a0

    a0 = c3_0 * x3
    a1 = x1 + x5 * 0.5
    a2 = x1 - x5

    o1 = c6_0 * (a1 + a0)
    o3 = c6_1 * a2
    o5 = c6_2 * (a1 - a0)
    return [o0 + o1, o2 + o3, o4 + o5, o4 - o5, o2 - o3, o0 - o1]


def _imdct12x3_f(xs, xprev, bt_prev, blk, T, win_np):
    xbuf = [None] * 18
    for w in range(3):
        outs = _imdct12_f([xs[..., w + 3 * k] for k in range(6)], T)
        for k in range(6):
            xbuf[6 * w + k] = outs[k]

    win_prev = _win_previous_f(xprev, bt_prev, win_np)
    w2 = np.asarray(win_np[2], np.float64) / 2.0 ** 32

    y = [None] * 18
    for i in range(3):
        y[0 + i] = win_prev[..., 0 + i] * 4.0
        y[3 + i] = win_prev[..., 3 + i] * 4.0
        y[6 + i] = win_prev[..., 6 + i] * 4.0 + np.float32(w2[0 + i]) * xbuf[3 + i]
        y[9 + i] = win_prev[..., 9 + i] * 4.0 + np.float32(w2[3 + i]) * xbuf[5 - i]
        y[12 + i] = win_prev[..., 12 + i] * 4.0 + (
            np.float32(w2[6 + i]) * xbuf[2 - i] + np.float32(w2[0 + i]) * xbuf[9 + i])
        y[15 + i] = win_prev[..., 15 + i] * 4.0 + (
            np.float32(w2[9 + i]) * xbuf[0 + i] + np.float32(w2[3 + i]) * xbuf[11 - i])

    new_prev = jnp.stack([xbuf[i] * 0.25
                          for i in (6, 7, 8, 12, 13, 14, 15, 16, 17)], axis=-1)
    y = jnp.stack(y, axis=-1)

    odd_blk = (blk & 1) == 1
    odd_samp = (jnp.arange(18) & 1) == 1
    y = jnp.where(odd_blk[..., None] & odd_samp, -y, y)
    return y, new_prev


@jax.jit
def imdct_granule_fast(x, xprev, nzb, block_type, mixed, prev_type,
                       prev_win_switch, block_cutoff, n_prev):
    """f32 hybrid synthesis; same block-selection integer logic as the exact
    ``imdct_granule`` (which carries the reference citations), no guard-bit
    outputs.  x: f32 [L, 576]; xprev: f32 [L, 32, 9].

    Returns (out [L, 18, 32] f32, new_xprev f32, new_nzb, n_blocks_out,
    curr_win_switch)."""
    T = mp3_tables()
    win_np = np.asarray(T["imdctWin"])
    x = x.astype(jnp.float32)
    xprev = xprev.astype(jnp.float32)
    (nzb, block_type, mixed, prev_type, prev_win_switch, block_cutoff,
     n_prev) = (v.astype(jnp.int32) for v in
                (nzb, block_type, mixed, prev_type, prev_win_switch,
                 block_cutoff, n_prev))
    L = x.shape[0]

    is_short = block_type == 2
    n_long_all = jnp.minimum((nzb + 7) // 18 + 1, 32)
    n_blocks_long = jnp.where(~is_short, n_long_all,
                              jnp.where(mixed == 1, block_cutoff, 0))
    nbfly = jnp.where(~is_short, n_blocks_long - 1,
                      jnp.where(mixed == 1, block_cutoff - 1, 0))

    x = _antialias_f(x, nbfly, T)
    nzb = jnp.maximum(nzb, nbfly * 18 + 8)
    n_blocks_total = (nzb + 17) // 18

    curr_win_switch = jnp.where(mixed == 1, block_cutoff, 0)

    blk = jnp.broadcast_to(jnp.arange(NBANDS, dtype=jnp.int32)[None, :], (L, NBANDS))
    xb = x.reshape(L, NBANDS, 18)

    curr_win = jnp.where((mixed[:, None] == 1) & (blk < curr_win_switch[:, None]),
                         0, block_type[:, None])
    prev_win = jnp.where(blk < prev_win_switch[:, None], 0, prev_type[:, None])

    y36, prev36 = _imdct36_f(xb, xprev, curr_win, prev_win, blk, T, win_np)
    y12, prev12 = _imdct12x3_f(xb, xprev, prev_win, blk, T, win_np)

    wp = _win_previous_f(xprev, prev_win, win_np)
    ypo = wp * 4.0
    odd_samp = (jnp.arange(18) & 1) == 1
    ypo = jnp.where(((blk & 1) == 1)[..., None] & odd_samp, -ypo, ypo)
    po_nonzero = jnp.any(ypo != 0, axis=-1)

    m_lim = jnp.maximum(n_blocks_long, n_blocks_total)[:, None]
    in_long = blk < n_blocks_long[:, None]
    in_short = ~in_long & (blk < n_blocks_total[:, None])
    in_prev = ~in_long & ~in_short & (blk >= m_lim) & (blk < n_prev[:, None])

    zeros_y = jnp.zeros_like(y36)
    y = jnp.where(in_long[..., None], y36,
                  jnp.where(in_short[..., None], y12,
                            jnp.where(in_prev[..., None], ypo, zeros_y)))
    new_prev = jnp.where(in_long[..., None], prev36,
                         jnp.where(in_short[..., None], prev12,
                                   jnp.where(in_prev[..., None],
                                             jnp.zeros_like(prev36), xprev)))

    ext = jnp.where(in_prev & po_nonzero, blk, -1)
    n_blocks_out = jnp.maximum(m_lim[:, 0], jnp.max(ext, axis=-1))

    out = jnp.swapaxes(y, 1, 2)
    return out, new_prev, nzb, n_blocks_out, curr_win_switch


# --------------------------------------------------------------------------
# subband synthesis (value mirror of ops/mp3subband.subband_granule)
# --------------------------------------------------------------------------

# FDCT32 butterfly shifts (mirrors ops/mp3subband._fdct32 shift table)
_FP_SHIFTS = [(1, 5, 1), (1, 3, 1), (1, 3, 1), (1, 2, 1), (1, 2, 1),
              (1, 1, 2), (1, 1, 2), (1, 1, 4)]


def _fdct32_f(x, dct_np):
    """Value mirror of the exact FDCT32: MULSHIFT32(c, v) << s == v*c/2^(32-s)."""
    cos4_0 = _c(0x5A82799A, 1)
    buf = [x[..., i] for i in range(32)]
    c = 0
    for i in range(8):
        s0, s1, s2 = _FP_SHIFTS[i]
        a0, a3 = buf[i], buf[31 - i]
        a1, a2 = buf[15 - i], buf[16 + i]
        b0 = a0 + a3
        b3 = _c(dct_np[c], s0) * (a0 - a3)
        c += 1
        b1 = a1 + a2
        b2 = _c(dct_np[c], s1) * (a1 - a2)
        c += 1
        buf[i] = b0 + b1
        buf[15 - i] = _c(dct_np[c], s2) * (b0 - b1)
        buf[16 + i] = b2 + b3
        buf[31 - i] = _c(dct_np[c], s2) * (b3 - b2)
        c += 1

    for g in range(4):
        o = 8 * g
        cc = 24 + 6 * g
        a0, a7, a3, a4 = buf[o + 0], buf[o + 7], buf[o + 3], buf[o + 4]
        b0 = a0 + a7
        b7 = _c(dct_np[cc + 0], 1) * (a0 - a7)
        b3 = a3 + a4
        b4 = _c(dct_np[cc + 1], 3) * (a3 - a4)
        a0 = b0 + b3
        a3 = _c(dct_np[cc + 2], 1) * (b0 - b3)
        a4 = b4 + b7
        a7 = _c(dct_np[cc + 2], 1) * (b7 - b4)

        a1, a6, a2, a5 = buf[o + 1], buf[o + 6], buf[o + 2], buf[o + 5]
        b1 = a1 + a6
        b6 = _c(dct_np[cc + 3], 1) * (a1 - a6)
        b2 = a2 + a5
        b5 = _c(dct_np[cc + 4], 1) * (a2 - a5)
        a1 = b1 + b2
        a2 = _c(dct_np[cc + 5], 2) * (b1 - b2)
        a5 = b5 + b6
        a6 = _c(dct_np[cc + 5], 2) * (b6 - b5)

        b0 = a0 + a1
        b1 = cos4_0 * (a0 - a1)
        b2 = a2 + a3
        b3 = cos4_0 * (a3 - a2)
        buf[o + 0] = b0
        buf[o + 1] = b1
        buf[o + 2] = b2 + b3
        buf[o + 3] = b3

        b4 = a4 + a5
        b5 = cos4_0 * (a4 - a5)
        b6 = a6 + a7
        b7 = cos4_0 * (a7 - a6)
        b6 = b6 + b7
        buf[o + 4] = b4 + b6
        buf[o + 5] = b5 + b7
        buf[o + 6] = b5 + b6
        buf[o + 7] = b7
    return buf


def _v33(xb_ch, dct_np):
    """FDCT32 outputs folded to the 33 distinct FIFO values of one step
    (buf[0] | 16 row-sums | 16 qrow-sums) — the linear map the PQMF stores;
    probed by ops/mp3mxu to build the fused-matmul operator."""
    buf = _fdct32_f(xb_ch, dct_np)
    vals = [buf[0]]
    for r in range(16):
        t = buf[_ROWS[r][0]]
        for k in _ROWS[r][1:]:
            t = t + buf[k]
        vals.append(t)
    for q in range(16):
        t = buf[_QROWS[q][0]]
        for k in _QROWS[q][1:]:
            t = t + buf[k]
        vals.append(t)
    return jnp.stack(vals, axis=-1)


def _subband_scan_acc(outbuf, vbuf, vindex, *, nch):
    """The v1 FIFO scan returning the PRE-QUANTIZATION accumulators.

    outbuf f32 [L, C, 18, 32]; vbuf f32 [L, 2176].  Returns
    (acc f32 [L, 18, C, 32] in PCM units, new vbuf f32 [L, 2176]).
    Shared by :func:`subband_granule_fast` (which quantizes) and the
    operator probes in ops/mp3mxu (which need the linear map un-rounded).
    """
    dct_np = np.asarray(mp3_tables()["dcttab"])
    outbuf = outbuf.astype(jnp.float32)
    L = outbuf.shape[0]
    C1_np, C2_np = _poly_coefs()
    # acc int64 + (1 << 25) >> 26 -> PCM units: fold 2^-26 into the taps
    C1 = jnp.asarray(C1_np.astype(np.float64) / 2.0 ** 26, jnp.float32)[None]
    C2 = jnp.asarray(C2_np.astype(np.float64) / 2.0 ** 26, jnp.float32)[None]

    row_idx = jnp.arange(34, dtype=jnp.int32)[None, :, None]
    col_idx = jnp.arange(64, dtype=jnp.int32)[None, None, :]

    def one_step(vb, v, xb, odd):
        row_off, qrow_off = 17 * odd, 17 * (1 - odd)
        c0 = (v - odd) & 7
        for ch in range(nch):
            v33 = _v33(xb[:, ch, :], dct_np)
            cc = 32 * ch

            def place(vals2, r0, nrows, col_a, col_b):
                rmask = (row_idx >= r0) & (row_idx < r0 + nrows)
                cmask = (col_idx == col_a) | (col_idx == col_b)
                vfull = vals2[:, np.clip(np.arange(34) - r0, 0, nrows - 1)]
                return rmask & cmask, vfull[:, :, None]

            m1, v1 = place(v33[:, 1:17], row_off, 16, v + cc, v + cc + 8)
            m2, v2 = place(v33[:, 17:33], qrow_off, 16, c0 + 16 + cc, c0 + 24 + cc)
            m3, v3 = place(v33[:, 0:1], qrow_off + 16, 1, c0 + cc, c0 + cc + 8)
            vb = jnp.where(m1, v1, jnp.where(m2, v2, jnp.where(m3, v3, vb)))

        acc_ch = []
        for ch in range(nch):
            sl = jax.lax.dynamic_slice(
                vb, (jnp.int32(0), jnp.int32(17 * odd), v + 32 * ch),
                (L, 17, 24))
            A = sl[:, :, 0:8]
            Bv = sl[:, :, 16:24][..., ::-1]
            lo = jnp.sum(C1 * A - C2 * Bv, axis=-1)
            hi = jnp.sum(C2 * A + C1 * Bv, axis=-1)
            acc_ch.append(jnp.concatenate([lo, hi[:, 1:16][:, ::-1]], axis=-1))
        return vb, (v - odd) & 7, jnp.stack(acc_ch, axis=1)   # [L, C, 32]

    xs = jnp.moveaxis(outbuf, 2, 0).reshape(9, 2, L, outbuf.shape[1], 32)

    def pair(carry, x2):
        vb, v = carry
        vb, v, acc0 = one_step(vb, v, x2[0], 0)
        vb, v, acc1 = one_step(vb, v, x2[1], 1)
        return (vb, v), jnp.stack([acc0, acc1], axis=0)   # [2, L, C, 32]

    vb0 = vbuf.astype(jnp.float32).reshape(L, 34, 64)
    (vb, _), acc_pairs = jax.lax.scan(pair, (vb0, vindex.astype(jnp.int32)), xs)
    # [9, 2, L, C, 32] -> [L, 18, C, 32]
    acc = jnp.moveaxis(acc_pairs.reshape(18, L, nch, 32), 0, 1)
    return acc, vb.reshape(L, 2176)


def _quantize_pcm(acc):
    """Value-space PCM quantization: (+ RND) >> 26 == floor(x + 0.5)
    round-half-up in PCM units, then int16 clip.  acc [L, 18, C, 32] ->
    pcm int16 [L, 18*32*C] (slot-major, samples channel-interleaved)."""
    x = jnp.floor(acc + 0.5)
    x = jnp.clip(x, -32768.0, 32767.0).astype(jnp.int16)
    # [L, t, c, i] -> [L, t, i, c] -> flat
    pcm = jnp.swapaxes(x, 2, 3)
    return pcm.reshape(pcm.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("nch",))
def subband_granule_fast(outbuf, vbuf, vindex, *, nch):
    """f32 subband synthesis; identical FIFO layout/phase protocol to the
    exact ``subband_granule`` (carried vbuf interconverts by dtype cast).

    outbuf: f32 [L, C, 18, 32]; vbuf: f32 [L, 2176].
    Returns (pcm int16 [L, 18*32*nch], new vbuf f32)."""
    acc, vb = _subband_scan_acc(outbuf, vbuf, vindex, nch=nch)
    return _quantize_pcm(acc), vb
