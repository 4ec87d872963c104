"""Batched MP3 (Helix) numeric kernels: dequant + stereo reconstruction.

TPU-native equivalents of the reference Helix decoder's per-granule numeric
stages (reference: src/decode/mp3_decoder.cpp):

- :func:`dequant_block_math` — Ken's fixed-point ``x^(4/3) * 2^(25-scale/4)``
  dequantizer (reference :550-634 DequantBlock), fully vectorized: the
  table/polynomial branches become masked lane math.
- :func:`dequantize_granule` — DequantChannel/Dequantize (:657-795,
  :7582-7705) for a batch of granules: the per-critical-band serial loop is
  replaced by host-precomputed per-sample parameter arrays (gain index, band
  id, window id, reorder permutation, processed mask) so the device does one
  uniform pass; critical-band bookkeeping (cbi), guard bits, mid-side and
  intensity stereo (MPEG-1 :1180-1278 and MPEG-2 :1302-1422) are computed as
  masked elementwise ops.

All arithmetic is exact int32/int64 (MULSHIFT32 == (int64(x)*int64(y))>>32),
bit-identical to the C reference.  Requires jax_enable_x64.

Sign convention: Huffman magnitudes carry their sign in the MSB
(reference ApplySign :7095); two's complement is applied here, in dequant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.tables import mp3_tables

__all__ = ["dequantize_granule", "mulshift32"]

MAX_NSAMP = 576


def mulshift32(x, y):
    """int32 high-word multiply: (int64(x) * int64(y)) >> 32."""
    return ((x.astype(jnp.int64) * y.astype(jnp.int64)) >> 32).astype(jnp.int32)


def const_lookup(idx, table) -> jax.Array:
    """Bit-exact ``table[idx]`` for a small COMPILE-TIME table without a
    device gather: a binary select tree over the bits of ``idx`` with scalar
    constant leaves.  A per-element minor-axis gather walks elements on TPU
    (~400x the cost of vector math on these shapes — the round-1 lesson
    that rebuilt expand_hp_device); the tree is pure elementwise selects
    that XLA fuses into one VPU pass.  ``idx`` must already be clipped to
    [0, len(table)).
    """
    vals = np.asarray(table).ravel()
    n = vals.size
    assert n >= 1
    nbits = max(1, int(n - 1).bit_length())
    dt = jnp.int64 if vals.dtype.kind == "i" and vals.itemsize == 8 else jnp.int32

    def build(base: int, bit: int):
        if bit < 0:
            return dt(int(vals[min(base, n - 1)]))
        lo = build(base, bit - 1)
        if base + (1 << bit) < n:
            hi = build(base + (1 << bit), bit - 1)
        else:
            return lo   # upper half out of range: idx can't select it
        return jnp.where((idx >> bit) & 1 == 1, hi, lo)

    return build(0, nbits - 1)


def _clz32(x):
    """__builtin_clz with lzcnt semantics (clz(0) = 32); x is int32."""
    return jax.lax.clz(x.astype(jnp.int32))


def _fastabs(x):
    return jnp.abs(x)  # wraps at INT_MIN like the reference's std::abs


def dequant_block_math(sx, scale, T):
    """Vectorized DequantBlock body (reference :550-634).

    sx: int32 sign|magnitude samples. scale: int32 per-sample gainI.
    Returns (signed dequantized value, magnitude y for the guard-bit mask).
    """
    i32 = jnp.int32
    x = sx & 0x7FFFFFFF

    # per-sample small-table lookups run as constant select trees, never
    # device gathers: a [.., 576] minor-axis gather walks elements on TPU
    # and dominated this stage (in-scan ablation: ~15 ms/granule at B=256
    # before this rewrite)
    Tnp = mp3_tables()
    scale_low = scale & 0x3
    scalef = const_lookup(scale_low, Tnp["pow14"]).astype(i32)
    scalei = jnp.minimum(scale >> 2, 31)

    # tab16[scale_low][x] over the flattened [4*16] table
    tab16_x = const_lookup((scale_low << 4) | jnp.clip(x, 0, 15),
                           Tnp["pow43_14"]).astype(i32)

    # x < 4 (tab4 cache): tab4[x] = x==0 ? 0 : tab16[x] >> shift
    shift4 = jnp.clip(scalei + 3, 0, 31)
    y_lt4 = jnp.where(x == 0, 0, tab16_x >> shift4)

    # 4 <= x < 16
    y_lt16 = jnp.where(scalei < 0, tab16_x << jnp.clip(-scalei, 0, 31), tab16_x >> jnp.clip(scalei, 0, 31))

    # 16 <= x < 64: pow43 table + fractional scale
    y_p43 = const_lookup(jnp.clip(x - 16, 0, 47), Tnp["pow43"]).astype(i32)
    y_p43 = mulshift32(y_p43, scalef)
    shift_p43 = scalei - 3

    # x >= 64: normalize and evaluate polynomial
    xn = (x << 17).astype(i32)
    sh = jnp.zeros_like(x)
    c4 = xn < 0x08000000
    xn = jnp.where(c4, xn << 4, xn)
    sh = sh + jnp.where(c4, 4, 0)
    c2 = xn < 0x20000000
    xn = jnp.where(c2, xn << 2, xn)
    sh = sh + jnp.where(c2, 2, 0)
    c1 = xn < 0x40000000
    xn = jnp.where(c1, xn << 1, xn)
    sh = sh + jnp.where(c1, 1, 0)

    use_lo = xn < jnp.int32(0x5A82799A)  # SQRTHALF
    poly_lo, poly_hi = T["poly43lo"], T["poly43hi"]
    y_poly = jnp.where(use_lo, poly_lo[0], poly_hi[0])
    for k in range(1, 5):
        ck = jnp.where(use_lo, poly_lo[k], poly_hi[k])
        y_poly = mulshift32(y_poly, xn) + ck
    y_poly = (mulshift32(y_poly, const_lookup(sh, Tnp["pow2frac"]).astype(i32)) << 3).astype(i32)
    y_poly = mulshift32(y_poly, scalef)
    shift_poly = scalei - const_lookup(sh, Tnp["pow2exp"]).astype(i32)

    # merge the two "integer scale" paths (x in [16,64) and x >= 64)
    y_big = jnp.where(x < 64, y_p43, y_poly)
    shift_big = jnp.where(x < 64, shift_p43, shift_poly)
    neg = shift_big < 0
    shn = jnp.clip(-shift_big, 0, 31)
    clip_lim = jnp.int32(0x7FFFFFFF) >> shn
    y_big = jnp.where(
        neg,
        jnp.where(y_big > clip_lim, jnp.int32(0x7FFFFFFF), (y_big << shn).astype(i32)),
        y_big >> jnp.clip(shift_big, 0, 31),
    )

    y = jnp.where(x < 4, y_lt4, jnp.where(x < 16, y_lt16, y_big))
    out = jnp.where(sx < 0, -y, y)
    return out, y


@functools.partial(jax.jit, static_argnames=("nch", "sfb_s"))
def dequantize_granule(huff, nzb, hp, *, nch, sfb_s):
    """Dequantize + stereo for a batch of granules.

    Args:
      huff: int32 ``[L, C, 576]`` sign|magnitude Huffman values.
      nzb:  int32 ``[L, C]`` input non-zero bounds.
      hp: dict of host-precomputed per-lane arrays (see models/mp3.py
        ``_granule_params``): per-sample gain/band/window/permutation masks,
        per-output-sample stereo parameters, misc flags.
      nch: channels (static).

    Returns dict with ``x`` [L, C, 576] dequantized (reordered) samples,
    ``nzb`` [L, C], ``gb`` [L, C], and cbi fields (cb_end_l [L,C],
    cb_end_s [L,C,3], cb_end_smax [L,C], cb_type [L,C]).
    """
    T = {k: jnp.asarray(v) for k, v in mp3_tables().items()}
    L = huff.shape[0]

    # ---------------- per-channel dequant (reference DequantChannel) -------
    dq, mag = dequant_block_math(huff, hp["gain"], T)
    processed = hp["processed"]  # [L, C, 576] bool
    dq = jnp.where(processed, dq, huff)  # unprocessed samples left as-is
    mag = jnp.where(processed, mag, 0)

    # guard-bit mask: OR of magnitudes over processed samples
    gb_mask = jax.lax.reduce(mag, jnp.int32(0), jax.lax.bitwise_or, (2,))
    gb = _clz32(gb_mask) - 1

    # critical-band bookkeeping (in INPUT order, pre-reorder)
    nonzero = dq != 0
    band = hp["band_in"]     # [L, C, 576], -1 where not tracked
    win = hp["win_in"]       # [L, C, 576] 0..2 (short) else 0
    is_long = hp["is_long_in"]

    def band_max(mask, init):
        b = jnp.where(mask, band, -1)
        return jnp.maximum(jnp.max(b, axis=-1), init)

    cb_end_l = band_max(nonzero & is_long & processed, jnp.zeros_like(nzb))
    cb_start_s = hp["cb_start_s"]  # [L, C]
    cb_end_s = jnp.stack(
        [band_max(nonzero & ~is_long & processed & (win == w), cb_start_s) for w in range(3)], axis=-1)
    has_short = hp["has_short"]  # [L, C] bool
    cb_end_s = jnp.where(has_short[..., None], cb_end_s, 0)
    cb_end_smax = jnp.max(cb_end_s, axis=-1)
    cb_type = hp["cb_type"]  # [L, C]

    # Short-block reorder (reference :714-760 window-major -> sample-major)
    # WITHOUT a dynamic gather (a per-element [.., 576] take_along_axis
    # walks elements on TPU): the in-section permutation is STATIC per row
    # type — within each short critical band it is a [3, n] -> [n, 3]
    # transpose — and only the section's absolute start (short_base, which
    # nzb can truncate) is data-dependent.  So: barrel-shift each lane's
    # section to offset 0 (log2 static rolls + selects), apply the static
    # band transposes for both row types, select, and shift back.
    sfb_s_np = np.asarray(sfb_s)             # static per-format band table [14]
    sb = hp["short_base"]               # [L, C]
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
        if out.shape[-1] < seg.shape[-1]:   # mixed section is 576-3*sfb_s[3]
            out = jnp.concatenate([out, seg[..., out.shape[-1]:]], axis=-1)
        return out

    seg = dq
    for k in range(10):                  # short_base < 576 fits 10 bits
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
        return dict(x=x, nzb=new_nzb, gb=gb, cb_end_l=cb_end_l, cb_end_s=cb_end_s,
                    cb_end_smax=cb_end_smax, cb_type=cb_type)

    # ---------------- joint stereo (reference Dequantize :7618-7705) -------
    mode_ext = hp["mode_ext"]          # [L]
    midside_flag = mode_ext >> 1
    intensity_flag = mode_ext & 1
    sfb_l = hp["sfb_l"]                # [L, 23]
    sfb_s = hp["sfb_s"]                # [L, 14]

    # rare no-guard-bit clip
    need_clip = (mode_ext != 0)[:, None] & ((gb[:, 0] < 1) | (gb[:, 1] < 1))[:, None]
    idx = jnp.arange(MAX_NSAMP)
    in_nzb = idx[None, None, :] < new_nzb[..., None]
    xc = jnp.clip(x, -0x3FFFFFFF, 0x3FFFFFFF)
    x = jnp.where(need_clip[..., None] & in_nzb, xc, x)

    # ---- mid-side ----
    # nSamps: intensity on -> up to start of right zero region; else max(nzb)
    cbi1_type = cb_type[:, 1]
    ms_n_long = jnp.take_along_axis(sfb_l, jnp.clip(cb_end_l[:, 1] + 1, 0, 22)[:, None], axis=-1)[:, 0]
    ms_n_short = 3 * jnp.take_along_axis(sfb_s, jnp.clip(cb_end_smax[:, 1] + 1, 0, 13)[:, None], axis=-1)[:, 0]
    ms_n_int = jnp.where(cbi1_type == 0, ms_n_long, ms_n_short)
    ms_n_free = jnp.maximum(new_nzb[:, 0], new_nzb[:, 1])
    ms_nsamps = jnp.where(intensity_flag == 1, ms_n_int, ms_n_free)

    ms_active = (midside_flag == 1)[:, None] & (idx[None, :] < ms_nsamps[:, None])  # [L, 576]
    xl, xr = x[:, 0], x[:, 1]
    ms_l, ms_r = xl + xr, xl - xr
    x0 = jnp.where(ms_active, ms_l, xl)
    x1 = jnp.where(ms_active, ms_r, xr)
    m_out_l = jax.lax.reduce(jnp.where(ms_active, _fastabs(ms_l), 0), jnp.int32(0), jax.lax.bitwise_or, (1,))
    m_out_r = jax.lax.reduce(jnp.where(ms_active, _fastabs(ms_r), 0), jnp.int32(0), jax.lax.bitwise_or, (1,))

    # ---- intensity ----
    # Two per-sample interpretations of the spectrum (host-precomputed): the
    # LONG structure (band via sfBand->l) used when cbi[1].cbType == 0, and
    # the SHORT structure (band via 3*sfBand->s + window) otherwise.
    ob_l = hp["band_out_l"]   # [L, 576] long band per sample
    ob_s = hp["band_out_s"]   # [L, 576] short band per sample (-1 in long prefix)
    ow = hp["win_out"]        # [L, 576] window per sample (short structure)
    sf_r_l = hp["sf_right_l"]  # [L, 576] right-ch scalefactor (long bands)
    sf_r_s = hp["sf_right_s"]  # [L, 576] right-ch scalefactor (short bands)
    il_l = hp["il_out_l"]     # [L, 576] MPEG2 illegal-intensity (long)
    il_s = hp["il_out_s"]     # [L, 576] MPEG2 illegal-intensity (short)
    ver_is_m1 = hp["ver_is_mpeg1"]  # [L] bool
    nsamps_in = new_nzb[:, 0]
    use_long = (cbi1_type == 0)[:, None]

    # long-structure bounds: band in [cbEndL[right]+1, cbEndL[left]+1),
    # prefix-limited to nSamps (both MPEG1 :1216-1231 and MPEG2 :1368-1387)
    long_lo = (cb_end_l[:, 1] + 1)[:, None]
    long_hi = (cb_end_l[:, 0] + 1)[:, None]
    in_long = (ob_l >= long_lo) & (ob_l < long_hi) & (ob_l >= 0)
    in_long = in_long & (idx[None, :] < nsamps_in[:, None])

    # short-structure bounds
    s_lo_1 = (cb_end_smax[:, 1] + 1)[:, None]      # MPEG1: same for all w
    s_hi_1 = (cb_end_smax[:, 0] + 1)[:, None]
    in_short_1 = (ob_s >= s_lo_1) & (ob_s < s_hi_1) & (ob_s >= 0)
    # MPEG1 triplet limit: i0 = 3*sfb_s[cbStartS]; whole triplets while >=3 left
    i0_1 = 3 * jnp.take_along_axis(sfb_s, jnp.clip(cb_end_smax[:, 1] + 1, 0, 13)[:, None], axis=-1)
    trip_lim = i0_1 + 3 * ((nsamps_in[:, None] - i0_1) // 3)
    in_short_1 = in_short_1 & (idx[None, :] < trip_lim) & (idx[None, :] >= i0_1)
    # MPEG2: per-window bounds, no sample limit (:1389-1419).  ow has 3
    # values: per-window bound selection is a 3-way select, not a
    # per-sample gather (minor-axis gathers walk elements on TPU)
    s_lo_2 = (cb_end_s[:, 1, :] + 1)   # [L, 3]
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

    # factors fl/fr per sample (structure-dependent scalefactor / il).
    # The intensity tables are tiny and the row choice is binary
    # (midside/intensity_scale flags), so every per-sample lookup runs as a
    # constant select tree over the flattened static table — never a
    # per-sample gather.
    sf_r = jnp.where(use_long, sf_r_l, sf_r_s)
    il = jnp.where(use_long, il_l, il_s)
    Tnp = mp3_tables()
    isf_m1_np = np.asarray(Tnp["ISFMpeg1"])           # [2, 7]
    iip_np = np.asarray(Tnp["ISFIIP"])                # [2, 2]
    ms1 = (jnp.clip(midside_flag, 0, 1) == 1)[:, None]
    iip0 = jnp.where(ms1, int(iip_np[1, 0]), int(iip_np[0, 0]))
    iip1 = jnp.where(ms1, int(iip_np[1, 1]), int(iip_np[0, 1]))
    sf_c = jnp.clip(sf_r, 0, 6)
    fl_m1 = jnp.where(ms1, const_lookup(sf_c, isf_m1_np[1]),
                      const_lookup(sf_c, isf_m1_np[0])).astype(jnp.int32)
    isf6 = jnp.where(ms1, int(isf_m1_np[1, 6]), int(isf_m1_np[0, 6]))
    fr_m1 = isf6 - fl_m1
    is_iip_m1 = sf_r == 7
    fl_1 = jnp.where(is_iip_m1, iip0, fl_m1)
    fr_1 = jnp.where(is_iip_m1, iip1, fr_m1)

    # MPEG2: one 64-entry tree over (intensity_scale, midside, isf2)
    isf_m2_flat = np.asarray(Tnp["ISFMpeg2"]).reshape(4, 16).ravel()   # [64]
    m2_row = ((jnp.clip(hp["intensity_scale"], 0, 1) << 1)
              | jnp.clip(midside_flag, 0, 1))[:, None] << 4            # [L,1]
    isf2 = (sf_r + 1) >> 1
    odd = (sf_r & 1) == 1
    fl_m2 = const_lookup(m2_row | jnp.where(odd, jnp.clip(isf2, 0, 15), 0),
                         isf_m2_flat).astype(jnp.int32)
    fr_m2 = const_lookup(m2_row | jnp.where(odd, 0, jnp.clip(isf2, 0, 15)),
                         isf_m2_flat).astype(jnp.int32)
    is_iip_m2 = sf_r == il
    fl_2 = jnp.where(is_iip_m2, iip0, fl_m2)
    fr_2 = jnp.where(is_iip_m2, iip1, fr_m2)

    fl = jnp.where(ver_is_m1[:, None], fl_1, fl_2)
    fr = jnp.where(ver_is_m1[:, None], fr_1, fr_2)

    xi_r = (mulshift32(fr, x0) << 2).astype(jnp.int32)
    xi_l = (mulshift32(fl, x0) << 2).astype(jnp.int32)
    x1 = jnp.where(int_active, xi_r, x1)
    x0 = jnp.where(int_active, xi_l, x0)

    i_out_l = jax.lax.reduce(jnp.where(int_active, _fastabs(xi_l), 0), jnp.int32(0), jax.lax.bitwise_or, (1,))
    i_out_r = jax.lax.reduce(jnp.where(int_active, _fastabs(xi_r), 0), jnp.int32(0), jax.lax.bitwise_or, (1,))

    # intensity OVERWRITES mOut (reference :1275-1276, :1416-1417);
    # mid-side ORs into it (:1155-1156)
    m_l = jnp.where(intensity_flag == 1, i_out_l, m_out_l)
    m_r = jnp.where(intensity_flag == 1, i_out_r, m_out_r)

    # post-stereo guard bits and nzb (reference :7694-7701)
    any_stereo = mode_ext != 0
    gb0 = jnp.where(any_stereo, _clz32(m_l) - 1, gb[:, 0])
    gb1 = jnp.where(any_stereo, _clz32(m_r) - 1, gb[:, 1])
    nz = jnp.maximum(new_nzb[:, 0], new_nzb[:, 1])
    nzb0 = jnp.where(any_stereo, nz, new_nzb[:, 0])
    nzb1 = jnp.where(any_stereo, nz, new_nzb[:, 1])

    return dict(
        x=jnp.stack([x0, x1], axis=1),
        nzb=jnp.stack([nzb0, nzb1], axis=-1),
        gb=jnp.stack([gb0, gb1], axis=-1),
        cb_end_l=cb_end_l, cb_end_s=cb_end_s, cb_end_smax=cb_end_smax, cb_type=cb_type,
    )
