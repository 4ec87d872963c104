"""Batched MP3 hybrid-filterbank synthesis (anti-alias + IMDCT + overlap-add).

TPU-native equivalent of the reference IMDCT stage (reference:
src/decode/mp3_decoder.cpp :1783-1881 AntiAlias, :1883-1935 WinPrevious,
:1937-2044 FreqInvertRescale, :2051-2172 idct9, :2174-2283 IMDCT36,
:2285-2448 imdct12/IMDCT12x3, :2450-2532 HybridTransform, :2552-2617 IMDCT).

The reference iterates serially over a granule's 32 subband blocks, choosing
long (36-point) or short (3x12-point) transforms per block; here every
(lane, block) pair is computed uniformly in parallel — both transform
variants are evaluated as straight-line vector math and the per-block type /
window / rescale decisions become masked selects.  Blocks past the non-zero
bound have all-zero inputs and reproduce the reference's "window previous
only" and "clear" branches for free.

All arithmetic is exact int32 with MULSHIFT32 = (int64 product) >> 32;
bit-identical to the C reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.tables import mp3_tables
from .mp3dsp import mulshift32, _clz32, _fastabs

__all__ = ["imdct_granule"]

NBANDS = 32


def _i32(x):
    return x.astype(jnp.int32)


def _antialias(x, nbfly, T):
    """Reference AntiAlias (:1783-1865): csa butterflies across the 31 block
    boundaries, applied where boundary index <= nBfly."""
    csa = T["csa"]  # [8, 2]
    L = x.shape[0]
    out = x
    # boundary b (1-based) at position 18*b; j = 0..7
    b_ids = jnp.arange(1, NBANDS)          # [31]
    j_ids = jnp.arange(8)                  # [8]
    li = (18 * b_ids[:, None] - 1 - j_ids[None, :]).reshape(-1)  # [31*8]
    ri = (18 * b_ids[:, None] + j_ids[None, :]).reshape(-1)
    a0 = out[:, li]
    b0 = out[:, ri]
    c0 = jnp.tile(csa[:, 0], NBANDS - 1)[None, :]
    c1 = jnp.tile(csa[:, 1], NBANDS - 1)[None, :]
    new_a = _i32((mulshift32(c0, a0) - mulshift32(c1, b0)) << 1)
    new_b = _i32((mulshift32(c0, b0) + mulshift32(c1, a0)) << 1)
    active = jnp.repeat(b_ids, 8)[None, :] <= nbfly[:, None]
    out = out.at[:, li].set(jnp.where(active, new_a, a0))
    out = out.at[:, ri].set(jnp.where(active, new_b, b0))
    return out


def _idct9(x):
    """Reference idct9 (:2051-2131). x: list of 9 arrays; returns list of 9."""
    T = mp3_tables()
    c9_0, c9_1, c9_2 = jnp.int32(T["c9_0"]), jnp.int32(T["c9_1"]), jnp.int32(T["c9_2"])
    c9_3, c9_4 = jnp.int32(T["c9_3"]), jnp.int32(T["c9_4"])
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

    m1 = mulshift32(c9_0, x3)
    m3 = mulshift32(c9_0, a10)
    m5 = mulshift32(c9_1, a5)
    m6 = mulshift32(c9_2, a6)
    m7 = mulshift32(c9_1, a8)
    m8 = mulshift32(c9_2, a5)
    m9 = mulshift32(c9_3, a9)
    m10 = mulshift32(c9_4, a7)
    m11 = mulshift32(c9_3, a3)
    m12 = mulshift32(c9_4, a9)

    a12 = x0 + (x6 >> 1)
    a13 = a12 + _i32(m1 << 1)
    a14 = a12 - _i32(m1 << 1)
    a15 = a1 + (a11 >> 1)
    a16 = _i32(m5 << 1) + _i32(m6 << 1)
    a17 = _i32(m7 << 1) - _i32(m8 << 1)
    a18 = a16 + a17
    a19 = _i32(m9 << 1) + _i32(m10 << 1)
    a20 = _i32(m11 << 1) - _i32(m12 << 1)

    a21 = a20 - a19
    a22 = a13 + a16
    a23 = a14 + a16
    a24 = a14 + a17
    a25 = a13 + a17
    a26 = a14 - a18
    a27 = a13 - a18

    return [
        a22 + a19,
        a15 + _i32(m3 << 1),
        a24 + a20,
        a26 - a21,
        a1 - a11,
        a27 + a21,
        a25 - a20,
        a15 - _i32(m3 << 1),
        a23 - a19,
    ]


def _win_previous(xprev, bt_prev, T):
    """Reference WinPrevious (:1883-1935). xprev: [..., 9] -> [..., 18].

    Computes both the short (btPrev==2) and long layouts, selected per lane.
    """
    win = T["imdctWin"]  # [4, 36] int32
    # long layout: wpLo = imdctWin[bt]+18, wpHi = wpLo+17 (descending).
    # bt_prev has 4 possible values: select static rows instead of a device
    # gather (per-lane minor-axis gathers walk elements on TPU)
    win_np = np.asarray(mp3_tables()["imdctWin"])
    lo_rows = [jnp.asarray(win_np[bt, 18:27]) for bt in range(4)]
    hi_rows = [jnp.asarray(win_np[bt, 35:26:-1].copy()) for bt in range(4)]
    btb = bt_prev[..., None]

    def _sel4(rows):
        return jnp.where(btb == 0, rows[0],
                         jnp.where(btb == 1, rows[1],
                                   jnp.where(btb == 2, rows[2], rows[3])))

    wlo = _sel4(lo_rows)
    whi = _sel4(hi_rows)
    x = xprev
    lo = mulshift32(wlo, x)            # xPrevWin[0..8]
    hi = mulshift32(whi, x)            # xPrevWin[17..9] (descending)
    long_out = jnp.concatenate([lo, hi[..., ::-1]], axis=-1)

    # short layout (btPrev == 2), reference :1893-1906
    w2 = win[2]
    s = [None] * 18
    s[0] = mulshift32(w2[6], x[..., 2]) + mulshift32(w2[0], x[..., 6])
    s[1] = mulshift32(w2[7], x[..., 1]) + mulshift32(w2[1], x[..., 7])
    s[2] = mulshift32(w2[8], x[..., 0]) + mulshift32(w2[2], x[..., 8])
    s[3] = mulshift32(w2[9], x[..., 0]) + mulshift32(w2[3], x[..., 8])
    s[4] = mulshift32(w2[10], x[..., 1]) + mulshift32(w2[4], x[..., 7])
    s[5] = mulshift32(w2[11], x[..., 2]) + mulshift32(w2[5], x[..., 6])
    s[6] = mulshift32(w2[6], x[..., 5])
    s[7] = mulshift32(w2[7], x[..., 4])
    s[8] = mulshift32(w2[8], x[..., 3])
    s[9] = mulshift32(w2[9], x[..., 3])
    s[10] = mulshift32(w2[10], x[..., 4])
    s[11] = mulshift32(w2[11], x[..., 5])
    zero = jnp.zeros_like(s[0])
    short_out = jnp.stack(s[:12] + [zero] * 6, axis=-1)

    return jnp.where((bt_prev == 2)[..., None], short_out, long_out)


def _clip2n(y, n):
    """Reference CLIP_2N: clip to [-2^n, 2^n - 1] with n per-element."""
    sign = y >> 31
    lim = _i32((jnp.int32(1) << n) - 1)
    over = sign != (y >> n)
    return jnp.where(over, sign ^ lim, y)


def _imdct36(xcur, xprev, bt_curr, bt_prev, blk, gb, T):
    """Reference IMDCT36 (:2174-2283), vectorized over [..., 18] blocks.

    Returns (y [..., 18], new_xprev [..., 9], mout [...]).
    """
    es = jnp.maximum(7 - gb, 0)
    xs = xcur >> es[..., None]
    xprev = xprev >> es[..., None]

    # accumulation loop (suffix alternating sums), i = 8..0
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
    xbuf_o[0] = xbuf_o[0] >> 1
    xbuf_e[0] = xbuf_e[0] >> 1

    even = _idct9(xbuf_e)
    odd = _idct9(xbuf_o)

    c18 = T["c18"]
    fast = (bt_prev == 0) & (bt_curr == 0)
    fast_win = T["fastWin36"]
    win_prev = _win_previous(xprev, bt_prev, T)
    win_np = np.asarray(mp3_tables()["imdctWin"])

    y = [None] * 18
    new_prev = [None] * 9
    mout = jnp.zeros_like(acc1)
    for i in range(9):
        c = c18[8 - i]
        xo = mulshift32(c, odd[8 - i])
        xe = even[8 - i] >> 2

        # fast path (:2222-2249)
        s_f = -xprev[..., i]
        d_f = -(xe - xo)
        t = s_f - d_f
        ylo_f = d_f + _i32(mulshift32(t, fast_win[2 * i]) << 2)
        yhi_f = s_f + _i32(mulshift32(t, fast_win[2 * i + 1]) << 2)

        # slow path (:2252-2275); bt_curr selects among 4 static window
        # scalars — select chain, not a per-lane gather
        d_s = xe - xo
        wlo = jnp.where(bt_curr == 0, int(win_np[0, i]),
                        jnp.where(bt_curr == 1, int(win_np[1, i]),
                                  jnp.where(bt_curr == 2, int(win_np[2, i]),
                                            int(win_np[3, i])))).astype(jnp.int32)
        whi = jnp.where(bt_curr == 0, int(win_np[0, 17 - i]),
                        jnp.where(bt_curr == 1, int(win_np[1, 17 - i]),
                                  jnp.where(bt_curr == 2, int(win_np[2, 17 - i]),
                                            int(win_np[3, 17 - i])))).astype(jnp.int32)
        ylo_s = _i32((win_prev[..., i] + mulshift32(d_s, wlo)) << 2)
        yhi_s = _i32((win_prev[..., 17 - i] + mulshift32(d_s, whi)) << 2)

        y[i] = jnp.where(fast, ylo_f, ylo_s)
        y[17 - i] = jnp.where(fast, yhi_f, yhi_s)
        new_prev[i] = xe + xo
        mout = mout | _fastabs(y[i]) | _fastabs(y[17 - i])

    y = jnp.stack(y, axis=-1)
    new_prev = jnp.stack(new_prev, axis=-1)

    # FreqInvertRescale (:1937-2044)
    odd_blk = (blk & 1) == 1
    odd_samp = (jnp.arange(18) & 1) == 1
    es_b = es[..., None]
    has_es = es_b > 0
    # es == 0: negate odd samples of odd blocks
    y0 = jnp.where(odd_blk[..., None] & odd_samp, -y, y)
    # es > 0: clip to 2^(31-es), shift left; odd samples of odd blocks negated first
    yv = jnp.where(odd_blk[..., None] & odd_samp, -y, y)
    yv = _i32(_clip2n(yv, 31 - es_b) << es_b)
    xpv = _i32(_clip2n(new_prev, 31 - es_b) << es_b)
    y_out = jnp.where(has_es, yv, y0)
    new_prev = jnp.where(has_es, xpv, new_prev)
    mout_es = jax.lax.reduce(_fastabs(yv), jnp.int32(0), jax.lax.bitwise_or, (yv.ndim - 1,))
    mout = mout | jnp.where(es > 0, mout_es, 0)
    return y_out, new_prev, mout


def _imdct12(x):
    """Reference imdct12 (:2291-2340): 6 strided inputs -> 6 outputs."""
    T = mp3_tables()
    c3_0 = jnp.int32(T["c9_0"])  # same constant 0x6ed9eba1
    # c6 = cos(((0:2)+0.5)*pi/6) Q31 == c18[1::3]? use exact literals from ref
    c6_0, c6_1, c6_2 = jnp.int32(0x7BA3751D), jnp.int32(0x5A82799A), jnp.int32(0x2120FB83)
    x0, x1, x2, x3, x4, x5 = x

    x4 = x4 - x5
    x3 = x3 - x4
    x2 = x2 - x3
    x3 = x3 - x5
    x1 = x1 - x2
    x0 = x0 - x1
    x1 = x1 - x3

    x0 = x0 >> 1
    x1 = x1 >> 1

    a0 = _i32(mulshift32(c3_0, x2) << 1)
    a1 = x0 + (x4 >> 1)
    a2 = x0 - x4
    o0 = a1 + a0
    o2 = a2
    o4 = a1 - a0

    a0 = _i32(mulshift32(c3_0, x3) << 1)
    a1 = x1 + (x5 >> 1)
    a2 = x1 - x5

    o1 = _i32(mulshift32(c6_0, a1 + a0) << 2)
    o3 = _i32(mulshift32(c6_1, a2) << 2)
    o5 = _i32(mulshift32(c6_2, a1 - a0) << 2)

    return [o0 + o1, o2 + o3, o4 + o5, o4 - o5, o2 - o3, o0 - o1]


def _imdct12x3(xcur, xprev, bt_prev, blk, gb, T):
    """Reference IMDCT12x3 (:2364-2448). Same signature as _imdct36."""
    es = jnp.maximum(7 - gb, 0)
    xs = xcur >> es[..., None]
    xprev_s = xprev >> es[..., None]

    xbuf = [None] * 18
    for w in range(3):
        outs = _imdct12([xs[..., w + 3 * k] for k in range(6)])
        for k in range(6):
            xbuf[6 * w + k] = outs[k]

    win_prev = _win_previous(xprev_s, bt_prev, T)
    w2 = T["imdctWin"][2]

    y = [None] * 18
    mout = jnp.zeros_like(xs[..., 0])
    for i in range(3):
        y[0 + i] = _i32(win_prev[..., 0 + i] << 2)
        y[3 + i] = _i32(win_prev[..., 3 + i] << 2)
        y[6 + i] = _i32(win_prev[..., 6 + i] << 2) + mulshift32(w2[0 + i], xbuf[3 + i])
        y[9 + i] = _i32(win_prev[..., 9 + i] << 2) + mulshift32(w2[3 + i], xbuf[5 - i])
        y[12 + i] = _i32(win_prev[..., 12 + i] << 2) + (
            mulshift32(w2[6 + i], xbuf[2 - i]) + mulshift32(w2[0 + i], xbuf[9 + i]))
        y[15 + i] = _i32(win_prev[..., 15 + i] << 2) + (
            mulshift32(w2[9 + i], xbuf[0 + i]) + mulshift32(w2[3 + i], xbuf[11 - i]))
        for k in (0, 3, 6, 9, 12, 15):
            mout = mout | _fastabs(y[k + i])

    new_prev = jnp.stack([xbuf[i] >> 2 for i in (6, 7, 8, 12, 13, 14, 15, 16, 17)], axis=-1)
    y = jnp.stack(y, axis=-1)

    # FreqInvertRescale on (y, new_prev)
    odd_blk = (blk & 1) == 1
    odd_samp = (jnp.arange(18) & 1) == 1
    es_b = es[..., None]
    has_es = es_b > 0
    y0 = jnp.where(odd_blk[..., None] & odd_samp, -y, y)
    yv = jnp.where(odd_blk[..., None] & odd_samp, -y, y)
    yv = _i32(_clip2n(yv, 31 - es_b) << es_b)
    xpv = _i32(_clip2n(new_prev, 31 - es_b) << es_b)
    y_out = jnp.where(has_es, yv, y0)
    new_prev = jnp.where(has_es, xpv, new_prev)
    mout_es = jax.lax.reduce(_fastabs(yv), jnp.int32(0), jax.lax.bitwise_or, (yv.ndim - 1,))
    mout = mout | jnp.where(es > 0, mout_es, 0)
    return y_out, new_prev, mout


@jax.jit
def imdct_granule(x, xprev, nzb, gb, block_type, mixed, prev_type, prev_win_switch,
                  block_cutoff, n_prev):
    """Hybrid synthesis for one granule, one channel, batched over lanes.

    Args:
      x: int32 ``[L, 576]`` dequantized samples.
      xprev: int32 ``[L, 32, 9]`` carried overlap state (reference overBuf).
      nzb, gb: int32 ``[L]``.
      block_type, mixed: int32 ``[L]`` side info.
      prev_type, prev_win_switch, n_prev: int32 ``[L]`` carried state
        (reference prevType / prevWinSwitch / numPrevIMDCT).
      block_cutoff: int32 ``[L]`` sfBand->l[8 or 6]/18 (host constant).

    Returns (out [L, 18, 32], new_xprev, new_nzb, gb_out, n_blocks_out,
    curr_win_switch) — the last three update prevType-family state.
    """
    T = {k: jnp.asarray(v) for k, v in mp3_tables().items()}
    x = x.astype(jnp.int32)
    xprev = xprev.astype(jnp.int32)
    nzb, gb, block_type, mixed, prev_type, prev_win_switch, block_cutoff, n_prev = (
        v.astype(jnp.int32) for v in
        (nzb, gb, block_type, mixed, prev_type, prev_win_switch, block_cutoff, n_prev))
    L = x.shape[0]

    # block counts (reference IMDCT :2584-2603)
    is_short = block_type == 2
    n_long_all = jnp.minimum((nzb + 7) // 18 + 1, 32)
    n_blocks_long = jnp.where(~is_short, n_long_all,
                              jnp.where(mixed == 1, block_cutoff, 0))
    nbfly = jnp.where(~is_short, n_blocks_long - 1,
                      jnp.where(mixed == 1, block_cutoff - 1, 0))

    x = _antialias(x, nbfly, T)
    nzb = jnp.maximum(nzb, nbfly * 18 + 8)
    n_blocks_total = (nzb + 17) // 18

    curr_win_switch = jnp.where(mixed == 1, block_cutoff, 0)

    blk = jnp.broadcast_to(jnp.arange(NBANDS, dtype=jnp.int32)[None, :], (L, NBANDS))
    xb = x.reshape(L, NBANDS, 18)

    # per-(lane, block) window indices
    curr_win = jnp.where((mixed[:, None] == 1) & (blk < curr_win_switch[:, None]),
                         0, block_type[:, None])
    prev_win = jnp.where(blk < prev_win_switch[:, None], 0, prev_type[:, None])
    gb_b = jnp.broadcast_to(gb[:, None], (L, NBANDS))

    y36, prev36, mout36 = _imdct36(xb, xprev, curr_win, prev_win, blk, gb_b, T)
    y12, prev12, mout12 = _imdct12x3(xb, xprev, prev_win, blk, gb_b, T)

    # "window previous only" branch (HybridTransform :2482-2512): unshifted
    # xprev, y = xPrevWin << 2 with frequency inversion, xprev zeroed
    wp = _win_previous(xprev, prev_win, T)
    ypo = _i32(wp << 2)
    odd_samp = (jnp.arange(18) & 1) == 1
    ypo = jnp.where(((blk & 1) == 1)[..., None] & odd_samp, -ypo, ypo)
    mout_po = jax.lax.reduce(_fastabs(ypo), jnp.int32(0), jax.lax.bitwise_or, (2,))
    po_nonzero = jax.lax.reduce(ypo, jnp.int32(0), jax.lax.bitwise_or, (2,)) != 0

    # branch select per (lane, block)
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
                                   jnp.where(in_prev[..., None], jnp.zeros_like(prev36), xprev)))
    mout_blk = jnp.where(in_long, mout36,
                         jnp.where(in_short, mout12,
                                   jnp.where(in_prev, mout_po, 0)))

    mout = jax.lax.reduce(mout_blk, jnp.int32(0), jax.lax.bitwise_or, (1,))
    gb_out = _clz32(mout) - 1

    # numPrevIMDCT: M, possibly set to the INDEX of the last nonzero
    # prev-only block (reference :2500-2511 sets nBlocksOut = i, not i+1)
    ext = jnp.where(in_prev & po_nonzero, blk, -1)
    n_blocks_out = jnp.maximum(m_lim[:, 0], jnp.max(ext, axis=-1))

    out = jnp.swapaxes(y, 1, 2)  # [L, 18, 32]
    return out, new_prev, nzb, gb_out, n_blocks_out, curr_win_switch
