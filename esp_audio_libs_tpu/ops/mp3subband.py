"""Batched MP3 subband synthesis: FDCT32 + vbuf FIFO + PQMF polyphase.

TPU-native equivalent of the reference subband stage (reference:
src/decode/mp3_decoder.cpp :7732-8019 FDCT32, :798-810 ClipToShort,
:812-1084 Polyphase{Mono,Stereo}, :1086-1120 Subband).

The reference runs 18 serial iterations per granule, each doing a 32-point
DCT per channel into a double-sized vbuf FIFO followed by a 64-bit-MAC
polyphase filter.  Here the FIFO rides as a [L, 34, 64] view whose accesses
are dynamic slices at the traced phase index (see subband_granule), the 18
steps scan as 9 even/odd pairs with all lanes batched, and because the
polyphase accumulates in int64 — exact integer arithmetic — the MAC order
is free, so the tap math is bit-identical to the serial MACs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.tables import mp3_tables
from .mp3dsp import mulshift32

__all__ = ["subband_granule"]

VB = 1088  # VBUF_LENGTH
DEF_NFRACBITS = 25 - 2 - 2 - 15  # = 6 (reference :791-795)
CSHIFT = 12
RND = 1 << (DEF_NFRACBITS - 1 + (32 - CSHIFT))  # rndVal (reference :873)


def _i32(x):
    return x.astype(jnp.int32)


def _clip2n(y, n):
    sign = y >> 31
    lim = _i32((jnp.int32(1) << n) - 1)
    return jnp.where(sign != (y >> n), sign ^ lim, y)


def _fdct32(x, gb, T):
    """Reference FDCT32 (:7776-7855) first+second pass, vectorized.

    x: int32 [..., 32]; gb: int32 [...].  Returns (buf list of 32, es [...]).
    """
    dct = T["dcttab"]
    cos4_0 = jnp.int32(0x5A82799A)
    es = jnp.maximum(6 - gb, 0)
    buf = [x[..., i] >> es for i in range(32)]

    # first pass: D32FP(i, s0, s1, s2) for i=0..7
    shifts = [(1, 5, 1), (1, 3, 1), (1, 3, 1), (1, 2, 1), (1, 2, 1), (1, 1, 2), (1, 1, 2), (1, 1, 4)]
    c = 0
    for i in range(8):
        s0, s1, s2 = shifts[i]
        a0, a3 = buf[i], buf[31 - i]
        a1, a2 = buf[15 - i], buf[16 + i]
        b0 = a0 + a3
        b3 = _i32(mulshift32(dct[c], a0 - a3) << s0)
        c += 1
        b1 = a1 + a2
        b2 = _i32(mulshift32(dct[c], a1 - a2) << s1)
        c += 1
        buf[i] = b0 + b1
        buf[15 - i] = _i32(mulshift32(dct[c], b0 - b1) << s2)
        buf[16 + i] = b2 + b3
        buf[31 - i] = _i32(mulshift32(dct[c], b3 - b2) << s2)
        c += 1

    # second pass: 4 groups of 8
    for g in range(4):
        o = 8 * g
        cc = 24 + 6 * g
        a0, a7, a3, a4 = buf[o + 0], buf[o + 7], buf[o + 3], buf[o + 4]
        b0 = a0 + a7
        b7 = _i32(mulshift32(dct[cc + 0], a0 - a7) << 1)
        b3 = a3 + a4
        b4 = _i32(mulshift32(dct[cc + 1], a3 - a4) << 3)
        a0 = b0 + b3
        a3 = _i32(mulshift32(dct[cc + 2], b0 - b3) << 1)
        a4 = b4 + b7
        a7 = _i32(mulshift32(dct[cc + 2], b7 - b4) << 1)

        a1, a6, a2, a5 = buf[o + 1], buf[o + 6], buf[o + 2], buf[o + 5]
        b1 = a1 + a6
        b6 = _i32(mulshift32(dct[cc + 3], a1 - a6) << 1)
        b2 = a2 + a5
        b5 = _i32(mulshift32(dct[cc + 4], a2 - a5) << 1)
        a1 = b1 + b2
        a2 = _i32(mulshift32(dct[cc + 5], b1 - b2) << 2)
        a5 = b5 + b6
        a6 = _i32(mulshift32(dct[cc + 5], b6 - b5) << 2)

        b0 = a0 + a1
        b1 = _i32(mulshift32(cos4_0, a0 - a1) << 1)
        b2 = a2 + a3
        b3 = _i32(mulshift32(cos4_0, a3 - a2) << 1)
        buf[o + 0] = b0
        buf[o + 1] = b1
        buf[o + 2] = b2 + b3
        buf[o + 3] = b3

        b4 = a4 + a5
        b5 = _i32(mulshift32(cos4_0, a4 - a5) << 1)
        b6 = a6 + a7
        b7 = _i32(mulshift32(cos4_0, a7 - a6) << 1)
        b6 = b6 + b7
        buf[o + 4] = b4 + b6
        buf[o + 5] = b5 + b7
        buf[o + 6] = b5 + b6
        buf[o + 7] = b7

    return buf, es


# write-value recipes from the output shuffle (:7856-7979): value index lists
# into buf (post-passes).  rows = "samples 16..31" block, qrows = "16..1".
_ROWS = [(1,), (17, 25, 29), (9, 13), (21, 25, 29), (5,), (21, 29, 27), (13, 11), (19, 29, 27),
         (3,), (19, 27, 31), (11, 15), (23, 27, 31), (7,), (23, 31), (15,), (31,)]
_QROWS = [(1,), (17, 30, 25), (14, 9), (22, 30, 25), (6,), (22, 26, 30), (10, 14), (18, 26, 30),
          (2,), (18, 28, 26), (12, 10), (20, 28, 26), (4,), (20, 24, 28), (8, 12), (16, 24, 28)]


def _poly_coefs():
    """Static tap matrices for the slice-based polyphase: C1/C2 [17, 8] such
    that (A = window cols 0..7, Bv = cols 23..16 reversed, rows 0..16):
      sample n (0..16)  = sum_x C1[n,x]*A[n,x] - C2[n,x]*Bv[n,x]
      sample 32-r (r>0) = sum_x C2[r,x]*A[r,x] + C1[r,x]*Bv[r,x]
    (reference PolyphaseStereo/Mono tap pairing, :812-1084)."""
    poly = mp3_tables()["polyCoef"]
    C1 = np.zeros((17, 8), np.int64)
    C2 = np.zeros((17, 8), np.int64)
    for r in range(16):
        for xx in range(8):
            C1[r, xx] = np.int64(poly[16 * r + 2 * xx])
            C2[r, xx] = np.int64(poly[16 * r + 2 * xx + 1])
    for xx in range(8):
        C1[16, xx] = np.int64(poly[256 + xx])
    return C1, C2


@functools.partial(jax.jit, static_argnames=("nch",))
def subband_granule(outbuf, gb, vbuf, vindex, *, nch):
    """Subband transform for one granule, batched over lanes.

    The FIFO rides as a ``[L, 34, 64]`` view (row = FIFO row, 17 per parity
    half; column = 8-phase ring slot, with the Helix double copy at +8, the
    qrows block at +16 and channel 1 at +32).  Every access is then a
    ``dynamic_slice``/``dynamic_update_slice`` whose start is the traced
    ``vindex`` phase — contiguous and fast — where a flat index table would
    lower to TPU gathers/scatters that walk elements (this stage was ~26 ms
    per granule at B=256 in gather form; slices make it sub-ms).  The 18
    steps unroll in trace (parity is static per step).

    Args:
      outbuf: int32 ``[L, C, 18, 32]`` IMDCT output.
      gb: int32 ``[L, C]`` guard bits.
      vbuf: int32 ``[L, 2176]`` carried FIFO (both channels + parities).
      vindex: traced int32 scalar FIFO phase, uniform across the batch
        (callers group streams by it).

    Returns (pcm int16 ``[L, 18*32*nch]`` interleaved, new vbuf).
    """
    T = {k: jnp.asarray(v) for k, v in mp3_tables().items()}
    outbuf = outbuf.astype(jnp.int32)
    gb = gb.astype(jnp.int32)
    L = outbuf.shape[0]
    C1_np, C2_np = _poly_coefs()
    C1 = jnp.asarray(C1_np)[None]   # [1, 17, 8]
    C2 = jnp.asarray(C2_np)[None]

    row_idx = jnp.arange(34, dtype=jnp.int32)[None, :, None]   # [1, 34, 1]
    col_idx = jnp.arange(64, dtype=jnp.int32)[None, None, :]   # [1, 1, 64]

    def one_step(vb, v, xb, odd):
        """One of the 18 steps; ``odd`` is a static python parity.

        Writes land as fused masked selects, NOT dynamic_update_slice: each
        DUS on the carried [L,34,64] FIFO lowers to a full-buffer copy
        inside the scan (432 copies/granule measured ~23 ms at B=256); the
        three write blocks have disjoint (row, column) masks, so one
        elementwise where-pass per channel replaces them all.
        """
        row_off, qrow_off = 17 * odd, 17 * (1 - odd)
        c0 = (v - odd) & 7
        for ch in range(nch):
            buf, es = _fdct32(xb[:, ch, :], gb[:, ch], T)
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
            v33 = jnp.stack(vals, axis=-1)  # [L, 33]
            # es epilogue (:7981-8005): clip + shift the stored values
            esb = es[..., None]
            v33 = jnp.where(esb > 0, _i32(_clip2n(v33, 31 - esb) << esb), v33)
            cc = 32 * ch

            def place(vals2, r0, nrows, col_a, col_b):
                # vals2 [L, nrows] written at rows r0..r0+nrows-1 (static)
                # and columns col_a / col_b (traced Helix double copy)
                rmask = (row_idx >= r0) & (row_idx < r0 + nrows)
                cmask = (col_idx == col_a) | (col_idx == col_b)
                vfull = vals2[:, np.clip(np.arange(34) - r0, 0, nrows - 1)]
                return rmask & cmask, vfull[:, :, None]

            m1, v1 = place(v33[:, 1:17], row_off, 16, v + cc, v + cc + 8)
            m2, v2 = place(v33[:, 17:33], qrow_off, 16, c0 + 16 + cc, c0 + 24 + cc)
            m3, v3 = place(v33[:, 0:1], qrow_off + 16, 1, c0 + cc, c0 + cc + 8)
            vb = jnp.where(m1, v1, jnp.where(m2, v2, jnp.where(m3, v3, vb)))

        # polyphase: one contiguous window per channel, static tap math
        pcm_ch = []
        for ch in range(nch):
            sl = jax.lax.dynamic_slice(
                vb, (jnp.int32(0), jnp.int32(17 * odd), v + 32 * ch),
                (L, 17, 24)).astype(jnp.int64)
            A = sl[:, :, 0:8]                       # taps v+0..7
            Bv = sl[:, :, 16:24][..., ::-1]         # taps v+23..16
            lo = jnp.sum(C1 * A - C2 * Bv, axis=-1)   # [L, 17] samples 0..16
            hi = jnp.sum(C2 * A + C1 * Bv, axis=-1)   # [L, 17]; rows 1..15
            acc = jnp.concatenate([lo, hi[:, 1:16][:, ::-1]], axis=-1)  # [L, 32]
            acc = acc + jnp.int64(RND)
            s32 = (acc >> (32 - CSHIFT)).astype(jnp.int32)
            x = s32 >> DEF_NFRACBITS
            sign = x >> 31
            x = jnp.where(sign != (x >> 15), sign ^ ((1 << 15) - 1), x)
            pcm_ch.append(x.astype(jnp.int16))  # [L, 32]
        if nch == 2:
            pcm = jnp.stack([pcm_ch[0], pcm_ch[1]], axis=-1).reshape(L, 64)
        else:
            pcm = pcm_ch[0]
        return vb, (v - odd) & 7, pcm

    # scan over the 9 even/odd step pairs: parity is static inside the body
    # (the phase only moves on odd steps), trace stays 2 steps deep
    xs = jnp.moveaxis(outbuf, 2, 0).reshape(9, 2, L, nch if nch == 2 else outbuf.shape[1], 32)

    def pair(carry, x2):
        vb, v = carry
        vb, v, pcm0 = one_step(vb, v, x2[0], 0)
        vb, v, pcm1 = one_step(vb, v, x2[1], 1)
        return (vb, v), jnp.concatenate([pcm0, pcm1], axis=-1)

    vb0 = vbuf.astype(jnp.int32).reshape(L, 34, 64)
    (vb, _), pcm_pairs = jax.lax.scan(pair, (vb0, vindex.astype(jnp.int32)), xs)
    pcm = jnp.moveaxis(pcm_pairs, 0, 1).reshape(L, -1)
    return pcm, vb.reshape(L, 2176)
