"""MXU-form MP3 granule synthesis: the hybrid IMDCT and the PQMF subband
stage as PROBED LINEAR OPERATORS applied with batched matmuls.

Why this exists (VERDICT r3 #1 / PLAN round-4): the exact tier's granule
pipeline is bound by elementwise/layout structure, not arithmetic — three
structural redesigns measured-rejected, and the round-4 f32 value-mirror
(ops/mp3fast.py) measured SLOWER than the exact tier because it keeps the
same hundreds-of-small-ops structure.  But everything downstream of the
dequantizer is LINEAR in the spectra for fixed side-info: the hybrid IMDCT
is a per-band [18->18(+9)] map selected by window type, and one granule of
PQMF synthesis (FDCT32 + FIFO + dewindow) is a [576+1088 -> 576+written]
map selected by the FIFO phase.  This module extracts those maps
NUMERICALLY by feeding basis vectors through the value-mirror functions
(anti-transcription by construction: no reference arithmetic is restated —
the operators are measured from our own verified mirror), stacks them per
window / per phase, and evaluates granules as a handful of large MXU
matmuls instead of ~10^3 small vector ops.

Operator inventory (all f32, probed once and cached in-process + on disk):

- ``AX`` [18, 99]: per-band x-side maps, columns = A36(win 0..3) | A12 |
  C36 | C12 (the 36-IMDCT's next-granule overlap C36 is window-independent
  — verified at probe time).
- ``PX`` [9, 72]: per-band xprev-side maps, columns = P(prev win 0..3)
  (shared by the long and short current-block paths — verified).
- ``S``  [8, 1664, 576]: one whole-granule subband map per FIFO phase,
  input = [outbuf(576) | vbuf channel block(1088)], output = the 576
  pre-quantization PCM accumulators in PCM units.
- ``W``  [8, 576, 1088] + ``keep`` [8, 1088]: the granule's FIFO update —
  written slots are a linear image of outbuf, surviving slots are identity
  (the probe asserts the vbuf->vbuf' map is exactly a 0/1 diagonal).

The probe sources carry the reference citations: ops/mp3fast.py /
ops/mp3imdct.py / ops/mp3subband.py (Helix mp3_decoder.cpp:1783-2617 hybrid
IMDCT, :798-1120,7707-8019 subband synthesis).

Accuracy: identical linear algebra to the value-mirror tier re-associated
into matmul order; matmul precision is configurable (HIGHEST = f32-grade
by default).  The tier contract is tolerance-tested against the EXACT
pipeline in tests/test_mp3_fast.py and pinned on TPU hardware by
tools/tpu_checks.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.tables import mp3_tables
from . import mp3fast

__all__ = ["mxu_operators", "imdct_granule_mxu", "subband_granule_mxu"]

NBANDS = 32
_OPS_CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "..", "build", "mp3_mxu_ops_v1.npz")

# matmul precision for the operator applications (HIGHEST == f32-grade on
# TPU; override for experiments via EAL_MP3_MXU_PRECISION=high|default)
_PRECISION = {"highest": jax.lax.Precision.HIGHEST,
              "high": jax.lax.Precision.HIGH,
              "default": jax.lax.Precision.DEFAULT}[
                  os.environ.get("EAL_MP3_MXU_PRECISION", "highest").lower()]


# --------------------------------------------------------------------------
# probing
# --------------------------------------------------------------------------

def _probe_imdct() -> dict:
    """Extract the per-band IMDCT maps from the value-mirror functions."""
    T = mp3_tables()
    win_np = np.asarray(T["imdctWin"])
    blk = jnp.zeros((18,), jnp.int32)           # even band: no FreqInvert

    eye18 = jnp.eye(18, dtype=jnp.float32)
    z9 = jnp.zeros((18, 9), jnp.float32)
    eye9 = jnp.eye(9, dtype=jnp.float32)
    z18 = jnp.zeros((9, 18), jnp.float32)

    A36, P36 = [], []
    C36 = None
    for wc in range(4):
        # bt_prev=1 forces the slow (windowed) path; with xprev=0 the
        # x-side map is the same linear operator the fast path encodes
        y, prev = mp3fast._imdct36_f(eye18, z9, jnp.full((18,), wc, jnp.int32),
                                     jnp.ones((18,), jnp.int32), blk, T, win_np)
        A36.append(np.asarray(y, np.float64))            # rows=basis -> A^T
        cf = np.asarray(prev, np.float64)
        if C36 is None:
            C36 = cf
        else:
            np.testing.assert_allclose(cf, C36, rtol=0, atol=1e-6)
    for wp in range(4):
        y, _ = mp3fast._imdct36_f(jnp.zeros((9, 18), jnp.float32), eye9,
                                  jnp.ones((9,), jnp.int32),
                                  jnp.full((9,), wp, jnp.int32),
                                  blk[:9], T, win_np)
        P36.append(np.asarray(y, np.float64))
        # the short current-block path adds the identical win_prev term
        y12p, _ = mp3fast._imdct12x3_f(z18, eye9,
                                       jnp.full((9,), wp, jnp.int32),
                                       blk[:9], T, win_np)
        np.testing.assert_allclose(np.asarray(y12p, np.float64), P36[-1],
                                   rtol=0, atol=1e-9)

    y12, prev12 = mp3fast._imdct12x3_f(eye18, z9, jnp.zeros((18,), jnp.int32),
                                       blk, T, win_np)
    A12 = np.asarray(y12, np.float64)
    C12 = np.asarray(prev12, np.float64)

    # columns: A36 wins 0..3 (4*18) | A12 (18) | C36 (9) | C12 (9)
    ax = np.concatenate(A36 + [A12, C36, C12], axis=1)   # [18, 99]
    px = np.concatenate(P36, axis=1)                     # [9, 72]
    return {"AX": ax.astype(np.float32), "PX": px.astype(np.float32)}


def _probe_subband() -> dict:
    """Extract the whole-granule subband maps, one per FIFO phase.

    Mono probe: the FIFO's reads and writes for channel ``ch`` stay inside
    its private 32-column block (columns 32*ch + [0, 32); see
    mp3fast._subband_scan_acc), so the mono operator applies per channel.
    """
    probe = jax.jit(functools.partial(mp3fast._subband_scan_acc, nch=1),
                    static_argnames=())

    n_o, n_v = 576, 34 * 32
    out_basis = jnp.eye(n_o, dtype=jnp.float32).reshape(n_o, 1, 18, 32)
    out_zero = jnp.zeros((n_v, 1, 18, 32), jnp.float32)
    # vbuf basis embedded in channel block 0 of the [34, 64] layout
    vb_basis = np.zeros((n_v, 34, 64), np.float32)
    r, c = np.divmod(np.arange(n_v), 32)
    vb_basis[np.arange(n_v), r, c] = 1.0
    vb_basis = jnp.asarray(vb_basis.reshape(n_v, 2176))
    vb_zero = jnp.zeros((n_o, 2176), jnp.float32)

    S = np.zeros((8, n_o + n_v, n_o), np.float32)
    W = np.zeros((8, n_o, n_v), np.float32)
    keep = np.zeros((8, n_v), np.float32)
    for v in range(8):
        vi = jnp.int32(v)
        acc_o, vb_o = probe(out_basis, vb_zero, vi)
        acc_v, vb_v = probe(out_zero, vb_basis, vi)
        S[v, :n_o] = np.asarray(acc_o.reshape(n_o, n_o))
        S[v, n_o:] = np.asarray(acc_v.reshape(n_v, n_o))
        blk_o = np.asarray(vb_o).reshape(n_o, 34, 64)[:, :, :32].reshape(n_o, n_v)
        W[v] = blk_o
        blk_v = np.asarray(vb_v).reshape(n_v, 34, 64)[:, :, :32].reshape(n_v, n_v)
        # the vbuf->vbuf' map must be exactly a 0/1 diagonal (pure
        # overwrite FIFO): anything else means the layout assumption broke
        d = np.diagonal(blk_v).copy()
        np.testing.assert_array_equal(np.isin(d, (0.0, 1.0)), True)
        np.fill_diagonal(blk_v, 0.0)
        np.testing.assert_array_equal(blk_v, 0.0)
        keep[v] = d
        # written slots must take nothing from the old vbuf
        np.testing.assert_array_equal(W[v][:, d == 1.0], 0.0)
    return {"S": S, "W": W, "keep": keep}


@functools.lru_cache(None)
def mxu_operators() -> dict:
    """All probed operators as device arrays (cached; disk-cached too —
    the probe costs a few seconds of scan compiles)."""
    host: dict | None = None
    try:
        with np.load(_OPS_CACHE_FILE) as z:
            host = {k: z[k] for k in ("AX", "PX", "S", "W", "keep")}
    except (OSError, KeyError):
        pass
    if host is None:
        host = {**_probe_imdct(), **_probe_subband()}
        try:
            os.makedirs(os.path.dirname(_OPS_CACHE_FILE), exist_ok=True)
            np.savez(_OPS_CACHE_FILE, **host)
        except OSError:
            pass
    return {k: jnp.asarray(v) for k, v in host.items()}


# --------------------------------------------------------------------------
# application
# --------------------------------------------------------------------------

def _sel4(sel, parts):
    """One-hot select over 4 stacked [..., 4, N] variants by int [...] sel."""
    oh = jax.nn.one_hot(sel, 4, dtype=parts.dtype)
    return jnp.einsum("...v,...vn->...n", oh, parts)


def imdct_granule_mxu(x, xprev, nzb, block_type, mixed, prev_type,
                      prev_win_switch, block_cutoff, n_prev, ops):
    """Matmul-form hybrid synthesis; same contract as
    ``mp3fast.imdct_granule_fast`` (which carries the selection-logic
    reference citations) with the per-band IMDCT/window/overlap math
    evaluated as two batched matmuls against the probed operators."""
    T = mp3_tables()
    x = x.astype(jnp.float32)
    xprev = xprev.astype(jnp.float32)
    (nzb, block_type, mixed, prev_type, prev_win_switch, block_cutoff,
     n_prev) = (v.astype(jnp.int32) for v in
                (nzb, block_type, mixed, prev_type, prev_win_switch,
                 block_cutoff, n_prev))
    L = x.shape[0]

    # ---- selection logic: identical to imdct_granule_fast ----
    is_short = block_type == 2
    n_long_all = jnp.minimum((nzb + 7) // 18 + 1, 32)
    n_blocks_long = jnp.where(~is_short, n_long_all,
                              jnp.where(mixed == 1, block_cutoff, 0))
    nbfly = jnp.where(~is_short, n_blocks_long - 1,
                      jnp.where(mixed == 1, block_cutoff - 1, 0))
    x = mp3fast._antialias_f(x, nbfly, T)
    nzb = jnp.maximum(nzb, nbfly * 18 + 8)
    n_blocks_total = (nzb + 17) // 18
    curr_win_switch = jnp.where(mixed == 1, block_cutoff, 0)

    blk = jnp.broadcast_to(jnp.arange(NBANDS, dtype=jnp.int32)[None, :],
                           (L, NBANDS))
    curr_win = jnp.where((mixed[:, None] == 1) & (blk < curr_win_switch[:, None]),
                         0, block_type[:, None])
    prev_win = jnp.where(blk < prev_win_switch[:, None], 0, prev_type[:, None])

    m_lim = jnp.maximum(n_blocks_long, n_blocks_total)[:, None]
    in_long = blk < n_blocks_long[:, None]
    in_short = ~in_long & (blk < n_blocks_total[:, None])
    in_prev = ~in_long & ~in_short & (blk >= m_lim) & (blk < n_prev[:, None])

    # ---- the linear maps as two batched matmuls ----
    xb = x.reshape(L, NBANDS, 18)
    yx_all = jnp.einsum("lbi,ij->lbj", xb, ops["AX"],
                        precision=_PRECISION)            # [L, 32, 99]
    yp_all = jnp.einsum("lbi,ij->lbj", xprev, ops["PX"],
                        precision=_PRECISION)            # [L, 32, 72]

    # AX columns: A36 wins 0..3 (4*18) | A12 (18) | C36 (9) | C12 (9)
    y36 = _sel4(curr_win, yx_all[..., :72].reshape(L, NBANDS, 4, 18))
    y12 = yx_all[..., 72:90]
    prev36 = yx_all[..., 90:99]
    prev12 = yx_all[..., 99:108]
    ypo = _sel4(prev_win, yp_all.reshape(L, NBANDS, 4, 18))

    ls = (in_long | in_short)[..., None]
    y = (jnp.where(in_long[..., None], y36,
                   jnp.where(in_short[..., None], y12, 0.0))
         + jnp.where(ls | in_prev[..., None], ypo, 0.0))
    new_prev = jnp.where(in_long[..., None], prev36,
                         jnp.where(in_short[..., None], prev12,
                                   jnp.where(in_prev[..., None],
                                             jnp.zeros_like(prev36), xprev)))

    # FreqInvert: negate odd samples of odd bands (probed at even band)
    odd_samp = (jnp.arange(18) & 1) == 1
    flip = ((blk & 1) == 1)[..., None] & odd_samp
    y = jnp.where(flip, -y, y)

    po_nonzero = jnp.any(ypo != 0, axis=-1)
    ext = jnp.where(in_prev & po_nonzero, blk, -1)
    n_blocks_out = jnp.maximum(m_lim[:, 0], jnp.max(ext, axis=-1))

    out = jnp.swapaxes(y, 1, 2)                          # [L, 18, 32]
    return out, new_prev, nzb, n_blocks_out, curr_win_switch


def subband_granule_mxu(outbuf, vbuf, vindex, ops, *, nch):
    """Matmul-form PQMF synthesis: one probed [1664 -> 576] map per FIFO
    phase for the accumulators plus a [576 -> 1088] written-slot map, both
    phase-indexed with a leading-axis dynamic slice inside the scan.

    outbuf f32 [L, C, 18, 32]; vbuf f32 [L, 2176].  Returns
    (pcm int16 [L, 18*32*nch], new vbuf) — same contract as
    ``mp3fast.subband_granule_fast``.
    """
    L = outbuf.shape[0]
    of = outbuf.astype(jnp.float32).reshape(L * nch, 576)
    vb = vbuf.astype(jnp.float32).reshape(L, 34, 2, 32)
    vc = vb.transpose(0, 2, 1, 3).reshape(L, 2, 34 * 32)[:, :nch]
    vc = vc.reshape(L * nch, 34 * 32)

    v = vindex.astype(jnp.int32)
    Sv = jax.lax.dynamic_index_in_dim(ops["S"], v, keepdims=False)
    Wv = jax.lax.dynamic_index_in_dim(ops["W"], v, keepdims=False)
    keepv = jax.lax.dynamic_index_in_dim(ops["keep"], v, keepdims=False)

    acc = jax.lax.dot_general(jnp.concatenate([of, vc], axis=-1), Sv,
                              (((1,), (0,)), ((), ())),
                              precision=_PRECISION)      # [L*C, 576]
    newv = jax.lax.dot_general(of, Wv, (((1,), (0,)), ((), ())),
                               precision=_PRECISION)     # [L*C, 1088]
    vc2 = jnp.where(keepv == 1.0, vc, newv)

    # reassemble the interleaved [34, 64] FIFO layout
    vc2 = vc2.reshape(L, nch, 34, 32)
    if nch == 2:
        new_vb = vc2.transpose(0, 2, 1, 3).reshape(L, 2176)
    else:
        new_vb = vb.at[:, :, 0, :].set(vc2[:, 0]).reshape(L, 2176)

    acc = acc.reshape(L, nch, 18, 32)
    acc = jnp.swapaxes(acc, 1, 2)                        # [L, 18, C, 32]
    return mp3fast._quantize_pcm(acc), new_vb
