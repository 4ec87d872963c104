"""MP3 device pipeline: chains dequant -> IMDCT -> subband per granule.

Decode path used by ``MP3Decoder.decode`` (the Helix ``MP3Decode``
equivalent, reference src/decode/mp3_decoder.cpp:8807-8854) and by
``BatchedMP3Decoder`` for many streams at once: streams x channels ride as
device lanes, all stages bit-exact int32/int64.  The single-stream API is a
B=1 wrapper over the batched kernel path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import mp3dsp, mp3imdct, mp3subband
from ..runtime.tables import mp3_tables
from .mp3 import granule_params_batch

__all__ = ["decode_granules", "decode_granules_batch"]


def decode_granules(huff, params, sf, frame, sfjs, state, n_granules=None):
    """Decode all granules of one parsed frame (single stream).

    Args:
      huff: int32 [2, 2, 576]; params: [2, 2, 24]; sf: [2, 2, 62];
      frame: [16]; sfjs: [8] (see native front-end layout).
      state: (over [2,288], prev_type [2], prev_win_switch [2], num_prev [2],
              vbuf [2176], vindex int)

    Returns (pcm int16 [nGrans*576*nChans], new state tuple, reference_defined).
    """
    over, prev_type, prev_win_switch, num_prev, vbuf, vindex = state
    ngr = int(frame[6])
    if n_granules is not None:
        ngr = min(ngr, n_granules)
    pcm, states, rdef = decode_granules_batch(
        huff[None], params[None], sf[None], frame[None], sfjs[None],
        [(over, prev_type, prev_win_switch, num_prev, vbuf)], vindex, ngr)
    over, prev_type, prev_win_switch, num_prev, vbuf = states[0]
    nch = int(frame[5])
    new_vindex = _advance_vindex(vindex, ngr)
    return (pcm[0].reshape(-1)[: ngr * 576 * nch],
            (over, prev_type, prev_win_switch, num_prev, vbuf, new_vindex),
            bool(rdef[0]))


def _advance_vindex(vindex: int, ngr: int) -> int:
    """vindex after ngr granules (it toggles parity once per granule and
    steps deterministically — recompute via the schedule builder)."""
    for _ in range(ngr):
        vindex = mp3subband.build_subband_schedule(vindex, 1)["vindex_out"]
    return vindex


def decode_granules_batch(huff, params, sf, frame, sfjs, states, vindex, ngr):
    """Decode ``ngr`` granules for ``B`` format-uniform streams in lockstep.

    All streams must share (version, samplerate index, nChans, vindex) —
    the batching precondition `BatchedMP3Decoder` establishes by grouping.
    Streams fold into the device lane axis of every kernel
    (ops/mp3dsp.py:121, ops/mp3imdct.py:334, ops/mp3subband.py:199).

    Args:
      huff: int32 [B, 2, 2, 576]; params [B, 2, 2, 24]; sf [B, 2, 2, 62];
      frame [B, 16]; sfjs [B, 8].
      states: list of B per-stream tuples (over [2,288], prev_type [2],
        prev_win_switch [2], num_prev [2], vbuf [2176]).
      vindex: shared subband FIFO index; ngr: granules to synthesize.

    Returns (pcm int16 [B, ngr*576*nch], new per-stream state tuples,
    reference_defined bool [B]).
    """
    B = huff.shape[0]
    nch = int(frame[0, 5])
    ver, sr_idx = int(frame[0, 0]), int(frame[0, 4])
    T = mp3_tables()
    cutoff = int(T["sfBandLong"][ver][sr_idx][8 if ver == 0 else 6] // 18)

    over = np.stack([s[0] for s in states]).copy()            # [B, 2, 288]
    prev_type = np.stack([s[1] for s in states]).copy()       # [B, 2]
    prev_win_switch = np.stack([s[2] for s in states]).copy()
    num_prev = np.stack([s[3] for s in states]).copy()
    vbuf_j = jnp.asarray(np.stack([s[4] for s in states]))    # [B, 2176]

    pcm_parts = []
    reference_defined = np.ones(B, bool)
    for gr in range(ngr):
        nzb_in = params[:, gr, :nch, 18].astype(np.int32)     # [B, nch]
        # ONE native call expands per-sample params for all B streams
        hp_np = granule_params_batch(params[:, gr], sf[:, gr], frame, sfjs,
                                     nzb_in, nch)
        hp = {k: jnp.asarray(v) for k, v in hp_np.items()}
        dq = mp3dsp.dequantize_granule(
            jnp.asarray(huff[:, gr, :nch]), jnp.asarray(nzb_in), hp, nch=nch)

        # streams x channels ride as lanes through the IMDCT
        x = dq["x"].reshape(B * nch, 576)
        # gb == 31 means the guard-bit mask was zero: the reference computes
        # CLZ(0) there (undefined in C), and the garbage gb feeds shift
        # amounts that rescale both the new samples AND the carried overlap
        # state (IMDCT36 xPrev >>= es, reference :2190-2200) — so its output
        # is nondeterministic unless everything involved is zero. Ours uses
        # the defined lzcnt value; flag streams where the reference's
        # behavior is undefined so differential tests can skip them.
        gb_arr = np.asarray(dq["gb"]).reshape(B, -1)[:, :nch]
        x_np = np.asarray(dq["x"])                            # [B, nch, 576]
        for b in range(B):
            for ch in range(nch):
                if gb_arr[b, ch] == 31 and (np.any(x_np[b, ch]) or np.any(over[b, ch])):
                    reference_defined[b] = False
        nzb = dq["nzb"].reshape(B, -1)[:, :nch].reshape(-1)
        gb = dq["gb"].reshape(B, -1)[:, :nch].reshape(-1)
        block_type = jnp.asarray(params[:, gr, :nch, 5].reshape(-1))
        mixed = jnp.asarray(params[:, gr, :nch, 6].reshape(-1))
        out, new_over, _, gb_out, n_out, cws = mp3imdct.imdct_granule(
            x, jnp.asarray(over[:, :nch].reshape(B * nch, 32, 9)),
            nzb, gb, block_type, mixed,
            jnp.asarray(prev_type[:, :nch].reshape(-1)),
            jnp.asarray(prev_win_switch[:, :nch].reshape(-1)),
            jnp.full((B * nch,), cutoff, np.int32),
            jnp.asarray(num_prev[:, :nch].reshape(-1)))

        over[:, :nch] = np.asarray(new_over).reshape(B, nch, 288)
        prev_type[:, :nch] = params[:, gr, :nch, 5]
        prev_win_switch[:, :nch] = np.asarray(cws).reshape(B, nch)
        num_prev[:, :nch] = np.asarray(n_out).reshape(B, nch)

        sched = mp3subband.build_subband_schedule(vindex, nch)
        pcm, vbuf_j = mp3subband.subband_granule(
            out.reshape(B, nch, 18, 32), gb_out.reshape(B, nch), vbuf_j,
            sched["fdct_idx"], sched["poly_idx"], sched["coef"], nch=nch)
        vindex = sched["vindex_out"]
        pcm_parts.append(np.asarray(pcm))                     # [B, 576*nch]

    if pcm_parts:
        pcm_all = np.concatenate(pcm_parts, axis=1).astype(np.int16)
    else:
        pcm_all = np.zeros((B, 0), np.int16)
    vbuf_np = np.asarray(vbuf_j)
    new_states = [(over[b], prev_type[b], prev_win_switch[b], num_prev[b], vbuf_np[b])
                  for b in range(B)]
    return pcm_all, new_states, reference_defined
