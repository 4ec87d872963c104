"""MP3 device pipeline: chains dequant -> IMDCT -> subband per granule.

Single-stream decode path used by ``MP3Decoder.decode`` (the Helix
``MP3Decode`` equivalent, reference src/decode/mp3_decoder.cpp:8807-8854):
the two channels of a granule ride as device lanes, all stages bit-exact
int32/int64.  Batch decoding across many streams uses the same kernels with
streams as additional lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import mp3dsp, mp3imdct, mp3subband
from ..runtime.tables import mp3_tables
from .mp3 import granule_params

__all__ = ["decode_granules"]


def decode_granules(huff, params, sf, frame, sfjs, state, n_granules=None):
    """Decode all granules of one parsed frame.

    Args:
      huff: int32 [2, 2, 576]; params: [2, 2, 24]; sf: [2, 2, 62];
      frame: [16]; sfjs: [8] (see native front-end layout).
      state: (over [2,288], prev_type [2], prev_win_switch [2], num_prev [2],
              vbuf [2176], vindex int)

    Returns (pcm int16 [nGrans*576*nChans], new state tuple).
    """
    over, prev_type, prev_win_switch, num_prev, vbuf, vindex = state
    ngr, nch = int(frame[6]), int(frame[5])
    if n_granules is not None:
        ngr = min(ngr, n_granules)
    ver, sr_idx = int(frame[0]), int(frame[4])
    T = mp3_tables()
    cutoff = int(T["sfBandLong"][ver][sr_idx][8 if ver == 0 else 6] // 18)

    over = over.copy()
    prev_type = prev_type.copy()
    prev_win_switch = prev_win_switch.copy()
    num_prev = num_prev.copy()
    vbuf_j = jnp.asarray(vbuf[None])

    pcm_parts = []
    reference_defined = True
    for gr in range(ngr):
        nzb_in = params[gr, :nch, 18].astype(np.int32)
        hp_np = granule_params(params[gr, :nch], sf[gr, :nch], frame, sfjs, nzb_in)
        hp = {k: jnp.asarray(np.asarray(v)[None, ...]) for k, v in hp_np.items()}
        dq = mp3dsp.dequantize_granule(
            jnp.asarray(huff[gr, :nch][None]), jnp.asarray(nzb_in[None]), hp, nch=nch)

        # channels ride as lanes through the IMDCT
        x = dq["x"][0]                    # [nch, 576]
        # gb == 31 means the guard-bit mask was zero: the reference computes
        # CLZ(0) there (undefined in C), and the garbage gb feeds shift
        # amounts that rescale both the new samples AND the carried overlap
        # state (IMDCT36 xPrev >>= es, reference :2190-2200) — so its output
        # is nondeterministic unless everything involved is zero. Ours uses
        # the defined lzcnt value; flag frames where the reference's
        # behavior is undefined so differential tests can skip them.
        gb_arr = np.asarray(dq["gb"]).reshape(-1)[:nch]
        x_np = np.asarray(x)
        for ch in range(nch):
            if gb_arr[ch] == 31 and (np.any(x_np[ch]) or np.any(over[ch])):
                reference_defined = False
        nzb = dq["nzb"].reshape(-1)[:nch]
        gb = dq["gb"].reshape(-1)[:nch]
        block_type = jnp.asarray(params[gr, :nch, 5])
        mixed = jnp.asarray(params[gr, :nch, 6])
        out, new_over, _, gb_out, n_out, cws = mp3imdct.imdct_granule(
            x, jnp.asarray(over[:nch].reshape(nch, 32, 9)),
            nzb, gb, block_type, mixed,
            jnp.asarray(prev_type[:nch]), jnp.asarray(prev_win_switch[:nch]),
            jnp.full((nch,), cutoff, np.int32), jnp.asarray(num_prev[:nch]))

        over[:nch] = np.asarray(new_over).reshape(nch, 288)
        prev_type[:nch] = params[gr, :nch, 5]
        prev_win_switch[:nch] = np.asarray(cws)
        num_prev[:nch] = np.asarray(n_out)

        sched = mp3subband.build_subband_schedule(vindex, nch)
        pcm, vbuf_j = mp3subband.subband_granule(
            out[None], gb_out[None], vbuf_j,
            sched["fdct_idx"], sched["poly_idx"], sched["coef"], nch=nch)
        vindex = sched["vindex_out"]
        pcm_parts.append(np.asarray(pcm)[0])

    if pcm_parts:
        pcm_all = np.concatenate(pcm_parts).astype(np.int16)
    else:
        pcm_all = np.zeros(0, np.int16)
    return pcm_all, (over, prev_type, prev_win_switch, num_prev,
                     np.asarray(vbuf_j)[0], vindex), reference_defined
