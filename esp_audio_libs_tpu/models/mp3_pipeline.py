"""MP3 device pipeline: chains dequant -> IMDCT -> subband per granule.

Decode path used by ``MP3Decoder.decode`` (the Helix ``MP3Decode``
equivalent, reference src/decode/mp3_decoder.cpp:8807-8854) and by
``BatchedMP3Decoder`` for many streams at once: streams x channels ride as
device lanes, all stages bit-exact int32/int64.  The single-stream API is a
B=1 wrapper over the batched kernel path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mp3dsp, mp3imdct, mp3subband
from ..runtime.tables import mp3_tables
from .mp3 import expand_hp_device, format_maps, granule_params_compact_blob

__all__ = ["decode_granules", "decode_granules_batch", "decode_granules_batch_dev"]

_SCHED_DEV: dict = {}   # (vindex, nch) -> (fdct, poly, coef device arrays, vindex_out)
_MAPS_DEV: dict = {}    # (ver, sr_idx) -> device copies of format_maps


def _maps_dev(ver: int, sr_idx: int) -> dict:
    key = (ver, sr_idx)
    hit = _MAPS_DEV.get(key)
    if hit is None:
        hit = _MAPS_DEV[key] = {k: jnp.asarray(v)
                                for k, v in format_maps(ver, sr_idx).items()}
    return hit


def _sched_dev(vindex: int, nch: int):
    """Device-cached subband schedule: only 8 vindex values x 2 channel
    counts exist, so steady state ships ZERO schedule bytes per granule."""
    key = (vindex, nch)
    hit = _SCHED_DEV.get(key)
    if hit is None:
        s = mp3subband.build_subband_schedule(vindex, nch)
        hit = _SCHED_DEV[key] = (jnp.asarray(s["fdct_idx"]), jnp.asarray(s["poly_idx"]),
                                 jnp.asarray(s["coef"]), s["vindex_out"])
    return hit


@functools.partial(jax.jit, static_argnames=("nch", "cutoff"))
def _granule_step(huff_g, nzb_in, compact, maps, over, prev_type,
                  prev_win_switch, num_prev, vbuf, block_type, mixed,
                  fdct_idx, poly_idx, coef, ref_undef, *, nch, cutoff):
    """One granule for B streams, fully device-resident (ONE dispatch).

    Chains dequant -> IMDCT -> subband and updates all carried state on
    device; per-sample parameters are EXPANDED ON DEVICE from the ~230-word
    compact blob + static per-format maps (the 44KB expanded form is pure
    transfer weight), and the reference-UB flag (see decode_granules_batch)
    is accumulated on device too, so the host never syncs inside a frame —
    critical when the chip sits behind a high-latency transport.
    """
    B = huff_g.shape[0]
    hp = expand_hp_device(compact, maps, nch)
    dq = mp3dsp.dequantize_granule(huff_g, nzb_in, hp, nch=nch)
    x = dq["x"].reshape(B * nch, 576)
    gb_in = dq["gb"][:, :nch]                                  # [B, nch]
    undef = (gb_in == 31) & (jnp.any(dq["x"][:, :nch] != 0, axis=-1)
                             | jnp.any(over[:, :nch] != 0, axis=-1))
    ref_undef = ref_undef | jnp.any(undef, axis=-1)

    nzb = dq["nzb"][:, :nch].reshape(-1)
    gb = gb_in.reshape(-1)
    out, new_over, _, gb_out, n_out, cws = mp3imdct.imdct_granule(
        x, over[:, :nch].reshape(B * nch, 32, 9).astype(jnp.int32),
        nzb, gb, block_type, mixed,
        prev_type[:, :nch].reshape(-1), prev_win_switch[:, :nch].reshape(-1),
        jnp.full((B * nch,), cutoff, jnp.int32), num_prev[:, :nch].reshape(-1))

    over = over.at[:, :nch].set(new_over.reshape(B, nch, 288))
    prev_type = prev_type.at[:, :nch].set(block_type.reshape(B, nch))
    prev_win_switch = prev_win_switch.at[:, :nch].set(cws.reshape(B, nch))
    num_prev = num_prev.at[:, :nch].set(n_out.reshape(B, nch))

    pcm, vbuf = mp3subband.subband_granule(
        out.reshape(B, nch, 18, 32), gb_out.reshape(B, nch), vbuf,
        fdct_idx, poly_idx, coef, nch=nch)
    return pcm, over, prev_type, prev_win_switch, num_prev, vbuf, ref_undef


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
    dev_state = tuple(jnp.asarray(np.stack([s[i] for s in states]))
                      for i in range(5))
    pcm, dev_state, ref_undef = decode_granules_batch_dev(
        huff, params, sf, frame, sfjs, dev_state, vindex, ngr)
    B = huff.shape[0]
    pcm_all = np.asarray(pcm).astype(np.int16)
    st_np = tuple(np.asarray(v) for v in dev_state)
    new_states = [tuple(a[b] for a in st_np) for b in range(B)]
    return pcm_all, new_states, ~np.asarray(ref_undef)


def decode_granules_batch_dev(huff, params, sf, frame, sfjs, dev_state,
                              vindex, ngr):
    """Device-resident variant: carried state stays on device across frames.

    Args are as decode_granules_batch except ``dev_state`` — a tuple of
    stacked jnp arrays (over [B,2,288], prev_type [B,2], prev_win_switch
    [B,2], num_prev [B,2], vbuf [B,2176]). Returns (pcm device
    [B, ngr*576*nch], new dev_state, ref_undef device bool [B]).

    Per granule the host does ONE native parameter expansion and ONE fused
    device dispatch; nothing syncs back. gb == 31 means the guard-bit mask
    was zero: the reference computes CLZ(0) there (undefined in C) and the
    garbage gb rescales both new samples and carried overlap state (IMDCT36
    xPrev >>= es, reference :2190-2200), so its output is nondeterministic
    unless everything involved is zero; ours uses the defined lzcnt value
    and accumulates the flag on device for differential tests to fetch.
    """
    B = huff.shape[0]
    nch = int(frame[0, 5])
    ver, sr_idx = int(frame[0, 0]), int(frame[0, 4])
    T = mp3_tables()
    cutoff = int(T["sfBandLong"][ver][sr_idx][8 if ver == 0 else 6] // 18)

    over, prev_type, prev_win_switch, num_prev, vbuf = dev_state
    maps = _maps_dev(ver, sr_idx)
    ref_undef = jnp.zeros(B, bool)
    pcm_parts = []
    for gr in range(ngr):
        nzb_in = params[:, gr, :nch, 18].astype(np.int32)     # [B, nch]
        # ONE native call emits the compact band-level params for all B
        # streams (~930B/stream); per-sample expansion happens on device
        compact = granule_params_compact_blob(params[:, gr], sf[:, gr],
                                              frame, sfjs, nzb_in, nch)
        fdct, poly, coef, vindex = _sched_dev(vindex, nch)
        (pcm, over, prev_type, prev_win_switch, num_prev, vbuf,
         ref_undef) = _granule_step(
            jnp.asarray(huff[:, gr, :nch]), jnp.asarray(nzb_in),
            jnp.asarray(compact), maps, over, prev_type, prev_win_switch,
            num_prev, vbuf, jnp.asarray(params[:, gr, :nch, 5].reshape(-1)),
            jnp.asarray(params[:, gr, :nch, 6].reshape(-1)),
            fdct, poly, coef, ref_undef, nch=nch, cutoff=cutoff)
        pcm_parts.append(pcm)                                 # device [B, 576*nch]

    if pcm_parts:
        pcm_all = jnp.concatenate(pcm_parts, axis=1).astype(jnp.int16)
    else:
        pcm_all = jnp.zeros((B, 0), jnp.int16)
    return pcm_all, (over, prev_type, prev_win_switch, num_prev, vbuf), ref_undef
