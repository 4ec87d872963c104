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
from ..runtime import transport
from ..runtime.tables import mp3_tables
from .mp3 import expand_hp_device, format_maps, granule_params_compact_blob

__all__ = ["decode_granules", "decode_granules_batch", "decode_granules_batch_dev"]

def _pack_huff16(huff_np: np.ndarray) -> np.ndarray:
    """Pack sign-in-MSB int32 spectral magnitudes to int16 for transport.

    Lossless by construction: a Layer III magnitude is at most
    15 + (2^13 - 1) = 8206 (the largest linbits field is 13,
    ISO/IEC 11172-3 Table B.7 tables 23/31), so value fits 15 bits and the
    sign flag moves from bit 31 to bit 15.  Halves the dominant per-granule
    upload; ``_granule_step`` re-widens on device, bit-exactly.
    """
    h = huff_np.astype(np.int32, copy=False)
    return (((h & 0x7FFF) | ((h >> 16) & 0x8000)).astype(np.uint16)).view(np.int16)


# escape-density ceiling for the int8+sideband spectral transport tier
# (shared rationale in runtime/transport.py); tests force it to 0.0/1.0
ESC_MAX_DENSITY = transport.ESC_MAX_DENSITY


def _pack_huff8(huff16: np.ndarray):
    """Try to narrow an int16-packed spectral plane (see ``_pack_huff16``)
    to int8 + a sparse escape sideband.

    Sign moves from bit 15 to bit 7; magnitudes > 127 ship as (flat
    position, packed-int16 value) pairs scattered back on device
    (``_granules_scan_esc_for``).  Returns ``(plane8, esc_pos, esc_val)``
    or ``None`` when the escape density makes the tier unprofitable.
    Lossless by construction either way.
    """
    u = huff16.view(np.uint16)
    mag = u & 0x7FFF
    esc = mag > 127
    n_esc = int(np.count_nonzero(esc))
    if n_esc > ESC_MAX_DENSITY * huff16.size:
        return None
    plane8 = ((mag & 0x7F) | ((u >> 8) & 0x80)).astype(np.uint8).view(np.int8)
    flat = np.flatnonzero(esc.reshape(-1))
    pos, val = transport.escape_sideband(
        flat, huff16.reshape(-1)[flat], oob_index=huff16.size,
        val_dtype=np.int16)
    return plane8, pos, val


def _pack_huff8_sharded(huff16: np.ndarray, n_shards: int):
    """Mesh form of :func:`_pack_huff8`: the stacked plane's STREAM axis
    (axis 1 of ``[G, B, ...]``) splits into ``n_shards`` contiguous blocks
    and each block gets its own escape sideband with positions local to the
    block (granule-major flat order), so the device fixup scatter is a vmap
    over the shard axis — no cross-shard scatter, and the sharded serving
    path keeps the int8 upload win (VERDICT r3 #4, same fix as the FLAC
    tier).  Returns ``(plane8, pos [S, cap], val [S, cap])`` or ``None``.
    """
    G, B = huff16.shape[:2]
    u = huff16.view(np.uint16)
    mag = u & 0x7FFF
    esc = mag > 127
    if int(np.count_nonzero(esc)) > ESC_MAX_DENSITY * huff16.size:
        return None
    plane8 = ((mag & 0x7F) | ((u >> 8) & 0x80)).astype(np.uint8).view(np.int8)
    blk = (B // n_shards) * int(np.prod(huff16.shape[2:]))
    mask2 = esc.reshape(G, n_shards, blk).swapaxes(0, 1).reshape(n_shards, -1)
    vals2 = huff16.reshape(G, n_shards, blk).swapaxes(0, 1).reshape(n_shards, -1)
    pos, val = transport.escape_sideband_blocked(mask2, vals2, np.int16)
    return plane8, pos, val


def _granule_body(huff_g, nzb_in, compact, maps, over, prev_type,
                  prev_win_switch, num_prev, vbuf, block_type, mixed,
                  vindex, ref_undef, *, nch, cutoff):
    """One granule for B streams, fully device-resident.

    Chains dequant -> IMDCT -> subband and updates all carried state on
    device; per-sample parameters are EXPANDED ON DEVICE from the ~230-word
    compact blob + static per-format maps (the 44KB expanded form is pure
    transfer weight), and the reference-UB flag (see decode_granules_batch)
    is accumulated on device too, so the host never syncs inside a frame —
    critical when the chip sits behind a high-latency transport.
    ``huff_g`` arrives int16-packed (see ``_pack_huff16``) and re-widens to
    the sign-in-MSB int32 form the dequantizer consumes.
    """
    B = huff_g.shape[0]
    v = huff_g.astype(jnp.int32)          # sign-extends the bit-15 flag
    mag = v & 0x7FFF
    huff_g = jnp.where(v < 0, mag | jnp.int32(-(2 ** 31)), mag)
    hp = expand_hp_device(compact, maps, nch)
    sfb_s_key = tuple(int(v) for v in np.asarray(maps["sfb_s"]))
    dq = mp3dsp.dequantize_granule(huff_g, nzb_in, hp, nch=nch, sfb_s=sfb_s_key)
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
        vindex, nch=nch)
    vindex = (vindex - 9) & 7   # 9 odd steps per granule advance the phase
    return pcm, over, prev_type, prev_win_switch, num_prev, vbuf, vindex, ref_undef


def _granule_body_fast(huff_g, nzb_in, compact, maps, over, prev_type,
                       prev_win_switch, num_prev, vbuf, block_type, mixed,
                       vindex, *, nch, cutoff):
    """Relaxed-precision granule: the f32 value-mirror pipeline
    (ops/mp3fast.py — opt-in FAST tier, <=1 LSB int16 vs the exact path,
    no reference-UB tracking).  Carried ``over``/``vbuf`` ride f32; all
    other state and the block-selection logic are identical ints."""
    from ..ops import mp3fast

    B = huff_g.shape[0]
    v = huff_g.astype(jnp.int32)
    mag = v & 0x7FFF
    huff_g = jnp.where(v < 0, mag | jnp.int32(-(2 ** 31)), mag)
    hp = expand_hp_device(compact, maps, nch)
    sfb_s_key = tuple(int(v) for v in np.asarray(maps["sfb_s"]))
    dq = mp3fast.dequantize_granule_fast(huff_g, nzb_in, hp, nch=nch,
                                         sfb_s=sfb_s_key)
    x = dq["x"].reshape(B * nch, 576)

    nzb = dq["nzb"][:, :nch].reshape(-1)
    out, new_over, _, n_out, cws = mp3fast.imdct_granule_fast(
        x, over[:, :nch].reshape(B * nch, 32, 9),
        nzb, block_type, mixed,
        prev_type[:, :nch].reshape(-1), prev_win_switch[:, :nch].reshape(-1),
        jnp.full((B * nch,), cutoff, jnp.int32), num_prev[:, :nch].reshape(-1))

    over = over.at[:, :nch].set(new_over.reshape(B, nch, 288))
    prev_type = prev_type.at[:, :nch].set(block_type.reshape(B, nch))
    prev_win_switch = prev_win_switch.at[:, :nch].set(cws.reshape(B, nch))
    num_prev = num_prev.at[:, :nch].set(n_out.reshape(B, nch))

    pcm, vbuf = mp3fast.subband_granule_fast(
        out.reshape(B, nch, 18, 32), vbuf, vindex, nch=nch)
    vindex = (vindex - 9) & 7
    return pcm, over, prev_type, prev_win_switch, num_prev, vbuf, vindex


def _granule_body_mxu(huff_g, nzb_in, compact, maps, over, prev_type,
                      prev_win_switch, num_prev, vbuf, block_type, mixed,
                      vindex, ops, *, nch, cutoff):
    """MXU-form relaxed granule: f32 dequant (value mirror) feeding the
    probed-operator IMDCT + subband matmuls (ops/mp3mxu.py).  Carried
    state layout is identical to the mirror tier, so the two fast tiers'
    checkpoints interconvert freely."""
    from ..ops import mp3fast, mp3mxu

    B = huff_g.shape[0]
    v = huff_g.astype(jnp.int32)
    mag = v & 0x7FFF
    huff_g = jnp.where(v < 0, mag | jnp.int32(-(2 ** 31)), mag)
    hp = expand_hp_device(compact, maps, nch)
    sfb_s_key = tuple(int(v) for v in np.asarray(maps["sfb_s"]))
    dq = mp3fast.dequantize_granule_fast(huff_g, nzb_in, hp, nch=nch,
                                         sfb_s=sfb_s_key)
    x = dq["x"].reshape(B * nch, 576)

    nzb = dq["nzb"][:, :nch].reshape(-1)
    out, new_over, _, n_out, cws = mp3mxu.imdct_granule_mxu(
        x, over[:, :nch].reshape(B * nch, 32, 9),
        nzb, block_type, mixed,
        prev_type[:, :nch].reshape(-1), prev_win_switch[:, :nch].reshape(-1),
        jnp.full((B * nch,), cutoff, jnp.int32), num_prev[:, :nch].reshape(-1),
        ops)

    over = over.at[:, :nch].set(new_over.reshape(B, nch, 288))
    prev_type = prev_type.at[:, :nch].set(block_type.reshape(B, nch))
    prev_win_switch = prev_win_switch.at[:, :nch].set(cws.reshape(B, nch))
    num_prev = num_prev.at[:, :nch].set(n_out.reshape(B, nch))

    pcm, vbuf = mp3mxu.subband_granule_mxu(
        out.reshape(B, nch, 18, 32), vbuf, vindex, ops, nch=nch)
    vindex = (vindex - 9) & 7
    return pcm, over, prev_type, prev_win_switch, num_prev, vbuf, vindex


_SCAN_JIT: dict = {}    # (ver, sr_idx, nch, cutoff) -> jitted scan


def _granules_scan_for(ver: int, sr_idx: int, nch: int, cutoff: int):
    """Per-format jitted whole-run scan.  The per-format maps are baked in
    as TRACE-TIME numpy constants — expand_hp_device turns their static
    index structure into one-hot matmuls and threshold arithmetic, which
    needs concrete values (and saves re-uploading them as arguments)."""
    key = (ver, sr_idx, nch, cutoff)
    fn = _SCAN_JIT.get(key)
    if fn is not None:
        return fn
    from .mp3 import format_maps
    maps = format_maps(ver, sr_idx)   # numpy: becomes compile-time constants

    @jax.jit
    def scan_fn(huff_gs, side_gs, over, prev_type, prev_win_switch,
                num_prev, vbuf, vindex0):
        """ALL granules of a run in ONE dispatch: ``lax.scan`` over the
        leading granule axis of every per-granule input.  Behind a
        high-latency transport this is the difference between 2*n_frames
        dispatch+upload round trips and exactly one: the stacked tensors
        ship together and the carried state never leaves the device between
        granules.

        ``side_gs`` int32 [G, B, 3*nch + CW] packs every small per-granule
        input into a single upload (per-transfer latency on a tunneled chip
        makes each separate host array cost ~a dispatch): columns are
        nzb [nch] | block_type [nch] | mixed [nch] | compact blob [CW].
        """
        B = huff_gs.shape[1]
        nzb_gs = side_gs[:, :, 0:nch]
        block_gs = side_gs[:, :, nch:2 * nch].reshape(side_gs.shape[0], -1)
        mixed_gs = side_gs[:, :, 2 * nch:3 * nch].reshape(side_gs.shape[0], -1)
        compact_gs = side_gs[:, :, 3 * nch:]

        def step(carry, xs):
            over, pt, pws, npv, vbuf, vindex, ru = carry
            huff_g, nzb, compact, bt, mx = xs
            pcm, over, pt, pws, npv, vbuf, vindex, ru = _granule_body(
                huff_g, nzb, compact, maps, over, pt, pws, npv, vbuf, bt, mx,
                vindex, ru, nch=nch, cutoff=cutoff)
            return (over, pt, pws, npv, vbuf, vindex, ru), pcm

        carry0 = (over, prev_type, prev_win_switch, num_prev, vbuf,
                  vindex0.astype(jnp.int32), jnp.zeros(B, bool))
        (over, prev_type, prev_win_switch, num_prev, vbuf, _, ref_undef), pcm_gs = \
            jax.lax.scan(step, carry0,
                         (huff_gs, nzb_gs, compact_gs, block_gs, mixed_gs))
        return (pcm_gs, (over, prev_type, prev_win_switch, num_prev, vbuf),
                ref_undef)

    _SCAN_JIT[key] = scan_fn
    return scan_fn


_SCAN_FAST_JIT: dict = {}


def _granules_scan_fast_for(ver: int, sr_idx: int, nch: int, cutoff: int):
    """FAST-tier counterpart of :func:`_granules_scan_for`: same one-upload /
    one-dispatch whole-run scan, f32 granule body, no ref-UB accumulator
    (returned as constant False for interface compatibility)."""
    key = (ver, sr_idx, nch, cutoff)
    fn = _SCAN_FAST_JIT.get(key)
    if fn is not None:
        return fn
    from .mp3 import format_maps
    maps = format_maps(ver, sr_idx)

    @jax.jit
    def scan_fn(huff_gs, side_gs, over, prev_type, prev_win_switch,
                num_prev, vbuf, vindex0):
        B = huff_gs.shape[1]
        nzb_gs = side_gs[:, :, 0:nch]
        block_gs = side_gs[:, :, nch:2 * nch].reshape(side_gs.shape[0], -1)
        mixed_gs = side_gs[:, :, 2 * nch:3 * nch].reshape(side_gs.shape[0], -1)
        compact_gs = side_gs[:, :, 3 * nch:]

        def step(carry, xs):
            over, pt, pws, npv, vbuf, vindex = carry
            huff_g, nzb, compact, bt, mx = xs
            pcm, over, pt, pws, npv, vbuf, vindex = _granule_body_fast(
                huff_g, nzb, compact, maps, over, pt, pws, npv, vbuf, bt, mx,
                vindex, nch=nch, cutoff=cutoff)
            return (over, pt, pws, npv, vbuf, vindex), pcm

        carry0 = (over.astype(jnp.float32), prev_type, prev_win_switch,
                  num_prev, vbuf.astype(jnp.float32),
                  vindex0.astype(jnp.int32))
        (over, prev_type, prev_win_switch, num_prev, vbuf, _), pcm_gs = \
            jax.lax.scan(step, carry0,
                         (huff_gs, nzb_gs, compact_gs, block_gs, mixed_gs))
        return (pcm_gs, (over, prev_type, prev_win_switch, num_prev, vbuf),
                jnp.zeros(B, bool))

    _SCAN_FAST_JIT[key] = scan_fn
    return scan_fn


_SCAN_MXU_JIT: dict = {}


def _granules_scan_mxu_for(ver: int, sr_idx: int, nch: int, cutoff: int):
    """MXU-tier counterpart of :func:`_granules_scan_for`: the probed
    operator bundle (ops/mp3mxu.mxu_operators — ~55MB of stacked f32
    matrices) rides as a jit ARGUMENT so it lives in HBM once instead of
    being baked into the executable as constants."""
    key = (ver, sr_idx, nch, cutoff)
    fn = _SCAN_MXU_JIT.get(key)
    if fn is not None:
        return fn
    from .mp3 import format_maps
    from ..ops import mp3mxu
    maps = format_maps(ver, sr_idx)

    @jax.jit
    def scan_jit(ops, huff_gs, side_gs, over, prev_type, prev_win_switch,
                 num_prev, vbuf, vindex0):
        B = huff_gs.shape[1]
        nzb_gs = side_gs[:, :, 0:nch]
        block_gs = side_gs[:, :, nch:2 * nch].reshape(side_gs.shape[0], -1)
        mixed_gs = side_gs[:, :, 2 * nch:3 * nch].reshape(side_gs.shape[0], -1)
        compact_gs = side_gs[:, :, 3 * nch:]

        def step(carry, xs):
            over, pt, pws, npv, vbuf, vindex = carry
            huff_g, nzb, compact, bt, mx = xs
            pcm, over, pt, pws, npv, vbuf, vindex = _granule_body_mxu(
                huff_g, nzb, compact, maps, over, pt, pws, npv, vbuf, bt, mx,
                vindex, ops, nch=nch, cutoff=cutoff)
            return (over, pt, pws, npv, vbuf, vindex), pcm

        carry0 = (over.astype(jnp.float32), prev_type, prev_win_switch,
                  num_prev, vbuf.astype(jnp.float32),
                  vindex0.astype(jnp.int32))
        (over, prev_type, prev_win_switch, num_prev, vbuf, _), pcm_gs = \
            jax.lax.scan(step, carry0,
                         (huff_gs, nzb_gs, compact_gs, block_gs, mixed_gs))
        return (pcm_gs, (over, prev_type, prev_win_switch, num_prev, vbuf),
                jnp.zeros(B, bool))

    # Probe the operator bundle EAGERLY, outside any jit trace: builders are
    # only ever called from Python (the per-key cache miss path), so the
    # probe's own scan compiles run un-traced.  Passing the bundle through a
    # closure into an OUTER jit (e.g. _granules_scan_esc_for's esc_fn) would
    # otherwise run the probe under that trace and leak tracers
    # (round-4 regression: tests/test_mp3_fast.py, mp3mxu.py probe-under-jit).
    ops = mp3mxu.mxu_operators()

    def scan_fn(*args):
        return scan_jit(ops, *args)

    # expose the ops-as-argument core so wrappers (the esc sideband jits)
    # can keep the bundle a runtime argument of THEIR executable too
    scan_fn._jit_with_ops = scan_jit
    scan_fn._ops = ops
    _SCAN_MXU_JIT[key] = scan_fn
    return scan_fn


def _tier(fast) -> str:
    """Normalize the ``fast`` tier selector: False -> exact int pipeline,
    "mirror" -> the f32 value-mirror (ops/mp3fast), True / "mxu" -> the
    probed-operator matmul form (ops/mp3mxu, the production fast tier)."""
    if fast is False or fast is None:
        return "exact"
    if fast == "mirror":
        return "mirror"
    return "mxu"


def _scan_builder(tier: str):
    return {"exact": _granules_scan_for,
            "mirror": _granules_scan_fast_for,
            "mxu": _granules_scan_mxu_for}[tier]


_SCAN_ESC_JIT: dict = {}


def _widen_esc16(huff8_gs):
    """int8 spectral plane (sign in bit 7) -> the int16-packed form the
    tier scans consume (sign in bit 15, 7-bit magnitude)."""
    v8 = huff8_gs.astype(jnp.int16)          # sign-extends bit 7
    mag = v8 & 0x7F
    return jnp.where(v8 < 0, mag | jnp.int16(-(2 ** 15)), mag)


def _esc_wrap(scan_fn, fixup):
    """Wrap a tier ``scan_fn`` into the int8+escape-sideband form: widen the
    int8 plane and scatter the escape values ON DEVICE, then run the scan —
    all under one jit so only the transport narrows.

    When the tier carries a probed operator bundle (``_jit_with_ops``, the
    MXU tier) the bundle rides as a runtime ARGUMENT of the combined
    executable too: closing it over the outer jit would inline ~55MB of
    matrices into the HLO as constants — and, pre-fix, ran the lazy probe
    under the trace (round-4 regression, tests/test_mp3_fast.py)."""
    jit_with_ops = getattr(scan_fn, "_jit_with_ops", None)
    if jit_with_ops is None:
        @jax.jit
        def esc_fn(huff8_gs, esc_pos, esc_val, *rest):
            return scan_fn(fixup(_widen_esc16(huff8_gs), esc_pos, esc_val),
                           *rest)
        return esc_fn

    ops = scan_fn._ops

    @jax.jit
    def esc_ops_fn(ops, huff8_gs, esc_pos, esc_val, *rest):
        return jit_with_ops(ops,
                            fixup(_widen_esc16(huff8_gs), esc_pos, esc_val),
                            *rest)

    def esc_fn(*args):
        return esc_ops_fn(ops, *args)
    return esc_fn


def _esc_fixup_flat(h16, esc_pos, esc_val):
    """Global flat-index escape scatter (single-device layout)."""
    return h16.reshape(-1).at[esc_pos].set(esc_val,
                                           mode="drop").reshape(h16.shape)


def _granules_scan_esc_for(ver: int, sr_idx: int, nch: int, cutoff: int,
                           fast: bool = False):
    """Sideband variant of :func:`_granules_scan_for`: the spectral plane
    arrives int8 (sign in bit 7) plus a sparse escape sideband and re-widens
    to the int16-packed form ON DEVICE before the same fused scan — the
    widen + scatter fuse into the one run dispatch, so only the transport
    narrows (the dominant upload halves again vs the int16 tier)."""
    key = (ver, sr_idx, nch, cutoff, _tier(fast))
    fn = _SCAN_ESC_JIT.get(key)
    if fn is not None:
        return fn
    scan_fn = _scan_builder(_tier(fast))(ver, sr_idx, nch, cutoff)
    fn = _esc_wrap(scan_fn, _esc_fixup_flat)
    _SCAN_ESC_JIT[key] = fn
    return fn


_SCAN_ESC_SHARDED_JIT: dict = {}


def _esc_fixup_sharded(h16, esc_pos, esc_val):
    """Per-shard-local escape scatter: sideband rows are shard-local (see
    ``_pack_huff8_sharded``) so the fixup is a vmap over the shard axis —
    each chip fixes up only its own stream block and GSPMD partitions the
    batched scatter without collectives."""
    S = esc_pos.shape[0]
    G = h16.shape[0]
    hs = jnp.swapaxes(h16.reshape(G, S, -1), 0, 1).reshape(S, -1)
    hs = jax.vmap(lambda w, p, v: w.at[p].set(v, mode="drop"))(
        hs, esc_pos, esc_val)
    return jnp.swapaxes(hs.reshape(S, G, -1), 0, 1).reshape(h16.shape)


def _granules_scan_esc_sharded_for(ver: int, sr_idx: int, nch: int,
                                   cutoff: int, fast: bool = False):
    """Mesh variant of :func:`_granules_scan_esc_for` (shard-local fixup)."""
    key = (ver, sr_idx, nch, cutoff, _tier(fast))
    fn = _SCAN_ESC_SHARDED_JIT.get(key)
    if fn is not None:
        return fn
    scan_fn = _scan_builder(_tier(fast))(ver, sr_idx, nch, cutoff)
    fn = _esc_wrap(scan_fn, _esc_fixup_sharded)
    _SCAN_ESC_SHARDED_JIT[key] = fn
    return fn


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
    """FIFO phase after ngr granules: 9 odd steps per granule each decrement
    the phase mod 8 (== build_subband_schedule's vindex_out chain)."""
    return (vindex - 9 * ngr) & 7


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
                              vindex, ngr, mesh=None, fast=False):
    """Device-resident variant: carried state stays on device across frames.

    Args are as decode_granules_batch except ``dev_state`` — a tuple of
    stacked jnp arrays (over [B,2,288], prev_type [B,2], prev_win_switch
    [B,2], num_prev [B,2], vbuf [B,2176]). Returns (pcm device
    [B, ngr*576*nch], new dev_state, ref_undef device bool [B]).

    The frame's granules ship and dispatch as ONE fused scan (see
    decode_granules_run). gb == 31 means the guard-bit mask was zero: the
    reference computes CLZ(0) there (undefined in C) and the garbage gb
    rescales both new samples and carried overlap state (IMDCT36
    xPrev >>= es, reference :2190-2200), so its output is nondeterministic
    unless everything involved is zero; ours uses the defined lzcnt value
    and accumulates the flag on device for differential tests to fetch.
    """
    G = ngr
    frame_g = np.repeat(np.asarray(frame)[:, None], max(G, 1), axis=1)
    sfjs_g = np.repeat(np.asarray(sfjs)[:, None], max(G, 1), axis=1)
    return decode_granules_run(huff[:, :G], params[:, :G], sf[:, :G],
                               frame_g[:, :G], sfjs_g[:, :G], dev_state, vindex,
                               mesh=mesh, fast=fast)


def decode_granules_run(huff_g, params_g, sf_g, frame_g, sfjs_g, dev_state,
                        vindex, mesh=None, fast=False):
    """Synthesize an arbitrary RUN of G granules (any mix of frames) for B
    format-uniform streams in ONE upload + ONE fused scan dispatch.

    This is the serving-rate path: behind a high-latency transport the
    per-dispatch round trip dominates MP3 decode, so ``BatchedMP3Decoder.
    decode_run`` parses many frames per stream and lands here with the whole
    run's granules stacked.  All per-granule inputs carry a granule axis:
    huff_g int32 [B, G, 2, 576], params_g [B, G, 2, 24], sf_g [B, G, 2, 62],
    frame_g [B, G, 16], sfjs_g [B, G, 8].  Streams must share
    (version, samplerate index, nChans) and the starting ``vindex``; the
    subband schedule sequence then advances identically for every stream.

    With ``mesh`` (a ``parallel.mesh.stream_mesh``), the stacked per-granule
    uploads land stream-sharded across the mesh (their stream axis is 1 —
    the tensors are granule-major) and the fused scan runs SPMD: each chip
    synthesizes its shard of streams with no collectives in the math (the
    reference has no cross-stream coupling, SURVEY.md §2 DP row).  Carried
    ``dev_state`` should already be batch-sharded (``BatchedMP3Decoder``
    initializes it so); outputs and new state inherit the sharding.

    Returns (pcm device [B, G*576*nch], new dev_state, ref_undef [B]).
    """
    B = huff_g.shape[0]
    G = huff_g.shape[1]
    over, prev_type, prev_win_switch, num_prev, vbuf = dev_state
    if G == 0:
        return (jnp.zeros((B, 0), jnp.int16),
                (over, prev_type, prev_win_switch, num_prev, vbuf),
                jnp.zeros(B, bool))
    nch = int(frame_g[0, 0, 5])
    ver, sr_idx = int(frame_g[0, 0, 0]), int(frame_g[0, 0, 4])
    T = mp3_tables()
    cutoff = int(T["sfBandLong"][ver][sr_idx][8 if ver == 0 else 6] // 18)

    huff_gs = np.stack([_pack_huff16(huff_g[:, g, :nch]) for g in range(G)])
    # pack every small per-granule input into ONE int32 upload (layout:
    # see _granules_scan); the compact blob comes from ONE native call per
    # granule (~930B/stream), expanded per-sample on device
    side_gs = None
    for g in range(G):
        nzb = params_g[:, g, :nch, 18].astype(np.int32)
        # granule_params_compact_blob returns a PERSISTENT per-B buffer —
        # it must be consumed (copied into side_gs) before the next call,
        # not collected: holding G references would alias one buffer and
        # synthesize every granule with the last granule's params
        blob = granule_params_compact_blob(
            params_g[:, g], sf_g[:, g], frame_g[:, g], sfjs_g[:, g], nzb, nch)
        if side_gs is None:
            side_gs = np.empty((G, B, 3 * nch + blob.shape[-1]), np.int32)
        side_gs[g, :, 0:nch] = params_g[:, g, :nch, 18]
        side_gs[g, :, nch:2 * nch] = params_g[:, g, :nch, 5]
        side_gs[g, :, 2 * nch:3 * nch] = params_g[:, g, :nch, 6]
        side_gs[g, :, 3 * nch:] = blob
    if mesh is not None:
        # sideband rows are per-shard-local under a mesh (the fixup scatter
        # stays on-chip, see _pack_huff8_sharded), so the sharded serving
        # path keeps the int8 upload win too
        from ..parallel.mesh import shard_streams, shard_streams_axis

        narrowed = _pack_huff8_sharded(huff_gs, mesh.size)
        huff_dev = shard_streams_axis(
            narrowed[0] if narrowed else huff_gs, 1, mesh)
        side_dev = shard_streams_axis(side_gs, 1, mesh)
        if narrowed is not None:
            _, esc_pos, esc_val = narrowed
            pcm_gs, new_state, ref_undef = _granules_scan_esc_sharded_for(
                ver, sr_idx, nch, cutoff, fast=fast)(
                huff_dev, shard_streams(esc_pos, mesh),
                shard_streams(esc_val, mesh), side_dev,
                over, prev_type, prev_win_switch, num_prev, vbuf,
                jnp.int32(vindex))
            pcm_all = jnp.swapaxes(pcm_gs, 0, 1).reshape(B, -1).astype(jnp.int16)
            return pcm_all, new_state, ref_undef
    else:
        narrowed = _pack_huff8(huff_gs)
        huff_dev = jnp.asarray(narrowed[0] if narrowed else huff_gs)
        side_dev = jnp.asarray(side_gs)
    if mesh is None and narrowed is not None:
        _, esc_pos, esc_val = narrowed
        pcm_gs, new_state, ref_undef = _granules_scan_esc_for(
            ver, sr_idx, nch, cutoff, fast=fast)(
            huff_dev, jnp.asarray(esc_pos), jnp.asarray(esc_val), side_dev,
            over, prev_type, prev_win_switch, num_prev, vbuf,
            jnp.int32(vindex))
    else:
        pcm_gs, new_state, ref_undef = _scan_builder(_tier(fast))(
            ver, sr_idx, nch, cutoff)(
            huff_dev, side_dev,
            over, prev_type, prev_win_switch, num_prev, vbuf,
            jnp.int32(vindex))
    # [G, B, 576*nch] -> [B, G*576*nch]
    pcm_all = jnp.swapaxes(pcm_gs, 0, 1).reshape(B, -1).astype(jnp.int16)
    return pcm_all, new_state, ref_undef
