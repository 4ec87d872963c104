"""MP3 decoding pipeline: native host front-end + batched device back-end.

Public semantics mirror the reference Helix API (reference:
include/mp3_decoder.h:386-394): ``MP3Decode`` / frame info / sync search,
with the same error codes and bad-frame zero-fill behavior.

Architecture (SURVEY.md §7.5): the native front-end
(native/src/mp3_frontend.cpp) handles everything bitstream-serial and emits
576-coefficient tensors + parameters; this module builds the per-sample
parameter arrays that turn the reference's per-critical-band serial loops
into uniform batched device passes (ops/mp3dsp.py dequant/stereo,
ops/mp3imdct.py hybrid synthesis, ops/mp3subband.py PQMF), all bit-exact
int32/int64 fixed-point.
"""

from __future__ import annotations

import ctypes as C
import functools

import numpy as np

from ..runtime.native import host_lib
from ..runtime.tables import mp3_tables
from ..utils.errors import MP3Error

__all__ = ["MP3Decoder", "granule_params"]

MAX_NSAMP = 576
IMDCT_SCALE = 2

_i32p = C.POINTER(C.c_int32)


def granule_params(params: np.ndarray, sf: np.ndarray, frame: np.ndarray, sfjs: np.ndarray,
                   nzb: np.ndarray) -> dict:
    """Build per-sample parameter arrays for one granule (all channels).

    Mirrors the control flow of the reference DequantChannel
    (src/decode/mp3_decoder.cpp:657-795): which critical band each sample
    belongs to, its gainI, the short-block reorder permutation, and the
    processed range implied by the early-exit-at-nonZeroBound logic — plus
    the output-order structure arrays used by the stereo stage.

    Args:
      params: int32 ``[C, 24]`` per-channel side info (front-end layout).
      sf:     int32 ``[C, 62]`` scalefactors (l[23] + s[13*3]).
      frame:  int32 ``[16]`` frame fields (front-end layout).
      sfjs:   int32 ``[8]`` slen[4] + nr[4].
      nzb:    int32 ``[C]`` input non-zero bounds.

    Returns: dict of numpy arrays keyed as ops.mp3dsp.dequantize_granule's
    ``hp`` expects (without the leading lane axis).
    """
    T = mp3_tables()
    ver, sr_idx, s_mode, mode_ext = int(frame[0]), int(frame[4]), int(frame[2]), int(frame[3])
    nch = int(frame[5])
    sfb_l = T["sfBandLong"][ver][sr_idx]
    sfb_s = T["sfBandShort"][ver][sr_idx]
    pre_tab = T["preTab"]

    Cn = nch
    gain = np.zeros((Cn, MAX_NSAMP), np.int32)
    band_in = np.full((Cn, MAX_NSAMP), -1, np.int32)
    win_in = np.zeros((Cn, MAX_NSAMP), np.int32)
    is_long_in = np.zeros((Cn, MAX_NSAMP), bool)
    processed = np.zeros((Cn, MAX_NSAMP), bool)
    invperm = np.tile(np.arange(MAX_NSAMP, dtype=np.int32), (Cn, 1))
    short_base = np.zeros(Cn, np.int32)
    cb_start_s = np.zeros(Cn, np.int32)
    has_short = np.zeros(Cn, bool)
    cb_type = np.zeros(Cn, np.int32)
    out_nzb_short = np.zeros(Cn, np.int32)

    for ch in range(Cn):
        p = params[ch]
        block_type, mixed = int(p[5]), int(p[6])
        sfact_mult = 2 * (int(p[16]) + 1)
        global_gain = int(p[2])
        if mode_ext >> 1:
            global_gain -= 2
        global_gain += IMDCT_SCALE

        if block_type == 2:
            if mixed:
                cb_end_l = 8 if ver == 0 else 6
                cbs = 3
            else:
                cb_end_l = 0
                cbs = 0
            cb_end_s = 13
        else:
            cb_end_l = 22
            cbs = 13
            cb_end_s = 13
        cb_start_s[ch] = cbs
        has_short[ch] = cbs < 12
        cb_type[ch] = 0 if block_type != 2 else (2 if mixed else 1)

        sfl = sf[ch, :23]
        sfs = sf[ch, 23:].reshape(13, 3)
        i = 0
        short_base[ch] = 0
        for cb in range(cb_end_l):
            n = int(sfb_l[cb + 1] - sfb_l[cb])
            g = 210 - global_gain + sfact_mult * (int(sfl[cb]) + (int(pre_tab[cb]) if p[15] else 0))
            gain[ch, i:i + n] = g
            band_in[ch, i:i + n] = cb
            is_long_in[ch, i:i + n] = True
            processed[ch, i:i + n] = True
            i += n
            if i >= nzb[ch]:
                break
        short_base[ch] = i

        if cbs < 12:
            for cb in range(cbs, cb_end_s):
                n = int(sfb_s[cb + 1] - sfb_s[cb])
                for w in range(3):
                    g = 210 - global_gain + 8 * int(p[10 + w]) + sfact_mult * int(sfs[cb, w])
                    gain[ch, i + n * w: i + n * (w + 1)] = g
                    band_in[ch, i + n * w: i + n * (w + 1)] = cb
                    win_in[ch, i + n * w: i + n * (w + 1)] = w
                    processed[ch, i + n * w: i + n * (w + 1)] = True
                # reorder: out[i + 3j + w] = in[i + n*w + j]
                for w in range(3):
                    j = np.arange(n)
                    invperm[ch, i + 3 * j + w] = i + n * w + j
                i += 3 * n
                if i >= nzb[ch]:
                    break
            out_nzb_short[ch] = i

    # ---- output-order structure arrays (for the stereo stage) ----
    idx = np.arange(MAX_NSAMP)
    band_out_l = np.full(MAX_NSAMP, -1, np.int32)
    for cb in range(22):
        band_out_l[sfb_l[cb]: sfb_l[cb + 1]] = cb
    band_out_s = np.full(MAX_NSAMP, -1, np.int32)
    win_out = np.zeros(MAX_NSAMP, np.int32)
    for cb in range(13):
        lo, hi = 3 * int(sfb_s[cb]), 3 * int(sfb_s[cb + 1])
        band_out_s[lo:hi] = cb
        win_out[lo:hi] = (idx[lo:hi] - lo) % 3

    # right-channel scalefactors per sample (for intensity)
    sf_r_l = np.zeros(MAX_NSAMP, np.int32)
    sf_r_s = np.zeros(MAX_NSAMP, np.int32)
    il_l = np.zeros(MAX_NSAMP, np.int32)
    il_s = np.zeros(MAX_NSAMP, np.int32)
    if Cn == 2:
        sfl1 = sf[1, :23]
        sfs1 = sf[1, 23:].reshape(13, 3)
        valid_l = band_out_l >= 0
        sf_r_l[valid_l] = sfl1[band_out_l[valid_l]]
        valid_s = band_out_s >= 0
        sf_r_s[valid_s] = sfs1[band_out_s[valid_s], win_out[valid_s]]
        # MPEG2 illegal-intensity-position per band (reference :1330-1334)
        il = np.zeros(23, np.int64)
        k = 0
        for r in range(4):
            tmp = (1 << int(sfjs[r])) - 1
            for _ in range(int(sfjs[4 + r])):
                if k < 23:
                    il[k] = tmp
                k += 1
        il_long = il.copy()
        il_long[21] = il_long[22] = 1     # (:1352)
        il_short = il.copy()
        il_short[12] = 1                  # (:1391)
        il_l[valid_l] = il_long[band_out_l[valid_l]]
        il_s[valid_s] = il_short[np.clip(band_out_s[valid_s], 0, 12)]

    return dict(
        gain=gain, band_in=band_in, win_in=win_in, is_long_in=is_long_in,
        processed=processed, invperm=invperm, short_base=short_base,
        cb_start_s=cb_start_s,
        has_short=has_short, cb_type=cb_type, out_nzb_short=out_nzb_short,
        band_out_l=band_out_l, band_out_s=band_out_s, win_out=win_out,
        sf_right_l=sf_r_l, sf_right_s=sf_r_s, il_out_l=il_l, il_out_s=il_s,
        sfb_l=sfb_l.astype(np.int32), sfb_s=sfb_s.astype(np.int32),
        mode_ext=np.int32(mode_ext), ver_is_mpeg1=np.bool_(ver == 0),
        intensity_scale=np.int32(frame[12]),
    )




# compact band-level blob: 2*22 + 2*39 + 2*6 + 23 + 39 + 23 + 13 + 3 words
# (layout: native/src/mp3_frontend.cpp eal_mp3_granule_params_compact)
_GPC_SIZE = 2 * 22 + 2 * 39 + 2 * 6 + 23 + 39 + 23 + 13 + 3
_GPC_BLOBS: dict = {}   # B -> persistent [B, _GPC_SIZE] output buffer


def granule_params_compact_blob(params, sf, frame, sfjs, nzb, nch) -> np.ndarray:
    """Raw compact parameter blob ``[B, _GPC_SIZE]`` (one native call;
    layout: native/src/mp3_frontend.cpp eal_mp3_granule_params_compact).
    The returned array is a PERSISTENT per-B buffer — consume or copy it
    before the next same-B call."""
    B = params.shape[0]
    p2 = np.zeros((B, 2, 24), np.int32)
    p2[:, :nch] = params[:, :nch]
    s2 = np.zeros((B, 2, 62), np.int32)
    s2[:, :nch] = sf[:, :nch]
    n2 = np.zeros((B, 2), np.int32)
    n2[:, :nch] = nzb[:, :nch]
    fr = np.ascontiguousarray(frame, np.int32)
    js = np.ascontiguousarray(sfjs, np.int32)
    out = _GPC_BLOBS.get(B)
    if out is None:
        out = _GPC_BLOBS[B] = np.empty((B, _GPC_SIZE), np.int32)
    host_lib().eal_mp3_granule_params_compact_batch(
        B, p2.ctypes.data_as(_i32p), s2.ctypes.data_as(_i32p),
        fr.ctypes.data_as(_i32p), js.ctypes.data_as(_i32p),
        n2.ctypes.data_as(_i32p), out.ctypes.data_as(_i32p))
    return out


@functools.lru_cache(None)
def format_maps(ver: int, sr_idx: int) -> dict:
    """Static per-format per-sample maps (numpy, cached; device copies are
    cached by the pipeline). These never depend on stream data:

      long_band[576]   input-order long-section band per sample (sfb_l)
      off_band/off_win/inv_off [2, 576]   short-section band / window /
        reorder source, indexed by OFFSET from the (dynamic) short-section
        base, one row per cbs in (0, 3) — the only short-start bands
      band_out_l/band_out_s/win_out [576]  output-order structure
      sfb_l[23] sfb_s[14]
    """
    T = mp3_tables()
    sfb_l = T["sfBandLong"][ver][sr_idx].astype(np.int32)
    sfb_s = T["sfBandShort"][ver][sr_idx].astype(np.int32)
    N = MAX_NSAMP

    long_band = np.zeros(N, np.int32)
    for cb in range(22):
        long_band[sfb_l[cb]: sfb_l[cb + 1]] = cb

    off_band = np.zeros((2, N), np.int32)
    off_win = np.zeros((2, N), np.int32)
    inv_off = np.tile(np.arange(N, dtype=np.int32), (2, 1))
    for ci, cbs in enumerate((0, 3)):
        off = 0
        for cb in range(cbs, 13):
            n = int(sfb_s[cb + 1] - sfb_s[cb])
            for w in range(3):
                off_band[ci, off + n * w: off + n * (w + 1)] = cb
                off_win[ci, off + n * w: off + n * (w + 1)] = w
            j = np.arange(n)
            for w in range(3):
                inv_off[ci, off + 3 * j + w] = off + n * w + j
            off += 3 * n

    idx = np.arange(N)
    band_out_l = np.full(N, -1, np.int32)
    for cb in range(22):
        band_out_l[sfb_l[cb]: sfb_l[cb + 1]] = cb
    band_out_s = np.full(N, -1, np.int32)
    win_out = np.zeros(N, np.int32)
    for cb in range(13):
        lo, hi = 3 * int(sfb_s[cb]), 3 * int(sfb_s[cb + 1])
        band_out_s[lo:hi] = cb
        win_out[lo:hi] = (idx[lo:hi] - lo) % 3
    return dict(long_band=long_band, off_band=off_band, off_win=off_win,
                inv_off=inv_off, band_out_l=band_out_l, band_out_s=band_out_s,
                win_out=win_out, sfb_l=sfb_l, sfb_s=sfb_s)


def expand_hp_device(compact, maps, nch: int) -> dict:
    """Trace-time per-sample expansion of the compact blob: pure gathers and
    masks against the static maps — must produce arrays identical to
    _gp_blob_to_dict (pinned by tests/test_mp3_decode.py)."""
    import jax.numpy as jnp

    B = compact.shape[0]
    N = MAX_NSAMP
    o = 0

    def take(*shape):
        nonlocal o
        n = int(np.prod(shape))
        v = compact[:, o:o + n].reshape(B, *shape)
        o += n
        return v

    gain_l = take(2, 22)[:, :nch]
    gain_s = take(2, 39)[:, :nch]
    pe_l = take(2)[:, :nch]
    short_base = take(2)[:, :nch]
    pe_s = take(2)[:, :nch]
    cb_start_s = take(2)[:, :nch]
    has_short = take(2)[:, :nch].astype(bool)
    cb_type = take(2)[:, :nch]
    sfl1 = take(23)
    sfs1 = take(39)
    il_long = take(23)
    il_short = take(13)
    scalars = take(3)

    idx = jnp.arange(N, dtype=jnp.int32)
    long_proc = idx[None, None, :] < pe_l[..., None]               # [B,C,N]
    # Short-section structure via ARITHMETIC, not shifted-row gathers: on
    # TPU a [B,C,576] minor-axis gather lowers to a serial element walk and
    # dominated this whole function.  Everything the old maps held is a
    # function of the in-section offset o and ~13 static thresholds:
    #   band(o):  count of band starts <= o        (13 compares)
    #   win(o) = (o - S[band]) // n[band];  k = remainder
    #   inv(o) = S[band] + n[band] * ((o-S) % 3) + (o-S) // 3
    row = (cb_start_s == 3).astype(jnp.int32)                      # [B,C]
    off = idx[None, None, :] - short_base[..., None]
    o = jnp.clip(off, 0, N - 1)
    short_proc = (off >= 0) & (idx[None, None, :] < pe_s[..., None]) \
        & has_short[..., None]

    sfb_s_np = np.asarray(maps["sfb_s"])                           # static [14]
    base_s = jnp.where(row == 1, int(sfb_s_np[3]), int(sfb_s_np[0]))   # sfb_s[cbs]
    # S[cb] = 3*(sfb_s[cb] - sfb_s[cbs]); widths are format-static scalars
    sband = -jnp.ones_like(o)
    S_sel = jnp.zeros_like(o)
    n_sel = jnp.ones_like(o)
    gw = [jnp.zeros_like(o) for _ in range(3)]   # per-window short gain
    for cb in range(13):
        S_cb = (3 * (int(sfb_s_np[cb]) - base_s))[..., None]       # [B,C,1]
        hit = o >= S_cb
        sband = jnp.where(hit, cb, sband)
        S_sel = jnp.where(hit, S_cb, S_sel)
        n_sel = jnp.where(hit, int(sfb_s_np[cb + 1] - sfb_s_np[cb]), n_sel)
        for w in range(3):
            gw[w] = jnp.where(hit, gain_s[:, :, cb * 3 + w, None], gw[w])
    q = o - S_sel
    swin = q // n_sel
    sinv = S_sel + n_sel * (q % 3) + q // 3
    g_short = jnp.where(swin == 0, gw[0], jnp.where(swin == 1, gw[1], gw[2]))

    lband = maps["long_band"][None, None, :]
    band_in = jnp.where(long_proc, lband,
                        jnp.where(short_proc, sband, jnp.int32(-1)))
    # static-index expansions ride the MXU as one-hot f32 matmuls (a device
    # gather here walks elements).  Precision.HIGHEST is REQUIRED: values
    # like gains (-300..+500) and il masks (up to 2^15-1) are f32-exact but
    # NOT bf16-exact, and TPU default matmul precision is bf16-based
    import jax.lax as _lax
    HI = _lax.Precision.HIGHEST
    long_band_np = np.asarray(maps["long_band"])
    oh_l22 = jnp.asarray(np.eye(22, dtype=np.float32)[long_band_np].T)  # [22,N]
    g_long = jnp.einsum("bcj,jt->bct", gain_l.astype(jnp.float32),
                        oh_l22, precision=HI).astype(jnp.int32)
    gain = jnp.where(long_proc, g_long, jnp.where(short_proc, g_short, 0))
    win_in = jnp.where(short_proc, swin, 0)
    processed = long_proc | short_proc
    invperm = jnp.where(short_proc, short_base[..., None] + sinv,
                        idx[None, None, :])

    bo_l_np = np.asarray(maps["band_out_l"])
    bo_s_np = np.asarray(maps["band_out_s"])
    wo_np = np.asarray(maps["win_out"])
    bo_l = maps["band_out_l"]
    bo_s = maps["band_out_s"]
    wo = maps["win_out"]
    # output-order right-channel params: indices are format-STATIC, so each
    # is one [B,K] @ [K,N] one-hot matmul (MXU) instead of a device gather
    oh23 = np.zeros((23, N), np.float32)
    oh23[np.clip(bo_l_np, 0, 22), np.arange(N)] = (bo_l_np >= 0)
    oh39 = np.zeros((39, N), np.float32)
    oh39[np.clip(bo_s_np * 3 + wo_np, 0, 38), np.arange(N)] = (bo_s_np >= 0)
    oh13 = np.zeros((13, N), np.float32)
    oh13[np.clip(bo_s_np, 0, 12), np.arange(N)] = (bo_s_np >= 0)
    f32 = jnp.float32
    sf_right_l = jnp.einsum("bj,jt->bt", sfl1.astype(f32), jnp.asarray(oh23), precision=HI).astype(jnp.int32)
    sf_right_s = jnp.einsum("bj,jt->bt", sfs1.astype(f32), jnp.asarray(oh39), precision=HI).astype(jnp.int32)
    il_out_l = jnp.einsum("bj,jt->bt", il_long.astype(f32), jnp.asarray(oh23), precision=HI).astype(jnp.int32)
    il_out_s = jnp.einsum("bj,jt->bt", il_short.astype(f32), jnp.asarray(oh13), precision=HI).astype(jnp.int32)

    bc = lambda a: jnp.broadcast_to(a[None], (B,) + a.shape)
    return dict(
        gain=gain, band_in=band_in, win_in=win_in, is_long_in=long_proc,
        processed=processed, invperm=invperm, short_base=short_base,
        cb_start_s=cb_start_s,
        has_short=has_short, cb_type=cb_type, out_nzb_short=pe_s,
        band_out_l=bc(bo_l), band_out_s=bc(bo_s), win_out=bc(wo),
        sf_right_l=sf_right_l, sf_right_s=sf_right_s, il_out_l=il_out_l,
        il_out_s=il_out_s, sfb_l=bc(maps["sfb_l"]), sfb_s=bc(maps["sfb_s"]),
        mode_ext=scalars[:, 0], ver_is_mpeg1=scalars[:, 1].astype(bool),
        intensity_scale=scalars[:, 2],
    )


class MP3Decoder:
    """Drop-in equivalent of the reference Helix public API, device-accelerated.

    See ``decode`` (== MP3Decode), ``get_last_frame_info``,
    ``get_next_frame_info``, ``find_sync_word``.
    """

    def __init__(self):
        from .flac import _require_x64

        _require_x64("MP3Decoder")
        self._lib = host_lib()
        self._ctx = self._lib.eal_mp3_create()
        self._last_frame = None
        # carried device-side state (per channel)
        self._over = np.zeros((2, 288), np.int32)
        self._prev_type = np.zeros(2, np.int32)
        self._prev_win_switch = np.zeros(2, np.int32)
        self._num_prev = np.zeros(2, np.int32)
        self._vbuf = np.zeros(2 * 1088, np.int32)
        self._vindex = 0

    def __del__(self):
        try:
            self._lib.eal_mp3_destroy(self._ctx)
        except Exception:
            pass

    # -------------------------------------------------------- checkpointing
    def get_state(self) -> dict:
        """Serializable snapshot of all carried decode state (SURVEY.md §5
        checkpoint/resume): the native front-end image (including the bit
        reservoir that carries cross-frame main data) + the device-side
        overlap/FIFO tensors. Restore with :meth:`set_state`; decoding then
        continues bit-identically to an uninterrupted run."""
        n = self._lib.eal_mp3_state_size(self._ctx)
        buf = np.zeros(n, np.uint8)
        if self._lib.eal_mp3_state_save(
                self._ctx, buf.ctypes.data_as(C.POINTER(C.c_uint8)), n) != 0:
            raise RuntimeError("MP3 state save failed")
        return {"native": buf.tobytes(),
                "over": np.asarray(self._over).copy(),
                "prev_type": np.asarray(self._prev_type).copy(),
                "prev_win_switch": np.asarray(self._prev_win_switch).copy(),
                "num_prev": np.asarray(self._num_prev).copy(),
                "vbuf": np.asarray(self._vbuf).copy(),
                "vindex": self._vindex}

    def _native_snapshot(self) -> bytes:
        """Native front-end image only (reservoir, headers) — the part of
        state a host parse mutates; used to roll back a parse whose results
        turn out unusable (see BatchedMP3Decoder.decode_run to_device)."""
        n = self._lib.eal_mp3_state_size(self._ctx)
        buf = np.zeros(n, np.uint8)
        if self._lib.eal_mp3_state_save(
                self._ctx, buf.ctypes.data_as(C.POINTER(C.c_uint8)), n) != 0:
            raise RuntimeError("MP3 state save failed")
        return buf.tobytes()

    def _native_restore(self, blob: bytes) -> None:
        data = np.frombuffer(blob, np.uint8)
        if self._lib.eal_mp3_state_load(
                self._ctx, data.ctypes.data_as(C.POINTER(C.c_uint8)), data.size) != 0:
            raise RuntimeError("MP3 state load failed (bad/incompatible blob)")

    def set_state(self, state: dict) -> None:
        data = np.frombuffer(state["native"], np.uint8)
        if self._lib.eal_mp3_state_load(
                self._ctx, data.ctypes.data_as(C.POINTER(C.c_uint8)), data.size) != 0:
            raise RuntimeError("MP3 state load failed (bad/incompatible blob)")
        self._over = np.asarray(state["over"], np.int32)
        self._prev_type = np.asarray(state["prev_type"], np.int32)
        self._prev_win_switch = np.asarray(state["prev_win_switch"], np.int32)
        self._num_prev = np.asarray(state["num_prev"], np.int32)
        self._vbuf = np.asarray(state["vbuf"], np.int32)
        self._vindex = int(state["vindex"])

    @staticmethod
    def find_sync_word(buf: bytes) -> int:
        b = np.frombuffer(buf, np.uint8)
        return host_lib().eal_mp3_find_sync_word(b.ctypes.data_as(C.POINTER(C.c_uint8)), b.size)

    def parse_frame(self, buf: bytes, use_size: bool = False):
        """Run the serial front-end on one frame; returns raw stage tensors."""
        b = np.frombuffer(buf, np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
        huff = np.zeros(2 * 2 * MAX_NSAMP, np.int32)
        params = np.zeros(2 * 2 * 24, np.int32)
        sf = np.zeros(2 * 2 * 62, np.int32)
        frame = np.zeros(16, np.int32)
        sfjs = np.zeros(8, np.int32)
        consumed = C.c_int32(0)
        clear = C.c_int32(0)
        err_gr = C.c_int32(0)
        err = self._lib.eal_mp3_parse_frame(
            self._ctx, b.ctypes.data_as(C.POINTER(C.c_uint8)), b.size, int(use_size),
            huff.ctypes.data_as(_i32p), params.ctypes.data_as(_i32p), sf.ctypes.data_as(_i32p),
            frame.ctypes.data_as(_i32p), sfjs.ctypes.data_as(_i32p),
            C.byref(consumed), C.byref(clear), C.byref(err_gr))
        self._last_frame = frame
        return (MP3Error(err), huff.reshape(2, 2, MAX_NSAMP), params.reshape(2, 2, 24),
                sf.reshape(2, 2, 62), frame, sfjs, consumed.value, bool(clear.value),
                err_gr.value)

    def get_last_frame_info(self):
        """MP3GetLastFrameInfo equivalent (reference :8613-8634): info from
        the most recently parsed frame's stored state; all-zero fields before
        any successful Layer-III header parse (like the reference)."""
        info = np.zeros(7, np.int32)
        self._lib.eal_mp3_last_frame_info(self._ctx, info.ctypes.data_as(_i32p))
        return {
            "bitrate": int(info[0]), "nChans": int(info[1]), "samprate": int(info[2]),
            "bitsPerSample": int(info[3]), "outputSamps": int(info[4]),
            "layer": int(info[5]), "version": int(info[6]),
        }

    def get_next_frame_info(self, buf: bytes):
        b = np.frombuffer(buf, np.uint8)
        info = np.zeros(7, np.int32)
        err = self._lib.eal_mp3_frame_info(self._ctx, b.ctypes.data_as(C.POINTER(C.c_uint8)),
                                           info.ctypes.data_as(_i32p))
        return MP3Error(err), {
            "bitrate": int(info[0]), "nChans": int(info[1]), "samprate": int(info[2]),
            "bitsPerSample": int(info[3]), "outputSamps": int(info[4]),
            "layer": int(info[5]), "version": int(info[6]),
        }

    def decode(self, buf: bytes, use_size: bool = False):
        """MP3Decode equivalent: one frame -> (error, int16 PCM, consumed bytes).

        On bad frames returns zeroed PCM like MP3ClearBadFrame
        (reference :8677-8685) when the frame size was known.
        """
        from . import mp3_pipeline  # device stages (separate module)

        err, huff, params, sf, frame, sfjs, consumed, clear, err_gr = self.parse_frame(buf, use_size)
        ngr, nch, ngs = int(frame[6]), int(frame[5]), int(frame[7])
        state = (self._over, self._prev_type, self._prev_win_switch, self._num_prev,
                 self._vbuf, self._vindex)
        self.last_frame_reference_defined = True
        if err != MP3Error.NONE:
            # The reference decodes granule-by-granule: granules before the
            # failing one have already updated the overlap/vbuf state even
            # though the frame's PCM is zero-filled (MP3ClearBadFrame,
            # reference :8677-8685, :8807-8854). Mirror that.
            if err_gr > 0:
                _, state, rdef = mp3_pipeline.decode_granules(
                    huff, params, sf, frame, sfjs, state, n_granules=err_gr)
                self.last_frame_reference_defined = rdef
                (self._over, self._prev_type, self._prev_win_switch, self._num_prev,
                 self._vbuf, self._vindex) = state
            pcm = np.zeros(ngr * ngs * nch, np.int16) if clear else None
            return err, pcm, consumed
        pcm, state, rdef = mp3_pipeline.decode_granules(huff, params, sf, frame, sfjs, state)
        self.last_frame_reference_defined = rdef
        (self._over, self._prev_type, self._prev_win_switch, self._num_prev,
         self._vbuf, self._vindex) = state
        return err, pcm, consumed
