"""Batched multi-stream decoders: the framework's data-parallel serving layer.

The reference is one-decoder-instance-per-stream and leaves parallelism to
the caller (SURVEY.md §2 parallelism table; all state lives in the decoder
structs, include/mp3_decoder.h:303-336, include/flac_decoder.h).  On TPU the
batch IS the first-class axis: these classes keep one native bitstream
front-end per stream on the host, then fold every stream's numeric work into
the lane dimension of the shared device kernels, so one device dispatch
decodes a whole fleet of streams.

Streams are grouped per step by the static shapes a kernel instance needs
(FLAC: block size x depth x channels; MP3: version x samplerate x channels x
FIFO parity) — the shape-bucketed-routing analog of expert parallelism
noted in SURVEY.md §2.  Within a bucket everything is one batched call.
"""

from __future__ import annotations

import numpy as np

import ctypes as C

from ..parallel import mesh as mesh_mod
from ..runtime import transport
from ..runtime.native import host_lib
from ..utils.errors import FLACDecoderResult, MP3Error
from .flac import (FLACDecoder, _decode_streams, decode_streams_to_device,
                   decode_streams_to_device_grouped)
from .mp3 import MP3Decoder
from . import mp3_pipeline

_i32p = C.POINTER(C.c_int32)

__all__ = ["BatchedFLACDecoder", "BatchedMP3Decoder", "MP3RunResult",
           "MP3DeviceRunResult"]


class MP3RunResult(list):
    """``decode_run`` host result: list over streams of per-frame
    ``(err, pcm|None, consumed)`` tuples, plus ``next_pos``.

    ``next_pos[s]`` is the offset INTO THE BUFFER PASSED FOR STREAM s where
    the next run starts.  It is NOT ``sum(consumed)``: after each successful
    frame the run internally plays the reference caller protocol and skips
    reservoir slack to the next sync word (MP3FindSyncWord, reference
    mp3_decoder.cpp:8533), bytes that appear in no frame's ``consumed``.
    Sequential callers must advance with ``next_pos`` — advancing by summed
    ``consumed`` lands inside the slack of real reservoir streams and the
    next run reports a spurious INVALID_FRAMEHEADER.  After an error frame
    (which ends that stream's run) ``next_pos`` points just past the
    consumed bytes with no sync skip, exactly where the reference caller
    would resync from.
    """

    def __init__(self, items, next_pos):
        super().__init__(items)
        self.next_pos = list(next_pos)


class MP3DeviceRunResult(tuple):
    """``decode_run(to_device=True)`` result: unpacks as the documented
    ``(pcm_dev, consumed_list)`` 2-tuple, with the same ``next_pos``
    attribute as :class:`MP3RunResult` for sequential callers."""

    def __new__(cls, pcm, consumed, next_pos):
        self = super().__new__(cls, (pcm, consumed))
        self.next_pos = list(next_pos)
        return self

import jax
import jax.numpy as jnp


class BatchedFLACDecoder:
    """Decode many independent FLAC streams with shared batched kernels.

    Each stream has its own host front-end (sync/header/Rice parsing is
    bitstream-serial); frames from ALL streams are bucketed by
    (block_size, depth, channels, 32-bit mode) and each bucket runs as ONE
    device call through the same ``_frame_kernel`` the single-stream
    ``FLACDecoder.decode_stream`` uses — identical math, so outputs are
    bit-identical to decoding each stream alone.
    """

    def __init__(self, n_streams: int, mesh=None):
        """``mesh``: optional ``parallel.mesh.stream_mesh`` — when given, the
        frame buckets' residual uploads land sharded across the mesh and the
        frame kernel runs SPMD (one shard of frames per chip); ragged buckets
        whose size doesn't divide the mesh fall back to single-device."""
        self.decoders = [FLACDecoder() for _ in range(n_streams)]
        self.mesh = mesh

    def read_headers(self, blobs):
        """Parse headers for all streams; returns list of FLACDecoderResult."""
        return [d.read_header(b) for d, b in zip(self.decoders, blobs)]

    def reset_stream(self, s: int) -> None:
        """Recycle slot ``s`` for a NEW stream (continuous-batching slot
        reuse).  FLAC carries all per-stream state in the host front-end
        (the device frame kernels are stateless per bucket), so a fresh
        decoder is the whole reset; call :meth:`read_headers`-equivalent
        ``self.decoders[s].read_header(blob)`` for the new stream next."""
        self.decoders[s] = FLACDecoder()

    def decode_streams(self, buffers, verify_md5: bool = True):
        """Decode all streams' frame sections (bytes after the header).

        One native call per stream parses every frame straight into shared
        batch tables (``eal_flac_parse_stream``), frames from ALL streams
        bucket by kernel shape, and each bucket is one device dispatch — see
        ``models.flac._decode_streams`` for the shared implementation.

        Args:
          buffers: per-stream bytes (pass None to skip a stream).
        Returns: list of per-stream (pcm_bytes, results-dict) like
          ``FLACDecoder.decode_stream``.
        """
        return _decode_streams(self.decoders, buffers, verify_md5,
                               mesh=self.mesh)

    def decode_streams_to_device(self, buffers):
        """Uniform-fleet decode leaving the packed PCM ON DEVICE — the
        composition path for decode -> resample chains (see
        ``models.flac.decode_streams_to_device``).  With a mesh, the PCM
        comes back stream-sharded, ready for a sharded resample stage."""
        return decode_streams_to_device(self.decoders, buffers, mesh=self.mesh)

    def decode_streams_to_device_grouped(self, buffers):
        """Mixed-fleet decode leaving PCM on device, grouped by frame-shape
        signature (``models.flac.decode_streams_to_device_grouped``): a
        non-uniform fleet keeps the no-host-round-trip composition win —
        consumers (e.g. per-group Resamplers) process each rectangular
        group block in turn."""
        return decode_streams_to_device_grouped(self.decoders, buffers,
                                                mesh=self.mesh)

    # ---------------------------------------------------------- checkpoint
    def get_state(self) -> dict:
        """Serializable snapshot of the WHOLE fleet, symmetric with
        :meth:`BatchedMP3Decoder.get_state` (SURVEY.md §5 checkpoint/resume
        at the serving layer).  FLAC carries all per-stream state in the
        host front-end (STREAMINFO, partial-header resume, CRC toggle —
        reference flac_decoder.h:485-490; the device frame kernels are
        stateless per bucket), so the fleet snapshot is the per-stream
        state list.  Restore with :meth:`set_state` into a
        ``BatchedFLACDecoder`` of the same width."""
        return {"streams": [d.get_state() for d in self.decoders]}

    def set_state(self, state: dict) -> None:
        if len(state["streams"]) != len(self.decoders):
            raise ValueError(
                f"state holds {len(state['streams'])} streams, decoder has "
                f"{len(self.decoders)}")
        for d, s in zip(self.decoders, state["streams"]):
            d.set_state(s)


class BatchedMP3Decoder:
    """Decode many independent MP3 streams in lockstep.

    Each stream keeps its own Helix-equivalent front-end (sync, side info,
    Huffman, bit reservoir are serial per stream); granule synthesis then
    runs through ``decode_granules_batch`` with streams folded into device
    lanes.  Streams are grouped per step by (version, samplerate index,
    channels, FIFO parity, granules-to-run) so each group is one batched
    dispatch; outputs are bit-identical to per-stream decoding.
    """

    def __init__(self, n_streams: int, mesh=None, fast=False):
        """``mesh``: optional ``parallel.mesh.stream_mesh`` — when given, the
        fleet's carried device state and every per-run upload are placed
        stream-sharded across the mesh, so the fused granule scan runs SPMD
        (one shard of streams per chip).  ``n_streams`` should be a multiple
        of the mesh size (XLA requires evenly divisible shardings).

        ``fast``: opt-in relaxed-precision tier (the resampler exact/fast
        duality): granule synthesis runs the f32 value-mirror pipeline
        (ops/mp3fast.py) — <= 1 LSB int16 vs the exact path on decodable
        streams (tests/test_mp3_fast.py), NOT bit-exact, and the
        reference-UB detector (``last_frame_reference_defined``) is inert
        (always True).  Carried ``over``/``vbuf`` device state rides f32;
        checkpoints interconvert between tiers by value (see set_state)."""
        self.decoders = [MP3Decoder() for _ in range(n_streams)]
        self.last_frame_reference_defined = [True] * n_streams
        self.mesh = mesh
        self.fast = bool(fast)
        if mesh is not None and n_streams % mesh.size != 0:
            raise ValueError(
                f"n_streams={n_streams} must be a multiple of the mesh size "
                f"({mesh.size}) for even stream sharding")
        # carried numeric state lives ON DEVICE, batch-stacked (the SoA
        # batch-major layout of SURVEY.md §2 #17): a tunneled chip makes
        # per-frame host round-trips of state the dominant cost otherwise.
        N = n_streams
        place = ((lambda x: x) if mesh is None
                 else (lambda x: mesh_mod.shard_streams(x, mesh)))
        num_dt = jnp.float32 if self.fast else jnp.int32
        self._over = place(jnp.zeros((N, 2, 288), num_dt))
        self._pt = place(jnp.zeros((N, 2), jnp.int32))
        self._pws = place(jnp.zeros((N, 2), jnp.int32))
        self._npv = place(jnp.zeros((N, 2), jnp.int32))
        self._vbuf = place(jnp.zeros((N, 2176), num_dt))
        self._vindex = [0] * N

    def _group_mesh(self, n_group: int):
        """The mesh for a dispatch group, or None when the group can't shard
        evenly (ragged sub-fleets fall back to unsharded dispatch — only the
        uniform serving case rides the mesh)."""
        if self.mesh is not None and n_group % self.mesh.size == 0:
            return self.mesh
        return None

    def _gather_state(self, streams):
        arrs = (self._over, self._pt, self._pws, self._npv, self._vbuf)
        if len(streams) == len(self.decoders) and streams == list(range(len(streams))):
            return arrs                      # whole-batch fast path: no gather
        idx = jnp.asarray(np.asarray(streams, np.int32))
        picked = tuple(jnp.take(a, idx, axis=0) for a in arrs)
        gmesh = self._group_mesh(len(streams))
        if gmesh is not None:   # keep sub-fleet state evenly stream-sharded
            picked = tuple(mesh_mod.shard_streams(a, gmesh) for a in picked)
        return picked

    def _scatter_state(self, streams, new_state):
        if len(streams) == len(self.decoders) and streams == list(range(len(streams))):
            self._over, self._pt, self._pws, self._npv, self._vbuf = new_state
            return
        idx = jnp.asarray(np.asarray(streams, np.int32))
        self._over = self._over.at[idx].set(new_state[0])
        self._pt = self._pt.at[idx].set(new_state[1])
        self._pws = self._pws.at[idx].set(new_state[2])
        self._npv = self._npv.at[idx].set(new_state[3])
        self._vbuf = self._vbuf.at[idx].set(new_state[4])

    # ------------------------------------------------------- slot recycling
    def reset_stream(self, s: int) -> None:
        """Recycle slot ``s`` for a NEW stream (continuous-batching slot
        reuse): fresh native front-end (bit reservoir, sync state), zeroed
        device carried-state row, FIFO parity back to 0.  Other slots are
        untouched — the in-place row scatter preserves the batch layout and
        any stream sharding, so a long-lived serving fleet admits new
        streams without re-creating the fleet or disturbing its neighbors.
        The reference has no analog: a "new stream" there is a new decoder
        instance (MP3InitDecoder, reference mp3_decoder.cpp:8491-8509)."""
        self.decoders[s] = MP3Decoder()
        self.last_frame_reference_defined[s] = True
        self._vindex[s] = 0
        self._over = self._over.at[s].set(0)
        self._pt = self._pt.at[s].set(0)
        self._pws = self._pws.at[s].set(0)
        self._npv = self._npv.at[s].set(0)
        self._vbuf = self._vbuf.at[s].set(0)

    # ---------------------------------------------------------- checkpoint
    def get_state(self) -> dict:
        """Serializable snapshot of the WHOLE fleet (SURVEY.md §5
        checkpoint/resume at the serving layer): per-stream native front-end
        images (bit reservoir included) + the batch-stacked device tensors,
        synced once.  Restore with :meth:`set_state` into a
        ``BatchedMP3Decoder`` of the same width; decoding then continues
        bit-identically to an uninterrupted run."""
        return {
            "native": [d.get_state()["native"] for d in self.decoders],
            "over": np.asarray(self._over).copy(),
            "pt": np.asarray(self._pt).copy(),
            "pws": np.asarray(self._pws).copy(),
            "npv": np.asarray(self._npv).copy(),
            "vbuf": np.asarray(self._vbuf).copy(),
            "vindex": list(self._vindex),
            "ref_defined": list(self.last_frame_reference_defined),
        }

    def set_state(self, state: dict) -> None:
        if len(state["native"]) != len(self.decoders):
            raise ValueError(
                f"state holds {len(state['native'])} streams, decoder has {len(self.decoders)}")
        for d, blob in zip(self.decoders, state["native"]):
            data = np.frombuffer(blob, np.uint8)
            if d._lib.eal_mp3_state_load(
                    d._ctx, data.ctypes.data_as(C.POINTER(C.c_uint8)), data.size) != 0:
                raise RuntimeError("MP3 state load failed (bad/incompatible blob)")
        place = ((lambda x: jnp.asarray(x)) if self.mesh is None
                 else (lambda x: mesh_mod.shard_streams(x, self.mesh)))
        num_dt = np.float32 if self.fast else np.int32

        def conv(a):
            # snapshots interconvert between tiers BY VALUE (the f32 tensors
            # mirror the exact path's integer values): round, don't truncate
            a = np.asarray(a)
            if a.dtype.kind == "f" and num_dt == np.int32:
                a = np.rint(np.clip(a, -2 ** 31, 2 ** 31 - 1))
            return a.astype(num_dt)

        self._over = place(conv(state["over"]))
        self._pt = place(np.asarray(state["pt"], np.int32))
        self._pws = place(np.asarray(state["pws"], np.int32))
        self._npv = place(np.asarray(state["npv"], np.int32))
        self._vbuf = place(conv(state["vbuf"]))
        self._vindex = list(state["vindex"])
        self.last_frame_reference_defined = list(state["ref_defined"])

    def _parse_batch(self, views, use_size=False):
        """Serial front-ends for the whole fleet in ONE native crossing
        (eal_mp3_parse_frame_batch); outputs land batch-stacked.

        views: per-stream np.uint8 views (zero-copy slices) or None to skip.
        Returns a dict of batch arrays; rc == INT32_MIN marks skipped rows.
        """
        n = len(self.decoders)
        lib = host_lib()
        out = {
            "huff": np.zeros((n, 2, 2, 576), np.int32),
            "params": np.zeros((n, 2, 2, 24), np.int32),
            "sf": np.zeros((n, 2, 2, 62), np.int32),
            "frame": np.zeros((n, 16), np.int32),
            "sfjs": np.zeros((n, 8), np.int32),
            "consumed": np.zeros(n, np.int32),
            "clear": np.zeros(n, np.int32),
            "err_gr": np.zeros(n, np.int32),
            "rc": np.full(n, np.iinfo(np.int32).min, np.int32),
        }
        ctxs = (C.c_void_p * n)()
        u8p = C.POINTER(C.c_uint8)
        bufp = (u8p * n)()
        lens = np.zeros(n, np.int32)
        for s, (dec, b) in enumerate(zip(self.decoders, views)):
            if b is None:
                continue
            ctxs[s] = dec._ctx
            bufp[s] = b.ctypes.data_as(u8p)
            lens[s] = b.size
        lib.eal_mp3_parse_frame_batch(
            n, ctxs, bufp, lens.ctypes.data_as(_i32p), int(use_size),
            out["huff"].ctypes.data_as(_i32p), out["params"].ctypes.data_as(_i32p),
            out["sf"].ctypes.data_as(_i32p), out["frame"].ctypes.data_as(_i32p),
            out["sfjs"].ctypes.data_as(_i32p), out["consumed"].ctypes.data_as(_i32p),
            out["clear"].ctypes.data_as(_i32p), out["err_gr"].ctypes.data_as(_i32p),
            out["rc"].ctypes.data_as(_i32p))
        return out

    @staticmethod
    def _as_view(buf):
        if buf is None:
            return None
        return (np.frombuffer(buf, np.uint8)
                if isinstance(buf, (bytes, bytearray)) else np.ascontiguousarray(buf))

    @staticmethod
    def _sync_ahead(view, pos: int) -> int:
        """Advance ``pos`` to the next frame sync word (the reference caller
        protocol: MP3Decode consumes only the main data it used, so real
        streams leave reservoir slack bytes before the next header and the
        caller runs MP3FindSyncWord each iteration — reference
        mp3_decoder.cpp:8533-8568).  Returns ``view.size`` when no further
        sync exists (clean end of stream)."""
        if pos >= view.size:
            return view.size
        sub = view[pos:]
        off = host_lib().eal_mp3_find_sync_word(
            sub.ctypes.data_as(C.POINTER(C.c_uint8)), sub.size)
        return pos + off if off >= 0 else view.size

    def decode(self, buffers, use_size=False):
        """One frame per stream: returns list of (err, pcm|None, consumed).

        Pass None for a stream to skip it this step (its state is kept).
        Semantics per stream match ``MP3Decoder.decode`` exactly, including
        MP3ClearBadFrame zero-fill and partial-granule state updates on
        mid-frame errors (reference mp3_decoder.cpp:8677-8685, 8807-8854).
        """
        n = len(self.decoders)
        assert len(buffers) == n
        views = [self._as_view(b) for b in buffers]
        pa = self._parse_batch(views, use_size)
        huffs, paramss, sfs = pa["huff"], pa["params"], pa["sf"]
        frames, sfjss = pa["frame"], pa["sfjs"]
        consumed_a, clear_a, err_gr_a, rcs = (pa["consumed"], pa["clear"],
                                              pa["err_gr"], pa["rc"])

        results = [None] * n
        work = {}   # group key -> list of (stream, parse tuple, ngr_run)
        skip = np.iinfo(np.int32).min
        for s, dec in enumerate(self.decoders):
            if rcs[s] == skip:
                continue
            err = MP3Error(int(rcs[s]))
            huff, params, sf, frame, sfjs = (huffs[s], paramss[s], sfs[s],
                                             frames[s], sfjss[s])
            dec._last_frame = frame
            consumed, clear, err_gr = int(consumed_a[s]), bool(clear_a[s]), int(err_gr_a[s])
            p = (err, huff, params, sf, frame, sfjs, consumed, clear, err_gr)
            ngr, nch, ngs = int(frame[6]), int(frame[5]), int(frame[7])
            self.last_frame_reference_defined[s] = True
            if err != MP3Error.NONE:
                results[s] = (err, np.zeros(ngr * ngs * nch, np.int16) if clear else None,
                              consumed)
                ngr_run = err_gr if err_gr > 0 else 0
            else:
                ngr_run = ngr
            if ngr_run > 0:
                key = (int(frame[0]), int(frame[4]), nch, self._vindex[s], ngr_run)
                work.setdefault(key, []).append((s, p, ngr_run))

        for (ver, sr_idx, nch, vindex, ngr_run), items in work.items():
            streams = [s for s, _, _ in items]
            huff = np.stack([p[1] for _, p, _ in items])
            params = np.stack([p[2] for _, p, _ in items])
            sf = np.stack([p[3] for _, p, _ in items])
            frame = np.stack([p[4] for _, p, _ in items])
            sfjs = np.stack([p[5] for _, p, _ in items])
            pcm, new_state, ref_undef = mp3_pipeline.decode_granules_batch_dev(
                huff, params, sf, frame, sfjs, self._gather_state(streams),
                vindex, ngr_run, mesh=self._group_mesh(len(streams)),
                fast=self.fast)
            self._scatter_state(streams, new_state)
            new_vindex = mp3_pipeline._advance_vindex(vindex, ngr_run)
            # the ONLY per-group sync: PCM + the reference-UB flags, pulled
            # together in one round trip
            pcm_np, undef = jax.device_get((pcm, ref_undef))
            for k, (s, p, _) in enumerate(items):
                self._vindex[s] = new_vindex
                self.last_frame_reference_defined[s] = not bool(undef[k])
                if results[s] is None:   # success path: emit PCM
                    results[s] = (MP3Error.NONE, pcm_np[k].reshape(-1), p[6])
        return results

    @staticmethod
    def _peek_format(view, pos):
        """(ver, sr_idx, nch) from the 4 header bytes at pos, or None when
        they can't be a Layer III header (the real parse then reports the
        error).  Field layout per ISO/IEC 11172-3 §2.4.1.3."""
        if pos + 4 > view.size:
            return None
        b1, b2, b3 = int(view[pos + 1]), int(view[pos + 2]), int(view[pos + 3])
        if int(view[pos]) != 0xFF or (b1 & 0xF0) != 0xF0:
            return None
        ver_idx = (b1 >> 3) & 0x03
        ver = 2 if ver_idx == 0 else (0 if (ver_idx & 1) else 1)
        sr_idx = (b2 >> 2) & 0x03
        nch = 1 if ((b3 >> 6) & 0x03) == 3 else 2
        return (ver, sr_idx, nch)

    def decode_run(self, buffers, n_frames, use_size=False, to_device=False):
        """Serving-rate API: decode up to ``n_frames`` sequential frames per
        stream, synthesizing each format group's WHOLE run of granules as a
        single fused device dispatch (mp3_pipeline.decode_granules_run) —
        behind a high-latency transport this amortizes the per-step
        upload/dispatch/sync round trips that dominate :meth:`decode`.

        Per-frame semantics are identical to repeated :meth:`decode` calls
        with the reference caller protocol between frames: after each
        successful frame the run skips reservoir slack to the next sync word
        (MP3FindSyncWord, reference mp3_decoder.cpp:8533) — real streams
        under-consume their frame slot whenever the next frame's reservoir
        backreference covers it.  A stream's run ends early at its first
        error frame (the error entry is included and carried state reflects
        the reference's partial-granule synthesis), at end of buffer, or
        before a mid-stream format change (rare; the next call picks it up).
        ``last_frame_reference_defined`` aggregates over the whole run.

        Error recovery: if a dispatch or download raises mid-run, the
        fleet's carried state stays coherent (per-slice vindex commits at
        dispatch; pinned by test) but that run's PCM and ``next_pos`` are
        lost and the native reservoirs have advanced — a caller that needs
        retry-the-same-bytes semantics should snapshot with
        :meth:`get_state` before the run and :meth:`set_state` on failure.

        Returns: :class:`MP3RunResult` — a list over streams of lists of
        (err, pcm|None, consumed), with ``next_pos[s]`` giving the buffer
        offset where stream s's NEXT run starts.  Sequential callers must
        advance with ``next_pos``, not summed ``consumed``: the bytes the
        internal sync skips (reservoir slack) appear in no frame's
        ``consumed`` (see MP3RunResult).  With ``to_device=True`` (uniform error-free
        fleets only — one format group covering every stream), returns
        :class:`MP3DeviceRunResult` — unpacks as ``(pcm_dev,
        consumed_list)`` with the same ``next_pos`` attribute; ``pcm_dev``
        is jnp int16 ``[n_streams, run_samples]`` left ON DEVICE for
        pipeline composition (bitcast to uint8 = packed PCM bytes).
        """
        views = [self._as_view(b) for b in buffers]
        if to_device:
            # the to_device preconditions (uniform error-free fleet) are only
            # knowable after parsing, but the parse advances every stream's
            # native bit reservoir — snapshot so a precondition failure
            # leaves the fleet exactly as it was (no silent corruption of
            # subsequent decodes)
            snaps = [(d._native_snapshot(), d._last_frame)
                     for d in self.decoders]
            try:
                parsed = self._parse_run(views, [0] * len(self.decoders),
                                         n_frames, use_size)
                return self._dispatch_run(parsed, to_device)
            except ValueError:
                for d, (blob, lf) in zip(self.decoders, snaps):
                    d._native_restore(blob)
                    d._last_frame = lf
                raise
        parsed = self._parse_run(views, [0] * len(self.decoders), n_frames, use_size)
        return self._dispatch_run(parsed, to_device)

    def _parse_run(self, views, pos, n_frames, use_size=False):
        """Host phase of a run: parse up to n_frames per stream from ``pos``.

        Mutates only native front-end state (reservoirs) — never device
        state — so a worker thread can parse run k+1 while run k's device
        work is in flight (``decode_run_pipelined``). Returns a dict with
        the parses, per-stream frame plans, and advanced positions.
        """
        n = len(self.decoders)
        pos = list(pos)
        active = [v is not None and v.size > pos[i] for i, v in enumerate(views)]
        fmt0 = [None] * n
        perstream = [[] for _ in range(n)]   # (frame_idx, err, clear, consumed, ngr_run)
        parses = []
        skip = np.iinfo(np.int32).min

        for f in range(n_frames):
            ins = [None] * n
            for s in range(n):
                if not active[s]:
                    continue
                fmt = self._peek_format(views[s], pos[s])
                if fmt is not None and fmt0[s] is not None and fmt != fmt0[s]:
                    active[s] = False   # format change: next call handles it
                    continue
                ins[s] = views[s][pos[s]:]
            if not any(v is not None for v in ins):
                break
            pa = self._parse_batch(ins, use_size)
            parses.append(pa)
            fi = len(parses) - 1
            for s in range(n):
                if ins[s] is None or pa["rc"][s] == skip:
                    continue
                err = MP3Error(int(pa["rc"][s]))
                consumed = int(pa["consumed"][s])
                pos[s] += consumed
                self.decoders[s]._last_frame = pa["frame"][s]
                frame = pa["frame"][s]
                if err == MP3Error.NONE:
                    # reference caller protocol: skip reservoir slack to the
                    # next sync word before the next frame
                    pos[s] = self._sync_ahead(views[s], pos[s])
                    ngr_run = int(frame[6])
                    fmt0[s] = (int(frame[0]), int(frame[4]), int(frame[5]))
                else:
                    ngr_run = int(pa["err_gr"][s]) if int(pa["err_gr"][s]) > 0 else 0
                    active[s] = False
                perstream[s].append((fi, err, bool(pa["clear"][s]), consumed, ngr_run))
                if active[s] and pos[s] >= views[s].size:
                    active[s] = False

        return {"parses": parses, "perstream": perstream, "pos": pos}

    def _dispatch_run(self, parsed, to_device=False):
        """Device phase of a run: group, synthesize, and assemble results.

        Mutates device-side carried state and per-stream vindex — call in
        run order (the pipelined driver serializes this phase).
        """
        n = len(self.decoders)
        parses, perstream = parsed["parses"], parsed["perstream"]

        # group streams by (format, starting vindex, total granules) — the
        # schedule sequence is then identical lane-to-lane
        results = [[] for _ in range(n)]
        work = {}
        for s in range(n):
            if not perstream[s]:
                continue
            G = sum(k for *_, k in perstream[s])
            first = parses[perstream[s][0][0]]["frame"][s]
            key = (int(first[0]), int(first[4]), int(first[5]), self._vindex[s], G)
            work.setdefault(key, []).append(s)

        if to_device:
            if len(work) != 1:
                raise ValueError("to_device requires a uniform fleet (one format group)")
            (key, streams), = work.items()
            if len(streams) != n:
                raise ValueError("to_device requires every stream in the group")
            for s2 in range(n):
                if any(e != MP3Error.NONE for _, e, *_ in perstream[s2]):
                    raise ValueError("to_device requires an error-free run")

        from concurrent.futures import ThreadPoolExecutor

        def _assemble(chunk, pcm_np, undef, nch, new_vindex):
            for bi, s in enumerate(chunk):
                self._vindex[s] = new_vindex
                if undef is not None:
                    self.last_frame_reference_defined[s] = not bool(undef[bi])
                off = 0
                for (fi, err, clear, consumed, k) in perstream[s]:
                    frame = parses[fi]["frame"][s]
                    if err == MP3Error.NONE:
                        results[s].append(
                            (err, pcm_np[bi, off:off + k * 576 * nch].copy(), consumed))
                    else:
                        ntot = int(frame[6]) * int(frame[7]) * int(frame[5])
                        results[s].append(
                            (err, np.zeros(ntot, np.int16) if clear else None, consumed))
                    off += k * 576 * nch

        pending = []   # (download future, chunk, nch, new_vindex) in order
        with ThreadPoolExecutor(max_workers=transport.DRAIN_THREADS) as drain:
            for (ver, sr_idx, nch, vindex, G), streams in work.items():
                B = len(streams)
                if G == 0:
                    _assemble(streams, None, None, nch, vindex)
                    continue
                huff_g = np.empty((B, G, 2, 576), np.int32)
                params_g = np.empty((B, G, 2, 24), np.int32)
                sf_g = np.empty((B, G, 2, 62), np.int32)
                frame_g = np.empty((B, G, 16), np.int32)
                sfjs_g = np.empty((B, G, 8), np.int32)
                for bi, s in enumerate(streams):
                    g = 0
                    for (fi, _err, _clear, _con, k) in perstream[s]:
                        pa = parses[fi]
                        huff_g[bi, g:g + k] = pa["huff"][s][:k]
                        params_g[bi, g:g + k] = pa["params"][s][:k]
                        sf_g[bi, g:g + k] = pa["sf"][s][:k]
                        frame_g[bi, g:g + k] = pa["frame"][s]
                        sfjs_g[bi, g:g + k] = pa["sfjs"][s]
                        g += k
                new_vindex = mp3_pipeline._advance_vindex(vindex, G)
                if to_device:
                    pcm, new_state, ref_undef = mp3_pipeline.decode_granules_run(
                        huff_g, params_g, sf_g, frame_g, sfjs_g,
                        self._gather_state(streams), vindex,
                        mesh=self._group_mesh(len(streams)), fast=self.fast)
                    self._scatter_state(streams, new_state)
                    undef = np.asarray(ref_undef)   # tiny [B] bool sync only
                    for bi, s in enumerate(streams):
                        self._vindex[s] = new_vindex
                        self.last_frame_reference_defined[s] = not bool(undef[bi])
                    consumed_list = [sum(c for *_, c, _k in perstream[s])
                                     for s in streams]
                    return MP3DeviceRunResult(pcm, consumed_list,
                                              parsed["pos"])

                # dispatch the group in stream SLICES: each sub-fleet's host
                # packing + upload overlaps the previous slice's PCM download
                # on the drain thread (full-duplex transport — same design
                # and measured ~2x as models/flac._decode_streams); sliced
                # outputs are identical because streams are independent.
                per = B
                if self.mesh is None:
                    # even slices: one compiled sub-fleet shape when B divides
                    n_sl = max(1, -(-B * G * 576 * nch * 2
                                    // transport.MP3_SLICE_PCM_BYTES))
                    per = -(-B // n_sl)
                for c0 in range(0, B, per):
                    chunk = streams[c0:c0 + per]
                    pcm, new_state, ref_undef = mp3_pipeline.decode_granules_run(
                        huff_g[c0:c0 + per], params_g[c0:c0 + per],
                        sf_g[c0:c0 + per], frame_g[c0:c0 + per],
                        sfjs_g[c0:c0 + per],
                        self._gather_state(chunk), vindex,
                        mesh=self._group_mesh(len(chunk)), fast=self.fast)
                    self._scatter_state(chunk, new_state)
                    # commit the host-side vindex the moment the device
                    # state advances — deferring it to the drain loop would
                    # leave the fleet silently desynced if a later slice's
                    # dispatch or download raises (the drain re-set is then
                    # idempotent); last_frame_reference_defined needs the
                    # downloaded flags, so it stays in _assemble
                    for s2 in chunk:
                        self._vindex[s2] = new_vindex
                    pending.append((drain.submit(jax.device_get, (pcm, ref_undef)),
                                    chunk, nch, new_vindex))
            for fut, chunk, nch, new_vindex in pending:
                pcm_np, undef = fut.result()
                _assemble(chunk, pcm_np, undef, nch, new_vindex)
        return MP3RunResult(results, parsed["pos"])

    def decode_run_pipelined(self, buffers, n_frames, n_runs, use_size=False,
                             to_device=False):
        """Generator over ``n_runs`` successive decode_run outputs with the
        host and device phases OVERLAPPED: a worker thread parses run k+1's
        frames (the native batch parse releases the GIL) while run k's
        granules synthesize on device — the host<->device pipeline the
        reference's serial loop can't express (SURVEY.md §2 PP row).

        Per-run outputs are identical to sequential :meth:`decode_run`
        calls (pinned by test); runs end early when every stream is
        exhausted or stopped.  Each yielded result's ``next_pos`` is
        absolute within the ``buffers`` passed here (the generator feeds
        the same views across runs).
        """
        from concurrent.futures import ThreadPoolExecutor

        views = [self._as_view(b) for b in buffers]
        pos = [0] * len(self.decoders)
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(self._parse_run, views, pos, n_frames, use_size)
            for r in range(n_runs):
                parsed = fut.result()
                if not any(parsed["perstream"]):
                    break
                if r + 1 < n_runs:
                    fut = ex.submit(self._parse_run, views, parsed["pos"],
                                    n_frames, use_size)
                yield self._dispatch_run(parsed, to_device)
