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

from ..runtime.native import host_lib
from ..utils.errors import FLACDecoderResult, MP3Error
from .flac import FLACDecoder, _decode_streams
from .mp3 import MP3Decoder
from . import mp3_pipeline

_i32p = C.POINTER(C.c_int32)

__all__ = ["BatchedFLACDecoder", "BatchedMP3Decoder"]

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

    def __init__(self, n_streams: int):
        self.decoders = [FLACDecoder() for _ in range(n_streams)]

    def read_headers(self, blobs):
        """Parse headers for all streams; returns list of FLACDecoderResult."""
        return [d.read_header(b) for d, b in zip(self.decoders, blobs)]

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
        return _decode_streams(self.decoders, buffers, verify_md5)


class BatchedMP3Decoder:
    """Decode many independent MP3 streams in lockstep.

    Each stream keeps its own Helix-equivalent front-end (sync, side info,
    Huffman, bit reservoir are serial per stream); granule synthesis then
    runs through ``decode_granules_batch`` with streams folded into device
    lanes.  Streams are grouped per step by (version, samplerate index,
    channels, FIFO parity, granules-to-run) so each group is one batched
    dispatch; outputs are bit-identical to per-stream decoding.
    """

    def __init__(self, n_streams: int):
        self.decoders = [MP3Decoder() for _ in range(n_streams)]
        self.last_frame_reference_defined = [True] * n_streams
        # carried numeric state lives ON DEVICE, batch-stacked (the SoA
        # batch-major layout of SURVEY.md §2 #17): a tunneled chip makes
        # per-frame host round-trips of state the dominant cost otherwise.
        N = n_streams
        self._over = jnp.zeros((N, 2, 288), jnp.int32)
        self._pt = jnp.zeros((N, 2), jnp.int32)
        self._pws = jnp.zeros((N, 2), jnp.int32)
        self._npv = jnp.zeros((N, 2), jnp.int32)
        self._vbuf = jnp.zeros((N, 2176), jnp.int32)
        self._vindex = [0] * N

    def _gather_state(self, streams):
        arrs = (self._over, self._pt, self._pws, self._npv, self._vbuf)
        if len(streams) == len(self.decoders) and streams == list(range(len(streams))):
            return arrs                      # whole-batch fast path: no gather
        idx = jnp.asarray(np.asarray(streams, np.int32))
        return tuple(jnp.take(a, idx, axis=0) for a in arrs)

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

    def decode(self, buffers, use_size=False):
        """One frame per stream: returns list of (err, pcm|None, consumed).

        Pass None for a stream to skip it this step (its state is kept).
        Semantics per stream match ``MP3Decoder.decode`` exactly, including
        MP3ClearBadFrame zero-fill and partial-granule state updates on
        mid-frame errors (reference mp3_decoder.cpp:8677-8685, 8807-8854).
        """
        n = len(self.decoders)
        assert len(buffers) == n
        results = [None] * n
        work = {}   # group key -> list of (stream, parse tuple, ngr_run)
        for s, (dec, buf) in enumerate(zip(self.decoders, buffers)):
            if buf is None:
                continue
            p = dec.parse_frame(buf, use_size)
            err, huff, params, sf, frame, sfjs, consumed, clear, err_gr = p
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
                vindex, ngr_run)
            self._scatter_state(streams, new_state)
            new_vindex = mp3_pipeline._advance_vindex(vindex, ngr_run)
            # the ONLY per-group syncs: PCM + the reference-UB flags
            pcm_np = np.asarray(pcm)
            undef = np.asarray(ref_undef)
            for k, (s, p, _) in enumerate(items):
                self._vindex[s] = new_vindex
                self.last_frame_reference_defined[s] = not bool(undef[k])
                if results[s] is None:   # success path: emit PCM
                    results[s] = (MP3Error.NONE, pcm_np[k].reshape(-1), p[6])
        return results
