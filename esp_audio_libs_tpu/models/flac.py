"""FLAC decoding pipeline: native host front-end + batched device back-end.

Public semantics mirror the reference ``flac::FLACDecoder``
(reference: include/flac_decoder.h, src/decode/flac/flac_decoder.cpp): same
result codes, streaming header protocol, metadata size limits, CRC toggles,
byte accounting, and output packing (native depths and the 32-bit
left-justified mode).

Architecture (SURVEY.md §7.4): the native front-end
(native/src/flac_frontend.cpp) performs everything bitstream-serial — sync,
headers, CRC, Rice decoding — and emits dense residual tensors + predictor
parameters; the device (ops/lpc.py) restores LPC/fixed prediction for whole
batches of subframes, applies wasted-bits shifts and stereo decorrelation,
and packs PCM bytes.  ``decode_frame`` drives one frame end-to-end;
``decode_stream`` batches all equal-sized frames of a stream into single
device calls (the high-throughput path).
"""

from __future__ import annotations

import ctypes as C
import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lpc as lpc_ops
from ..runtime.native import host_lib
from ..utils.errors import FLACDecoderResult, FLACMetadataType

__all__ = ["FLACDecoder"]

_i32p = C.POINTER(C.c_int32)


@functools.partial(jax.jit, static_argnames=("depth", "nch", "mode32"))
def _frame_kernel(data, coeffs, order, shift, wasted, chan_assign, *, depth, nch, mode32):
    """Device back-end for a batch of frames.

    data: int ``[..., C, T]`` (warm-ups + residuals; may arrive int16 when
    the frame's words fit — the batched feed ships the dominant tensor at
    half width), coeffs ``[..., C, 32]``, order/shift/wasted ``[..., C]``,
    chan_assign ``[...]``. Returns packed PCM uint8 ``[..., T*C*bps]``.
    """
    y = lpc_ops.lpc_restore(data.astype(jnp.int32), coeffs, order, shift)
    y = y << wasted[..., None]
    if nch == 2:
        y = lpc_ops.decorrelate(y, chan_assign)
    inter = jnp.swapaxes(y, -1, -2).reshape(*y.shape[:-2], -1)  # [..., T*C]

    if mode32:
        # left-justified 32-bit mode (reference flac_decoder.cpp:245-258)
        samples = inter << (32 - depth)
        nbytes = 4
    else:
        shift_amount = (8 - depth % 8) % 8
        samples = inter + (128 if depth == 8 else 0)
        samples = samples << shift_amount
        nbytes = (depth + 7) // 8

    parts = [((samples >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(nbytes)]
    stacked = jnp.stack(parts, axis=-1)
    return stacked.reshape(*stacked.shape[:-2], -1)


def _require_x64(what: str) -> None:
    """The FLAC/MP3 numeric paths use int64 (64-bit LPC accumulators,
    MULSHIFT32/polyphase MACs). Without jax_enable_x64 JAX silently
    truncates int64 to int32 and decode output is WRONG — fail loudly."""
    import jax

    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            f"{what} requires 64-bit integer math: enable it with "
            "jax.config.update('jax_enable_x64', True) (before tracing) "
            "or JAX_ENABLE_X64=1. Without it JAX silently truncates the "
            "decoder's int64 accumulators and output is incorrect.")


class FLACDecoder:
    """Drop-in equivalent of the reference decoder class, device-accelerated."""

    def __init__(self):
        _require_x64("FLACDecoder")
        self._lib = host_lib()
        self._ctx = self._lib.eal_flac_create()
        self._output_32bit = False
        self._header_ok = False

    def __del__(self):
        try:
            self._lib.eal_flac_destroy(self._ctx)
        except Exception:
            pass

    # -------------------------------------------------------- checkpointing
    def get_state(self) -> dict:
        """Serializable snapshot of all carried decode state (SURVEY.md §5
        checkpoint/resume): native front-end (STREAMINFO, metadata,
        partial-header resume, CRC toggle) + Python-side flags. Restore into
        any FLACDecoder with :meth:`set_state`; decoding then continues
        identically to an uninterrupted run."""
        n = self._lib.eal_flac_state_size(self._ctx)
        buf = np.zeros(n, np.uint8)
        rc = self._lib.eal_flac_state_save(
            self._ctx, buf.ctypes.data_as(C.POINTER(C.c_uint8)), n)
        if rc != 0:
            raise RuntimeError("FLAC state save failed")
        return {"native": buf.tobytes(), "output_32bit": self._output_32bit,
                "header_ok": self._header_ok}

    def set_state(self, state: dict) -> None:
        data = np.frombuffer(state["native"], np.uint8)
        rc = self._lib.eal_flac_state_load(
            self._ctx, data.ctypes.data_as(C.POINTER(C.c_uint8)), data.size)
        if rc != 0:
            raise RuntimeError("FLAC state load failed (bad/incompatible blob)")
        self._output_32bit = bool(state["output_32bit"])
        self._header_ok = bool(state["header_ok"])

    # ------------------------------------------------------------- header
    def read_header(self, buffer: bytes) -> FLACDecoderResult:
        buf = np.frombuffer(buffer, np.uint8)
        rc = self._lib.eal_flac_read_header(
            self._ctx, buf.ctypes.data_as(C.POINTER(C.c_uint8)), buf.size)
        res = FLACDecoderResult(rc)
        if res == FLACDecoderResult.SUCCESS:
            self._header_ok = True
        return res

    # ------------------------------------------------------------ getters
    @property
    def sample_rate(self) -> int:
        return self._lib.eal_flac_sample_rate(self._ctx)

    @property
    def num_channels(self) -> int:
        return self._lib.eal_flac_num_channels(self._ctx)

    @property
    def sample_depth(self) -> int:
        return self._lib.eal_flac_sample_depth(self._ctx)

    @property
    def min_block_size(self) -> int:
        return self._lib.eal_flac_min_block_size(self._ctx)

    @property
    def max_block_size(self) -> int:
        return self._lib.eal_flac_max_block_size(self._ctx)

    @property
    def num_samples(self) -> int:
        return self._lib.eal_flac_num_samples(self._ctx)

    @property
    def md5_signature(self) -> bytes:
        out = np.zeros(16, np.uint8)
        self._lib.eal_flac_md5(self._ctx, out.ctypes.data_as(C.POINTER(C.c_uint8)))
        return out.tobytes()

    def get_bytes_index(self) -> int:
        return self._lib.eal_flac_bytes_index(self._ctx)

    def get_output_bytes_per_sample(self) -> int:
        if self._output_32bit:
            return 4
        return (self.sample_depth + 7) // 8

    def get_output_buffer_size(self) -> int:
        return self.max_block_size * self.num_channels

    def get_output_buffer_size_bytes(self) -> int:
        return self.get_output_buffer_size() * self.get_output_bytes_per_sample()

    def get_metadata_blocks(self):
        n = self._lib.eal_flac_num_metadata(self._ctx)
        blocks = []
        for i in range(n):
            t = C.c_int32(0)
            ln = C.c_int32(0)
            self._lib.eal_flac_metadata_info(self._ctx, i, C.byref(t), C.byref(ln))
            data = np.zeros(max(ln.value, 1), np.uint8)
            self._lib.eal_flac_metadata_data(self._ctx, i, data.ctypes.data_as(C.POINTER(C.c_uint8)))
            blocks.append((FLACMetadataType(t.value), data[: ln.value].tobytes()))
        return blocks

    # ------------------------------------------------------------- config
    def set_max_metadata_size(self, mtype: FLACMetadataType, max_size: int) -> None:
        self._lib.eal_flac_set_max_metadata_size(self._ctx, int(mtype), max_size)

    def set_max_album_art_size(self, max_size: int) -> None:
        self.set_max_metadata_size(FLACMetadataType.PICTURE, max_size)

    def set_crc_check_enabled(self, enabled: bool) -> None:
        self._lib.eal_flac_set_crc_check(self._ctx, int(enabled))

    def set_output_32bit_samples(self, enabled: bool) -> None:
        self._output_32bit = enabled

    # ------------------------------------------------------------- frames
    def _parse_frame(self, buffer: np.ndarray):
        nch = self.num_channels
        mb = self.max_block_size
        data = np.zeros((nch, mb), np.int32)
        order = np.zeros(nch, np.int32)
        shift = np.zeros(nch, np.int32)
        wasted = np.zeros(nch, np.int32)
        use64 = np.zeros(nch, np.int32)
        coeffs = np.zeros((nch, 32), np.int32)
        bs = C.c_int32(0)
        ca = C.c_int32(0)
        depth = C.c_int32(0)
        crc_ok = C.c_int32(1)
        rc = self._lib.eal_flac_parse_frame(
            self._ctx, buffer.ctypes.data_as(C.POINTER(C.c_uint8)), buffer.size,
            data.ctypes.data_as(_i32p), mb,
            order.ctypes.data_as(_i32p), shift.ctypes.data_as(_i32p),
            wasted.ctypes.data_as(_i32p), use64.ctypes.data_as(_i32p),
            coeffs.ctypes.data_as(_i32p),
            C.byref(bs), C.byref(ca), C.byref(depth), C.byref(crc_ok))
        return (FLACDecoderResult(rc), data, order, shift, wasted, use64, coeffs,
                bs.value, ca.value, depth.value)

    def decode_frame(self, buffer: bytes):
        """Decode one frame: returns (result, packed_pcm_bytes|None, num_samples).

        num_samples counts interleaved samples (block_size * channels), like
        the reference's out-param (flac_decoder.cpp:221).
        """
        buf = np.frombuffer(buffer, np.uint8) if isinstance(buffer, (bytes, bytearray)) else buffer
        res, data, order, shift, wasted, use64, coeffs, bs, ca, depth = self._parse_frame(buf)
        if res != FLACDecoderResult.SUCCESS:
            return res, None, 0
        packed = _frame_kernel(
            jnp.asarray(data[:, :bs]), jnp.asarray(coeffs), jnp.asarray(order),
            jnp.asarray(shift), jnp.asarray(wasted), jnp.int32(ca),
            depth=depth, nch=self.num_channels, mode32=self._output_32bit)
        return res, np.asarray(packed).tobytes(), bs * self.num_channels

    # ----------------------------------------------------------- streaming
    def decode_stream(self, buffer: bytes, verify_md5: bool = True):
        """Decode an entire stream after read_header: batches all equal-sized
        frames into single device calls.

        Returns (pcm_bytes, results) where results is a dict with per-frame
        result codes, total samples, and md5_ok (None when the STREAMINFO
        carries no signature or verify_md5=False).
        """
        buf = np.frombuffer(buffer, np.uint8) if isinstance(buffer, (bytes, bytearray)) else buffer
        pos = 0
        frames = []
        codes = []
        while pos < buf.size:
            res, data, order, shift, wasted, use64, coeffs, bs, ca, depth = self._parse_frame(buf[pos:])
            consumed = self.get_bytes_index()
            if res != FLACDecoderResult.SUCCESS:
                codes.append(res)
                break
            # frames whose residual/warmup words fit int16 ship at half
            # width (the residual tensor dominates the feed; exact widening
            # back to int32 happens in the kernel)
            fits16 = bool(self._lib.eal_flac_frame_fits16(
                data.ctypes.data_as(_i32p), data.shape[1], self.num_channels, bs))
            d = data[:, :bs].astype(np.int16) if fits16 else data[:, :bs]
            frames.append((d, order, shift, wasted, coeffs, bs, ca, depth))
            codes.append(res)
            pos += consumed

        # bucket frames by (block_size, depth, width) and decode batched
        out_chunks = [None] * len(frames)
        buckets = {}
        for i, f in enumerate(frames):
            buckets.setdefault((f[5], f[7], f[0].dtype.itemsize), []).append(i)
        for (bs, depth, _w), idxs in buckets.items():
            data = jnp.asarray(np.stack([frames[i][0] for i in idxs]))
            order = jnp.asarray(np.stack([frames[i][1] for i in idxs]))
            shift = jnp.asarray(np.stack([frames[i][2] for i in idxs]))
            wasted = jnp.asarray(np.stack([frames[i][3] for i in idxs]))
            coeffs = jnp.asarray(np.stack([frames[i][4] for i in idxs]))
            ca = jnp.asarray(np.asarray([frames[i][6] for i in idxs], np.int32))
            packed = _frame_kernel(data, coeffs, order, shift, wasted, ca,
                                   depth=depth, nch=self.num_channels,
                                   mode32=self._output_32bit)
            packed_np = np.asarray(packed)
            for k, i in enumerate(idxs):
                out_chunks[i] = packed_np[k]

        pcm = b"".join(c.tobytes() for c in out_chunks if c is not None)

        md5_ok = None
        if verify_md5 and not self._output_32bit:
            sig = self.md5_signature
            if any(sig):
                md5_ok = self._md5_of_output(out_chunks, frames) == sig
        total = sum(f[5] for f in frames) * self.num_channels
        return pcm, {"frame_results": codes, "num_samples": total, "md5_ok": md5_ok,
                     "num_frames": len(frames)}

    def _md5_of_output(self, out_chunks, frames) -> bytes:
        """MD5 over decoded PCM in FLAC's canonical form: interleaved,
        little-endian, ceil(depth/8) bytes, signed (the host example repacks
        sign and removes the 8-bit bias before hashing,
        host_examples/flac_to_wav/src/flac_to_wav.cpp:13-52,325-328)."""
        depth = self.sample_depth
        md5 = hashlib.md5()
        shift_amount = (8 - depth % 8) % 8
        bps = (depth + 7) // 8
        for chunk, f in zip(out_chunks, frames):
            if chunk is None:
                continue
            if shift_amount == 0 and depth != 8:
                md5.update(chunk.tobytes())
            else:
                arr = np.frombuffer(chunk.tobytes(), np.uint8).reshape(-1, bps).astype(np.int64)
                v = np.zeros(arr.shape[0], np.int64)
                for k in range(bps):
                    v |= arr[:, k] << (8 * k)
                sign = 1 << (8 * bps - 1)
                v = (v ^ sign) - sign
                if depth == 8:
                    v -= 128
                v >>= shift_amount
                repacked = np.zeros((arr.shape[0], bps), np.uint8)
                for k in range(bps):
                    repacked[:, k] = (v >> (8 * k)) & 0xFF
                md5.update(repacked.tobytes())
        return md5.digest()
