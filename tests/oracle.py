"""ctypes bindings for the reference esp-audio-libs built as a host oracle.

Every binding forwards to the unmodified reference code (see
native/oracle/oracle_shim.cpp); tests compare our JAX/Pallas implementations
bit-for-bit against these.
"""

from __future__ import annotations

import ctypes as C
import functools
from pathlib import Path

import numpy as np

LIB_PATH = Path(__file__).resolve().parent.parent / "build" / "liboracle.so"


class Oracle:
    def __init__(self, lib: C.CDLL):
        self.lib = lib
        L = lib
        u8p, f32p, i16p, i32p = (
            C.POINTER(C.c_uint8),
            C.POINTER(C.c_float),
            C.POINTER(C.c_int16),
            C.POINTER(C.c_int32),
        )
        L.ref_quantized_to_float.argtypes = [u8p, f32p, C.c_uint32, C.c_uint8, C.c_float]
        L.ref_float_to_quantized.restype = C.c_uint32
        L.ref_float_to_quantized.argtypes = [f32p, u8p, C.c_uint32, C.c_uint8]
        L.ref_dsps_dotprod_f32.argtypes = [f32p, f32p, f32p, C.c_int]
        L.ref_dsps_biquad_f32.argtypes = [f32p, f32p, C.c_int, f32p, f32p]
        L.ref_dsps_add_s16.argtypes = [i16p, i16p, i16p] + [C.c_int] * 5
        L.ref_dsps_mulc_s16.argtypes = [i16p, i16p, C.c_int, C.c_int16, C.c_int, C.c_int]
        L.ref_biquad_lowpass.argtypes = [C.c_double, f32p]
        L.ref_biquad_highpass.argtypes = [C.c_double, f32p]
        L.ref_biquad_apply_buffer.argtypes = [f32p, C.c_float, f32p, f32p, C.c_int, C.c_int]
        L.ref_resample_init.restype = C.c_void_p
        L.ref_resample_init.argtypes = [C.c_int, C.c_int, C.c_int, C.c_float, C.c_int]
        L.ref_resample_free.argtypes = [C.c_void_p]
        L.ref_resample_reset.argtypes = [C.c_void_p]
        L.ref_resample_advance_position.argtypes = [C.c_void_p, C.c_float]
        L.ref_resample_get_position.restype = C.c_float
        L.ref_resample_get_position.argtypes = [C.c_void_p]
        L.ref_resample_get_required_samples.restype = C.c_uint
        L.ref_resample_get_required_samples.argtypes = [C.c_void_p, C.c_int, C.c_float]
        L.ref_resample_get_expected_output.restype = C.c_uint
        L.ref_resample_get_expected_output.argtypes = [C.c_void_p, C.c_int, C.c_float]
        L.ref_resample_process_interleaved.argtypes = [
            C.c_void_p, f32p, C.c_int, f32p, C.c_int, C.c_float, C.POINTER(C.c_uint), C.POINTER(C.c_uint)]
        L.ref_resample_get_filter.argtypes = [C.c_void_p, C.c_int, f32p]
        L.ref_resample_get_output_offset.restype = C.c_float
        L.ref_resample_get_output_offset.argtypes = [C.c_void_p]
        L.ref_resample_get_input_index.restype = C.c_int
        L.ref_resample_get_input_index.argtypes = [C.c_void_p]
        L.ref_resampler_create.restype = C.c_void_p
        L.ref_resampler_create.argtypes = [C.c_size_t, C.c_size_t]
        L.ref_resampler_destroy.argtypes = [C.c_void_p]
        L.ref_resampler_initialize.restype = C.c_int
        L.ref_resampler_initialize.argtypes = [
            C.c_void_p, C.c_float, C.c_float, C.c_uint8, C.c_uint8, C.c_uint8, C.c_int, C.c_int,
            C.c_uint16, C.c_uint16]
        L.ref_resampler_resample.argtypes = [
            C.c_void_p, u8p, u8p, C.c_size_t, C.c_size_t, C.c_float,
            C.POINTER(C.c_size_t), C.POINTER(C.c_size_t), C.POINTER(C.c_size_t), C.POINTER(C.c_uint32)]
        L.ref_wav_create.restype = C.c_void_p
        L.ref_wav_destroy.argtypes = [C.c_void_p]
        L.ref_wav_reset.argtypes = [C.c_void_p]
        L.ref_wav_decode_header.restype = C.c_int
        L.ref_wav_decode_header.argtypes = [C.c_void_p, u8p, C.c_size_t]
        for name, restype in [
            ("ref_wav_state", C.c_int), ("ref_wav_bytes_processed", C.c_size_t),
            ("ref_wav_chunk_bytes_left", C.c_size_t), ("ref_wav_sample_rate", C.c_uint32),
            ("ref_wav_num_channels", C.c_uint16), ("ref_wav_bits_per_sample", C.c_uint16),
        ]:
            fn = getattr(L, name)
            fn.restype = restype
            fn.argtypes = [C.c_void_p]
        L.ref_flac_create.restype = C.c_void_p
        L.ref_flac_destroy.argtypes = [C.c_void_p]
        L.ref_flac_read_header.restype = C.c_int
        L.ref_flac_read_header.argtypes = [C.c_void_p, u8p, C.c_size_t]
        L.ref_flac_decode_frame.restype = C.c_int
        L.ref_flac_decode_frame.argtypes = [C.c_void_p, u8p, C.c_size_t, u8p, C.POINTER(C.c_uint32)]
        for name, restype in [
            ("ref_flac_num_channels", C.c_uint32), ("ref_flac_sample_rate", C.c_uint32),
            ("ref_flac_sample_depth", C.c_uint32), ("ref_flac_max_block_size", C.c_uint32),
            ("ref_flac_min_block_size", C.c_uint32), ("ref_flac_output_buffer_size_bytes", C.c_uint32),
            ("ref_flac_output_bytes_per_sample", C.c_uint32), ("ref_flac_bytes_index", C.c_size_t),
            ("ref_flac_num_samples", C.c_uint64),
        ]:
            fn = getattr(L, name)
            fn.restype = restype
            fn.argtypes = [C.c_void_p]
        L.ref_flac_md5.argtypes = [C.c_void_p, u8p]
        L.ref_flac_set_crc_check.argtypes = [C.c_void_p, C.c_int]
        L.ref_flac_set_output_32bit.argtypes = [C.c_void_p, C.c_int]
        L.ref_mp3_init.restype = C.c_void_p
        L.ref_mp3_free.argtypes = [C.c_void_p]
        L.ref_mp3_find_sync_word.restype = C.c_int
        L.ref_mp3_find_sync_word.argtypes = [u8p, C.c_int]
        L.ref_mp3_decode.restype = C.c_int
        L.ref_mp3_decode.argtypes = [C.c_void_p, u8p, C.c_int, i16p, C.c_int, C.POINTER(C.c_int)]
        L.ref_mp3_get_last_frame_info.argtypes = [C.c_void_p, i32p]
        L.ref_mp3_get_next_frame_info.restype = C.c_int
        L.ref_mp3_get_next_frame_info.argtypes = [C.c_void_p, i32p, u8p]
        L.ref_mp3_stage_dequant.restype = C.c_int
        L.ref_mp3_stage_dequant.argtypes = [C.c_void_p] + [i32p] * 10
        L.ref_mp3_stage_imdct.restype = C.c_int
        L.ref_mp3_stage_imdct.argtypes = [C.c_void_p, C.c_int, i32p, C.c_int32, C.c_int32,
                                          i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p]
        L.ref_mp3_stage_subband.restype = C.c_int
        L.ref_mp3_stage_subband.argtypes = [C.c_void_p, C.c_int, i32p, i32p, i32p, i32p, i16p]

    # ------------------------------------------------------------ quantization
    def quantized_to_float(self, data: np.ndarray, bits: int, gain_db: float = 0.0) -> np.ndarray:
        data = np.ascontiguousarray(data, dtype=np.uint8)
        bps = 1 if bits <= 8 else 2 if bits <= 16 else 3 if bits <= 24 else 4
        n = data.size // bps
        out = np.zeros(n, np.float32)
        self.lib.ref_quantized_to_float(
            data.ctypes.data_as(C.POINTER(C.c_uint8)), out.ctypes.data_as(C.POINTER(C.c_float)),
            n, bits, gain_db)
        return out

    def float_to_quantized(self, x: np.ndarray, bits: int):
        x = np.ascontiguousarray(x, dtype=np.float32)
        bps = 1 if bits <= 8 else 2 if bits <= 16 else 3 if bits <= 24 else 4
        out = np.zeros(x.size * bps, np.uint8)
        clipped = self.lib.ref_float_to_quantized(
            x.ctypes.data_as(C.POINTER(C.c_float)), out.ctypes.data_as(C.POINTER(C.c_uint8)), x.size, bits)
        return out, clipped

    # ------------------------------------------------------------ dsp kernels
    def dotprod_f32(self, a, b):
        a = np.ascontiguousarray(a, np.float32)
        b = np.ascontiguousarray(b, np.float32)
        out = np.zeros(1, np.float32)
        self.lib.ref_dsps_dotprod_f32(
            a.ctypes.data_as(C.POINTER(C.c_float)), b.ctypes.data_as(C.POINTER(C.c_float)),
            out.ctypes.data_as(C.POINTER(C.c_float)), a.size)
        return out[0]

    def dsps_biquad_f32(self, x, coef, w):
        x = np.ascontiguousarray(x, np.float32)
        coef = np.ascontiguousarray(coef, np.float32)
        w = np.ascontiguousarray(w, np.float32).copy()
        out = np.zeros_like(x)
        self.lib.ref_dsps_biquad_f32(
            x.ctypes.data_as(C.POINTER(C.c_float)), out.ctypes.data_as(C.POINTER(C.c_float)), x.size,
            coef.ctypes.data_as(C.POINTER(C.c_float)), w.ctypes.data_as(C.POINTER(C.c_float)))
        return out, w

    def add_s16(self, a, b, shift=0):
        a = np.ascontiguousarray(a, np.int16)
        b = np.ascontiguousarray(b, np.int16)
        out = np.zeros_like(a)
        self.lib.ref_dsps_add_s16(
            a.ctypes.data_as(C.POINTER(C.c_int16)), b.ctypes.data_as(C.POINTER(C.c_int16)),
            out.ctypes.data_as(C.POINTER(C.c_int16)), a.size, 1, 1, 1, shift)
        return out

    def mulc_s16(self, x, c):
        x = np.ascontiguousarray(x, np.int16)
        out = np.zeros_like(x)
        self.lib.ref_dsps_mulc_s16(
            x.ctypes.data_as(C.POINTER(C.c_int16)), out.ctypes.data_as(C.POINTER(C.c_int16)), x.size, c, 1, 1)
        return out

    # ------------------------------------------------------------ art biquad
    def biquad_lowpass(self, frequency: float) -> np.ndarray:
        out = np.zeros(5, np.float32)
        self.lib.ref_biquad_lowpass(frequency, out.ctypes.data_as(C.POINTER(C.c_float)))
        return out

    def biquad_highpass(self, frequency: float) -> np.ndarray:
        out = np.zeros(5, np.float32)
        self.lib.ref_biquad_highpass(frequency, out.ctypes.data_as(C.POINTER(C.c_float)))
        return out

    def biquad_apply_buffer(self, coeffs5, gain, state4, buffer, stride=1):
        coeffs5 = np.ascontiguousarray(coeffs5, np.float32)
        state4 = np.ascontiguousarray(state4, np.float32).copy()
        buffer = np.ascontiguousarray(buffer, np.float32).copy()
        n = buffer.size // stride
        self.lib.ref_biquad_apply_buffer(
            coeffs5.ctypes.data_as(C.POINTER(C.c_float)), gain,
            state4.ctypes.data_as(C.POINTER(C.c_float)),
            buffer.ctypes.data_as(C.POINTER(C.c_float)), n, stride)
        return buffer, state4

    # ------------------------------------------------------------ wav
    def wav_parse(self, data: bytes):
        d = self.lib.ref_wav_create()
        try:
            buf = np.frombuffer(data, np.uint8)
            res = self.lib.ref_wav_decode_header(d, buf.ctypes.data_as(C.POINTER(C.c_uint8)), buf.size)
            return {
                "result": res,
                "state": self.lib.ref_wav_state(d),
                "bytes_processed": self.lib.ref_wav_bytes_processed(d),
                "chunk_bytes_left": self.lib.ref_wav_chunk_bytes_left(d),
                "sample_rate": self.lib.ref_wav_sample_rate(d),
                "num_channels": self.lib.ref_wav_num_channels(d),
                "bits_per_sample": self.lib.ref_wav_bits_per_sample(d),
            }
        finally:
            self.lib.ref_wav_destroy(d)


def mp3_decode_frame(oracle, handle, buf: "np.ndarray", pos: int):
    """One reference MP3Decode call at ``buf[pos:]`` on an open ref_mp3
    handle: returns (err, pcm int16 np.ndarray trimmed to outputSamps,
    consumed).  The single canonical ctypes sequence for the MP3 oracle —
    shared by tests/test_mp3_decode.py and examples/test_mp3_decoder.py so
    the FFI contract lives in one place."""
    import numpy as np

    pcm = np.zeros(1152 * 2, np.int16)
    consumed = C.c_int(0)
    err = oracle.lib.ref_mp3_decode(
        handle, buf[pos:].ctypes.data_as(C.POINTER(C.c_uint8)),
        buf.size - pos, pcm.ctypes.data_as(C.POINTER(C.c_int16)), 0,
        C.byref(consumed))
    info = np.zeros(7, np.int32)
    oracle.lib.ref_mp3_get_last_frame_info(
        handle, info.ctypes.data_as(C.POINTER(C.c_int32)))
    return int(err), pcm[: int(info[4])].copy(), int(consumed.value)


@functools.lru_cache(None)
def load() -> Oracle:
    if not LIB_PATH.exists():
        import subprocess

        subprocess.run([str(LIB_PATH.parent.parent / "native" / "oracle" / "build_oracle.sh")], check=True)
    return Oracle(C.CDLL(str(LIB_PATH)))
