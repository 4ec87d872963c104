"""ctypes loader for the framework's native host library (libeal_host.so).

The native library owns host-side control/init code that needs exact glibc
f32 libm semantics (filter design) or is inherently serial (phase-grid
generation, later: FLAC/MP3 bitstream front-ends).  Built by
native/build_host.sh; auto-built on first import if missing.
"""

from __future__ import annotations

import ctypes as C
import functools
import subprocess
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
LIB_PATH = REPO / "build" / "libeal_host.so"


@functools.lru_cache(None)
def host_lib() -> C.CDLL:
    if not LIB_PATH.exists():
        subprocess.run([str(REPO / "native" / "build_host.sh")], check=True, capture_output=True)
    lib = C.CDLL(str(LIB_PATH))
    f32p = C.POINTER(C.c_float)
    i32p = C.POINTER(C.c_int32)
    i8p = C.POINTER(C.c_int8)
    lib.eal_design_filterbank.restype = C.c_int
    lib.eal_design_filterbank.argtypes = [C.c_int, C.c_int, C.c_float, C.c_int, f32p]
    lib.eal_phase_grid.restype = None
    lib.eal_phase_grid.argtypes = [
        C.c_int, C.c_int, C.c_int, C.c_float,       # config
        C.c_int, C.c_int,                           # chunk
        f32p, i32p,                                 # state io
        i32p, i32p, i32p, f32p, i8p,                # schedule
        i32p, i32p,                                 # results
    ]
    lib.eal_required_samples.restype = C.c_uint
    lib.eal_required_samples.argtypes = [C.c_int, C.c_float, C.c_int, C.c_int, C.c_float]
    lib.eal_expected_output.restype = C.c_uint
    lib.eal_expected_output.argtypes = [C.c_int, C.c_float, C.c_int, C.c_int, C.c_float]

    # ---- FLAC front-end ----
    u8p = C.POINTER(C.c_uint8)
    lib.eal_flac_create.restype = C.c_void_p
    lib.eal_flac_destroy.argtypes = [C.c_void_p]
    lib.eal_flac_read_header.restype = C.c_int32
    lib.eal_flac_read_header.argtypes = [C.c_void_p, u8p, C.c_size_t]
    lib.eal_flac_set_max_metadata_size.argtypes = [C.c_void_p, C.c_int32, C.c_uint32]
    lib.eal_flac_set_crc_check.argtypes = [C.c_void_p, C.c_int32]
    for name, restype in [
        ("eal_flac_sample_rate", C.c_uint32), ("eal_flac_num_channels", C.c_uint32),
        ("eal_flac_sample_depth", C.c_uint32), ("eal_flac_min_block_size", C.c_uint32),
        ("eal_flac_max_block_size", C.c_uint32), ("eal_flac_num_samples", C.c_uint64),
        ("eal_flac_bytes_index", C.c_size_t), ("eal_flac_num_metadata", C.c_int32),
    ]:
        fn = getattr(lib, name)
        fn.restype = restype
        fn.argtypes = [C.c_void_p]
    lib.eal_flac_md5.argtypes = [C.c_void_p, u8p]
    lib.eal_flac_metadata_info.restype = C.c_int32
    lib.eal_flac_metadata_info.argtypes = [C.c_void_p, C.c_int32, i32p, i32p]
    lib.eal_flac_metadata_data.restype = C.c_int32
    lib.eal_flac_metadata_data.argtypes = [C.c_void_p, C.c_int32, u8p]
    lib.eal_flac_parse_frame.restype = C.c_int32
    lib.eal_flac_parse_frame.argtypes = [
        C.c_void_p, u8p, C.c_size_t, i32p, C.c_size_t,
        i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p]
    i16p = C.POINTER(C.c_int16)
    lib.eal_flac_parse_stream.restype = C.c_int32
    lib.eal_flac_parse_stream.argtypes = [
        C.c_void_p, u8p, C.c_size_t, C.c_int32, C.c_int32,   # ctx, buf, len, max_frames, frame_cap
        i8p, i16p, i32p,                                     # data8/16/32
        i32p, i32p, i32p,                                    # slot8/16/32 cursors
        i32p, i32p,                                          # wide, slot
        i32p, i32p, i32p, i32p, i32p,                        # order, shift, wasted, use64, coeffs
        i32p, i32p, i32p, i32p, i32p,                        # bs, ca, depth, crc_ok, consumed
        i32p]                                                # last_rc (24 args total)

    # ---- MP3 front-end ----
    lib.eal_mp3_create.restype = C.c_void_p
    lib.eal_mp3_destroy.argtypes = [C.c_void_p]
    lib.eal_mp3_find_sync_word.restype = C.c_int
    lib.eal_mp3_find_sync_word.argtypes = [u8p, C.c_int]
    lib.eal_mp3_parse_frame.restype = C.c_int
    lib.eal_mp3_parse_frame.argtypes = [
        C.c_void_p, u8p, C.c_int, C.c_int,
        i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p]
    lib.eal_mp3_parse_frame_batch.restype = C.c_int
    lib.eal_mp3_parse_frame_batch.argtypes = [
        C.c_int, C.POINTER(C.c_void_p), C.POINTER(u8p), i32p, C.c_int,
        i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p]
    lib.eal_mp3_frame_info.restype = C.c_int
    lib.eal_mp3_frame_info.argtypes = [C.c_void_p, u8p, i32p]
    lib.eal_mp3_last_frame_info.restype = C.c_int
    lib.eal_mp3_last_frame_info.argtypes = [C.c_void_p, i32p]
    lib.eal_mp3_granule_params_compact_batch.restype = C.c_int
    lib.eal_mp3_granule_params_compact_batch.argtypes = [C.c_int, i32p, i32p, i32p, i32p, i32p, i32p]
    for codec in ("flac", "mp3"):
        getattr(lib, f"eal_{codec}_state_size").restype = C.c_size_t
        getattr(lib, f"eal_{codec}_state_size").argtypes = [C.c_void_p]
        getattr(lib, f"eal_{codec}_state_save").restype = C.c_int
        getattr(lib, f"eal_{codec}_state_save").argtypes = [C.c_void_p, u8p, C.c_size_t]
        getattr(lib, f"eal_{codec}_state_load").restype = C.c_int
        getattr(lib, f"eal_{codec}_state_load").argtypes = [C.c_void_p, u8p, C.c_size_t]
    return lib


def design_filterbank_native(num_taps: int, num_filters: int, lowpass_ratio: float, flags: int) -> np.ndarray:
    """Bit-exact filterbank design via the native library — the PRODUCTION
    path (pinned bit-for-bit against the reference by
    tests/test_art_resampler.py::test_filterbank_bitexact).

    ops/sinc.py re-derives the same math in vectorized numpy as an
    independent cross-check (test_filterbank_native_vs_numpy_crosscheck):
    absolute agreement <= ~4e-7 across the envelope; per-tap ulp distance is
    unbounded at near-zero tail taps because the error diffusion
    redistributes the sin/cos rounding differences.
    """
    out = np.zeros((num_filters + 1, num_taps), np.float32)
    rc = host_lib().eal_design_filterbank(
        num_taps, num_filters, np.float32(lowpass_ratio), flags,
        out.ctypes.data_as(C.POINTER(C.c_float)))
    if rc == 1:
        raise ValueError("must 4-1024 filter taps, and a multiple of 4!")
    if rc == 2:
        raise ValueError("must be 2-1024 filters!")
    return out
