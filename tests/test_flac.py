"""FLAC pipeline differential tests: generated corpus -> oracle vs TPU decode.

Test vectors come from tools/flacgen.py (pure-Python encoder covering every
subframe type, Rice partitioning/escapes, wasted bits, stereo modes, depths).
Primary oracle: the reference decoder compiled on host. Secondary check: the
STREAMINFO MD5 self-verification.
"""

import ctypes as C

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from flacgen import SubframePlan, make_flac  # noqa: E402

from esp_audio_libs_tpu.models.flac import FLACDecoder  # noqa: E402
from esp_audio_libs_tpu.utils.errors import FLACDecoderResult  # noqa: E402


def oracle_decode_all(oracle, blob: bytes, out32=False):
    """Drive the reference decoder over a whole stream; returns per-frame
    (result, bytes) plus header info."""
    d = oracle.lib.ref_flac_create()
    try:
        if out32:
            oracle.lib.ref_flac_set_output_32bit(d, 1)
        buf = np.frombuffer(blob, np.uint8)
        rc = oracle.lib.ref_flac_read_header(d, buf.ctypes.data_as(C.POINTER(C.c_uint8)), buf.size)
        if rc != 0:
            return rc, None, []
        info = {
            "sample_rate": oracle.lib.ref_flac_sample_rate(d),
            "channels": oracle.lib.ref_flac_num_channels(d),
            "depth": oracle.lib.ref_flac_sample_depth(d),
            "min_block": oracle.lib.ref_flac_min_block_size(d),
            "max_block": oracle.lib.ref_flac_max_block_size(d),
            "num_samples": oracle.lib.ref_flac_num_samples(d),
        }
        md5 = np.zeros(16, np.uint8)
        oracle.lib.ref_flac_md5(d, md5.ctypes.data_as(C.POINTER(C.c_uint8)))
        info["md5"] = md5.tobytes()
        pos = oracle.lib.ref_flac_bytes_index(d)
        outbuf = np.zeros(oracle.lib.ref_flac_output_buffer_size_bytes(d) + 64, np.uint8)
        frames = []
        while pos < len(blob):
            ns = C.c_uint32(0)
            chunk = buf[pos:]
            rc = oracle.lib.ref_flac_decode_frame(
                d, chunk.ctypes.data_as(C.POINTER(C.c_uint8)), chunk.size,
                outbuf.ctypes.data_as(C.POINTER(C.c_uint8)), C.byref(ns))
            consumed = oracle.lib.ref_flac_bytes_index(d)
            if rc != 0:
                frames.append((rc, b"", 0))
                break
            bps = oracle.lib.ref_flac_output_bytes_per_sample(d)
            frames.append((rc, outbuf[: ns.value * bps].tobytes(), ns.value))
            pos += consumed
        return 0, info, frames
    finally:
        oracle.lib.ref_flac_destroy(d)


CORPUS = [
    dict(rng_seed=1, depth=16, channels=1, block_size=256, n_frames=3,
         plans=[[SubframePlan("constant")], [SubframePlan("verbatim")],
                [SubframePlan("fixed", order=2)]]),
    dict(rng_seed=2, depth=16, channels=2, block_size=256, n_frames=4,
         plans=[[SubframePlan("lpc", order=8), SubframePlan("lpc", order=4)],
                [SubframePlan("fixed", order=3), SubframePlan("fixed", order=1)],
                [SubframePlan("lpc", order=12, partition_order=2), SubframePlan("verbatim")],
                [SubframePlan("lpc", order=2, escape=True), SubframePlan("constant")]]),
    dict(rng_seed=3, depth=16, channels=2, block_size=192, n_frames=3,
         stereo_modes=["ls", "rs", "ms"],
         plans=[[SubframePlan("lpc", order=6), SubframePlan("lpc", order=6)]] * 3),
    dict(rng_seed=4, depth=8, channels=1, block_size=256, n_frames=2,
         plans=[[SubframePlan("fixed", order=4)], [SubframePlan("lpc", order=1)]]),
    dict(rng_seed=5, depth=24, channels=2, block_size=512, n_frames=2,
         plans=[[SubframePlan("lpc", order=8), SubframePlan("fixed", order=2)]] * 2),
    dict(rng_seed=6, depth=16, channels=1, block_size=250, n_frames=2,
         uncommon_bs_code=True,
         plans=[[SubframePlan("fixed", order=0)], [SubframePlan("lpc", order=3)]]),
    dict(rng_seed=7, depth=16, channels=1, block_size=256, n_frames=2,
         plans=[[SubframePlan("lpc", order=5, wasted=3)], [SubframePlan("verbatim", wasted=2)]]),
    dict(rng_seed=8, depth=32, channels=1, block_size=128, n_frames=2,
         plans=[[SubframePlan("lpc", order=4)], [SubframePlan("verbatim")]]),
    dict(rng_seed=9, depth=12, channels=1, block_size=256, n_frames=2,
         plans=[[SubframePlan("fixed", order=2)], [SubframePlan("lpc", order=7)]]),
    dict(rng_seed=10, depth=16, channels=2, block_size=4096, n_frames=2,
         stereo_modes=["ms", None],
         plans=[[SubframePlan("lpc", order=32), SubframePlan("lpc", order=16)]] * 2),
    dict(rng_seed=11, depth=20, channels=2, block_size=576, n_frames=2,
         stereo_modes=[None, "ms"],
         plans=[[SubframePlan("lpc", order=8, partition_order=3),
                 SubframePlan("fixed", order=4, partition_order=1)]] * 2),
    # ---- reference-envelope extremes (TESTING.md:82-96: 1-8 channels,
    # 22.05-768 kHz, block 16-65535, depths 8-32) ----
    dict(rng_seed=12, depth=16, channels=8, block_size=256, n_frames=2,
         plans=[[SubframePlan("lpc", order=4) for _ in range(8)],
                [SubframePlan("fixed", order=2) for _ in range(8)]]),
    dict(rng_seed=13, depth=24, channels=3, block_size=512, n_frames=2,
         plans=[[SubframePlan("lpc", order=8), SubframePlan("fixed", order=3),
                 SubframePlan("verbatim")]] * 2),
    dict(rng_seed=14, depth=16, channels=6, block_size=1024, n_frames=2,
         sample_rate=96000,
         plans=[[SubframePlan("lpc", order=12, fit=True) for _ in range(6)]] * 2),
    dict(rng_seed=15, depth=16, channels=2, block_size=16, n_frames=3,
         uncommon_bs_code=True,
         plans=[[SubframePlan("lpc", order=2), SubframePlan("fixed", order=1)]] * 3),
    dict(rng_seed=16, depth=16, channels=1, block_size=65535, n_frames=1,
         sample_rate=768000,
         plans=[[SubframePlan("lpc", order=8, fit=True)]]),
    dict(rng_seed=17, depth=32, channels=2, block_size=256, n_frames=2,
         sample_rate=176400,
         plans=[[SubframePlan("lpc", order=8, wasted=2), SubframePlan("verbatim")]] * 2),
    dict(rng_seed=18, depth=20, channels=2, block_size=4608, n_frames=2,
         sample_rate=88200,
         plans=[[SubframePlan("lpc", order=16, fit=True, partition_order=4),
                 SubframePlan("lpc", order=8, escape=True)]] * 2),
    dict(rng_seed=19, depth=16, channels=2, block_size=4096, n_frames=3,
         stereo_modes=["ms", "ls", "rs"],
         plans=[[SubframePlan("lpc", order=8, fit=True),
                 SubframePlan("lpc", order=12, fit=True)]] * 3),
]


@pytest.fixture(scope="module")
def corpus():
    return [make_flac(**cfg) for cfg in CORPUS]


@pytest.mark.parametrize("ci", range(len(CORPUS)))
def test_stream_decodes_in_reference(oracle, corpus, ci):
    """Sanity: generated vectors are valid FLAC for the reference decoder."""
    blob, pcm = corpus[ci]
    rc, info, frames = oracle_decode_all(oracle, blob)
    assert rc == 0
    assert all(f[0] == 0 for f in frames), [f[0] for f in frames]
    assert sum(f[2] for f in frames) == pcm.size


@pytest.mark.parametrize("ci", range(len(CORPUS)))
def test_decode_frame_matches_reference(oracle, corpus, ci):
    blob, pcm = corpus[ci]
    rc, info, ref_frames = oracle_decode_all(oracle, blob)
    assert rc == 0

    dec = FLACDecoder()
    assert dec.read_header(blob) == FLACDecoderResult.SUCCESS
    assert dec.sample_rate == info["sample_rate"]
    assert dec.num_channels == info["channels"]
    assert dec.sample_depth == info["depth"]
    assert dec.num_samples == info["num_samples"]
    assert dec.md5_signature == info["md5"]

    pos = dec.get_bytes_index()
    for rframe in ref_frames:
        res, out, ns = dec.decode_frame(blob[pos:])
        assert int(res) == rframe[0]
        assert ns == rframe[2]
        assert out == rframe[1]
        pos += dec.get_bytes_index()


@pytest.mark.parametrize("ci", [1, 2, 9, 11, 15, 17, 18])
def test_decode_stream_batched(oracle, corpus, ci):
    blob, pcm = corpus[ci]
    rc, info, ref_frames = oracle_decode_all(oracle, blob)
    dec = FLACDecoder()
    assert dec.read_header(blob) == FLACDecoderResult.SUCCESS
    pcm_bytes, results = dec.decode_stream(blob[dec.get_bytes_index():])
    assert results["md5_ok"] is True
    assert pcm_bytes == b"".join(f[1] for f in ref_frames)


@pytest.mark.parametrize("ci", [1, 4, 7, 11, 16])
def test_output_32bit_mode(oracle, corpus, ci):
    blob, _ = corpus[ci]
    rc, info, ref_frames = oracle_decode_all(oracle, blob, out32=True)
    dec = FLACDecoder()
    dec.set_output_32bit_samples(True)
    assert dec.read_header(blob) == FLACDecoderResult.SUCCESS
    pos = dec.get_bytes_index()
    for rframe in ref_frames:
        res, out, ns = dec.decode_frame(blob[pos:])
        assert int(res) == rframe[0]
        assert out == rframe[1]
        pos += dec.get_bytes_index()


def test_error_paths_match_reference(oracle, corpus):
    blob, _ = corpus[0]
    # bad magic
    bad = b"fLaX" + blob[4:]
    d = FLACDecoder()
    assert d.read_header(bad) == FLACDecoderResult.ERROR_BAD_MAGIC_NUMBER
    rc, _, _ = oracle_decode_all(oracle, bad)
    assert rc == int(FLACDecoderResult.ERROR_BAD_MAGIC_NUMBER)

    # truncated header: split inside a metadata block (the reference cannot
    # resume mid-STREAMINFO; padding blocks resume fine). Assert parity with
    # the reference for the same split.
    blob_meta, _ = make_flac(rng_seed=21, n_frames=1, metadata=[(1, b"\x00" * 100)],
                             plans=[[SubframePlan("fixed", order=1), SubframePlan("fixed", order=1)]])
    split = 60  # inside the padding block (4 magic + 4 + 34 streaminfo + 4 + ...)
    d2 = FLACDecoder()
    ref = oracle.lib.ref_flac_create()
    b1 = np.frombuffer(blob_meta[:split], np.uint8)
    b2 = np.frombuffer(blob_meta[split:], np.uint8)
    rc1_ref = oracle.lib.ref_flac_read_header(ref, b1.ctypes.data_as(C.POINTER(C.c_uint8)), b1.size)
    rc2_ref = oracle.lib.ref_flac_read_header(ref, b2.ctypes.data_as(C.POINTER(C.c_uint8)), b2.size)
    oracle.lib.ref_flac_destroy(ref)
    assert int(d2.read_header(blob_meta[:split])) == rc1_ref == int(FLACDecoderResult.HEADER_OUT_OF_DATA)
    assert int(d2.read_header(blob_meta[split:])) == rc2_ref == int(FLACDecoderResult.SUCCESS)

    # corrupt frame CRC16: flip last byte of the stream
    corrupt = bytearray(blob)
    corrupt[-1] ^= 0xFF
    d3 = FLACDecoder()
    assert d3.read_header(bytes(corrupt)) == FLACDecoderResult.SUCCESS
    pos = d3.get_bytes_index()
    results = []
    while pos < len(corrupt):
        res, out, ns = d3.decode_frame(bytes(corrupt[pos:]))
        results.append(res)
        if res != FLACDecoderResult.SUCCESS:
            break
        pos += d3.get_bytes_index()
    assert results[-1] == FLACDecoderResult.ERROR_CRC_MISMATCH

    # crc check disabled -> decodes (payload CRC only; data bits intact)
    d4 = FLACDecoder()
    d4.set_crc_check_enabled(False)
    assert d4.read_header(bytes(corrupt)) == FLACDecoderResult.SUCCESS


def test_metadata_blocks(oracle):
    meta = [(1, b"\x00" * 64), (4, b"vorbis-ish comment payload")]
    blob, _ = make_flac(rng_seed=20, n_frames=1, metadata=meta,
                        plans=[[SubframePlan("fixed", order=1), SubframePlan("fixed", order=1)]])
    dec = FLACDecoder()
    # default limits: padding skipped (max 0), vorbis comment kept (2KB)
    assert dec.read_header(blob) == FLACDecoderResult.SUCCESS
    blocks = dec.get_metadata_blocks()
    assert len(blocks) == 1
    assert blocks[0][0] == 4 and blocks[0][1] == meta[1][1]
    # raise padding limit -> stored
    dec2 = FLACDecoder()
    dec2.set_max_metadata_size(1, 1024)
    assert dec2.read_header(blob) == FLACDecoderResult.SUCCESS
    assert len(dec2.get_metadata_blocks()) == 2
