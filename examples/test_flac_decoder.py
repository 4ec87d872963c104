#!/usr/bin/env python3
"""FLAC conformance-suite runner.

TPU-native equivalent of the reference's conformance harness (reference:
host_examples/flac_to_wav/test_flac_decoder.py, TESTING.md): runs the decoder
over a corpus of FLAC files in three categories (subset / uncommon / faulty),
verifies each with two oracles, and writes text + JSON reports
(test_results/test_report.{txt,json}).

Oracles:
  1. primary   — MD5 of decoded PCM vs the STREAMINFO signature (the same
                 cryptographic self-check the reference CLI performs)
  2. secondary — byte-compare against the reference C decoder compiled as a
                 host library (this image has no ffmpeg; the reference's
                 secondary oracle was ffmpeg)

Corpus: point --corpus at a directory laid out like
ietf-wg-cellar/flac-test-files (subset/, uncommon/, faulty/). Without a
corpus the runner generates one with tools/flacgen.py covering every
subframe type, stereo mode, bit depth and several corrupt streams.
"""

from __future__ import annotations

import argparse
import ctypes as C
import json
import os
import struct
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

# persistent XLA compile cache, shared with the CLI subprocesses this runner
# drives — without it every flac_to_wav invocation pays a fresh compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / "build" / "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# honor an explicit JAX_PLATFORMS choice even where a site plugin pins a
# different backend (env var alone loses to plugin re-registration)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from esp_audio_libs_tpu.models.flac import FLACDecoder  # noqa: E402
from esp_audio_libs_tpu.utils.errors import FLACDecoderResult  # noqa: E402


def install_independent_corpus(root: Path):
    """Copy the committed ``independent`` category into the working corpus.

    These files break the single-author loop (VERDICT r3): ``enc2_*`` are
    encoded by tools/flacgen2.py — a second encoder whose every structural
    choice (order selection, Rice params, partition search, stereo mode) is
    cost-measured, not plan-scripted — and ``mut_*`` are structure-aware
    mutants that the REFERENCE decoder accepted at generation time
    (tools/flacmut.py), with STREAMINFO MD5 signatures rewritten from the
    oracle-verified PCM.  They are committed (corpus/independent/) so the
    category is hermetic: CI re-verifies MD5 + CLI without the reference
    mounted, and the full differential runs wherever it is."""
    src = REPO / "corpus" / "independent"
    dst = root / "independent"
    if not src.is_dir():
        return
    dst.mkdir(parents=True, exist_ok=True)
    for f in src.glob("*.flac"):
        (dst / f.name).write_bytes(f.read_bytes())


def generate_corpus(root: Path):
    """Synthesize a corpus with tools/flacgen.py (no network in this image)."""
    from flacgen import SubframePlan, make_flac

    (root / "subset").mkdir(parents=True, exist_ok=True)
    (root / "uncommon").mkdir(parents=True, exist_ok=True)
    (root / "faulty").mkdir(parents=True, exist_ok=True)

    subset = [
        dict(rng_seed=1, depth=16, channels=2, block_size=4096, n_frames=4,
             stereo_modes=["ms", "ls", "rs", None],
             plans=[[SubframePlan("lpc", order=8), SubframePlan("lpc", order=8)]] * 4),
        dict(rng_seed=2, depth=16, channels=1, block_size=1152, n_frames=3,
             plans=[[SubframePlan("fixed", order=o)] for o in (2, 3, 4)]),
        dict(rng_seed=3, depth=24, channels=2, block_size=2048, n_frames=3,
             plans=[[SubframePlan("lpc", order=12, partition_order=2),
                     SubframePlan("lpc", order=6)]] * 3),
        dict(rng_seed=4, depth=8, channels=1, block_size=256, n_frames=2,
             plans=[[SubframePlan("verbatim")], [SubframePlan("constant")]]),
        dict(rng_seed=5, depth=16, channels=2, block_size=576, n_frames=3,
             plans=[[SubframePlan("lpc", order=2, escape=True), SubframePlan("fixed", order=1)]] * 3),
        dict(rng_seed=6, depth=16, channels=1, block_size=192, n_frames=4,
             plans=[[SubframePlan("lpc", order=32)]] * 4),
        dict(rng_seed=7, depth=16, channels=2, block_size=4096, n_frames=4,
             stereo_modes=["ms", "ls", "rs", None],
             plans=[[SubframePlan("lpc", order=8, fit=True),
                     SubframePlan("lpc", order=12, fit=True)]] * 4),
    ]
    SP = SubframePlan
    lpc2 = lambda **kw: [[SP("lpc", order=8, fit=True, **kw),
                          SP("lpc", order=8, fit=True, **kw)]]
    # --- blocksize series (ietf subset 01-10: 16..4608, incl. non-pow2) ---
    for s, bs in enumerate([4608, 16, 192, 254, 512, 725, 1000, 1937, 2304]):
        subset.append(dict(rng_seed=30 + s, depth=16, channels=2, block_size=bs,
                           n_frames=2, plans=lpc2() * 2 if bs >= 32 else
                           [[SP("fixed", order=1), SP("fixed", order=2)]] * 2))
    # --- rice partition orders 0..8 (ietf 11 + partition files) ---
    for s, po in enumerate([0, 1, 3, 5, 8]):
        subset.append(dict(rng_seed=40 + s, depth=16, channels=2, block_size=4096,
                           n_frames=2, plans=lpc2(partition_order=po) * 2))
    # --- qlp coefficient precision extremes (ietf 12-13) ---
    subset.append(dict(rng_seed=45, depth=16, channels=2, block_size=4096, n_frames=2,
                       plans=[[SP("lpc", order=8, precision=15, fit=True)] * 2] * 2))
    subset.append(dict(rng_seed=46, depth=16, channels=2, block_size=4096, n_frames=2,
                       plans=[[SP("lpc", order=2, precision=2, shift=1)] * 2] * 2))
    # --- wasted bits (ietf 14) ---
    subset.append(dict(rng_seed=47, depth=16, channels=2, block_size=4096, n_frames=2,
                       plans=[[SP("lpc", order=6, wasted=1), SP("lpc", order=6, wasted=5)]] * 2))
    # --- only-verbatim / only-constant streams (ietf 15-16) ---
    subset.append(dict(rng_seed=48, depth=16, channels=2, block_size=1152, n_frames=3,
                       plans=[[SP("verbatim"), SP("verbatim")]] * 3))
    subset.append(dict(rng_seed=49, depth=16, channels=2, block_size=1152, n_frames=3,
                       plans=[[SP("constant"), SP("constant")]] * 3))
    # --- all fixed predictor orders 0-4 (ietf 17) ---
    subset.append(dict(rng_seed=50, depth=16, channels=1, block_size=2304, n_frames=5,
                       plans=[[SP("fixed", order=o)] for o in range(5)]))
    # --- odd + explicit-coded sample rates (ietf 19-21) ---
    subset.append(dict(rng_seed=51, depth=16, channels=2, block_size=4096, n_frames=2,
                       sample_rate=35467, sr_code_override=13, plans=lpc2() * 2))
    subset.append(dict(rng_seed=52, depth=16, channels=2, block_size=4096, n_frames=2,
                       sample_rate=39000, sr_code_override=14, plans=lpc2() * 2))
    subset.append(dict(rng_seed=53, depth=16, channels=2, block_size=2304, n_frames=2,
                       sample_rate=22050, plans=lpc2() * 2))
    subset.append(dict(rng_seed=54, depth=16, channels=1, block_size=1024, n_frames=2,
                       sample_rate=96000, sr_code_override=12,
                       plans=[[SP("lpc", order=4)]] * 2))
    # --- bit depths 8/12/20/24/32 stereo (ietf 22-23 + uncommon depths) ---
    for s, dep in enumerate([8, 12, 20, 24, 32]):
        subset.append(dict(rng_seed=55 + s, depth=dep, channels=2, block_size=2048,
                           n_frames=2, stereo_modes=["ms", "ls"], plans=lpc2() * 2))
    # --- variable blocksize streams (ietf 24-25) ---
    subset.append(dict(rng_seed=60, depth=16, channels=2,
                       block_sizes=[4096, 1152, 576, 2048], n_frames=4,
                       stereo_modes=["ms", None, "ls", "rs"], plans=lpc2() * 4))
    subset.append(dict(rng_seed=61, depth=16, channels=1,
                       block_sizes=[192, 725, 4096], n_frames=3,
                       plans=[[SP("fixed", order=2)], [SP("lpc", order=8, fit=True)],
                              [SP("lpc", order=12, fit=True)]]))
    # --- channel counts 3-8 (ietf 26-31) ---
    for s, nch in enumerate([3, 4, 5, 6, 7, 8]):
        subset.append(dict(rng_seed=62 + s, depth=16, channels=nch, block_size=256,
                           n_frames=2,
                           plans=[[SP("lpc", order=4, fit=True) for _ in range(nch)],
                                  [SP("fixed", order=2) for _ in range(nch)]]))
    # --- stereo decorrelation, one mode per file (ietf 32-35) ---
    for s, mode in enumerate(["rs", "ls", "ms", None]):
        subset.append(dict(rng_seed=68 + s, depth=16, channels=2, block_size=4096,
                           n_frames=2, stereo_modes=[mode] * 2, plans=lpc2() * 2))
    # --- metadata variants (ietf 36-41); content is opaque to both decoders,
    #     size-limit/skip handling is what's exercised ---
    md_rng = np.random.default_rng(99)
    big_padding = bytes(100 * 1024)
    seektable = b"".join(  # 18-byte seekpoints
        int(i).to_bytes(8, "big") + int(i * 1000).to_bytes(8, "big") + (4096).to_bytes(2, "big")
        for i in range(32))
    vorbis = (b"\x0b\x00\x00\x00flacgen 1.0\x02\x00\x00\x00"
              b"\x0c\x00\x00\x00TITLE=corpus" b"\x10\x00\x00\x00ARTIST=synthetic")
    picture = (b"\x00\x00\x00\x06" + b"\x00\x00\x00\x09image/png" + b"\x00" * 20 +
               (8192).to_bytes(4, "big") + md_rng.integers(0, 256, 8192, dtype=np.uint8).tobytes())
    application = b"eal!" + md_rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    cuesheet = bytes(128) + (1).to_bytes(1, "big") + bytes(395)
    for s, (mtype, mdata) in enumerate([(1, big_padding), (3, seektable), (4, vorbis),
                                        (6, picture), (2, application), (5, cuesheet)]):
        subset.append(dict(rng_seed=72 + s, depth=16, channels=2, block_size=4096,
                           n_frames=2, metadata=[(mtype, mdata)], plans=lpc2() * 2))
    # --- high sample rates at depth (ietf high-rate files) ---
    subset.append(dict(rng_seed=80, depth=24, channels=2, block_size=4096, n_frames=2,
                       sample_rate=96000, plans=lpc2() * 2))
    subset.append(dict(rng_seed=81, depth=24, channels=2, block_size=4096, n_frames=2,
                       sample_rate=192000, plans=lpc2() * 2))
    subset.append(dict(rng_seed=82, depth=16, channels=2, block_size=4096, n_frames=2,
                       sample_rate=384000, sr_code_override=0, plans=lpc2() * 2))
    # --- filling combos: escapes, high orders, mixed kinds, short tail ---
    subset.append(dict(rng_seed=83, depth=16, channels=2, block_size=4096, n_frames=2,
                       plans=[[SP("lpc", order=8, escape=True), SP("lpc", order=8)]] * 2))
    subset.append(dict(rng_seed=84, depth=16, channels=2, block_size=4096, n_frames=2,
                       plans=[[SP("lpc", order=25, fit=True), SP("lpc", order=32, fit=True)]] * 2))
    subset.append(dict(rng_seed=85, depth=16, channels=2, block_size=4096, n_frames=3,
                       plans=[[SP("constant"), SP("lpc", order=8)],
                              [SP("verbatim"), SP("fixed", order=3)],
                              [SP("lpc", order=16, fit=True), SP("verbatim")]]))
    subset.append(dict(rng_seed=86, depth=16, channels=2, block_size=4096, n_frames=3,
                       last_block_size=137, plans=lpc2() * 3))
    subset.append(dict(rng_seed=87, depth=16, channels=2, block_size=4096, n_frames=2,
                       metadata=[(1, bytes(64)), (4, b"\x04\x00\x00\x00gen\x00\x00\x00\x00"),
                                 (3, bytes(18 * 4))], plans=lpc2() * 2))
    subset.append(dict(rng_seed=88, depth=12, channels=1, block_size=254, n_frames=3,
                       uncommon_bs_code=True,
                       plans=[[SP("lpc", order=6, fit=True)]] * 3))
    subset.append(dict(rng_seed=89, depth=24, channels=2, block_size=4096, n_frames=2,
                       plans=[[SP("lpc", order=12, fit=True, partition_order=6),
                               SP("lpc", order=16, fit=True, partition_order=4)]] * 2))
    assert len(subset) == 64, len(subset)
    uncommon = [
        dict(rng_seed=11, depth=32, channels=2, block_size=512, n_frames=2,
             plans=[[SubframePlan("lpc", order=4), SubframePlan("verbatim")]] * 2),
        dict(rng_seed=12, depth=20, channels=2, block_size=1000, n_frames=2,
             uncommon_bs_code=True, stereo_modes=["ms", None],
             plans=[[SubframePlan("lpc", order=8), SubframePlan("fixed", order=2)]] * 2),
        dict(rng_seed=13, depth=12, channels=1, block_size=250, n_frames=2,
             uncommon_bs_code=True,
             plans=[[SubframePlan("fixed", order=0)], [SubframePlan("lpc", order=7)]]),
        dict(rng_seed=14, depth=16, channels=1, block_size=256, n_frames=2,
             plans=[[SubframePlan("lpc", order=5, wasted=3)], [SubframePlan("verbatim", wasted=2)]]),
        # reference-envelope extremes (TESTING.md:82-96): 1-8 channels,
        # 22.05-768 kHz, block sizes 16-65535, depths 8-32
        dict(rng_seed=15, depth=16, channels=8, block_size=256, n_frames=2,
             plans=[[SubframePlan("lpc", order=4) for _ in range(8)],
                    [SubframePlan("fixed", order=2) for _ in range(8)]]),
        dict(rng_seed=16, depth=24, channels=4, block_size=1024, n_frames=2, sample_rate=96000,
             plans=[[SubframePlan("lpc", order=8, fit=True) for _ in range(4)]] * 2),
        dict(rng_seed=17, depth=16, channels=2, block_size=16, n_frames=3, uncommon_bs_code=True,
             plans=[[SubframePlan("lpc", order=2), SubframePlan("fixed", order=1)]] * 3),
        dict(rng_seed=18, depth=16, channels=1, block_size=65535, n_frames=1, sample_rate=768000,
             plans=[[SubframePlan("lpc", order=8, fit=True)]]),
        dict(rng_seed=19, depth=32, channels=2, block_size=256, n_frames=2, sample_rate=176400,
             plans=[[SubframePlan("lpc", order=8, wasted=2), SubframePlan("verbatim")]] * 2),
        dict(rng_seed=20, depth=16, channels=3, block_size=4096, n_frames=2, sample_rate=22050,
             plans=[[SubframePlan("lpc", order=16, fit=True, partition_order=4),
                     SubframePlan("fixed", order=3),
                     SubframePlan("lpc", order=8, escape=True)]] * 2),
    ]
    from flacgen import make_flac as mk
    for i, cfg in enumerate(subset):
        blob, _ = mk(**cfg)
        (root / "subset" / f"subset_{i:02d}.flac").write_bytes(blob)
    for i, cfg in enumerate(uncommon):
        blob, _ = mk(**cfg)
        (root / "uncommon" / f"uncommon_{i:02d}.flac").write_bytes(blob)
    # uncommon expect-fail classes (reference TESTING.md:93-96): mid-stream
    # parameter changes and headerless streams are rejected (not supported
    # by either decoder).  Header size with STREAMINFO only is 4+4+34=42.
    ua, _ = mk(rng_seed=25, depth=16, channels=2, block_size=1024, n_frames=2,
               plans=[[SubframePlan("lpc", order=4)] * 2] * 2)
    ub, _ = mk(rng_seed=26, depth=16, channels=3, block_size=1024, n_frames=1,
               plans=[[SubframePlan("lpc", order=4)] * 3])
    (root / "uncommon" / "reject_midstream_channel_change.flac").write_bytes(
        ua + ub[42:])
    (root / "uncommon" / "reject_headerless.flac").write_bytes(ua[42:])
    # faulty: corrupted variants, mirroring the reference corpus's failure
    # classes (TESTING.md:98-104).  Reject-class files must fail in BOTH
    # decoders; "accept_" files carry errors both decoders tolerate
    # gracefully (garbage skipped by sync search, unvalidated header fields)
    # and must decode with verified MD5 — the reference corpus has both
    # kinds ("some files may be accepted if the error is in metadata we
    # don't validate").
    from flacgen import STANDARD_RATES, SubframePlan as SP
    blob, _ = mk(**subset[0])
    (root / "faulty" / "bad_magic.flac").write_bytes(b"fLaX" + blob[4:])
    bad2 = bytearray(blob)
    bad2[-3] ^= 0xFF  # corrupt last frame CRC region
    (root / "faulty" / "crc_mismatch.flac").write_bytes(bytes(bad2))
    (root / "faulty" / "truncated.flac").write_bytes(blob[: len(blob) // 2])
    # mid-frame truncation: cut inside the LAST frame's payload
    (root / "faulty" / "mid_frame_truncated.flac").write_bytes(blob[:-9])
    # mid-header truncation: cut inside the metadata region
    (root / "faulty" / "mid_header_truncated.flac").write_bytes(blob[:20])
    # reserved subframe type code (spec §9.2.1)
    b6, _ = mk(rng_seed=70, depth=16, channels=2, block_size=256, n_frames=1,
               plans=[[SP("reserved"), SP("fixed", order=1)]])
    (root / "faulty" / "reserved_subframe.flac").write_bytes(b6)
    # reserved residual coding method (spec §9.2.7)
    b7, _ = mk(rng_seed=71, depth=16, channels=2, block_size=256, n_frames=1,
               plans=[[SP("lpc", order=4, bad_residual_method=True),
                       SP("fixed", order=1)]])
    (root / "faulty" / "reserved_residual_method.flac").write_bytes(b7)
    # rice partition order that does not divide the block size.  "hardened_"
    # class: the reference DISCARDS decode_subframes' return value
    # (flac_decoder.cpp:220 — no `ret =`), so with a structurally-valid
    # CRC16 it reports SUCCESS and emits uninitialized memory as PCM; its
    # output is nondeterministic and not a usable oracle here.  This repo
    # propagates BLOCK_SIZE_NOT_DIVISIBLE_RICE (the check the reference has
    # at :858-861 but loses).  Pass = our decoder and CLI reject.
    b8, _ = mk(rng_seed=72, depth=16, channels=1, block_size=1000, n_frames=1,
               plans=[[SP("lpc", order=4, bad_partition_order=True)]])
    (root / "faulty" / "hardened_bad_partition_order.flac").write_bytes(b8)
    # frame channel assignment contradicting STREAMINFO (validated, :634-645)
    b9, _ = mk(rng_seed=73, depth=16, channels=2, block_size=256, n_frames=1,
               plans=[[SP("fixed", order=1), SP("fixed", order=1)]],
               ca_override=0)
    (root / "faulty" / "channel_mismatch.flac").write_bytes(b9)
    # reserved frame sample-rate code 15 (spec: invalid)
    b10, _ = mk(rng_seed=74, depth=16, channels=1, block_size=256, n_frames=1,
                plans=[[SP("fixed", order=1)]], sr_code_override=15)
    (root / "faulty" / "reserved_sample_rate.flac").write_bytes(b10)
    # accept-class: metadata block length field overflowing the file — both
    # decoders read STREAMINFO's fixed 34 bytes and tolerate the bogus
    # declared length identically ("errors in metadata we don't validate",
    # reference TESTING.md:102-104); output stays MD5-verified
    b11 = bytearray(blob)
    b11[5:8] = (0xFFFFFF).to_bytes(3, "big")  # STREAMINFO length -> 16 MB
    (root / "faulty" / "accept_metadata_overflow.flac").write_bytes(bytes(b11))
    # accept-class: junk between frames is skipped by frame sync search
    b12, _ = mk(rng_seed=75, depth=16, channels=2, block_size=1024, n_frames=3,
                plans=[[SP("lpc", order=6), SP("fixed", order=2)]] * 3,
                inter_frame_garbage=23)
    (root / "faulty" / "accept_interframe_garbage.flac").write_bytes(b12)
    # wrong (but valid) sample-rate code in the frame header: both decoders
    # validate it against STREAMINFO (reference flac_decoder.cpp:655-659;
    # no mid-stream rate changes) -> reject class
    b13, _ = mk(rng_seed=76, depth=16, channels=2, block_size=256, n_frames=2,
                plans=[[SP("fixed", order=2), SP("lpc", order=4)]] * 2,
                sr_code_override=STANDARD_RATES[48000])
    (root / "faulty" / "wrong_sample_rate.flac").write_bytes(b13)


def reference_decode(oracle_lib, blob: bytes):
    """Decode with the reference C library; returns (ok, pcm bytes or None)."""
    d = oracle_lib.ref_flac_create()
    try:
        buf = np.frombuffer(blob, np.uint8)
        rc = oracle_lib.ref_flac_read_header(
            d, buf.ctypes.data_as(C.POINTER(C.c_uint8)), buf.size)
        if rc != 0:
            return False, None
        pos = oracle_lib.ref_flac_bytes_index(d)
        out = np.zeros(oracle_lib.ref_flac_output_buffer_size_bytes(d) + 64, np.uint8)
        pcm = bytearray()
        while pos < len(blob):
            ns = C.c_uint32(0)
            chunk = buf[pos:]
            rc = oracle_lib.ref_flac_decode_frame(
                d, chunk.ctypes.data_as(C.POINTER(C.c_uint8)), chunk.size,
                out.ctypes.data_as(C.POINTER(C.c_uint8)), C.byref(ns))
            if rc != 0:
                return False, bytes(pcm)
            bps = oracle_lib.ref_flac_output_bytes_per_sample(d)
            pcm += out[: ns.value * bps].tobytes()
            pos += oracle_lib.ref_flac_bytes_index(d)
        return True, bytes(pcm)
    finally:
        oracle_lib.ref_flac_destroy(d)


def _wav_data_payload(path: Path) -> bytes:
    """Extract the data chunk payload from a RIFF/WAVE file."""
    raw = path.read_bytes()
    pos = 12  # past RIFF size WAVE
    while pos + 8 <= len(raw):
        tag, size = raw[pos : pos + 4], struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        if tag == b"data":
            return raw[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    return b""


def drive_cli(path: Path, out_dir: Path, expect_fail: bool, ref_pcm,
              warm_pool=None):
    """Drive the real user artifact — the flac_to_wav CLI — and scrape its
    output, the way the reference harness drives its compiled example binary
    (reference test_flac_decoder.py:152-259).  Checks exit code, the MD5
    PASS report, and (when the reference decoded the file) the WAV data
    payload byte-for-byte.

    By default the files are served by a WarmCliPool (examples/
    cli_worker.py): persistent worker subprocesses running the CLI's
    ``convert()`` per job, so the per-file cost is decode, not JAX startup
    (the cold suite paid ~5-10 s of import/init per file).  ``--cold-cli``
    restores one fresh subprocess per file."""
    out_wav = out_dir / (path.stem + ".wav")
    try:
        if warm_pool is not None:
            rc, stdout = warm_pool.drive(str(path), str(out_wav))
        else:
            proc = subprocess.run(
                [sys.executable, str(REPO / "examples" / "flac_to_wav.py"),
                 str(path), str(out_wav)],
                capture_output=True, text=True, timeout=900, env=os.environ.copy())
            rc, stdout = proc.returncode, proc.stdout
    except Exception:
        return False   # a hung/failed CLI marks THIS file failed, not the run
    if expect_fail:
        return rc != 0
    if rc != 0:
        return False
    if "MD5: PASS" not in stdout and "no signature" not in stdout:
        return False
    if ref_pcm is not None and _wav_data_payload(out_wav) != ref_pcm:
        return False
    return True


def test_single_file(path: Path, oracle_lib, expect_fail: bool, cli_out: Path | None = None,
                     cli_pool=None, warm_pool=None):
    """Run both oracles on one file (mirrors the reference runner's
    test_single_file, host_examples/.../test_flac_decoder.py:152-259).

    ``hardened_`` faulty files skip the reference oracle: on those inputs
    the reference reports SUCCESS while emitting uninitialized memory
    (decode_frame drops decode_subframes' return value,
    flac_decoder.cpp:220, and a structurally-valid CRC16 hides it), so its
    output is nondeterministic; pass = this repo's decoder and CLI reject.
    """
    blob = path.read_bytes()
    t0 = time.perf_counter()
    result = {"file": path.name, "md5": None, "reference_match": None,
              "cli": None, "status": "fail", "parity": None, "seconds": 0.0}

    dec = FLACDecoder()
    ok = dec.read_header(blob) == FLACDecoderResult.SUCCESS
    pcm = b""
    decode_ok = False
    if ok:
        pcm, r = dec.decode_stream(blob[dec.get_bytes_index():])
        decode_ok = all(x == FLACDecoderResult.SUCCESS for x in r["frame_results"])
        result["md5"] = bool(r["md5_ok"]) if r["md5_ok"] is not None else None
    # decode-parity (PCM produced and compared) vs reject-parity (both
    # decoders produced nothing) are different verification strengths;
    # every row says which it achieved (subset/uncommon REQUIRE decode)
    result["parity"] = "decode" if decode_ok and pcm else "reject"

    ref_ok, ref_pcm = (None, None)
    if oracle_lib is not None and not path.name.startswith("hardened_"):
        ref_ok, ref_pcm = reference_decode(oracle_lib, blob)
        result["reference_match"] = (decode_ok == ref_ok) and (not decode_ok or pcm == ref_pcm)

    if cli_out is not None:
        ref_arg = ref_pcm if (ref_ok and not expect_fail) else None
        if cli_pool is not None:   # run CLI drives concurrently
            result["_cli_future"] = cli_pool.submit(
                drive_cli, path, cli_out, expect_fail, ref_arg, warm_pool)
        else:
            result["cli"] = drive_cli(path, cli_out, expect_fail, ref_arg,
                                      warm_pool)

    if expect_fail:
        # faulty corpus: pass when BOTH decoders reject (reference runner
        # semantics, test_flac_decoder.py:241-247)
        ok_fail = not decode_ok and (ref_ok in (None, False))
        if result["cli"] is not None:
            ok_fail = ok_fail and result["cli"]
        result["status"] = "pass" if ok_fail else "fail"
    else:
        checks = [decode_ok]
        if result["md5"] is not None:
            checks.append(result["md5"])
        if result["reference_match"] is not None:
            checks.append(result["reference_match"])
        if result["cli"] is not None:
            checks.append(result["cli"])
        result["status"] = "pass" if all(checks) else "fail"
    result["seconds"] = round(time.perf_counter() - t0, 3)
    return result


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", type=Path, default=REPO / "build" / "flac_corpus")
    ap.add_argument("--out", type=Path, default=REPO / "build" / "test_results")
    ap.add_argument("--no-reference", action="store_true")
    ap.add_argument("--no-cli", action="store_true",
                    help="skip driving the flac_to_wav CLI subprocess per file")
    ap.add_argument("--cold-cli", action="store_true",
                    help="one fresh CLI subprocess per file (full startup "
                         "each time) instead of the warm worker pool")
    args = ap.parse_args()
    t_run0 = time.perf_counter()

    if not args.corpus.exists():
        print(f"generating corpus at {args.corpus}")
        generate_corpus(args.corpus)
    if not (args.corpus / "independent").exists():
        install_independent_corpus(args.corpus)

    oracle_lib = None
    ref = Path(os.environ.get("REF", "/root/reference"))
    if not args.no_reference and (ref / "src").is_dir():
        from tests.oracle import load
        oracle_lib = load().lib
    elif not args.no_reference:
        print("reference source not found: running with the MD5 oracle only")

    from concurrent.futures import ThreadPoolExecutor
    cli_pool = None if args.no_cli else ThreadPoolExecutor(max_workers=4)
    warm_pool = None
    if not args.no_cli and not args.cold_cli:
        from cli_worker import WarmCliPool
        warm_pool = WarmCliPool("flac", n_workers=4)

    categories = ["subset", "uncommon", "faulty", "independent"]
    report = {"categories": {}, "summary": {}}
    total = passed = 0
    lines = ["FLAC conformance report (esp-audio-libs-tpu)", "=" * 46,
             "corpus provenance: the official ietf-wg-cellar/flac-test-files",
             "corpus (the files the reference's TESTING.md numbers cite) is",
             "UNREACHABLE in this environment — no network egress (DNS",
             "resolution fails) and no copy exists on disk (searched / and",
             "the reference checkout).  The suite below runs the synthetic",
             "breadth mirror of those axes plus oracle-filtered independent",
             "mutants (corpus/independent/); rerun against the official",
             "files when network or a local copy is available.", ""]
    for cat in categories:
        d = args.corpus / cat
        if not d.exists():
            continue
        results = []
        cli_out = None
        if not args.no_cli:
            cli_out = args.out / "wav" / cat
            cli_out.mkdir(parents=True, exist_ok=True)
        for f in sorted(d.glob("*.flac")):
            r = test_single_file(f, oracle_lib,
                                 expect_fail=((cat == "faulty"
                                               and not f.name.startswith("accept_"))
                                              or f.name.startswith("reject_")),
                                 cli_out=cli_out, cli_pool=cli_pool,
                                 warm_pool=warm_pool)
            results.append(r)
        report["categories"][cat] = results
    # resolve the concurrent CLI drives, then finalize statuses
    for cat, results in report["categories"].items():
        for r in results:
            fut = r.pop("_cli_future", None)
            if fut is not None:
                r["cli"] = fut.result()
                if not r["cli"]:
                    r["status"] = "fail"
            total += 1
            passed += r["status"] == "pass"
            label = r["status"].upper()
            if r["status"] == "pass" and r["parity"] == "reject":
                label = "PASS-reject"   # visibly weaker than decode-parity
            lines.append(f"[{cat}] {r['file']}: {label} "
                         f"(md5={r['md5']}, ref={r['reference_match']}, cli={r['cli']}, {r['seconds']}s)")
    n_dec = sum(r["parity"] == "decode"
                for rs in report["categories"].values() for r in rs)
    report["summary"] = {"total": total, "passed": passed,
                         "failed": total - passed,
                         "decode_parity": n_dec,
                         "reject_parity": total - n_dec}
    if warm_pool is not None:
        warm_pool.close()
    wall = time.perf_counter() - t_run0
    report["summary"]["wall_seconds"] = round(wall, 1)
    report["summary"]["cli_mode"] = ("none" if args.no_cli else
                                     "cold" if args.cold_cli else "warm-pool")
    lines.insert(2, f"{passed}/{total} passed "
                    f"({n_dec} decode-parity, {total - n_dec} reject-parity); "
                    f"suite wall {wall:.1f}s "
                    f"(cli={report['summary']['cli_mode']})")

    args.out.mkdir(parents=True, exist_ok=True)
    (args.out / "test_report.txt").write_text("\n".join(lines) + "\n")
    (args.out / "test_report.json").write_text(json.dumps(report, indent=2))
    print("\n".join(lines))
    print(f"\nreports: {args.out}/test_report.{{txt,json}}")
    return 0 if passed == total else 1


if __name__ == "__main__":
    sys.exit(main())
