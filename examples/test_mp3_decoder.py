#!/usr/bin/env python3
"""MP3 conformance-suite runner.

MP3 counterpart of examples/test_flac_decoder.py.  The reference library
ships NO MP3 tests at all (SURVEY.md §4: Helix's validation was upstream),
so this harness goes beyond parity: it runs the decoder over a generated
corpus in three categories (standard / modes / faulty), verifies each file
with two oracles, and writes text + JSON reports
(test_results/mp3_test_report.{txt,json}).

Oracles:
  1. primary   — frame-for-frame differential against the reference C
                 decoder (Helix, reference src/decode/mp3_decoder.cpp
                 MP3Decode :8710-8856) compiled as a host library: error
                 codes, consumed byte counts, and PCM bytes must match
                 (PCM comparison skips frames where the reference hits its
                 __builtin_clz(0) UB — our decoder flags those).
  2. secondary — drive the mp3_to_wav CLI as a subprocess: exit code and
                 the WAV data payload vs the library decode.

Corpus (generated; no network in this image): `standard/` exercises all
MPEG versions, mono/stereo/joint-stereo (ms/is), short/mixed blocks, the
bit reservoir, tonal success frames, silence, and mid-stream garbage
resync; `modes/` exercises free-bitrate discovery incl. padding
transitions; `faulty/` holds reject classes (garbage, reserved
layer/version/samplerate, invalid bitrate, truncation, free-bitrate
without a second sync) where pass = both decoders produce zero frames and
the CLI exits nonzero (Helix semantics: bad frames inside a valid stream
zero-fill and resync, so only whole-stream rejects belong here —
MP3ClearBadFrame, reference :8677-8685).
"""

from __future__ import annotations

import argparse
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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / "build" / "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from esp_audio_libs_tpu.models.mp3 import MP3Decoder  # noqa: E402

# attempt cap is a pure runaway guard: every attempt advances >= 1 byte, so
# real files terminate by length; the CLI's --max-frames (which counts only
# PCM-producing frames) gets the same value, far above any corpus file
MAX_FRAMES = 100_000

# bump when generate_corpus changes so stale build/ corpora regenerate
CORPUS_VERSION = b"3"


def generate_corpus(root: Path):
    """Synthesize the corpus from the repo's oracle-validated generators.

    Every file carries an INTENT recorded in ``intent.json``:
      decode — the file must actually decode (>= 1 PCM frame); a report row
               that only achieves reject-parity is a FAIL for these.
      parity — fuzz inputs: pass = both decoders behave identically,
               success not promised by the name.
      reject — the stream must produce zero frames in both decoders.
    Intended-success generators are verified AT BUILD TIME: generation
    fails if a decode-intent file produces no PCM, so the corpus can never
    again ship a 'reservoir'/'tonal' file that silently tests rejection.
    """
    from tests.test_mp3_coverage import (craft_reservoir_stream,
                                         craft_tonal_frame, crafted_frame,
                                         fuzz_frame)
    from tests.test_mp3_decode import make_header
    from tests.test_mp3_modes import make_free_frame

    std = root / "standard"
    modes = root / "modes"
    faulty = root / "faulty"
    for d in (std, modes, faulty):
        d.mkdir(parents=True, exist_ok=True)
    intent = {}

    def emit(path: Path, blob: bytes, what: str):
        path.write_bytes(blob)
        intent[path.name] = what
        if what == "decode":
            _, n_ok, _, _ = our_decode_loop(blob)
            assert n_ok >= 1, (
                f"{path.name} is an intended-SUCCESS corpus file but decoded "
                f"zero frames — generator bug, refusing to ship it")
        elif what == "decode_long":
            # long streams: build-time sanity on a prefix only (the runner
            # verifies full-stream frame-for-frame parity via decode_run)
            _, n_ok, _, _ = our_decode_loop(blob[:8192])
            assert n_ok >= 1, (
                f"{path.name} long-stream prefix decoded zero frames — "
                f"generator bug, refusing to ship it")

    # ---- standard: every version x rate x channel-mode family ------------
    # (MPEG-2.5 configs live in faulty/: the reference's 12-bit sync mask
    # makes ver_bits==0 unreachable — dead code in the reference itself,
    # include/mp3_decoder.h:41-42, mp3_decoder.cpp:8309-8318; see PARITY.md)
    fuzz_cfgs = [
        ("mpeg1_mono_128k", dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=3)),
        ("mpeg1_stereo_192k", dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)),
        ("mpeg1_joint_ms", dict(ver_bits=3, bitrate_idx=11, sr_idx=1, mode=1, mode_ext=2)),
        ("mpeg1_joint_ms_is", dict(ver_bits=3, bitrate_idx=11, sr_idx=2, mode=1, mode_ext=3)),
        ("mpeg1_joint_is", dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=1, mode_ext=1)),
        ("mpeg2_stereo", dict(ver_bits=2, bitrate_idx=8, sr_idx=0, mode=0)),
        ("mpeg2_intensity", dict(ver_bits=2, bitrate_idx=8, sr_idx=1, mode=1, mode_ext=1)),
        ("mpeg2_mono", dict(ver_bits=2, bitrate_idx=7, sr_idx=2, mode=3)),
    ]
    for i, (name, cfg) in enumerate(fuzz_cfgs):
        rng = np.random.default_rng(1000 + i)
        blob = b"".join(fuzz_frame(cfg, rng) for _ in range(4))
        emit(std / f"fuzz_{name}.mp3", blob, "parity")

    tonal_cfgs = [
        ("mpeg1_stereo", dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)),
        ("mpeg1_mono", dict(ver_bits=3, bitrate_idx=9, sr_idx=1, mode=3)),
        ("mpeg2_stereo", dict(ver_bits=2, bitrate_idx=7, sr_idx=0, mode=0)),
        # joint-stereo success paths: real spectra through mid/side and
        # intensity reconstruction (reference MidSideProc :1139,
        # IntensityProcMPEG1 :1180)
        ("mpeg1_joint_ms", dict(ver_bits=3, bitrate_idx=9, sr_idx=0,
                                mode=1, mode_ext=2)),
        ("mpeg1_joint_is", dict(ver_bits=3, bitrate_idx=9, sr_idx=0,
                                mode=1, mode_ext=1)),
        ("mpeg1_joint_ms_is", dict(ver_bits=3, bitrate_idx=9, sr_idx=0,
                                   mode=1, mode_ext=3)),
    ]
    for i, (name, cfg) in enumerate(tonal_cfgs):
        rng = np.random.default_rng(2000 + i)
        blob = b"".join(craft_tonal_frame(cfg, rng) for _ in range(4))
        emit(std / f"tonal_{name}.mp3", blob, "decode")

    win_cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)
    for bt, mixed in [(1, 0), (2, 0), (2, 1), (3, 0)]:
        rng = np.random.default_rng(3000 + bt * 2 + mixed)
        blob = b"".join(crafted_frame(win_cfg, bt, mixed, rng) for _ in range(3))
        emit(std / f"windows_bt{bt}_mixed{mixed}.mp3", blob, "decode")
    rng = np.random.default_rng(3100)
    blob = b"".join(crafted_frame(dict(ver_bits=2, bitrate_idx=8, sr_idx=0, mode=0),
                                  2, 1, rng) for _ in range(3))
    emit(std / "windows_mpeg2_short_mixed.mp3", blob, "decode")

    # bit reservoir: REAL backreferences — mainDataBegin computed from
    # packing the main-data byte stream across frames, every frame decodes
    # (reference mainBuf assembly :8774-8802).  The old random-payload
    # reservoir files never decoded a frame; they live on as fuzz parity
    # inputs below.
    for seed in (0, 1):
        rng = np.random.default_rng(100 + seed)
        cfgs = [dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)] * 5
        emit(std / f"reservoir_{seed}.mp3",
             craft_reservoir_stream(cfgs, rng, gains=(200 + seed, 235)),
             "decode")
    rng = np.random.default_rng(102)
    from tests.test_mp3_decode import frame_sizes
    cfg = dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)
    total, _ = frame_sizes(3, 11, 0, 0)
    emit(std / "fuzz_reservoir_random.mp3",
         b"".join(make_header(**cfg)
                  + rng.integers(0, 256, total - 4, dtype=np.uint8).tobytes()
                  for _ in range(5)),
         "parity")

    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=3)
    total, _ = frame_sizes(3, 9, 0, 3)
    emit(std / "silence.mp3",
         (make_header(**cfg) + bytes(total - 4)) * 3, "decode")

    # VBR: the bitrate index changes frame to frame (the common LAME
    # shape); the reference re-parses the header every frame and the frame
    # slot size follows along
    rng = np.random.default_rng(4100)
    emit(std / "vbr_tonal.mp3", b"".join(
        craft_tonal_frame(dict(ver_bits=3, bitrate_idx=br, sr_idx=0, mode=0),
                          rng)
        for br in (9, 13, 7, 11)), "decode")
    # VBR + reservoir: backreferences cross differently-sized slots
    rng = np.random.default_rng(4101)
    emit(std / "vbr_reservoir.mp3",
         craft_reservoir_stream(
             [dict(ver_bits=3, bitrate_idx=br, sr_idx=0, mode=0)
              for br in (9, 12, 6, 11, 13)], rng),
         "decode")

    # mid-stream garbage: decoder must resync to the next frame (values
    # < 0xFF so no false sync word appears inside the junk)
    rng = np.random.default_rng(42)
    f1 = craft_tonal_frame(dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0), rng)
    junk = bytes(int(x) for x in rng.integers(0, 0xFE, 37))
    f2 = craft_tonal_frame(dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0), rng)
    emit(std / "midstream_garbage.mp3", f1 + junk + f2, "decode")

    # ---- modes: free bitrate (bitrate_idx=0, size discovered from the
    # second sync — reference MP3FindFreeSync :8570-8610) -----------------
    emit(modes / "free_silent.mp3",
         b"".join(make_free_frame(100) for _ in range(4)), "decode")
    rng = np.random.default_rng(7)
    emit(modes / "free_tonal.mp3",
         b"".join(make_free_frame(120, tonal_rng=rng, mode=0) for _ in range(4)),
         "decode")
    emit(modes / "free_padding.mp3",
         b"".join(make_free_frame(100, padding=p) for p in (0, 1, 1, 0)),
         "decode")

    # ---- long: >=30 s real-encoder-shaped streams (VERDICT r4 #4) --------
    # ~1152 frames per file, full-stream frame-for-frame PCM parity vs the
    # oracle; reservoir occupancy EVOLVES over hundreds of frames (the
    # mainBuf path the reference was battle-tested on, reference
    # mp3_decoder.cpp:8774-8802).  Frame counts are multiples of the
    # runner's decode_run chunk (128) so one compiled shape covers the run.
    longd = root / "long"
    longd.mkdir(parents=True, exist_ok=True)
    NLONG = 1152   # 30.1 s at 44.1k MPEG-1 / 22.05k MPEG-2
    rng = np.random.default_rng(9001)
    emit(longd / "long_tonal_mpeg1_stereo.mp3",
         b"".join(craft_tonal_frame(
             dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0), rng)
             for _ in range(NLONG)), "decode_long")
    rng = np.random.default_rng(9002)
    emit(longd / "long_reservoir_mpeg1_stereo.mp3",
         craft_reservoir_stream(
             [dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0)] * NLONG,
             rng, gains=(200, 235)), "decode_long")
    rng = np.random.default_rng(9003)
    emit(longd / "long_vbr_reservoir_mpeg1.mp3",
         craft_reservoir_stream(
             [dict(ver_bits=3, bitrate_idx=(9, 12, 6, 11, 13)[i % 5],
                   sr_idx=0, mode=0) for i in range(NLONG)], rng),
         "decode_long")
    rng = np.random.default_rng(9004)
    emit(longd / "long_tonal_mpeg2_stereo.mp3",
         b"".join(craft_tonal_frame(
             dict(ver_bits=2, bitrate_idx=7, sr_idx=0, mode=0), rng)
             for _ in range(NLONG)), "decode_long")

    # ---- faulty: whole-stream reject classes -----------------------------
    rng = np.random.default_rng(13)
    emit(faulty / "garbage.mp3",
         bytes(int(x) for x in rng.integers(0, 0xFE, 512)), "reject")
    emit(faulty / "empty.mp3", b"", "reject")
    # MPEG-2.5 is UNREACHABLE in the reference: its sync mask demands 12 set
    # bits, so a header with ver_bits==0 never syncs (verIdx==0 is dead
    # code, include/mp3_decoder.h:41-42, mp3_decoder.cpp:8309-8318).  These
    # verify that this decoder rejects them the same way — reject-parity,
    # named as such (they used to sit in standard/ as tonal_/fuzz_mpeg25).
    rng = np.random.default_rng(1008)
    emit(faulty / "mpeg25_sync_unreachable_mono.mp3",
         b"".join(craft_tonal_frame(
             dict(ver_bits=0, bitrate_idx=8, sr_idx=0, mode=3),
             np.random.default_rng(2006)) for _ in range(4)), "reject")
    emit(faulty / "mpeg25_sync_unreachable_stereo.mp3",
         b"".join(fuzz_frame(dict(ver_bits=0, bitrate_idx=8, sr_idx=1, mode=0),
                             rng) for _ in range(4)), "reject")
    # hardened_: the reference over-reads a truncated input buffer here
    # (one of the ASan-documented reference memory-safety bugs,
    # native/sanitize_check.sh), so its result is undefined garbage; pass =
    # this repo's hardened decoder and the CLI reject. The C oracle is
    # skipped for hardened_ files, as in the FLAC runner.
    emit(faulty / "hardened_truncated_header.mp3", b"\xff\xfb", "reject")
    emit(faulty / "reserved_layer.mp3",
         make_header(layer_bits=0) + bytes(200), "reject")
    emit(faulty / "reserved_version.mp3",
         make_header(ver_bits=1) + bytes(200), "reject")
    emit(faulty / "reserved_samplerate.mp3",
         make_header(sr_idx=3) + bytes(200), "reject")
    emit(faulty / "invalid_bitrate.mp3",
         make_header(bitrate_idx=15) + bytes(200), "reject")
    emit(faulty / "free_no_second_sync.mp3", make_free_frame(100), "reject")
    (root / "intent.json").write_text(json.dumps(intent, indent=1))
    # completeness sentinel: an interrupted generation (dirs exist, files
    # partial) must regenerate on the next run, not silently test a subset;
    # the value versions the corpus layout (bump on generator changes)
    (root / ".complete").write_bytes(CORPUS_VERSION)


def our_decode_loop(data: bytes):
    """Decode a whole file with the CLI's loop semantics (mp3_to_wav.py):
    returns (frames [(err, consumed, defined)], success_count, payload,
    pcm_per_success_frame list)."""
    dec = MP3Decoder()
    start = MP3Decoder.find_sync_word(data)
    if start < 0:
        return [], 0, b"", []
    pos = start
    frames, pcms = [], []
    payload = b""
    n_ok = 0
    while pos < len(data) and len(frames) < MAX_FRAMES:
        err, pcm, consumed = dec.decode(data[pos:])
        defined = bool(dec.last_frame_reference_defined)
        frames.append((int(err), int(consumed), defined))
        if pcm is not None:
            payload += bytes(memoryview(pcm))
        if int(err) == 0:
            n_ok += 1
            pcms.append(None if pcm is None else bytes(memoryview(pcm)))
        else:
            pcms.append(None)
        if consumed <= 0:
            nxt = MP3Decoder.find_sync_word(data[pos + 1:])
            if nxt < 0:
                break
            pos += 1 + nxt
        else:
            pos += consumed
    return frames, n_ok, payload, pcms


def our_decode_run_loop(data: bytes, chunk: int = 128):
    """Long-stream our-side loop: same per-frame semantics as
    :func:`our_decode_loop` (pinned by tests/test_mp3_decode.py's
    decode==decode_run parity), but each ``chunk`` frames synthesize as ONE
    fused device dispatch — hundreds-to-thousands of frames per file stay
    tractable.  Well-formed streams only (the long/ category); an advance
    stall ends the loop and parity-vs-oracle then fails visibly."""
    from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder

    dec = BatchedMP3Decoder(1)
    frames, pcms = [], []
    payload = b""
    n_ok = 0
    pos = 0
    while pos < len(data) and len(frames) < MAX_FRAMES:
        runs = dec.decode_run([data[pos:]], chunk)
        rr = runs[0]
        if not rr:
            break
        defined = bool(dec.last_frame_reference_defined[0])
        for (err, pcm, consumed) in rr:
            frames.append((int(err), int(consumed), defined))
            b = None if pcm is None else bytes(memoryview(np.asarray(pcm)))
            if b is not None:
                payload += b
            if int(err) == 0:
                n_ok += 1
                pcms.append(b)
            else:
                pcms.append(None)
        adv = int(runs.next_pos[0])
        if adv <= 0:
            break
        pos += adv
    return frames, n_ok, payload, pcms


def ref_decode_loop(oracle, data: bytes):
    """Reference decode with the SAME loop/resync policy as our_decode_loop
    (the single-frame FFI call is shared via tests.oracle.mp3_decode_frame)."""
    from tests.oracle import mp3_decode_frame

    h = oracle.lib.ref_mp3_init()
    try:
        buf = np.frombuffer(data, np.uint8)
        start = MP3Decoder.find_sync_word(data)  # sync scan is format-defined
        if start < 0:
            return [], 0, []
        pos = start
        frames, pcms = [], []
        n_ok = 0
        while pos < len(buf) and len(frames) < MAX_FRAMES:
            err, pcm, consumed = mp3_decode_frame(oracle, h, buf, pos)
            frames.append((err, consumed))
            if err == 0:
                n_ok += 1
                pcms.append(pcm.tobytes())
            else:
                pcms.append(None)
            if consumed <= 0:
                nxt = MP3Decoder.find_sync_word(data[pos + 1:])
                if nxt < 0:
                    break
                pos += 1 + nxt
            else:
                pos += consumed
        return frames, n_ok, pcms
    finally:
        oracle.lib.ref_mp3_free(h)


def _wav_data_payload(path: Path) -> bytes:
    raw = path.read_bytes()
    pos = 12
    while pos + 8 <= len(raw):
        tag, size = raw[pos: pos + 4], struct.unpack("<I", raw[pos + 4: pos + 8])[0]
        if tag == b"data":
            return raw[pos + 8: pos + 8 + size]
        pos += 8 + size + (size & 1)
    return b""


def drive_cli(path: Path, out_dir: Path, expect_fail: bool, expected_payload,
              warm_pool=None):
    """Drive the mp3_to_wav CLI: exit code + WAV payload.
    ``expected_payload is None`` means the library produced zero frames, so
    the CLI must exit nonzero (it writes no WAV without frames).  Served by
    a WarmCliPool by default (examples/cli_worker.py — per-file cost is
    decode, not JAX startup); ``--cold-cli`` restores one fresh subprocess
    per file."""
    out_wav = out_dir / (path.stem + ".wav")
    try:
        if warm_pool is not None:
            rc, _ = warm_pool.drive(str(path), str(out_wav),
                                    max_frames=MAX_FRAMES)
        else:
            proc = subprocess.run(
                [sys.executable, str(REPO / "examples" / "mp3_to_wav.py"),
                 str(path), str(out_wav), "--max-frames", str(MAX_FRAMES)],
                capture_output=True, text=True, timeout=900, env=os.environ.copy())
            rc = proc.returncode
    except Exception:
        return False
    if expect_fail or expected_payload is None:
        return rc != 0
    if rc != 0:
        return False
    return _wav_data_payload(out_wav) == expected_payload


def test_single_file(path: Path, oracle, expect_fail: bool,
                     cli_out: Path | None = None, cli_pool=None,
                     intent: str = "parity", warm_pool=None):
    blob = path.read_bytes()
    t0 = time.perf_counter()
    result = {"file": path.name, "frames": 0, "reference_match": None,
              "cli": None, "status": "fail", "intent": intent,
              "parity": None, "seconds": 0.0}

    if intent == "decode_long":
        frames, n_ok, payload, pcms = our_decode_run_loop(blob)
    else:
        frames, n_ok, payload, pcms = our_decode_loop(blob)
    result["frames"] = n_ok

    ref_ok = None
    if oracle is not None and not path.name.startswith("hardened_"):
        rframes, rn_ok, rpcms = ref_decode_loop(oracle, blob)
        ref_ok = len(rframes) == len(frames) and rn_ok == n_ok
        for (ge, gc, gdef), (re_, rc) in zip(frames, rframes):
            ref_ok = ref_ok and ge == re_ and gc == rc
        for (ge, gc, gdef), gp, rp in zip(frames, pcms, rpcms):
            if ge == 0 and gdef:
                # UB-flagged frames: the reference PCM is nondeterministic
                # (__builtin_clz(0) in guard-bit tracking); skip those
                ref_ok = ref_ok and gp is not None and rp is not None \
                    and len(gp) == len(rp) and gp == rp
        result["reference_match"] = bool(ref_ok)

    if cli_out is not None:
        result["_cli_future"] = cli_pool.submit(
            drive_cli, path, cli_out, expect_fail,
            payload if n_ok else None, warm_pool)

    result["_expect_fail"] = expect_fail
    result["_n_ok"] = n_ok
    result["seconds"] = round(time.perf_counter() - t0, 3)
    return result


def finalize_status(result):
    """Compute pass/fail once every oracle has resolved (the CLI drive runs
    as a deferred future).  Parity is necessary but NOT sufficient: a
    decode-parity row (frames >= 1, PCM compared) and a reject-parity row
    (both decoders produced nothing) are different verification strengths,
    so each row reports which one it achieved and its generator-declared
    INTENT is enforced — a file named/intended for success that only
    achieves reject-parity is a FAIL, never a silent PASS.  At least one
    oracle must have run; otherwise the file fails rather than passing
    vacuously."""
    n_ok = result["_n_ok"]
    result["parity"] = "decode" if n_ok > 0 else "reject"
    checks = []
    if result["reference_match"] is not None:
        checks.append(result["reference_match"])
    if result["cli"] is not None:
        checks.append(result["cli"])
    if result.pop("_expect_fail"):
        checks.append(n_ok == 0)
    if result["intent"] == "decode":
        checks.append(n_ok >= 1)
    elif result["intent"] == "decode_long":
        checks.append(n_ok >= 1100)   # >=30 s streams: ~1152 frames each
    elif result["intent"] == "reject":
        checks.append(n_ok == 0)
    result.pop("_n_ok")
    result["status"] = "pass" if checks and all(checks) else "fail"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", type=Path, default=REPO / "build" / "mp3_corpus")
    ap.add_argument("--out", type=Path, default=REPO / "build" / "test_results")
    ap.add_argument("--no-reference", action="store_true")
    ap.add_argument("--no-cli", action="store_true")
    ap.add_argument("--cold-cli", action="store_true",
                    help="one fresh CLI subprocess per file instead of the "
                         "warm worker pool")
    args = ap.parse_args()
    t_run0 = time.perf_counter()

    sentinel = args.corpus / ".complete"
    if not sentinel.exists() or sentinel.read_bytes() != CORPUS_VERSION:
        print(f"generating corpus at {args.corpus}")
        generate_corpus(args.corpus)
    intents = json.loads((args.corpus / "intent.json").read_text())

    # committed independent category (tools/mp3mut.py): oracle-accepted
    # structural mutants, none authored by the generator path above; each
    # was verified >= 1 decoded frame at generation, so intent is decode
    ind_src = REPO / "corpus" / "independent_mp3"
    if ind_src.is_dir():
        ind_dst = args.corpus / "independent"
        ind_dst.mkdir(parents=True, exist_ok=True)
        for f in ind_src.glob("*.mp3"):
            (ind_dst / f.name).write_bytes(f.read_bytes())
            intents.setdefault(f.name, "decode")

    oracle = None
    ref = Path(os.environ.get("REF", "/root/reference"))
    if not args.no_reference and (ref / "src").is_dir():
        from tests.oracle import load
        oracle = load()
    elif not args.no_reference:
        print("reference source not found: running without the C oracle")

    from concurrent.futures import ThreadPoolExecutor
    cli_pool = ThreadPoolExecutor(max_workers=4)
    warm_pool = None
    if not args.no_cli and not args.cold_cli:
        from cli_worker import WarmCliPool
        warm_pool = WarmCliPool("mp3", n_workers=4)

    report = {"categories": {}, "summary": {}}
    total = passed = 0
    lines = ["MP3 conformance report (esp-audio-libs-tpu)", "=" * 45]
    for cat in ["standard", "modes", "long", "faulty", "independent"]:
        d = args.corpus / cat
        if not d.exists():
            continue
        cli_out = None
        if not args.no_cli and cat != "long":
            cli_out = args.out / "mp3_wav" / cat
            cli_out.mkdir(parents=True, exist_ok=True)
        results = [test_single_file(f, oracle, expect_fail=(cat == "faulty"),
                                    cli_out=cli_out, cli_pool=cli_pool,
                                    intent=intents.get(f.name, "parity"),
                                    warm_pool=warm_pool)
                   for f in sorted(d.glob("*.mp3"))]
        report["categories"][cat] = results
    for cat, results in report["categories"].items():
        for r in results:
            fut = r.pop("_cli_future", None)
            if fut is not None:
                r["cli"] = fut.result()
            finalize_status(r)
            total += 1
            passed += r["status"] == "pass"
            label = r["status"].upper()
            if r["status"] == "pass" and r["parity"] == "reject":
                label = "PASS-reject"   # visibly weaker than decode-parity
            lines.append(f"[{cat}] {r['file']}: {label} "
                         f"(frames={r['frames']}, intent={r['intent']}, "
                         f"ref={r['reference_match']}, "
                         f"cli={r['cli']}, {r['seconds']}s)")
    n_dec = sum(r["parity"] == "decode"
                for rs in report["categories"].values() for r in rs)
    report["summary"] = {"total": total, "passed": passed,
                         "failed": total - passed,
                         "decode_parity": n_dec,
                         "reject_parity": total - n_dec}
    if total == 0:
        print("ERROR: empty corpus — nothing was tested")
        return 1
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
    (args.out / "mp3_test_report.txt").write_text("\n".join(lines) + "\n")
    (args.out / "mp3_test_report.json").write_text(json.dumps(report, indent=2))
    print("\n".join(lines))
    print(f"\nreports: {args.out}/mp3_test_report.{{txt,json}}")
    return 0 if passed == total else 1


if __name__ == "__main__":
    sys.exit(main())
