#!/usr/bin/env python3
"""flac_to_wav: decode FLAC files to WAV with MD5 verification.

TPU-native equivalent of the reference host example (reference:
host_examples/flac_to_wav/src/flac_to_wav.cpp): streaming FLAC decode ->
WAV writer with WAVE_FORMAT_EXTENSIBLE for 12/20/24/32-bit and multichannel
content, plus a running MD5 of the decoded PCM checked against the
STREAMINFO signature (PASS/FAIL report, :446-478).  The decode itself runs
batched on the accelerator via models/flac.py.

Usage: flac_to_wav.py input.flac output.wav [--no-verify]
"""

from __future__ import annotations

import argparse
import os
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# persistent XLA compile cache: without it every CLI invocation pays a fresh
# multi-second (tunnel: multi-minute) compile for its frame shapes — this is
# what kept the conformance suite from finishing inside one driver window
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / "build" / "jax_cache"))

import jax

# honor an explicit JAX_PLATFORMS choice even where a site plugin pins a
# different backend (the env var alone loses to plugin re-registration —
# same lesson as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

from esp_audio_libs_tpu.models.flac import FLACDecoder  # noqa: E402
from esp_audio_libs_tpu.utils.errors import FLACDecoderResult  # noqa: E402

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def write_wav_header(f, sample_rate, channels, bits_per_sample, num_samples, bytes_per_sample):
    """PCM or EXTENSIBLE header depending on depth/channels (reference
    flac_to_wav.cpp:80-152)."""
    data_size = num_samples * channels * bytes_per_sample
    byte_rate = sample_rate * channels * bytes_per_sample
    block_align = channels * bytes_per_sample
    use_ext = bits_per_sample not in (8, 16) or channels > 2

    if use_ext:
        fmt = struct.pack(
            "<HHIIHHHHI", WAVE_FORMAT_EXTENSIBLE, channels, sample_rate, byte_rate,
            block_align, bytes_per_sample * 8, 22, bits_per_sample,
            (1 << channels) - 1 if channels <= 18 else 0)
        fmt += b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"  # PCM GUID
    else:
        fmt = struct.pack("<HHIIHH", WAVE_FORMAT_PCM, channels, sample_rate, byte_rate,
                          block_align, bits_per_sample)
    f.write(b"RIFF")
    f.write(struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_size))
    f.write(b"WAVE")
    f.write(b"fmt ")
    f.write(struct.pack("<I", len(fmt)))
    f.write(fmt)
    f.write(b"data")
    f.write(struct.pack("<I", data_size))


def convert(in_path: str, out_path: str, verify: bool = True) -> int:
    try:
        blob = Path(in_path).read_bytes()
    except OSError as e:
        print(f"ERROR: cannot read {in_path}: {e.strerror}")
        return 1
    dec = FLACDecoder()
    res = dec.read_header(blob)
    if res != FLACDecoderResult.SUCCESS:
        print(f"ERROR: header parse failed: {res.name}")
        return 1

    print(f"  {dec.sample_rate} Hz, {dec.num_channels} ch, {dec.sample_depth} bit, "
          f"{dec.num_samples} samples")

    pcm, results = dec.decode_stream(blob[dec.get_bytes_index():], verify_md5=verify)
    bad = [r for r in results["frame_results"] if r != FLACDecoderResult.SUCCESS]
    if bad:
        print(f"ERROR: decode failed: {bad[-1].name} after {results['num_frames']} frames")
        return 1

    bps = dec.get_output_bytes_per_sample()
    n = results["num_samples"] // dec.num_channels
    with open(out_path, "wb") as f:
        write_wav_header(f, dec.sample_rate, dec.num_channels, dec.sample_depth, n, bps)
        f.write(pcm)

    print(f"  wrote {out_path}: {n} samples/channel, {len(pcm)} PCM bytes")
    if verify:
        if results["md5_ok"] is None:
            print("  MD5: no signature in STREAMINFO (skipped)")
        elif results["md5_ok"]:
            print("  MD5: PASS")
        else:
            print("  MD5: FAIL")
            return 2
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--no-verify", action="store_true")
    args = ap.parse_args()
    sys.exit(convert(args.input, args.output, verify=not args.no_verify))


if __name__ == "__main__":
    main()
