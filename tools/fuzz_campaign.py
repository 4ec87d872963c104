#!/usr/bin/env python3
"""Long-running randomized differential fuzz campaign vs the C oracle.

CI's differential suites run fixed seeds; this tool draws FRESH random
cases every run — random FLAC encode plans (subframe types, LPC orders
1-32, precisions, shifts, wasted bits, partition orders, escapes, stereo
modes, fitted/noise signals) and random MP3 frame streams (all version x
rate x mode families, random side info / main data / mainDataBegin, plus
crafted tonal and window-switch frames) — and pins our pipelines
byte-for-byte against the reference compiled as the oracle.

Every case is reproducible from the printed campaign seed.  Shapes are
drawn from a small pool so XLA compiles stay bounded (the entropy is in
the bitstreams, which don't change kernel shapes).

    python tools/fuzz_campaign.py --kind all --n 200 --seed 12345

Exit 0 = every case matched; 1 = mismatch (details printed).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

# bounded shape pools (each new (block, depth, ch, width-class) bucket is
# an XLA compile; the bitstream-level entropy is shape-free)
FLAC_BLOCKS = [192, 576, 1024, 4096]
FLAC_DEPTHS = [8, 16, 24, 32]
FLAC_CHANNELS = [1, 2, 8]


def _random_plan(rng, depth):
    kind = rng.choice(["constant", "verbatim", "fixed", "lpc", "lpc", "lpc"])
    from flacgen import SubframePlan

    if kind == "constant":
        return SubframePlan("constant", wasted=int(rng.integers(0, 3)))
    if kind == "verbatim":
        return SubframePlan("verbatim", wasted=int(rng.integers(0, 2)))
    if kind == "fixed":
        return SubframePlan("fixed", order=int(rng.integers(0, 5)),
                            partition_order=int(rng.integers(0, 3)),
                            wasted=int(rng.integers(0, 2)))
    return SubframePlan(
        "lpc", order=int(rng.integers(1, 33)),
        precision=int(rng.integers(4, 16)),
        shift=int(rng.integers(1, 15)),
        partition_order=int(rng.integers(0, 4)),
        wasted=int(rng.integers(0, 2)),
        escape=bool(rng.integers(0, 4) == 0),
        fit=bool(rng.integers(0, 3) == 0))


def fuzz_flac_case(oracle, seed: int) -> str | None:
    """One random FLAC stream, ours vs oracle. Returns None or error text."""
    from flacgen import make_flac

    from esp_audio_libs_tpu.models.flac import FLACDecoder
    from tests.test_flac import oracle_decode_all

    rng = np.random.default_rng(seed)
    ch = int(rng.choice(FLAC_CHANNELS))
    depth = int(rng.choice(FLAC_DEPTHS))
    block = int(rng.choice(FLAC_BLOCKS))
    n_frames = int(rng.integers(1, 4))
    plans = [[_random_plan(rng, depth) for _ in range(ch)]
             for _ in range(n_frames)]
    stereo_modes = None
    if ch == 2:
        stereo_modes = [rng.choice([None, "ls", "rs", "ms"])
                        for _ in range(n_frames)]
    try:
        blob, _pcm = make_flac(rng_seed=seed, depth=depth, channels=ch,
                               block_size=block, n_frames=n_frames,
                               plans=plans, stereo_modes=stereo_modes)
    except (ValueError, AssertionError):
        return None   # generator rejected the combo — not a decode finding

    rc_ref, info_ref, frames_ref = oracle_decode_all(oracle, blob)

    dec = FLACDecoder()
    rc = dec.read_header(blob)
    if int(rc) != int(rc_ref):
        return f"header rc {int(rc)} != ref {int(rc_ref)}"
    if rc_ref != 0:
        return None
    pcm, info = dec.decode_stream(blob[dec.get_bytes_index():])
    ref_pcm = b"".join(p for _rc, p, _n in frames_ref)
    ref_rcs = [int(r) for r, _p, _n in frames_ref]
    got_rcs = [int(r) for r in info["frame_results"]]
    if got_rcs != ref_rcs:
        return f"frame rcs {got_rcs} != ref {ref_rcs}"
    if bytes(pcm) != ref_pcm:
        n = min(len(pcm), len(ref_pcm))
        diff = next((i for i in range(n) if pcm[i] != ref_pcm[i]), n)
        return (f"pcm mismatch at byte {diff} "
                f"(lens {len(pcm)}/{len(ref_pcm)}; depth={depth} ch={ch} "
                f"block={block})")
    return None


def fuzz_mp3_case(oracle, seed: int) -> str | None:
    """One random MP3 stream, ours vs oracle frame-for-frame."""
    from tests.test_mp3_coverage import craft_tonal_frame, crafted_frame
    from tests.test_mp3_decode import (compare_streams, frame_sizes,
                                       make_header)

    rng = np.random.default_rng(seed)
    ver_bits = int(rng.choice([3, 2, 0]))
    sr_idx = int(rng.integers(0, 3))
    mode, mode_ext = [(0, 0), (3, 0), (1, 1), (1, 2), (1, 3)][
        int(rng.integers(0, 5))]
    br_pool = [5, 7, 8, 9, 11, 12, 13] if ver_bits == 3 else [5, 7, 8]
    cfg = dict(ver_bits=ver_bits, sr_idx=sr_idx, mode=mode,
               mode_ext=mode_ext, bitrate_idx=int(rng.choice(br_pool)))
    n_frames = int(rng.integers(2, 7))
    stream = b""
    for f in range(n_frames):
        # per-frame bitrate (VBR) in a third of cases
        fcfg = dict(cfg)
        if rng.integers(0, 3) == 0:
            fcfg["bitrate_idx"] = int(rng.choice(br_pool))
        roll = int(rng.integers(0, 4))
        try:
            if roll == 0:
                frame = craft_tonal_frame(fcfg, rng)
            elif roll == 1:
                bt, mixed = [(0, 0), (1, 0), (2, 0), (2, 1), (3, 0)][
                    int(rng.integers(0, 5))]
                frame = crafted_frame(fcfg, bt, mixed, rng)
            else:
                raise AssertionError   # take the fuzz-body path below
        except AssertionError:
            # crafted generators reject tiny frame slots — fuzz body instead
            total, _side = frame_sizes(fcfg["ver_bits"], fcfg["bitrate_idx"],
                                       fcfg["sr_idx"], fcfg["mode"])
            body = bytearray(rng.integers(0, 256, total - 4,
                                          dtype=np.uint8).tobytes())
            if f == 0 and roll == 2:
                body[0] = 0            # self-contained first frame sometimes
                if fcfg["ver_bits"] == 3:
                    body[1] &= 0x7F
            frame = make_header(**fcfg) + bytes(body)
        stream += frame
    try:
        compare_streams(oracle, stream, n_frames)
    except AssertionError as e:
        return f"{type(e).__name__}: {str(e)[:300]} (cfg={cfg})"
    return None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kind", choices=["flac", "mp3", "all"], default="all")
    ap.add_argument("--n", type=int, default=100, help="cases per kind")
    ap.add_argument("--seed", type=int, default=None,
                    help="campaign seed (default: time-derived, printed)")
    args = ap.parse_args()
    seed = args.seed if args.seed is not None else int(time.time()) % 2**31
    print(f"campaign seed: {seed}")

    sys.path.insert(0, str(REPO / "tests"))
    from tests import oracle as oracle_mod

    o = oracle_mod.load()
    failures = []
    t0 = time.time()
    kinds = ["flac", "mp3"] if args.kind == "all" else [args.kind]
    for kind in kinds:
        fn = fuzz_flac_case if kind == "flac" else fuzz_mp3_case
        for i in range(args.n):
            case_seed = seed + i * 2654435761 % 2**31
            err = fn(o, case_seed)
            if err:
                failures.append((kind, case_seed, err))
                print(f"FAIL [{kind} seed={case_seed}]: {err}")
            if (i + 1) % 25 == 0:
                print(f"  {kind}: {i + 1}/{args.n} "
                      f"({time.time() - t0:.0f}s, {len(failures)} failures)")
    print(f"done: {args.n * len(kinds)} cases, {len(failures)} failures, "
          f"{time.time() - t0:.0f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
