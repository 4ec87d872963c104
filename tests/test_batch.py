"""Batched multi-stream decoders must be bit-identical to per-stream decode.

The batching layer (models/batch.py) only regroups work — frames from many
streams fold into the lane axis of the same kernels the single-stream paths
use — so every output byte must match decoding each stream alone.  This is
the data-parallel serving layer the reference doesn't have (SURVEY.md §2
parallelism table: reference is one-instance-per-stream, caller-parallel).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder, BatchedMP3Decoder
from esp_audio_libs_tpu.models.flac import FLACDecoder
from esp_audio_libs_tpu.models.mp3 import MP3Decoder
from esp_audio_libs_tpu.utils.errors import FLACDecoderResult


def _flac_corpus():
    from flacgen import SubframePlan, make_flac

    cfgs = [
        dict(rng_seed=21, depth=16, channels=2, block_size=1024, n_frames=3,
             stereo_modes=["ms", "ls", None],
             plans=[[SubframePlan("lpc", order=8), SubframePlan("fixed", order=2)]] * 3),
        dict(rng_seed=22, depth=16, channels=2, block_size=1024, n_frames=3,
             plans=[[SubframePlan("lpc", order=4), SubframePlan("lpc", order=12)]] * 3),
        dict(rng_seed=23, depth=24, channels=1, block_size=512, n_frames=2,
             plans=[[SubframePlan("lpc", order=6)], [SubframePlan("verbatim")]]),
        dict(rng_seed=24, depth=8, channels=2, block_size=1024, n_frames=2,
             plans=[[SubframePlan("constant"), SubframePlan("fixed", order=1)]] * 2),
    ]
    return [make_flac(**c)[0] for c in cfgs]


def test_batched_flac_matches_single():
    blobs = _flac_corpus()
    bat = BatchedFLACDecoder(len(blobs))
    hdrs = bat.read_headers(blobs)
    assert all(h == FLACDecoderResult.SUCCESS for h in hdrs)
    results = bat.decode_streams(
        [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)])

    for blob, (pcm, info) in zip(blobs, results):
        ref = FLACDecoder()
        assert ref.read_header(blob) == FLACDecoderResult.SUCCESS
        ref_pcm, ref_info = ref.decode_stream(blob[ref.get_bytes_index():])
        assert pcm == ref_pcm
        assert info["md5_ok"] is True
        assert info["num_samples"] == ref_info["num_samples"]
        assert info["frame_results"] == ref_info["frame_results"]


def test_batched_flac_skip_stream():
    blobs = _flac_corpus()[:2]
    bat = BatchedFLACDecoder(2)
    bat.read_headers(blobs)
    results = bat.decode_streams([blobs[0][bat.decoders[0].get_bytes_index():], None])
    assert results[1] == (b"", None)
    assert len(results[0][0]) > 0 and results[0][1]["md5_ok"] is True


def _mp3_header(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0, mode_ext=0):
    b1 = 0xE0 | (ver_bits << 3) | (1 << 1) | 1
    b2 = (bitrate_idx << 4) | (sr_idx << 2)
    b3 = (mode << 6) | (mode_ext << 4)
    return bytes([0xFF, b1, b2, b3])


def _mp3_stream(cfg, seed, n_frames=3):
    from esp_audio_libs_tpu.runtime.tables import mp3_tables

    T = mp3_tables()
    ver = {3: 0, 2: 1, 0: 2}[cfg["ver_bits"]]
    total = int(T["slotTab"][ver][cfg["sr_idx"]][cfg["bitrate_idx"]])
    hdr = _mp3_header(**cfg)
    rng = np.random.default_rng(seed)
    stream = b""
    for _ in range(n_frames):
        body = bytearray(rng.integers(0, 256, total - 4, dtype=np.uint8).tobytes())
        body[0] = 0                      # mainDataBegin = 0 (self-contained)
        if cfg["ver_bits"] == 3:
            body[1] &= 0x7F
        stream += hdr + bytes(body)
    return stream, n_frames


MP3_CFGS = [
    dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=3),                # mono
    dict(ver_bits=3, bitrate_idx=11, sr_idx=0, mode=0),               # stereo
    dict(ver_bits=3, bitrate_idx=11, sr_idx=1, mode=1, mode_ext=2),   # joint ms
    dict(ver_bits=2, bitrate_idx=8, sr_idx=0, mode=0),                # MPEG2
]


@pytest.mark.parametrize("homogeneous", [True, False])
def test_batched_mp3_matches_single(homogeneous):
    cfgs = [MP3_CFGS[1]] * 4 if homogeneous else MP3_CFGS
    streams = [_mp3_stream(c, seed=40 + i) for i, c in enumerate(cfgs)]
    n = len(streams)

    bat = BatchedMP3Decoder(n)
    singles = [MP3Decoder() for _ in range(n)]
    pos = [0] * n
    for step in range(3):
        bufs = [s[0][p:] for (s, p) in zip(streams, pos)]
        got = bat.decode(bufs)
        for i in range(n):
            err_s, pcm_s, con_s = singles[i].decode(bufs[i])
            err_b, pcm_b, con_b = got[i]
            assert err_b == err_s and con_b == con_s, f"stream {i} step {step}"
            if pcm_s is None:
                assert pcm_b is None
            else:
                np.testing.assert_array_equal(np.asarray(pcm_b), pcm_s,
                                              err_msg=f"stream {i} step {step}")
            assert (bat.last_frame_reference_defined[i]
                    == singles[i].last_frame_reference_defined)
            pos[i] += con_s


def test_batched_mp3_skip_stream():
    from esp_audio_libs_tpu.runtime.tables import mp3_tables

    cfg = MP3_CFGS[0]
    total = int(mp3_tables()["slotTab"][0][cfg["sr_idx"]][cfg["bitrate_idx"]])
    stream = _mp3_header(**cfg) + bytes(total - 4)   # silence frame
    bat = BatchedMP3Decoder(2)
    got = bat.decode([stream, None])
    assert got[1] is None
    assert got[0][0] == 0 and got[0][1] is not None
    assert not np.any(np.asarray(got[0][1]))


@pytest.mark.parametrize("homogeneous", [True, False])
def test_mp3_decode_run_matches_decode(homogeneous):
    """decode_run (one fused dispatch per group for the whole run) returns
    exactly what repeated decode() calls return, frame by frame — including
    errored streams stopping early and partial-granule state updates."""
    cfgs = [MP3_CFGS[1]] * 4 if homogeneous else MP3_CFGS
    streams = [_mp3_stream(c, seed=60 + i, n_frames=5) for i, c in enumerate(cfgs)]
    n = len(streams)
    n_frames = 5

    ref = BatchedMP3Decoder(n)
    expected = [[] for _ in range(n)]
    pos = [0] * n
    stopped = [False] * n
    for _ in range(n_frames):
        bufs = [None if stopped[i] or pos[i] >= len(s[0]) else s[0][pos[i]:]
                for i, s in enumerate(streams)]
        if all(b is None for b in bufs):
            break
        got = ref.decode(bufs)
        for i in range(n):
            if bufs[i] is None:
                continue
            expected[i].append(got[i])
            pos[i] += got[i][2]
            if got[i][0] != 0:
                stopped[i] = True   # decode_run stops a stream at first error

    bat = BatchedMP3Decoder(n)
    results = bat.decode_run([s[0] for s in streams], n_frames)

    for i in range(n):
        assert len(results[i]) == len(expected[i]), f"stream {i}: frame count"
        for f, ((ee, ep, ec), (ge, gp, gc)) in enumerate(zip(expected[i], results[i])):
            assert (ge, gc) == (ee, ec), f"stream {i} frame {f}"
            if ep is None:
                assert gp is None, f"stream {i} frame {f}"
            else:
                np.testing.assert_array_equal(np.asarray(gp).reshape(-1),
                                              np.asarray(ep).reshape(-1),
                                              err_msg=f"stream {i} frame {f}")
        # carried state equivalence: one more plain decode step must agree
        tail_ref = ref.decode([None if not expected[i] else streams[i][0][pos[i]:]
                               for i in range(n)])
        tail_got = bat.decode([None if not expected[i] else streams[i][0][pos[i]:]
                               for i in range(n)])
        for i2 in range(n):
            if tail_ref[i2] is None or tail_got[i2] is None:
                assert tail_ref[i2] == tail_got[i2]
                continue
            assert tail_got[i2][0] == tail_ref[i2][0]
            if tail_ref[i2][1] is not None and tail_got[i2][1] is not None:
                np.testing.assert_array_equal(np.asarray(tail_got[i2][1]),
                                              np.asarray(tail_ref[i2][1]))
        break  # tail check once


@pytest.mark.parametrize("homogeneous", [True, False])
def test_mp3_sliced_dispatch_bitexact(monkeypatch, homogeneous):
    """Stream-sliced group dispatch in decode_run (sub-fleet dispatches with
    downloads drained on a worker thread) must match whole-group dispatch
    frame-for-frame, including carried state across a follow-up run: force a
    tiny slice target so every group splits, including a ragged tail."""
    from esp_audio_libs_tpu.runtime import transport

    cfgs = [MP3_CFGS[1]] * 4 if homogeneous else MP3_CFGS
    streams = [_mp3_stream(c, seed=75 + i, n_frames=5) for i, c in enumerate(cfgs)]
    n = len(streams)

    def run():
        bat = BatchedMP3Decoder(n)
        first = bat.decode_run([s[0] for s in streams], 3)
        # follow-up run from carried state exercises state scatter/gather;
        # next_pos (not summed consumed) is the sequential-caller contract
        second = bat.decode_run(
            [s[0][p:] for s, p in zip(streams, first.next_pos)], 2)
        return first, second

    want = run()
    monkeypatch.setattr(transport, "MP3_SLICE_PCM_BYTES", 3 * 2 * 576 * 2 * 2)
    got = run()
    for a, b in zip(want, got):
        for i in range(n):
            assert len(a[i]) == len(b[i]), f"stream {i}: frame count"
            for f, ((ee, ep, ec), (ge, gp, gc)) in enumerate(zip(a[i], b[i])):
                assert (ge, gc) == (ee, ec), f"stream {i} frame {f}"
                if ep is None:
                    assert gp is None
                else:
                    np.testing.assert_array_equal(
                        np.asarray(gp).reshape(-1), np.asarray(ep).reshape(-1),
                        err_msg=f"stream {i} frame {f}")


def test_mp3_pipelined_runs_match_sequential():
    """decode_run_pipelined (host parse of run k+1 overlapped with run k's
    device phase) yields per-run outputs identical to sequential
    decode_run calls."""
    cfgs = [MP3_CFGS[1]] * 4
    streams = [_mp3_stream(c, seed=90 + i, n_frames=9)[0] for i, c in enumerate(cfgs)]
    n = len(streams)
    n_frames, n_runs = 3, 3

    ref = BatchedMP3Decoder(n)
    pos = [0] * n
    expected = []
    for _ in range(n_runs):
        r = ref.decode_run([s[p:] for s, p in zip(streams, pos)], n_frames)
        expected.append(r)
        pos = [p + np_ for p, np_ in zip(pos, r.next_pos)]

    bat = BatchedMP3Decoder(n)
    got = list(bat.decode_run_pipelined(streams, n_frames, n_runs))
    assert len(got) == len(expected)
    for run, (erun, grun) in enumerate(zip(expected, got)):
        for s, (err_rr, got_rr) in enumerate(zip(erun, grun)):
            assert len(got_rr) == len(err_rr), f"run {run} stream {s}"
            for f, ((ee, ep, ec), (ge, gp, gc)) in enumerate(zip(err_rr, got_rr)):
                assert (ge, gc) == (ee, ec), f"run {run} stream {s} frame {f}"
                if ep is None:
                    assert gp is None
                else:
                    np.testing.assert_array_equal(np.asarray(gp), np.asarray(ep),
                                                  err_msg=f"run {run} stream {s} frame {f}")


def test_flac_int8_escape_sideband_bitexact(monkeypatch):
    """The int8+escape-sideband transport tier (models/flac._frame_kernel_esc)
    must be byte-identical to the int16 tier it replaces: force it on for
    every int16 bucket and off, and compare whole-stream decodes (fitted-LPC
    corpus = the realistic escape statistics, plus a verbatim-heavy one so
    dense-escape buckets exercise the density cutoff)."""
    from flacgen import SubframePlan, make_flac
    from esp_audio_libs_tpu.models import flac as flac_model

    cfgs = [
        dict(rng_seed=91, depth=16, channels=2, block_size=2048, n_frames=3,
             plans=[[SubframePlan("lpc", order=8, fit=True),
                     SubframePlan("lpc", order=12, fit=True)]] * 3),
        dict(rng_seed=92, depth=16, channels=1, block_size=1024, n_frames=2,
             plans=[[SubframePlan("fixed", order=2)], [SubframePlan("lpc", order=4)]]),
    ]
    blobs = [make_flac(**c)[0] for c in cfgs]

    def run():
        bat = BatchedFLACDecoder(len(blobs))
        bat.read_headers(blobs)
        return bat.decode_streams(
            [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)])

    monkeypatch.setattr(flac_model, "ESC_MAX_DENSITY", 0.0)   # tier disabled
    want = run()
    monkeypatch.setattr(flac_model, "ESC_MAX_DENSITY", 1.0)   # tier forced
    got = run()
    for s in range(len(blobs)):
        assert got[s][0] == want[s][0], f"stream {s}: sideband tier changed PCM"
        assert got[s][1]["md5_ok"] and want[s][1]["md5_ok"]


def test_flac_sliced_dispatch_bitexact(monkeypatch):
    """Transport-sliced bucket dispatch (models/flac._decode_streams with a
    drain thread overlapping downloads and uploads) must be byte-identical
    to whole-bucket dispatch: force a tiny slice target so every bucket
    splits into many slices, including a ragged tail, and compare."""
    from esp_audio_libs_tpu.runtime import transport

    blobs = _flac_corpus()

    def run():
        bat = BatchedFLACDecoder(len(blobs))
        bat.read_headers(blobs)
        return bat.decode_streams(
            [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)])

    want = run()   # default: single slice per bucket at these sizes
    # 1024x2x2 B frames -> 3 frames/slice (ragged tails in 4- and 2-frame
    # buckets exercise the odd-shape path)
    monkeypatch.setattr(transport, "SLICE_OUT_BYTES", 3 * 1024 * 2 * 2)
    got = run()
    for s in range(len(blobs)):
        assert got[s][0] == want[s][0], f"stream {s}: sliced dispatch changed PCM"
        assert got[s][1] == want[s][1]


def test_mp3_int8_escape_sideband_bitexact(monkeypatch):
    """The MP3 int8+escape-sideband spectral transport tier
    (mp3_pipeline._granules_scan_esc_for) must be bit-identical to the
    int16 tier it narrows: run the same fleet with the tier forced off and
    forced on and compare every frame's PCM.  Random-body fuzz streams have
    dense linbits escapes, so forcing density to 1.0 exercises heavy
    sideband traffic (the worst case for the scatter)."""
    from esp_audio_libs_tpu.models import mp3_pipeline

    cfgs = [MP3_CFGS[1]] * 6
    streams = [_mp3_stream(c, seed=700 + i, n_frames=4)[0] for i, c in enumerate(cfgs)]

    def run():
        bat = BatchedMP3Decoder(len(streams))
        return bat.decode_run([np.frombuffer(s, np.uint8) for s in streams], 4)

    monkeypatch.setattr(mp3_pipeline, "ESC_MAX_DENSITY", 0.0)   # tier disabled
    want = run()
    monkeypatch.setattr(mp3_pipeline, "ESC_MAX_DENSITY", 1.0)   # tier forced
    got = run()
    n_frames = 0
    for s in range(len(streams)):
        assert len(got[s]) == len(want[s])
        for f, (w, g) in enumerate(zip(want[s], got[s])):
            assert g[0] == w[0] and g[2] == w[2], f"s{s} f{f} err/consumed"
            if w[1] is None:
                assert g[1] is None
            else:
                np.testing.assert_array_equal(g[1], w[1], err_msg=f"s{s} f{f}")
            n_frames += 1
    assert n_frames > 0


def test_flac_parallel_fleet_parse_deterministic(monkeypatch):
    """The threaded fleet parse (workers fill private staging groups, main
    thread commits in stream order) must produce tables BIT-IDENTICAL to the
    serial path — row order, width-slot assignment, codes, frame maps, and
    on_stream ordering — regardless of thread scheduling.  The corpus mixes
    residual width tiers, (channels, block_size) shape keys, a skipped
    stream, and a mid-stream error so the commit remap covers every case."""
    from flacgen import SubframePlan, make_flac
    from esp_audio_libs_tpu.models import flac as flac_mod

    cfgs = [
        dict(rng_seed=41, depth=16, channels=2, block_size=1024, n_frames=3,
             stereo_modes=["ms", None, "ls"],
             plans=[[SubframePlan("lpc", order=8, fit=True)] * 2] * 3),   # int8-ish
        dict(rng_seed=42, depth=16, channels=2, block_size=1024, n_frames=2,
             plans=[[SubframePlan("verbatim"), SubframePlan("lpc", order=4)]] * 2),
        dict(rng_seed=43, depth=24, channels=1, block_size=512, n_frames=2,
             plans=[[SubframePlan("verbatim")], [SubframePlan("lpc", order=6)]]),  # int32
        dict(rng_seed=44, depth=8, channels=2, block_size=1024, n_frames=2,
             plans=[[SubframePlan("constant"), SubframePlan("fixed", order=2)]] * 2),
    ]
    blobs = [make_flac(**c)[0] for c in cfgs] * 3   # 12 streams, keys interleave
    blobs.append(blobs[0][: len(blobs[0]) - 7])     # mid-frame truncation -> error code

    def parse(n_threads):
        monkeypatch.setenv("EAL_PARSE_THREADS", str(n_threads))
        decs, bufs = [], []
        for blob in blobs:
            d = FLACDecoder()
            assert d.read_header(blob) == FLACDecoderResult.SUCCESS
            decs.append(d)
            bufs.append(np.frombuffer(blob[d.get_bytes_index():], np.uint8))
        bufs[5] = None   # skipped slot
        seen = []
        groups, codes, frames_of = flac_mod._parse_streams(
            decs, bufs, on_stream=seen.append)
        return groups, codes, frames_of, seen

    sg, sc, sf, sseen = parse(1)   # forced serial
    tg, tc, tf, tseen = parse(4)   # forced 4-thread pool on this 1-core box

    assert sseen == tseen == list(range(len(blobs)))
    assert sc == tc and sf == tf
    assert sorted(sg) == sorted(tg)
    for key in sg:
        a, b = sg[key], tg[key]
        assert a.nf == b.nf and list(a.cursors) == list(b.cursors)
        for name in ("wide", "slot", "order", "shift", "wasted", "use64",
                     "coeffs", "bs", "ca", "depth", "crc_ok", "consumed"):
            np.testing.assert_array_equal(getattr(a, name)[: a.nf],
                                          getattr(b, name)[: b.nf], err_msg=name)
        for w, name in enumerate(("data8", "data16", "data32")):
            cw = int(a.cursors[w])
            np.testing.assert_array_equal(getattr(a, name)[:cw],
                                          getattr(b, name)[:cw], err_msg=name)
    # and through the serving layer: threaded fleet decode == per-stream
    monkeypatch.setenv("EAL_PARSE_THREADS", "3")
    bat = BatchedFLACDecoder(len(blobs) - 1)
    bat.read_headers(blobs[:-1])
    results = bat.decode_streams(
        [b[d.get_bytes_index():] for b, d in zip(blobs, bat.decoders)])
    monkeypatch.delenv("EAL_PARSE_THREADS")
    for blob, (pcm, info) in zip(blobs, results):
        ref = FLACDecoder()
        assert ref.read_header(blob) == FLACDecoderResult.SUCCESS
        ref_pcm, ref_info = ref.decode_stream(blob[ref.get_bytes_index():])
        assert pcm == ref_pcm
        assert info["frame_results"] == ref_info["frame_results"]


def test_mp3_parallel_batch_parse_deterministic(monkeypatch):
    """The native batch parse's thread pool (streams are independent
    contexts with disjoint output rows) must produce results identical to
    per-stream parsing regardless of thread scheduling.  EAL_PARSE_THREADS
    forces the pool on even on single-core CI boxes."""
    monkeypatch.setenv("EAL_PARSE_THREADS", "4")
    cfg = MP3_CFGS[1]
    streams = [_mp3_stream(cfg, seed=500 + i, n_frames=1)[0] for i in range(128)]
    bat = BatchedMP3Decoder(128)
    views = [np.frombuffer(s, np.uint8) for s in streams]
    pa = bat._parse_batch(views)
    monkeypatch.delenv("EAL_PARSE_THREADS")

    single = BatchedMP3Decoder(1)
    for i in (0, 1, 63, 64, 127):   # spot-check across thread ranges
        ps = single._parse_batch([views[i]])
        np.testing.assert_array_equal(pa["huff"][i], ps["huff"][0], err_msg=f"s{i}")
        np.testing.assert_array_equal(pa["frame"][i], ps["frame"][0])
        assert pa["rc"][i] == ps["rc"][0] and pa["consumed"][i] == ps["consumed"][0]


def test_mp3_decode_run_next_pos_on_reservoir_slack():
    """Sequential decode_run calls on streams with inter-frame slack must
    continue via result.next_pos: slack bytes (ancillary data / tag blocks
    between frames, which real encoder output carries) belong to the
    reference caller protocol's MP3FindSyncWord skip, not to any frame's
    consumed, so summing consumed lands mid-slack and the follow-up run
    would misparse. Split runs continued with next_pos must match one
    whole run frame-for-frame."""
    from tests.test_mp3_coverage import craft_tonal_frame
    from esp_audio_libs_tpu.utils.errors import MP3Error

    cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)
    rng = np.random.default_rng(5)
    # ancillary blocks between frames: byte values < 0xFF so no false sync
    stream = np.frombuffer(
        b"".join(craft_tonal_frame(cfg, rng)
                 + bytes(int(x) for x in rng.integers(0, 0xFE, 21 + 7 * i))
                 for i in range(4)), np.uint8)

    whole = BatchedMP3Decoder(1).decode_run([stream], 4)
    assert [e for e, _, _ in whole[0]] == [MP3Error.NONE] * 4
    # the premise: this stream really has slack (else the test is vacuous)
    assert whole.next_pos[0] > sum(c for _, _, c in whole[0])

    bat = BatchedMP3Decoder(1)
    first = bat.decode_run([stream], 2)
    assert first.next_pos[0] > sum(c for _, _, c in first[0])
    second = bat.decode_run([stream[first.next_pos[0]:]], 2)
    got = list(first[0]) + list(second[0])
    assert len(got) == 4
    for f, ((we, wp, wc), (ge, gp, gc)) in enumerate(zip(whole[0], got)):
        assert (ge, gc) == (we, wc), f"frame {f}"
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp),
                                      err_msg=f"frame {f} pcm")

    # advancing by summed consumed is a real desync on this stream: the
    # next parse starts mid-slack, not at a frame header
    bad = BatchedMP3Decoder(1)
    bad.decode_run([stream], 2)
    sumc = sum(c for _, _, c in first[0])
    broken = bad.decode_run([stream[sumc:]], 2)
    assert [e for e, _, _ in broken[0]] != [MP3Error.NONE, MP3Error.NONE]


def test_mp3_decode_run_vbr_stream():
    """VBR (per-frame bitrate changes — the common LAME shape): frame slot
    sizes change mid-run; decode_run must follow along exactly like the
    single-stream reference caller protocol."""
    from tests.test_mp3_coverage import craft_tonal_frame
    from esp_audio_libs_tpu.utils.errors import MP3Error

    rng = np.random.default_rng(8)
    frames = [craft_tonal_frame(
        dict(ver_bits=3, bitrate_idx=br, sr_idx=0, mode=0), rng)
        for br in (9, 13, 7, 11)]
    stream = np.frombuffer(b"".join(frames), np.uint8)

    # ground truth: single-stream decode with the reference caller protocol
    dec = MP3Decoder()
    want, pos = [], 0
    data = bytes(stream)
    while pos < len(data) and len(want) < 4:
        err, pcm, consumed = dec.decode(data[pos:])
        want.append((int(err), np.asarray(pcm), consumed))
        assert int(err) == 0
        pos += consumed
        nxt = MP3Decoder.find_sync_word(data[pos:])
        pos = pos + nxt if nxt >= 0 else len(data)

    got = BatchedMP3Decoder(1).decode_run([stream], 4)
    assert len(got[0]) == 4
    for f, ((we, wp, wc), (ge, gp, gc)) in enumerate(zip(want, got[0])):
        assert (ge, gc) == (we, wc), f"frame {f}"
        np.testing.assert_array_equal(np.asarray(gp), wp,
                                      err_msg=f"frame {f}")
    assert got.next_pos[0] == pos


def test_mp3_decode_run_stops_at_format_change():
    """A mid-stream format change (stereo -> mono here) ends the run for
    that stream — the next decode_run call picks it up from next_pos with
    the new format, matching single-stream decode throughout."""
    from tests.test_mp3_coverage import craft_tonal_frame
    from esp_audio_libs_tpu.utils.errors import MP3Error

    rng = np.random.default_rng(14)
    st = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)
    mo = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=3)
    blob = (craft_tonal_frame(st, rng) + craft_tonal_frame(st, rng)
            + craft_tonal_frame(mo, rng) + craft_tonal_frame(mo, rng))
    stream = np.frombuffer(blob, np.uint8)

    dec = MP3Decoder()
    want, pos = [], 0
    data = bytes(stream)
    while pos < len(data) and len(want) < 4:
        err, pcm, consumed = dec.decode(data[pos:])
        assert int(err) == 0
        want.append(np.asarray(pcm))
        pos += consumed
        nxt = MP3Decoder.find_sync_word(data[pos:])
        pos = pos + nxt if nxt >= 0 else len(data)

    bat = BatchedMP3Decoder(1)
    first = bat.decode_run([stream], 4)
    assert len(first[0]) == 2, "run must stop at the format change"
    second = bat.decode_run([stream[first.next_pos[0]:]], 4)
    assert len(second[0]) == 2
    got = [p for _, p, _ in list(first[0]) + list(second[0])]
    for f in range(4):
        np.testing.assert_array_equal(np.asarray(got[f]), want[f],
                                      err_msg=f"frame {f}")


def test_mp3_reset_stream_slot_reuse():
    """Continuous-batching slot reuse: resetting a finished slot admits a
    NEW stream whose decode matches a fresh decoder exactly, while the
    neighbor slot's carried state continues bit-exact across the reset."""
    from tests.test_mp3_coverage import craft_tonal_frame
    from esp_audio_libs_tpu.utils.errors import MP3Error

    def tonal(seed, n, cfg=dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)):
        rng = np.random.default_rng(seed)
        return np.frombuffer(
            b"".join(craft_tonal_frame(cfg, rng) for _ in range(n)), np.uint8)

    A, B, C = tonal(1, 4), tonal(2, 6), tonal(3, 2)

    def single_protocol(stream, n):
        dec, pos, out = MP3Decoder(), 0, []
        data = bytes(stream)
        while pos < len(data) and len(out) < n:
            err, pcm, _c = dec.decode(data[pos:])
            assert int(err) == 0
            out.append(np.asarray(pcm))
            pos += _c
            nxt = MP3Decoder.find_sync_word(data[pos:])
            pos = pos + nxt if nxt >= 0 else len(data)
        return out

    want_B = single_protocol(B, 6)
    want_C = single_protocol(C, 2)

    fleet = BatchedMP3Decoder(2)
    r1 = fleet.decode_run([A, B], 4)
    assert len(r1[0]) == 4 and len(r1[1]) == 4
    fleet.reset_stream(0)          # slot 0 finished: admit stream C
    r2 = fleet.decode_run([C, B[r1.next_pos[1]:]], 2)
    # recycled slot: identical to a fresh decoder on C
    assert [e for e, _, _ in r2[0]] == [MP3Error.NONE] * 2
    for f in range(2):
        np.testing.assert_array_equal(np.asarray(r2[0][f][1]), want_C[f],
                                      err_msg=f"recycled slot frame {f}")
    # neighbor slot: frames 5-6 continue bit-exact across the reset
    for f in range(2):
        np.testing.assert_array_equal(np.asarray(r2[1][f][1]), want_B[4 + f],
                                      err_msg=f"neighbor frame {4 + f}")


def test_flac_reset_stream_slot_reuse():
    blobs = _flac_corpus()[:2]
    bat = BatchedFLACDecoder(2)
    bat.read_headers(blobs)
    bat.decode_streams([b[d.get_bytes_index():]
                        for b, d in zip(blobs, bat.decoders)])
    bat.reset_stream(0)
    new_blob = _flac_corpus()[2]
    assert bat.decoders[0].read_header(new_blob) == FLACDecoderResult.SUCCESS
    results = bat.decode_streams(
        [new_blob[bat.decoders[0].get_bytes_index():], None])
    assert results[0][1]["md5_ok"] is True

    ref = FLACDecoder()
    ref.read_header(new_blob)
    ref_pcm, _ = ref.decode_stream(new_blob[ref.get_bytes_index():])
    assert results[0][0] == ref_pcm


def test_mp3_sliced_run_transport_failure_leaves_state_consistent(monkeypatch):
    """A transport failure mid-run (a slice's PCM download raising) must
    surface AND leave host/device state coherent: vindex commits eagerly at
    each slice's dispatch, so a follow-up decode_run from the correct
    positions synthesizes bit-exactly — the failure loses that run's PCM,
    never the fleet's carried state."""
    import jax as jax_mod

    from tests.test_mp3_coverage import craft_tonal_frame
    from esp_audio_libs_tpu.runtime import transport

    def tonal(seed, n):
        rng = np.random.default_rng(seed)
        cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)
        return np.frombuffer(
            b"".join(craft_tonal_frame(cfg, rng) for _ in range(n)), np.uint8)

    streams = [tonal(30 + i, 5) for i in range(4)]

    control = BatchedMP3Decoder(4)
    r1c = control.decode_run(streams, 3)
    r2c = control.decode_run(
        [s[p:] for s, p in zip(streams, r1c.next_pos)], 2)

    monkeypatch.setattr(transport, "MP3_SLICE_PCM_BYTES", 1)  # force slices
    calls = []
    orig = jax_mod.device_get

    def flaky(x):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("injected transport failure")
        return orig(x)

    monkeypatch.setattr(jax_mod, "device_get", flaky)
    bat = BatchedMP3Decoder(4)
    snap = bat.get_state()   # the documented retry recipe
    with pytest.raises(RuntimeError, match="injected transport failure"):
        bat.decode_run(streams, 3)
    assert len(calls) > 1, "expected multiple slices (one failed download)"

    # retry-the-same-bytes via the checkpoint recipe: restore the pre-run
    # snapshot and repeat the WHOLE run — must match the unbroken control
    retry_fleet = BatchedMP3Decoder(4)
    retry_fleet.set_state(snap)
    r1 = retry_fleet.decode_run(streams, 3)
    for i in range(4):
        assert len(r1[i]) == len(r1c[i]), f"retry stream {i}"
        for f, ((we, wp, wc), (ge, gp, gc)) in enumerate(zip(r1c[i], r1[i])):
            assert (ge, gc) == (we, wc), f"retry stream {i} frame {f}"
            np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
    assert r1.next_pos == r1c.next_pos

    # carried state must be coherent: the follow-up run from the correct
    # positions matches the unbroken control frame-for-frame
    r2 = bat.decode_run([s[p:] for s, p in zip(streams, r1c.next_pos)], 2)
    for i in range(4):
        assert len(r2[i]) == len(r2c[i]), f"stream {i}"
        for f, ((we, wp, wc), (ge, gp, gc)) in enumerate(zip(r2c[i], r2[i])):
            assert (ge, gc) == (we, wc), f"stream {i} frame {f}"
            np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp),
                                          err_msg=f"stream {i} frame {f}")
    assert r2.next_pos == r2c.next_pos


def test_mp3_pipelined_to_device_matches_sequential():
    """decode_run_pipelined(to_device=True): a uniform fleet's multi-run
    composed serving path (PCM device-resident per run) must match
    sequential decode_run(to_device=True) calls run for run."""
    from tests.test_mp3_coverage import craft_tonal_frame

    def tonal(seed, nf):
        rng = np.random.default_rng(seed)
        cfg = dict(ver_bits=3, bitrate_idx=9, sr_idx=0, mode=0)
        return b"".join(craft_tonal_frame(cfg, rng) for _ in range(nf))

    streams = [tonal(120 + i, 9) for i in range(4)]
    n, n_frames, n_runs = len(streams), 3, 3

    ref = BatchedMP3Decoder(n)
    pos = [0] * n
    expected = []
    for _ in range(n_runs):
        r = ref.decode_run([s[p:] for s, p in zip(streams, pos)], n_frames,
                           to_device=True)
        expected.append((np.asarray(r[0]), list(r[1]), list(r.next_pos)))
        pos = [p + np_ for p, np_ in zip(pos, r.next_pos)]

    bat = BatchedMP3Decoder(n)
    got = list(bat.decode_run_pipelined(streams, n_frames, n_runs,
                                        to_device=True))
    assert len(got) == len(expected)
    abs_pos = [0] * n
    for run, ((e_pcm, e_con, e_next), g) in enumerate(zip(expected, got)):
        g_pcm, g_con = g
        np.testing.assert_array_equal(np.asarray(g_pcm), e_pcm,
                                      err_msg=f"run {run}")
        assert list(g_con) == e_con, f"run {run}"
        # pipelined next_pos is ABSOLUTE within the original buffers
        abs_pos = [p + np_ for p, np_ in zip(abs_pos, e_next)]
        assert list(g.next_pos) == abs_pos, f"run {run}"


def test_fleet_fault_isolation_mid_stream():
    """VERDICT r4 #9: one stream of a fleet hits a MID-STREAM fault (CRC
    mismatch in one; truncation in another) while the rest decode —
    per-stream result codes isolate the faults, every healthy stream's PCM
    is bit-identical to decoding it alone, and each faulty stream behaves
    exactly as its own single-stream decode (the reference's degradation
    model: per-instance result codes, include/flac_decoder.h:22-44).
    Covers both the host-returning and the to_device(grouped) paths."""
    from flacgen import SubframePlan, make_flac

    B, bad_crc, bad_trunc = 32, 7, 19
    n_frames = 4
    blob, _ = make_flac(rng_seed=77, depth=16, channels=2, block_size=1024,
                        n_frames=n_frames,
                        plans=[[SubframePlan("lpc", order=8, fit=True)] * 2]
                        * n_frames)
    one = FLACDecoder()
    one.read_header(blob)
    hdr = one.get_bytes_index()
    body = blob[hdr:]
    frame_len = len(body) // n_frames  # equal-size frames (same plan/seed)

    bodies = [body] * B
    # CRC fault: flip a residual byte inside frame 2 (past its header) —
    # frame parses but its CRC16 check fails
    bc = bytearray(body)
    bc[2 * frame_len + frame_len // 2] ^= 0x40
    bodies[bad_crc] = bytes(bc)
    # truncation fault: stream ends mid-frame-3
    bodies[bad_trunc] = body[: 3 * frame_len + 10]

    # single-stream expectations (shared decode path, trusted baseline)
    def single(bodyb):
        d = FLACDecoder()
        d.read_header(blob)
        return d.decode_stream(bodyb, verify_md5=True)

    want = {s: single(bodies[s]) for s in (0, bad_crc, bad_trunc)}
    assert FLACDecoderResult.ERROR_CRC_MISMATCH in \
        want[bad_crc][1]["frame_results"], "corruption did not hit CRC"
    assert any(c != FLACDecoderResult.SUCCESS
               for c in want[bad_trunc][1]["frame_results"])

    # host-returning fleet path
    bat = BatchedFLACDecoder(B)
    bat.read_headers([blob] * B)
    res = bat.decode_streams(bodies, verify_md5=True)
    for s in range(B):
        w = want.get(s, want[0])
        assert res[s][1]["frame_results"] == w[1]["frame_results"], s
        assert res[s][0] == w[0], f"stream {s} PCM diverged"
        assert res[s][1]["md5_ok"] == w[1]["md5_ok"], s
    healthy = [s for s in range(B) if s not in (bad_crc, bad_trunc)]
    assert all(res[s][1]["md5_ok"] for s in healthy)

    # to_device path: the faulty streams land in their own signature
    # groups; healthy streams' device PCM is untouched
    bat2 = BatchedFLACDecoder(B)
    bat2.read_headers([blob] * B)
    group_list, results = bat2.decode_streams_to_device_grouped(bodies)
    seen = sorted(sum((ids for ids, _ in group_list), []))
    assert seen == list(range(B))
    for ids, pcm_dev in group_list:
        got = np.asarray(pcm_dev)
        for k, s in enumerate(ids):
            w = want.get(s, want[0])
            np.testing.assert_array_equal(
                got[k], np.frombuffer(w[0], np.uint8),
                err_msg=f"stream {s} device PCM diverged")
            assert results[s]["frame_results"] == w[1]["frame_results"]
