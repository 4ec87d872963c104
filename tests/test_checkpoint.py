"""Checkpoint/resume: saved state restored into a FRESH object must continue
decoding bit-identically to an uninterrupted run (SURVEY.md §5 — the
reference's streaming state machines, made explicitly serializable)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from esp_audio_libs_tpu.models.flac import FLACDecoder
from esp_audio_libs_tpu.models.mp3 import MP3Decoder
from esp_audio_libs_tpu.models.resampler import Resampler, ResamplerConfiguration
from esp_audio_libs_tpu.utils.errors import FLACDecoderResult


def test_flac_save_restore_mid_stream():
    from flacgen import SubframePlan, make_flac

    blob, _ = make_flac(rng_seed=61, depth=16, channels=2, block_size=512,
                        n_frames=6, stereo_modes=["ms", None, "ls", "rs", None, "ms"],
                        plans=[[SubframePlan("lpc", order=8),
                                SubframePlan("fixed", order=2)]] * 6)
    ref = FLACDecoder()
    assert ref.read_header(blob) == FLACDecoderResult.SUCCESS
    body = blob[ref.get_bytes_index():]
    full_pcm, _ = ref.decode_stream(body)

    dec = FLACDecoder()
    dec.read_header(blob)
    # decode 3 frames, checkpoint, restore into a FRESH decoder, finish
    pos, parts = 0, []
    for _ in range(3):
        res, pcm, _ = dec.decode_frame(body[pos:])
        assert res == FLACDecoderResult.SUCCESS
        parts.append(pcm)
        pos += dec.get_bytes_index()

    state = dec.get_state()
    dec2 = FLACDecoder()
    dec2.set_state(state)
    assert dec2.sample_rate == ref.sample_rate
    assert dec2.md5_signature == ref.md5_signature
    for _ in range(3):
        res, pcm, _ = dec2.decode_frame(body[pos:])
        assert res == FLACDecoderResult.SUCCESS
        parts.append(pcm)
        pos += dec2.get_bytes_index()
    assert b"".join(parts) == full_pcm


def test_flac_save_restore_partial_header():
    """Checkpoint taken mid-header (inside a metadata block) must carry the
    partial-header resume state."""
    from flacgen import SubframePlan, make_flac

    blob, _ = make_flac(rng_seed=62, depth=16, channels=1, block_size=256,
                        n_frames=2, metadata=[(1, bytes(256))],   # padding block
                        plans=[[SubframePlan("fixed", order=1)]] * 2)
    dec = FLACDecoder()
    r = dec.read_header(blob[:60])       # cuts inside the padding block
    assert r == FLACDecoderResult.HEADER_OUT_OF_DATA
    dec2 = FLACDecoder()
    dec2.set_state(dec.get_state())
    assert dec2.read_header(blob) == FLACDecoderResult.SUCCESS
    pcm, info = dec2.decode_stream(blob[dec2.get_bytes_index():])
    assert info["md5_ok"] is True


def _mp3_stream(n_frames, seed):
    from esp_audio_libs_tpu.runtime.tables import mp3_tables

    T = mp3_tables()
    total = int(T["slotTab"][0][0][11])
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | 2 | 1, 11 << 4, 0])
    rng = np.random.default_rng(seed)
    s = b""
    for f in range(n_frames):
        # random bodies WITHOUT zeroing mainDataBegin: the bit reservoir
        # carries real cross-frame data through the checkpoint
        s += hdr + rng.integers(0, 256, total - 4, dtype=np.uint8).tobytes()
    return s


def test_mp3_save_restore_with_reservoir():
    stream = _mp3_stream(6, seed=71)
    ref = MP3Decoder()
    expected, pos = [], 0
    for _ in range(6):
        err, pcm, con = ref.decode(stream[pos:])
        expected.append((int(err), None if pcm is None else np.asarray(pcm).copy()))
        pos += con

    dec = MP3Decoder()
    got, pos = [], 0
    for _ in range(3):
        err, pcm, con = dec.decode(stream[pos:])
        got.append((int(err), None if pcm is None else np.asarray(pcm).copy()))
        pos += con
    dec2 = MP3Decoder()
    dec2.set_state(dec.get_state())
    for _ in range(3):
        err, pcm, con = dec2.decode(stream[pos:])
        got.append((int(err), None if pcm is None else np.asarray(pcm).copy()))
        pos += con

    for i, ((ee, ep), (ge, gp)) in enumerate(zip(expected, got)):
        assert ge == ee, f"frame {i}"
        if ep is None:
            assert gp is None
        else:
            np.testing.assert_array_equal(gp, ep, err_msg=f"frame {i}")


def test_resampler_save_restore_mid_stream():
    cfg = ResamplerConfiguration(44100.0, 16000.0, 16, 16, 2, True, True, 64, 64)
    rng = np.random.default_rng(81)
    chunk = 400
    raw = rng.integers(0, 256, (2, 4 * chunk * 2 * 2), dtype=np.uint8)

    ref = Resampler(batch=2, exact=True)
    ref.initialize(cfg)
    expected, pos = [], 0
    for _ in range(4):
        o, r = ref.resample(raw[:, pos * 4:(pos + chunk) * 4], chunk, 300, 0.0)
        expected.append(np.asarray(o))
        pos += r.frames_used

    a = Resampler(batch=2, exact=True)
    a.initialize(cfg)
    got, pos = [], 0
    for _ in range(2):
        o, r = a.resample(raw[:, pos * 4:(pos + chunk) * 4], chunk, 300, 0.0)
        got.append(np.asarray(o))
        pos += r.frames_used
    b = Resampler(batch=2, exact=True)
    b.initialize(cfg)
    b.set_state(a.get_state())
    for _ in range(2):
        o, r = b.resample(raw[:, pos * 4:(pos + chunk) * 4], chunk, 300, 0.0)
        got.append(np.asarray(o))
        pos += r.frames_used
    for i, (e, g) in enumerate(zip(expected, got)):
        np.testing.assert_array_equal(g, e, err_msg=f"chunk {i}")


def test_bad_state_blob_rejected():
    dec = FLACDecoder()
    try:
        dec.set_state({"native": b"garbage", "output_32bit": False, "header_ok": False})
        raise AssertionError("accepted garbage state")
    except RuntimeError:
        pass
    m = MP3Decoder()
    st = m.get_state()
    st["native"] = st["native"][:-8]     # truncated image
    try:
        m.set_state(st)
        raise AssertionError("accepted truncated state")
    except RuntimeError:
        pass


def test_batched_flac_save_restore():
    """Fleet-level FLAC checkpoint, symmetric with the MP3 fleet pair: a
    BatchedFLACDecoder snapshot (pickle round trip) restored into a FRESH
    fleet continues decoding bit-identically.  FLAC fleet state is host-only
    (per-stream native front-ends; device frame kernels are stateless), so
    this pins the serving checkpoint API's uniformity across codecs."""
    import pickle

    from flacgen import SubframePlan, make_flac

    from esp_audio_libs_tpu.models.batch import BatchedFLACDecoder

    B = 4
    blobs, bodies, splits = [], [], []
    for s in range(B):
        blob, _ = make_flac(rng_seed=400 + s, depth=16, channels=2,
                            block_size=256, n_frames=6,
                            stereo_modes=["ms", None, "ls", "rs", None, "ms"],
                            plans=[[SubframePlan("lpc", order=4 + s),
                                    SubframePlan("fixed", order=2)]] * 6)
        scout = FLACDecoder()
        assert scout.read_header(blob) == FLACDecoderResult.SUCCESS
        body = blob[scout.get_bytes_index():]
        # find the byte boundary after 3 frames for the mid-stream split
        pos = 0
        for _ in range(3):
            res, _, _ = scout.decode_frame(body[pos:])
            assert res == FLACDecoderResult.SUCCESS
            pos += scout.get_bytes_index()
        blobs.append(blob)
        bodies.append(body)
        splits.append(pos)

    ref = BatchedFLACDecoder(B)
    assert all(r == FLACDecoderResult.SUCCESS for r in ref.read_headers(blobs))
    full = ref.decode_streams(bodies)
    assert all(res["md5_ok"] for _, res in full)

    fleet = BatchedFLACDecoder(B)
    fleet.read_headers(blobs)
    part1 = fleet.decode_streams([b[:p] for b, p in zip(bodies, splits)],
                                 verify_md5=False)

    blob = pickle.dumps(fleet.get_state())
    fleet2 = BatchedFLACDecoder(B)
    fleet2.set_state(pickle.loads(blob))
    part2 = fleet2.decode_streams([b[p:] for b, p in zip(bodies, splits)],
                                  verify_md5=False)

    for s in range(B):
        assert part1[s][0] + part2[s][0] == full[s][0], f"stream {s}"
        assert (part1[s][1]["num_frames"] + part2[s][1]["num_frames"]
                == full[s][1]["num_frames"])

    # width mismatch must be rejected, like the MP3 fleet pair
    try:
        BatchedFLACDecoder(B + 1).set_state(pickle.loads(blob))
        raise AssertionError("accepted mismatched fleet width")
    except ValueError:
        pass


def test_batched_mp3_save_restore():
    """Fleet-level checkpoint: a BatchedMP3Decoder snapshot restored into a
    FRESH fleet (pickle round trip, as a serving layer migrating streams
    across workers would do) continues bit-identically, including the
    per-stream native bit reservoirs and the batch-stacked device state."""
    import pickle

    from esp_audio_libs_tpu.models.batch import BatchedMP3Decoder

    B = 8
    streams = [_mp3_stream(6, seed=100 + s) for s in range(B)]

    ref = BatchedMP3Decoder(B)
    pos = [0] * B
    expected = []
    for _ in range(6):
        got = ref.decode([st[p:] for st, p in zip(streams, pos)])
        pos = [p + g[2] for p, g in zip(pos, got)]
        expected.append([(g[0], None if g[1] is None else np.asarray(g[1]).copy())
                         for g in got])

    bat = BatchedMP3Decoder(B)
    pos = [0] * B
    results = []
    for _ in range(3):
        got = bat.decode([st[p:] for st, p in zip(streams, pos)])
        pos = [p + g[2] for p, g in zip(pos, got)]
        results.append([(g[0], None if g[1] is None else np.asarray(g[1]).copy())
                        for g in got])

    blob = pickle.dumps(bat.get_state())
    bat2 = BatchedMP3Decoder(B)
    bat2.set_state(pickle.loads(blob))
    for _ in range(3):
        got = bat2.decode([st[p:] for st, p in zip(streams, pos)])
        pos = [p + g[2] for p, g in zip(pos, got)]
        results.append([(g[0], None if g[1] is None else np.asarray(g[1]).copy())
                        for g in got])

    for f, (erow, grow) in enumerate(zip(expected, results)):
        for s, ((ee, ep), (ge, gp)) in enumerate(zip(erow, grow)):
            assert ge == ee, f"frame {f} stream {s}"
            if ep is None:
                assert gp is None, f"frame {f} stream {s}"
            else:
                np.testing.assert_array_equal(gp, ep, err_msg=f"frame {f} stream {s}")
