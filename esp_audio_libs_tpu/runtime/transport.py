"""Host<->device transport tuning and the overlapped-parse scaffolding
shared by the serving dispatch paths.

The serving layer splits large dispatches into slices and overlaps the
three legs — host parse, uploads, downloads — across threads.  The design
rests on measured link properties (re-measure with
``tools/transport_probe.py`` when deploying elsewhere):

- the link is full duplex (uploads and downloads overlap ~perfectly),
- same-direction concurrency scales aggregate bandwidth in some windows
  (D2H 8 -> 54 MB/s at 4 threads in one measured window) and never hurts,
- oversized single downloads can stall pathologically, so splitting is
  also a robustness measure.

These constants are the tuning surface; tests monkeypatch them to force
many tiny slices.
"""

from __future__ import annotations

import contextlib
import queue
import threading

import numpy as np

# target PCM bytes per dispatch slice — sized so one slice's upload and the
# previous slice's download overlap while per-transfer latency stays
# amortized (throughput measured flat for 4-17 MB slices)
SLICE_OUT_BYTES = 8 << 20

# target PCM bytes per MP3 sub-fleet dispatch (stream-axis slicing of a
# format group's fused granule run)
MP3_SLICE_PCM_BYTES = 8 << 20

# worker threads running slice jobs (upload + dispatch + download each):
# concurrent transfers scale on the measured link and slice results are
# order-independent
DRAIN_THREADS = 4

# escape-density ceiling for the int8+sideband transport tiers (FLAC
# residuals, MP3 spectral planes): each escape costs 6 sideband bytes vs
# the 1 byte/word the narrower plane saves, so the break-even is 1/6;
# 1/64 keeps the tier safely profitable.  Typical content engages it:
# fitted-LPC FLAC residuals and quantized MP3 spectral magnitudes rarely
# exceed int8 range (linbits escapes are sparse by design).
ESC_MAX_DENSITY = 1.0 / 64.0


def escape_sideband(esc_flat_idx, flat_vals, oob_index: int, val_dtype):
    """Sparse (position, value) escape sideband for an int8 transport plane.

    Padded to a pow2 cap (min 16) so escape-count jitter doesn't recompile
    the device fixup; padding slots carry the out-of-range ``oob_index`` so
    the device-side ``.at[pos].set(val, mode="drop")`` scatter ignores them.
    Returns ``(pos int32[cap], val val_dtype[cap])``.
    """
    n_esc = int(esc_flat_idx.size)
    cap = max(16, 1 << int(n_esc - 1).bit_length()) if n_esc else 16
    pos = np.full(cap, oob_index, np.int32)
    val = np.zeros(cap, val_dtype)
    pos[:n_esc] = esc_flat_idx
    val[:n_esc] = flat_vals
    return pos, val


def escape_sideband_blocked(mask2d, vals2d, val_dtype):
    """Block-LOCAL escape sidebands for a leading-axis-sharded int8 plane.

    ``mask2d``/``vals2d`` are the escape mask and source values reshaped to
    ``[S, M]`` — one row per mesh shard, each row the shard's contiguous
    block flattened.  Positions are local to the row (so the device-side
    fixup is a vmap'd scatter each chip runs on its own block, no
    collectives — VERDICT r3 #4), padded to ONE shared pow2 cap (min 16)
    so shard shapes stay uniform; padding slots carry the out-of-range
    local index ``M`` and drop in the scatter.
    Returns ``(pos int32[S, cap], val val_dtype[S, cap])``.
    """
    S, M = mask2d.shape
    counts = mask2d.sum(axis=1)
    n_max = int(counts.max()) if S else 0
    cap = max(16, 1 << int(n_max - 1).bit_length()) if n_max else 16
    pos = np.full((S, cap), M, np.int32)
    val = np.zeros((S, cap), val_dtype)
    for s in range(S):
        idx = np.flatnonzero(mask2d[s])
        pos[s, :idx.size] = idx
        val[s, :idx.size] = vals2d[s, idx]
    return pos, val


@contextlib.contextmanager
def overlapped_parse(parse_call, n_streams: int):
    """Run ``parse_call(on_stream)`` with per-stream completion signals.

    Yields a queue that receives each completed stream id and a final
    ``None`` sentinel.  With more than one stream the parse runs on a
    worker thread so the consumer can dispatch completed streams' work
    while later streams still parse; with one stream it runs inline (there
    is nothing to overlap — the signals just queue up).  Exceptions from
    the parse are re-raised on context exit, AFTER the consumer body — the
    sentinel is always delivered, so consumers never block on a dead
    parser.
    """
    done_q: queue.Queue = queue.Queue()
    err = []

    def _job():
        try:
            parse_call(done_q.put)
        except BaseException as e:      # noqa: BLE001 — re-raised below
            err.append(e)
        finally:
            done_q.put(None)

    if n_streams <= 1:
        _job()
        yield done_q
        if err:
            raise err[0]
        return

    t = threading.Thread(target=_job)
    t.start()
    try:
        yield done_q
    finally:
        t.join()
    if err:
        raise err[0]
