"""FLAC decoding pipeline: native host front-end + batched device back-end.

Public semantics mirror the reference ``flac::FLACDecoder``
(reference: include/flac_decoder.h, src/decode/flac/flac_decoder.cpp): same
result codes, streaming header protocol, metadata size limits, CRC toggles,
byte accounting, and output packing (native depths and the 32-bit
left-justified mode).

Architecture (SURVEY.md §7.4): the native front-end
(native/src/flac_frontend.cpp) performs everything bitstream-serial — sync,
headers, CRC, Rice decoding — and emits dense residual tensors + predictor
parameters; the device (ops/lpc.py) restores LPC/fixed prediction for whole
batches of subframes, applies wasted-bits shifts and stereo decorrelation,
and packs PCM bytes.  ``decode_frame`` drives one frame end-to-end;
``decode_stream`` batches all equal-sized frames of a stream into single
device calls (the high-throughput path).
"""

from __future__ import annotations

import ctypes as C
import functools
import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lpc as lpc_ops
from ..runtime import transport
from ..runtime.native import host_lib
from ..utils.errors import FLACDecoderResult, FLACMetadataType

__all__ = ["FLACDecoder"]

_i32p = C.POINTER(C.c_int32)


def _frame_kernel_body(data, coeffs, order, shift, wasted, chan_assign, *, depth, nch,
                       mode32, use64=True, max_order=32):
    """Device back-end for a batch of frames.

    data: int ``[..., C, T]`` (warm-ups + residuals; may arrive int16 when
    the frame's words fit — the batched feed ships the dominant tensor at
    half width), coeffs ``[..., C, 32]``, order/shift/wasted ``[..., C]``,
    chan_assign ``[...]``. ``use64=False`` selects the int32 accumulation
    fast path — only valid when every subframe's front-end overflow analysis
    cleared it (see ``lpc_restore``). Returns packed PCM uint8
    ``[..., T*C*bps]``.
    """
    y = lpc_ops.lpc_restore(data.astype(jnp.int32), coeffs, order, shift,
                            use64=use64, max_order=max_order)
    y = y << wasted[..., None]
    if nch == 2:
        y = lpc_ops.decorrelate(y, chan_assign)
    inter = jnp.swapaxes(y, -1, -2).reshape(*y.shape[:-2], -1)  # [..., T*C]

    if mode32:
        # left-justified 32-bit mode (reference flac_decoder.cpp:245-258)
        samples = inter << (32 - depth)
        nbytes = 4
    else:
        shift_amount = (8 - depth % 8) % 8
        samples = inter + (128 if depth == 8 else 0)
        samples = samples << shift_amount
        nbytes = (depth + 7) // 8

    parts = [((samples >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(nbytes)]
    stacked = jnp.stack(parts, axis=-1)
    return stacked.reshape(*stacked.shape[:-2], -1)


_frame_kernel = functools.partial(jax.jit, static_argnames=(
    "depth", "nch", "mode32", "use64", "max_order"))(_frame_kernel_body)


@functools.partial(jax.jit, static_argnames=("depth", "nch", "mode32", "use64",
                                             "max_order"))
def _frame_kernel_esc(data8, esc_pos, esc_val, coeffs, order, shift, wasted,
                      chan_assign, *, depth, nch, mode32, use64=True,
                      max_order=32):
    """Sideband variant of the frame kernel: residual words ship as int8
    plus a sparse escape sideband (flat position, int32 value) for the rare
    words that don't fit — well-predicted real audio has escape densities of
    ~0.1-0.2% (mostly warm-up samples), so this halves the dominant
    transport tensor vs the int16 tier.  Padding entries carry an
    out-of-range position and are dropped by the scatter.
    """
    wide = data8.astype(jnp.int32).reshape(-1)
    fixed = wide.at[esc_pos].set(esc_val, mode="drop").reshape(data8.shape)
    return _frame_kernel_body(fixed, coeffs, order, shift, wasted, chan_assign,
                              depth=depth, nch=nch, mode32=mode32, use64=use64,
                              max_order=max_order)


@functools.partial(jax.jit, static_argnames=("depth", "nch", "mode32", "use64",
                                             "max_order"))
def _frame_kernel_esc_sharded(data8, esc_pos, esc_val, coeffs, order, shift,
                              wasted, chan_assign, *, depth, nch, mode32,
                              use64=True, max_order=32):
    """Mesh form of the sideband fixup (VERDICT r3 #4): escape positions are
    LOCAL to each shard's contiguous frame block — ``esc_pos``/``esc_val``
    are ``[S, cap]`` with one row per shard, ``data8``'s frame axis is
    sharded into those S blocks — so the fixup is a vmap'd scatter over the
    shard axis.  Each chip rewrites only its own block and GSPMD partitions
    the batched scatter without collectives, so the sharded serving path
    keeps the ~2x upload win of the int8 tier instead of falling back to
    int16."""
    S = esc_pos.shape[0]
    wide = data8.astype(jnp.int32).reshape(S, -1)
    fixed = jax.vmap(lambda w, p, v: w.at[p].set(v, mode="drop"))(
        wide, esc_pos, esc_val).reshape(data8.shape)
    return _frame_kernel_body(fixed, coeffs, order, shift, wasted, chan_assign,
                              depth=depth, nch=nch, mode32=mode32, use64=use64,
                              max_order=max_order)


_ORDER_CLASSES = (4, 8, 12, 16, 32)


def _order_class(orders) -> int:
    """Static LPC window class for a dispatch: the smallest of
    {4, 8, 12, 16, 32} covering every subframe order in the batch.  Keeps
    kernel specializations bounded (five variants per shape) while the
    dominant real-encoder orders (<= 8/12) run a 4x-narrower scan window
    (ops/lpc.py max_order; the reference gets the same effect from its
    per-order assembly jump table, flac_lpc_32_asm.S:42)."""
    mo = int(np.max(orders, initial=0))
    for c in _ORDER_CLASSES:
        if mo <= c:
            return c
    return 32


# escape-density ceiling for choosing the int8+sideband transport tier
# (shared rationale in runtime/transport.py); tests force it to 0.0/1.0
ESC_MAX_DENSITY = transport.ESC_MAX_DENSITY


def _require_x64(what: str) -> None:
    """The FLAC/MP3 numeric paths use int64 (64-bit LPC accumulators,
    MULSHIFT32/polyphase MACs). Without jax_enable_x64 JAX silently
    truncates int64 to int32 and decode output is WRONG — fail loudly."""
    import jax

    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            f"{what} requires 64-bit integer math: enable it with "
            "jax.config.update('jax_enable_x64', True) (before tracing) "
            "or JAX_ENABLE_X64=1. Without it JAX silently truncates the "
            "decoder's int64 accumulators and output is incorrect.")


class _ParseGroup:
    """Host-side frame table for one (channels, max_block_size) shape class.

    The native front-end appends every parsed frame of every stream directly
    into these batch-major arrays (``eal_flac_parse_stream``), so the Python
    layer never touches individual frames: residuals land pre-narrowed to
    the NARROWEST width the frame's words fit — int8 (well-predicted real
    audio: residual std is tens of LSBs), int16, or int32 — each step
    halving the device upload; predictor metadata is row-indexed by frame
    slot.  Arrays double when full (amortized O(total)).
    """

    def __init__(self, nch: int, mbs: int, cap: int = 256):
        self.nch, self.mbs, self.cap = nch, mbs, cap
        self.nf = 0
        self.data8 = np.empty((cap, nch, mbs), np.int8)
        self.data16 = np.empty((cap, nch, mbs), np.int16)
        self.data32 = np.empty((cap, nch, mbs), np.int32)
        self.cursors = np.zeros(3, np.int32)  # [slot8, slot16, slot32]
        self.wide = np.empty(cap, np.int32)
        self.slot = np.empty(cap, np.int32)
        self.order = np.empty((cap, nch), np.int32)
        self.shift = np.empty((cap, nch), np.int32)
        self.wasted = np.empty((cap, nch), np.int32)
        self.use64 = np.empty((cap, nch), np.int32)
        self.coeffs = np.empty((cap, nch, 32), np.int32)
        self.bs = np.empty(cap, np.int32)
        self.ca = np.empty(cap, np.int32)
        self.depth = np.empty(cap, np.int32)
        self.crc_ok = np.empty(cap, np.int32)
        self.consumed = np.empty(cap, np.int32)

    def room(self) -> int:
        return min([self.cap - self.nf] + [self.cap - int(c) for c in self.cursors])

    def grow(self) -> None:
        new_cap = self.cap * 2
        for name in ("data8", "data16", "data32", "wide", "slot", "order", "shift",
                     "wasted", "use64", "coeffs", "bs", "ca", "depth",
                     "crc_ok", "consumed"):
            old = getattr(self, name)
            new = np.empty((new_cap,) + old.shape[1:], old.dtype)
            new[: old.shape[0]] = old
            setattr(self, name, new)
        self.cap = new_cap


def _parse_one_stream(lib, dec, buffer, g):
    """Parse every frame of one stream into group ``g`` (appending at
    ``g.nf``), one native call per capacity window
    (``eal_flac_parse_stream``).  Returns ``(rows, codes_s)``: the group
    row indices appended and the stream's result-code list (same protocol
    as the old per-frame loop — SUCCESS per parsed frame plus the terminal
    code that ended the stream, if any)."""
    u8p = C.POINTER(C.c_uint8)
    i16p = C.POINTER(C.c_int16)
    buf = np.frombuffer(buffer, np.uint8) if isinstance(buffer, (bytes, bytearray)) else np.ascontiguousarray(buffer)
    mbs = g.mbs
    rows, codes_s = [], []
    pos = 0
    while pos < buf.size:
        room = g.room()
        if room == 0:
            g.grow()
            continue
        last_rc = C.c_int32(0)
        sub = buf[pos:]
        f0 = g.nf
        nf = lib.eal_flac_parse_stream(
            dec._ctx, sub.ctypes.data_as(u8p), sub.size, room, mbs,
            g.data8.ctypes.data_as(C.POINTER(C.c_int8)),
            g.data16.ctypes.data_as(i16p), g.data32.ctypes.data_as(_i32p),
            g.cursors[0:].ctypes.data_as(_i32p), g.cursors[1:].ctypes.data_as(_i32p),
            g.cursors[2:].ctypes.data_as(_i32p),
            g.wide[f0:].ctypes.data_as(_i32p), g.slot[f0:].ctypes.data_as(_i32p),
            g.order[f0:].ctypes.data_as(_i32p), g.shift[f0:].ctypes.data_as(_i32p),
            g.wasted[f0:].ctypes.data_as(_i32p), g.use64[f0:].ctypes.data_as(_i32p),
            g.coeffs[f0:].ctypes.data_as(_i32p), g.bs[f0:].ctypes.data_as(_i32p),
            g.ca[f0:].ctypes.data_as(_i32p), g.depth[f0:].ctypes.data_as(_i32p),
            g.crc_ok[f0:].ctypes.data_as(_i32p), g.consumed[f0:].ctypes.data_as(_i32p),
            C.byref(last_rc))
        g.nf += nf
        pos += int(g.consumed[f0 : f0 + nf].sum())
        codes_s.extend([FLACDecoderResult.SUCCESS] * nf)
        rows.extend(range(f0, f0 + nf))
        rc = last_rc.value
        if rc != 0:
            codes_s.append(FLACDecoderResult(rc))
            break
        if nf < room:   # clean exhaustion (pos >= size)
            break
    return rows, codes_s


def _parse_thread_count(n_live: int) -> int:
    """Host-parse pool size for a fleet of ``n_live`` streams — the same
    heuristic as the MP3 fleet parse (native/src/mp3_frontend.cpp,
    eal_mp3_parse_frame_batch): auto-engage only above a minimum fleet with
    >=32 streams per thread, EAL_PARSE_THREADS overrides (lets tests force
    the pool on single-core boxes and deployments pin the parse fleet's
    footprint next to the transport threads)."""
    forced = 0
    env = os.environ.get("EAL_PARSE_THREADS")
    if env:
        try:
            forced = int(env)
        except ValueError:
            forced = 0
    hw = os.cpu_count() or 1
    n = forced if forced > 0 else hw
    if forced > 0:
        # clamp to the live-stream count like the native MP3 heuristic
        # (mp3_frontend.cpp caps n_threads <= B): EAL_PARSE_THREADS=16 with
        # 2 streams must not spin 16 idle workers / a 16-wide window
        n = max(min(n, n_live), 1)
        return n if n > 1 else 1
    if n <= 1 or n_live < max(64, 2 * n):
        return 1
    if n > n_live // 32:   # >=32 streams per thread when auto-sized
        n = n_live // 32
    return max(min(n, n_live), 1)


def _parse_streams(decoders, buffers, groups=None, codes=None, frames_of=None,
                   on_stream=None):
    """Host front-end for a fleet: parse every frame of every stream into
    the shared :class:`_ParseGroup` tables.  Returns
    ``(groups, codes, frames_of)``: per-stream result-code lists and
    per-stream lists of (group key, frame row) pairs.

    ``groups``/``codes``/``frames_of`` may be passed in pre-allocated and
    ``on_stream(s)`` is then called after stream ``s`` is fully parsed —
    the overlap hook ``_decode_streams`` uses to start uploading completed
    streams' frames while later streams still parse (the native call
    releases the GIL; ``_ParseGroup.grow`` publishes reallocated tables
    only after the copy, so rows of completed streams are always
    consistent for a concurrent reader).

    At serving fleet sizes on a multi-core host the per-stream entropy
    decode parallelizes (SURVEY.md §7 hard part (d) — keep the host
    front-end from starving the device): streams are independent contexts,
    so workers parse into PRIVATE staging groups and the main thread
    commits them into the shared tables in stream order — the committed
    layout (row order, width-slot assignment) is bit-identical to the
    serial path, so downstream bucketing/dispatch and ``on_stream``
    ordering are unaffected by thread scheduling.
    """
    lib = host_lib()
    groups = {} if groups is None else groups
    codes = [[] for _ in buffers] if codes is None else codes
    frames_of = [[] for _ in buffers] if frames_of is None else frames_of

    def key_of(dec):
        return (dec.num_channels, dec.max_block_size)

    def shared_group(key):
        g = groups.get(key)
        if g is None:   # setdefault would CONSTRUCT the group per stream
            g = groups[key] = _ParseGroup(*key)
        return g

    n_live = sum(1 for b in buffers if b is not None)
    n_threads = _parse_thread_count(n_live)
    if n_threads <= 1:
        for s, (dec, buffer) in enumerate(zip(decoders, buffers)):
            if buffer is not None:
                key = key_of(dec)
                rows, codes_s = _parse_one_stream(lib, dec, buffer, shared_group(key))
                codes[s].extend(codes_s)
                frames_of[s].extend((key, r) for r in rows)
            if on_stream is not None:
                on_stream(s)
        return groups, codes, frames_of

    from concurrent.futures import ThreadPoolExecutor

    def worker(s):
        # small initial capacity: private groups exist only worker-to-commit,
        # but a whole submission window of them can be alive at once
        gp = _ParseGroup(*key_of(decoders[s]), cap=8)
        rows, codes_s = _parse_one_stream(lib, decoders[s], buffers[s], gp)
        return gp, rows, codes_s

    def commit(s, gp, rows, codes_s):
        """Append a private group's rows to the shared group, reproducing
        exactly the layout the serial path would have produced."""
        key = key_of(decoders[s])
        g = shared_group(key)
        while g.cap - g.nf < gp.nf or any(
                g.cap - int(g.cursors[w]) < int(gp.cursors[w]) for w in range(3)):
            g.grow()
        f0, base = g.nf, g.cursors.copy()
        pnf = gp.nf
        for name in ("wide", "order", "shift", "wasted", "use64", "coeffs",
                     "bs", "ca", "depth", "crc_ok", "consumed"):
            getattr(g, name)[f0 : f0 + pnf] = getattr(gp, name)[:pnf]
        # private width-slot counters start at 0, so global slot = width's
        # shared cursor at commit + private slot
        g.slot[f0 : f0 + pnf] = gp.slot[:pnf] + base[gp.wide[:pnf]]
        for w, name in enumerate(("data8", "data16", "data32")):
            cw = int(gp.cursors[w])
            if cw:
                getattr(g, name)[base[w] : base[w] + cw] = getattr(gp, name)[:cw]
        g.cursors += gp.cursors
        g.nf = f0 + pnf
        codes[s].extend(codes_s)
        frames_of[s].extend((key, f0 + r) for r in rows)

    # Bounds live private-group memory.  Each in-flight _ParseGroup holds all
    # three width tables (int8+int16+int32 = 7 B/sample per frame row at its
    # grown capacity), so peak host RSS scales with window x longest-stream
    # frame count on top of the shared tables; n_threads + 2 keeps the pool
    # fed through the in-order commit without the old 4x multiplier.
    window = n_threads + 2
    futs = {}
    submit_i = 0
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        def maybe_submit():
            nonlocal submit_i
            while submit_i < len(buffers) and len(futs) < window:
                s = submit_i
                submit_i += 1
                if buffers[s] is not None:
                    futs[s] = pool.submit(worker, s)

        maybe_submit()
        for s in range(len(buffers)):
            if buffers[s] is not None:
                gp, rows, codes_s = futs.pop(s).result()
                maybe_submit()
                commit(s, gp, rows, codes_s)
            if on_stream is not None:
                on_stream(s)
    return groups, codes, frames_of



def _frame_shape_key(g, fi, m32):
    """Kernel static-shape key for one frame row (shared by the host and
    device-resident decode paths — a new width tier or static param must
    change only here)."""
    return ((g.nch, g.mbs), int(g.bs[fi]), int(g.depth[fi]), int(g.wide[fi]),
            bool(g.use64[fi].any()), m32)


def _run_frame_bucket(g, rows, frs, bkey, mesh=None):
    """Dispatch one shape bucket through the frame kernel; returns the
    device output [len(rows), bytes].

    With ``mesh`` (and a bucket size divisible by it), the residual upload —
    the dominant tensor — and the per-frame params land lane-sharded across
    the mesh and the kernel runs SPMD, one shard of frames per chip (frames
    are independent; no collectives in the math)."""
    ((nch, mbs), bs, depth, wide, acc64, m32) = bkey
    morder = _order_class(g.order[frs])
    src = (g.data8, g.data16, g.data32)[wide]
    data = src[rows] if bs == mbs else src[rows][:, :, :bs]
    sharded = mesh is not None and len(rows) % mesh.size == 0
    if sharded:
        from ..parallel.mesh import shard_streams as _shard

        put = lambda x: _shard(np.ascontiguousarray(x), mesh)
    else:
        put = jnp.asarray

    # int8 + escape-sideband transport tier: int16 frames whose words are
    # int8-sized except for rare escapes ship at half width plus a sparse
    # fixup (see _frame_kernel_esc).  Under a mesh the sideband is built
    # per SHARD (positions local to each shard's contiguous frame block,
    # _frame_kernel_esc_sharded) so the fixup scatter stays shard-local —
    # the sharded serving path pays the same ~1 B/word upload as the
    # single-chip path.
    if wide == 1:
        esc_mask = np.abs(data.astype(np.int32)) > 127
        n_esc = int(esc_mask.sum())
        if n_esc <= ESC_MAX_DENSITY * data.size:
            if sharded:
                flat2 = data.reshape(mesh.size, -1)
                pos, val = transport.escape_sideband_blocked(
                    esc_mask.reshape(mesh.size, -1), flat2, np.int32)
                return _frame_kernel_esc_sharded(
                    put(data.astype(np.int8)), put(pos), put(val),
                    put(g.coeffs[frs]), put(g.order[frs]),
                    put(g.shift[frs]), put(g.wasted[frs]), put(g.ca[frs]),
                    depth=depth, nch=nch, mode32=m32, use64=acc64,
                    max_order=morder)
            flat = np.flatnonzero(esc_mask)
            pos, val = transport.escape_sideband(
                flat, data.reshape(-1)[flat], oob_index=data.size,
                val_dtype=np.int32)
            return _frame_kernel_esc(
                jnp.asarray(data.astype(np.int8)), jnp.asarray(pos),
                jnp.asarray(val), jnp.asarray(g.coeffs[frs]),
                jnp.asarray(g.order[frs]), jnp.asarray(g.shift[frs]),
                jnp.asarray(g.wasted[frs]), jnp.asarray(g.ca[frs]),
                depth=depth, nch=nch, mode32=m32, use64=acc64,
                max_order=morder)

    return _frame_kernel(
        put(data), put(g.coeffs[frs]),
        put(g.order[frs]), put(g.shift[frs]),
        put(g.wasted[frs]), put(g.ca[frs]),
        depth=depth, nch=nch, mode32=m32, use64=acc64, max_order=morder)


def _decode_streams(decoders, buffers, verify_md5: bool = True, mesh=None):
    """Shared end-to-end path for 1..N streams: native batched host parse,
    cross-stream shape-bucketed device kernels, per-stream reassembly.

    ``mesh``: optional stream mesh — buckets whose frame count divides the
    mesh size dispatch SPMD with the frame axis sharded (see
    ``_run_frame_bucket``); ragged buckets fall back to single-device.

    Large buckets dispatch in SLICES with the PCM download of slice k
    running on a drain thread while slice k+1's residuals upload: the
    host<->device link is full duplex (a single big transfer serializes
    ~3 bytes/sample of total traffic; overlapped it costs
    max(up, down) ≈ 2 — measured ~2x e2e on the tunnel, and oversized
    single D2H transfers can stall pathologically there).  Slice outputs
    are assembled in dispatch order, so results are byte-identical to the
    single-dispatch path.

    Returns the per-stream (pcm_bytes, results-dict) list of
    ``FLACDecoder.decode_stream`` / ``BatchedFLACDecoder.decode_streams``.
    """
    from concurrent.futures import ThreadPoolExecutor

    n = len(decoders)
    assert len(buffers) == n

    # the host parse signals per completed stream (threaded for fleets —
    # transport.overlapped_parse); the main thread buckets each completed
    # stream's frames by the kernel's static shape params (residual width
    # and the int32-accumulation clearance are part of the compiled shape)
    # and dispatches a slice as soon as one fills, so uploads of early
    # streams ride the link while late streams still parse.  Each worker
    # runs a whole slice — host row prep, upload, kernel dispatch, PCM
    # download — so several transfers ride the link in EACH direction
    # concurrently (see runtime/transport.py for the measurements).  Slices
    # are independent frames and assembly maps by (stream, j), so
    # completion order is irrelevant.
    groups: dict = {}
    codes = [[] for _ in buffers]
    frames_of = [[] for _ in buffers]
    out_chunks = [[] for _ in range(n)]
    buckets: dict = {}   # bkey -> not-yet-dispatched (s, j, fi) rows
    pending = []         # per-slice worker futures

    def _parse_call(on_stream):
        _parse_streams(decoders, buffers, groups, codes, frames_of,
                       on_stream=on_stream)

    with transport.overlapped_parse(_parse_call, n) as done_q, \
            ThreadPoolExecutor(max_workers=transport.DRAIN_THREADS) as pool:
        def _slice_job(bkey, sl):
            g = groups[bkey[0]]
            rows = np.fromiter((g.slot[fi] for _, _, fi in sl),
                               np.int64, len(sl))
            frs = np.fromiter((fi for _, _, fi in sl), np.int64, len(sl))
            return np.asarray(
                _run_frame_bucket(g, rows, frs, bkey, mesh=mesh)), sl

        while True:
            s = done_q.get()
            if s is None:
                break
            out_chunks[s] = [None] * len(frames_of[s])
            m32 = decoders[s]._output_32bit
            for j, (key, fi) in enumerate(frames_of[s]):
                bkey = _frame_shape_key(groups[key], fi, m32)
                sl = buckets.setdefault(bkey, [])
                sl.append((s, j, fi))
                if mesh is not None:
                    continue   # sharded buckets stay whole (SPMD over ICI)
                ((nch, _mbs), bs, depth, _wide, _acc64, bm32) = bkey
                bps = 4 if bm32 else (depth + 7) // 8
                if len(sl) * bs * nch * bps >= transport.SLICE_OUT_BYTES:
                    buckets[bkey] = []
                    pending.append(pool.submit(_slice_job, bkey, sl))
        for bkey, sl in buckets.items():   # tails (+ whole mesh buckets)
            if sl:
                pending.append(pool.submit(_slice_job, bkey, sl))
        for fut in pending:
            packed_np, sl = fut.result()
            for k, (s, j, _) in enumerate(sl):
                out_chunks[s][j] = packed_np[k]

    results = []
    for s, dec in enumerate(decoders):
        if buffers[s] is None:
            results.append((b"", None))
            continue
        pcm = b"".join(c.tobytes() for c in out_chunks[s] if c is not None)
        md5_ok = None
        if verify_md5 and not dec._output_32bit:
            sig = dec.md5_signature
            if any(sig):
                md5_ok = dec._md5_of_output(out_chunks[s]) == sig
        total = int(sum(groups[key].bs[fi] for key, fi in frames_of[s])) * dec.num_channels
        results.append((pcm, {"frame_results": codes[s], "num_samples": total,
                              "md5_ok": md5_ok, "num_frames": len(frames_of[s])}))
    return results


class _FleetSig:
    """Per-signature dispatch state for :func:`decode_streams_to_device_grouped`.

    A *signature* is a stream's full per-frame shape-key sequence; streams
    with the same signature batch into the same device dispatches and share
    one rectangular on-device PCM block.  A uniform fleet is the one-
    signature special case."""

    __slots__ = ("keys", "bucket_js", "chunk_outs", "ready", "chunk_n",
                 "stream_ids")

    def __init__(self, keys, n, mesh):
        self.keys = keys
        self.bucket_js = {}
        for bkey in dict.fromkeys(keys):
            self.bucket_js[bkey] = [j for j, k in enumerate(keys) if k == bkey]
        # chunk streams so each dispatch round moves ~one transport slice of
        # PCM-equivalent bytes (see transport.SLICE_OUT_BYTES)
        stream_bytes = sum(k[1] * k[0][0] * (4 if k[5] else (k[2] + 7) // 8)
                           for k in keys)
        self.chunk_n = n if mesh is not None else max(
            1, transport.SLICE_OUT_BYTES // max(1, stream_bytes))
        self.chunk_outs = {}   # bkey -> [chunk, len(js), bytes] device arrays
        self.ready = []        # parsed, not-yet-dispatched stream ids
        self.stream_ids = []   # all stream ids, dispatch order


def decode_streams_to_device_grouped(decoders, buffers, mesh=None):
    """Fleet decode with the PCM LEFT ON DEVICE, for an arbitrary (possibly
    MIXED) fleet: the serving composition path (decode -> resample -> ...
    chains without any host round trip).

    Streams are grouped by their frame-shape *signature* (the sequence of
    per-frame shape keys); each signature group batches into shared device
    dispatches and yields one rectangular device PCM block.  The reference
    imposes no fleet uniformity (each decoder instance is independent,
    include/flac_decoder.h) — neither does this path; a uniform fleet
    simply produces a single group (VERDICT r4 #5).

    Returns ``(group_list, results)``:

    - ``group_list``: list of ``(stream_ids, pcm_dev)`` in first-seen
      order — ``pcm_dev`` is jnp uint8 ``[len(stream_ids), stream_bytes]``
      of packed PCM (bitcast-viewable as int16 for 16-bit output, the
      byte layout ``Resampler.resample_stream`` consumes group-wise).
    - ``results``: per-stream metadata (``decode_streams`` minus
      ``md5_ok`` — the bytes never reach the host, so MD5 verification is
      unavailable by construction).

    With ``mesh``, each group's residual uploads arrive stream-sharded and
    its PCM block is returned batch-sharded when the group divides the
    mesh — ready to feed a sharded ``Resampler.resample_stream`` without a
    resharding collective.
    """
    n = len(decoders)

    # parse signals per completed stream (transport.overlapped_parse — same
    # pattern as _decode_streams): stream-chunks of residuals upload while
    # later streams still parse.  This path is upload-dominated (no PCM
    # download), so hiding the host parse leg under the uploads is the whole
    # remaining overlap.
    groups: dict = {}
    codes = [[] for _ in buffers]
    frames_of = [[] for _ in buffers]
    sigs: dict = {}          # signature tuple -> _FleetSig, first-seen order

    def _parse_call(on_stream):
        _parse_streams(decoders, buffers, groups, codes, frames_of,
                       on_stream=on_stream)

    def _dispatch_chunk(st, streams_chunk):
        for bkey, js in st.bucket_js.items():
            g = groups[bkey[0]]
            rows = np.fromiter(
                (g.slot[frames_of[s][j][1]] for s in streams_chunk for j in js),
                np.int64, len(streams_chunk) * len(js))
            frs = np.fromiter(
                (frames_of[s][j][1] for s in streams_chunk for j in js),
                np.int64, len(streams_chunk) * len(js))
            packed = _run_frame_bucket(g, rows, frs, bkey, mesh=mesh)
            st.chunk_outs.setdefault(bkey, []).append(
                packed.reshape(len(streams_chunk), len(js), -1))

    with transport.overlapped_parse(_parse_call, n) as done_q:
        while True:
            s = done_q.get()
            if s is None:
                break
            m32 = decoders[s]._output_32bit
            keys = [_frame_shape_key(groups[key], fi, m32)
                    for key, fi in frames_of[s]]
            sig = (m32, tuple(keys))
            st = sigs.get(sig)
            if st is None:
                st = sigs[sig] = _FleetSig(keys, n, mesh)
            st.stream_ids.append(s)
            st.ready.append(s)
            if len(st.ready) >= st.chunk_n:
                _dispatch_chunk(st, st.ready)
                st.ready = []
        if not any(st.keys for st in sigs.values()):
            raise ValueError("no frames parsed")
        for st in sigs.values():
            if st.ready:
                _dispatch_chunk(st, st.ready)
                st.ready = []

    group_list = []
    for st in sigs.values():
        F = len(st.keys)
        if F == 0:
            group_list.append((st.stream_ids,
                               jnp.zeros((len(st.stream_ids), 0), jnp.uint8)))
            continue
        # stitch chunk rows (stream-major, dispatch order) and per-frame-
        # position segments back into stream x j order on device
        segs = [None] * F
        for bkey, js in st.bucket_js.items():
            outs = st.chunk_outs[bkey]
            dev = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
            for k, j in enumerate(js):
                segs[j] = dev[:, k]
        pcm_dev = jnp.concatenate(segs, axis=1) if F > 1 else segs[0]
        if mesh is not None and len(st.stream_ids) % mesh.size == 0:
            # pin the composition handoff layout: stream-sharded PCM
            from ..parallel.mesh import batch_sharding

            pcm_dev = jax.device_put(pcm_dev, batch_sharding(mesh, pcm_dev.ndim))
        group_list.append((st.stream_ids, pcm_dev))

    results = []
    for s in range(n):
        total = int(sum(groups[key].bs[fi] for key, fi in frames_of[s])) \
            * decoders[s].num_channels
        results.append({"frame_results": codes[s], "num_samples": total,
                        "num_frames": len(frames_of[s])})
    return group_list, results


def decode_streams_to_device(decoders, buffers, mesh=None):
    """Uniform-fleet convenience wrapper over
    :func:`decode_streams_to_device_grouped`: returns ``(pcm_dev, results)``
    with ``pcm_dev`` one jnp uint8 ``[n_streams, stream_bytes]`` rectangle
    (rows in stream order).  A fleet that produces more than one frame-shape
    signature raises — call the grouped variant to keep a mixed fleet's PCM
    on device per group.
    """
    group_list, results = decode_streams_to_device_grouped(
        decoders, buffers, mesh=mesh)
    if len(group_list) != 1:
        raise ValueError(
            "decode_streams_to_device requires a uniform fleet (same "
            "frame-shape sequence per stream); this fleet has "
            f"{len(group_list)} shape signatures — use "
            "decode_streams_to_device_grouped for per-group device PCM")
    ids, pcm_dev = group_list[0]
    if ids != list(range(len(decoders))):
        # parse completion order is stream order today, but don't rely on it
        pcm_dev = jnp.take(pcm_dev, jnp.asarray(np.argsort(ids)), axis=0)
    return pcm_dev, results


class FLACDecoder:
    """Drop-in equivalent of the reference decoder class, device-accelerated."""

    def __init__(self):
        _require_x64("FLACDecoder")
        self._lib = host_lib()
        self._ctx = self._lib.eal_flac_create()
        self._output_32bit = False
        self._header_ok = False

    def __del__(self):
        try:
            self._lib.eal_flac_destroy(self._ctx)
        except Exception:
            pass

    # -------------------------------------------------------- checkpointing
    def get_state(self) -> dict:
        """Serializable snapshot of all carried decode state (SURVEY.md §5
        checkpoint/resume): native front-end (STREAMINFO, metadata,
        partial-header resume, CRC toggle) + Python-side flags. Restore into
        any FLACDecoder with :meth:`set_state`; decoding then continues
        identically to an uninterrupted run."""
        n = self._lib.eal_flac_state_size(self._ctx)
        buf = np.zeros(n, np.uint8)
        rc = self._lib.eal_flac_state_save(
            self._ctx, buf.ctypes.data_as(C.POINTER(C.c_uint8)), n)
        if rc != 0:
            raise RuntimeError("FLAC state save failed")
        return {"native": buf.tobytes(), "output_32bit": self._output_32bit,
                "header_ok": self._header_ok}

    def set_state(self, state: dict) -> None:
        data = np.frombuffer(state["native"], np.uint8)
        rc = self._lib.eal_flac_state_load(
            self._ctx, data.ctypes.data_as(C.POINTER(C.c_uint8)), data.size)
        if rc != 0:
            raise RuntimeError("FLAC state load failed (bad/incompatible blob)")
        self._output_32bit = bool(state["output_32bit"])
        self._header_ok = bool(state["header_ok"])

    # ------------------------------------------------------------- header
    def read_header(self, buffer: bytes) -> FLACDecoderResult:
        buf = np.frombuffer(buffer, np.uint8)
        rc = self._lib.eal_flac_read_header(
            self._ctx, buf.ctypes.data_as(C.POINTER(C.c_uint8)), buf.size)
        res = FLACDecoderResult(rc)
        if res == FLACDecoderResult.SUCCESS:
            self._header_ok = True
        return res

    # ------------------------------------------------------------ getters
    @property
    def sample_rate(self) -> int:
        return self._lib.eal_flac_sample_rate(self._ctx)

    @property
    def num_channels(self) -> int:
        return self._lib.eal_flac_num_channels(self._ctx)

    @property
    def sample_depth(self) -> int:
        return self._lib.eal_flac_sample_depth(self._ctx)

    @property
    def min_block_size(self) -> int:
        return self._lib.eal_flac_min_block_size(self._ctx)

    @property
    def max_block_size(self) -> int:
        return self._lib.eal_flac_max_block_size(self._ctx)

    @property
    def num_samples(self) -> int:
        return self._lib.eal_flac_num_samples(self._ctx)

    @property
    def md5_signature(self) -> bytes:
        out = np.zeros(16, np.uint8)
        self._lib.eal_flac_md5(self._ctx, out.ctypes.data_as(C.POINTER(C.c_uint8)))
        return out.tobytes()

    def get_bytes_index(self) -> int:
        return self._lib.eal_flac_bytes_index(self._ctx)

    def get_output_bytes_per_sample(self) -> int:
        if self._output_32bit:
            return 4
        return (self.sample_depth + 7) // 8

    def get_output_buffer_size(self) -> int:
        return self.max_block_size * self.num_channels

    def get_output_buffer_size_bytes(self) -> int:
        return self.get_output_buffer_size() * self.get_output_bytes_per_sample()

    def get_metadata_blocks(self):
        n = self._lib.eal_flac_num_metadata(self._ctx)
        blocks = []
        for i in range(n):
            t = C.c_int32(0)
            ln = C.c_int32(0)
            self._lib.eal_flac_metadata_info(self._ctx, i, C.byref(t), C.byref(ln))
            data = np.zeros(max(ln.value, 1), np.uint8)
            self._lib.eal_flac_metadata_data(self._ctx, i, data.ctypes.data_as(C.POINTER(C.c_uint8)))
            blocks.append((FLACMetadataType(t.value), data[: ln.value].tobytes()))
        return blocks

    # ------------------------------------------------------------- config
    def set_max_metadata_size(self, mtype: FLACMetadataType, max_size: int) -> None:
        self._lib.eal_flac_set_max_metadata_size(self._ctx, int(mtype), max_size)

    def set_max_album_art_size(self, max_size: int) -> None:
        self.set_max_metadata_size(FLACMetadataType.PICTURE, max_size)

    def set_crc_check_enabled(self, enabled: bool) -> None:
        self._lib.eal_flac_set_crc_check(self._ctx, int(enabled))

    def set_output_32bit_samples(self, enabled: bool) -> None:
        self._output_32bit = enabled

    # ------------------------------------------------------------- frames
    def _parse_frame(self, buffer: np.ndarray):
        nch = self.num_channels
        mb = self.max_block_size
        data = np.zeros((nch, mb), np.int32)
        order = np.zeros(nch, np.int32)
        shift = np.zeros(nch, np.int32)
        wasted = np.zeros(nch, np.int32)
        use64 = np.zeros(nch, np.int32)
        coeffs = np.zeros((nch, 32), np.int32)
        bs = C.c_int32(0)
        ca = C.c_int32(0)
        depth = C.c_int32(0)
        crc_ok = C.c_int32(1)
        rc = self._lib.eal_flac_parse_frame(
            self._ctx, buffer.ctypes.data_as(C.POINTER(C.c_uint8)), buffer.size,
            data.ctypes.data_as(_i32p), mb,
            order.ctypes.data_as(_i32p), shift.ctypes.data_as(_i32p),
            wasted.ctypes.data_as(_i32p), use64.ctypes.data_as(_i32p),
            coeffs.ctypes.data_as(_i32p),
            C.byref(bs), C.byref(ca), C.byref(depth), C.byref(crc_ok))
        return (FLACDecoderResult(rc), data, order, shift, wasted, use64, coeffs,
                bs.value, ca.value, depth.value)

    def decode_frame(self, buffer: bytes):
        """Decode one frame: returns (result, packed_pcm_bytes|None, num_samples).

        num_samples counts interleaved samples (block_size * channels), like
        the reference's out-param (flac_decoder.cpp:221).
        """
        buf = np.frombuffer(buffer, np.uint8) if isinstance(buffer, (bytes, bytearray)) else buffer
        res, data, order, shift, wasted, use64, coeffs, bs, ca, depth = self._parse_frame(buf)
        if res != FLACDecoderResult.SUCCESS:
            return res, None, 0
        packed = _frame_kernel(
            jnp.asarray(data[:, :bs]), jnp.asarray(coeffs), jnp.asarray(order),
            jnp.asarray(shift), jnp.asarray(wasted), jnp.int32(ca),
            depth=depth, nch=self.num_channels, mode32=self._output_32bit,
            use64=bool(use64.any()), max_order=_order_class(order))
        return res, np.asarray(packed).tobytes(), bs * self.num_channels

    # ----------------------------------------------------------- streaming
    def decode_stream(self, buffer: bytes, verify_md5: bool = True):
        """Decode an entire stream after read_header: one native call parses
        every frame, then all equal-shaped frames decode as single device
        calls (shared with the fleet path, see ``_decode_streams``).

        Returns (pcm_bytes, results) where results is a dict with per-frame
        result codes, total samples, and md5_ok (None when the STREAMINFO
        carries no signature or verify_md5=False).
        """
        return _decode_streams([self], [buffer], verify_md5)[0]

    def _md5_of_output(self, out_chunks) -> bytes:
        """MD5 over decoded PCM in FLAC's canonical form: interleaved,
        little-endian, ceil(depth/8) bytes, signed (the host example repacks
        sign and removes the 8-bit bias before hashing,
        host_examples/flac_to_wav/src/flac_to_wav.cpp:13-52,325-328)."""
        depth = self.sample_depth
        md5 = hashlib.md5()
        shift_amount = (8 - depth % 8) % 8
        bps = (depth + 7) // 8
        for chunk in out_chunks:
            if chunk is None:
                continue
            if shift_amount == 0 and depth != 8:
                md5.update(chunk.tobytes())
            else:
                arr = np.frombuffer(chunk.tobytes(), np.uint8).reshape(-1, bps).astype(np.int64)
                v = np.zeros(arr.shape[0], np.int64)
                for k in range(bps):
                    v |= arr[:, k] << (8 * k)
                sign = 1 << (8 * bps - 1)
                v = (v ^ sign) - sign
                if depth == 8:
                    v -= 128
                v >>= shift_amount
                repacked = np.zeros((arr.shape[0], bps), np.uint8)
                for k in range(bps):
                    repacked[:, k] = (v >> (8 * k)) & 0xFF
                md5.update(repacked.tobytes())
        return md5.digest()
