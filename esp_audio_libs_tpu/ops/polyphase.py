"""Batched polyphase sinc-resampling kernels (device side).

The reference computes one ``numTaps``-long dot product per output sample per
channel (reference: src/resample/art_resampler.cpp:369-373 ``apply_filter``
-> dsps_dotprod_f32, driven by :421-458 ``subsample_*``).  Here the whole
chunk schedule (from runtime/phase_grid.py) is applied to a ``[..., L]``
batch at once:

* exact mode — per-tap scan: ``acc += x[win0+k] * filt[idx, k]`` preserves
  the C kernel's sequential f32 accumulation order bit-for-bit while staying
  fully vectorized across streams and output positions (VPU-bound).
* fast mode — the schedule is materialized as a banded ``[L, T]`` weight
  matrix on device (lerp prefolded, direct-copy rows as unit taps) and the
  chunk becomes ONE f32 matmul on the MXU: ``out = x @ W``.

Both modes handle the reference's three per-output cases: direct copy
(integer phase, no lowpass), single-filter dot, and two-filter linear
interpolation ``sum2*w + sum1*(1-w)`` (art_resampler.cpp:425-450).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .scan import exact_mul as _exact_mul

__all__ = ["polyphase_apply", "build_banded_weights", "polyphase_banded",
           "banded_weights_device", "banded_K"]


def banded_K(ratio: float, taps_p: int, tile: int = 128, *,
             aligned: bool = False) -> int:
    """Static slab width: a tile of ``tile`` outputs spans at most
    ``(tile-1)/ratio`` window starts plus the (possibly biquad-folded) tap
    count; rounded up to the lane width. ``aligned`` adds one lane-width of
    slack because tile starts are then rounded DOWN to 128 (the Pallas
    kernel's Mosaic DMAs require lane-aligned slice offsets); the XLA path
    skips the slack — its dynamic_slice takes any offset and the extra K is
    pure slab traffic."""
    span = int(np.ceil((tile - 1) / float(ratio))) + taps_p + 8
    if aligned:
        span += 128
    return ((span + 127) // 128) * 128


def banded_weights_device(filters, direct_row, win0x, idx1, idx2, weight, mode,
                          gen, *, K: int, taps_p: int, L: int, tile: int = 128,
                          aligned: bool = False):
    """Build the block-banded weight tiles ON DEVICE (inside jit).

    The host of a TPU VM can be slow/contended (this box: one CPU shared
    with the transport), and phase grids do NOT recur (the f32 phase orbit
    is effectively aperiodic), so host-side weight building or caching is a
    steady-state cost. Everything here is vectorized device work from the
    five compact [T] grid arrays:

      * feff rows: two row-gathers from the filterbank + f32 lerp (same
        single-rounded ops as the reference's subsample_interpolate)
      * band placement: instead of a scatter (TPU scatters serialize), each
        padded row is rotated to its in-tile offset with a BARREL SHIFTER —
        log2(K) static jnp.roll + select steps, all dense vector ops.
        Offsets never wrap: o + taps' <= K by construction.

    Args:
      filters: f32 ``[F+1, taps']`` (device). direct_row: f32 ``[taps']``
        mode-0 row. win0x/idx1/idx2/weight/mode: ``[T]`` grid arrays
        (T padded to a multiple of tile; entries at t >= gen are ignored).
      gen: traced valid-output count. K/taps_p/L: static (see banded_K; L is
        xext's time length, for start clamping). With ``aligned`` (the
        Pallas-kernel contract), K must come from banded_K(aligned=True),
        tile starts are rounded down to 128 (Mosaic DMA slice offsets must
        be lane-aligned) and L MUST be a multiple of 128 — an unaligned L
        would let end-of-buffer clamping push band offsets past K.
    Returns: (Wt ``[nt, K, tile]``, starts int32 ``[nt]``).
    """
    if aligned and L % 128:
        raise ValueError(f"xext length {L} must be a multiple of 128 (pad it)")
    T = win0x.shape[0]
    nt = T // tile
    valid = jnp.arange(T, dtype=jnp.int32) < gen

    f1 = jnp.take(filters, idx1, axis=0)
    f2 = jnp.take(filters, idx2, axis=0)
    w = weight.astype(jnp.float32)[:, None]
    feff = jnp.where((mode == 2)[:, None], f2 * w + f1 * (jnp.float32(1.0) - w), f1)
    feff = jnp.where((mode == 0)[:, None], direct_row[None, :], feff)
    feff = jnp.where(valid[:, None], feff, jnp.float32(0.0))  # zero padded slots

    starts = win0x.reshape(nt, tile)[:, 0]
    if aligned:
        starts = (starts // 128) * 128
    starts = jnp.minimum(starts, L - K).astype(jnp.int32)
    offs = win0x.reshape(nt, tile) - starts[:, None]          # [nt, tile]
    offs = jnp.clip(offs, 0, K - taps_p).astype(jnp.int32)

    Wt = jnp.pad(feff.reshape(nt, tile, taps_p).transpose(0, 2, 1),
                 [(0, 0), (0, K - taps_p), (0, 0)])           # [nt, K, tile]
    shift = 1
    while shift < K:
        sel = (offs & shift) != 0                             # [nt, tile]
        Wt = jnp.where(sel[:, None, :], jnp.roll(Wt, shift, axis=1), Wt)
        shift <<= 1
    return Wt, starts


def build_banded_weights(filters_np, win0x, idx1, idx2, weight, mode, *,
                         half, direct_row=None, valid_len=None, tile=128,
                         L=None):
    """Host-side schedule compression: block-banded weight tiles.

    The fast path used to scatter a full ``[L, T]`` banded matrix on device
    per call (slow: TPU scatters serialize) and run one huge matmul whose
    FLOPs scale with L instead of taps. The phase grid is host-known and
    data-independent, so instead compress it ONCE here: outputs are grouped
    into tiles of ``tile`` columns; each tile's windows span only
    ``O(tile*ratio + taps)`` input samples, so its weights fit a small dense
    ``[K, tile]`` block anchored at ``starts[i]``. The device then runs one
    batched ``[.., K] x [K, tile]`` MXU matmul per tile (polyphase_banded) —
    ~L/K x fewer FLOPs and zero device scatters. Results are identical ops to
    the old path (same f32 lerp folding, same HIGHEST matmul contraction
    per output column).

    Args:
      filters_np: f32 ``[F+1, taps']`` numpy filterbank (possibly biquad-folded).
      win0x: int ``[T]`` window starts in xext coordinates (>= 0, monotonic).
      idx1, idx2, weight, mode: the phase-grid arrays (numpy).
      half: taps//2 of the ORIGINAL filterbank (direct-copy tap position).
      direct_row: optional f32 ``[taps']`` row for mode-0 outputs (used when a
        pre-filter is folded in: a "copy" must still be lowpassed); defaults
        to a unit tap at half-1.
      valid_len: outputs at t >= valid_len get all-zero rows (padded slots).
      L: xext time length; when given, tile starts are clamped to L - K so
        polyphase_banded's dynamic_slice never shifts a slab (offsets are
        computed against the clamped starts, so clamping stays aligned).
    Returns: (Wt f32 ``[nt, K, tile]``, starts int32 ``[nt]``).
    """
    T = len(win0x)
    V = T if valid_len is None else min(int(valid_len), T)
    tapsp = filters_np.shape[1]
    w = weight[:V].astype(np.float32)
    f1 = filters_np[idx1[:V]]
    f2 = filters_np[idx2[:V]]
    feff = np.where((mode[:V] == 2)[:, None],
                    f2 * w[:, None] + f1 * (np.float32(1.0) - w)[:, None],
                    f1).astype(np.float32)
    if direct_row is None:
        direct_row = np.zeros(tapsp, np.float32)
        direct_row[half - 1] = 1.0
    feff[mode[:V] == 0] = direct_row

    nt = -(-T // tile)
    starts = np.zeros(nt, np.int64)
    span = tapsp
    for i in range(nt):
        t0 = min(i * tile, V - 1) if V else 0
        starts[i] = win0x[t0]
        last = min((i + 1) * tile, V) - 1
        if last >= t0:
            span = max(span, int(win0x[last]) + tapsp - int(starts[i]))
    K = ((span + 127) // 128) * 128
    if L is not None:
        if L < K:
            raise ValueError(f"xext length {L} shorter than slab width {K}")
        starts = np.minimum(starts, L - K)
    Wt = np.zeros((nt, K, tile), np.float32)
    for t in range(V):
        i, j = divmod(t, tile)
        o = int(win0x[t]) - int(starts[i])
        if o + tapsp > K:   # possible only after clamping; widen would be needed
            raise ValueError("band exceeds slab after start clamping")
        Wt[i, o:o + tapsp, j] = feff[t]
    return Wt, starts.astype(np.int32)


def polyphase_banded(xext, Wt, starts, *, T: int):
    """Apply block-banded schedule weights: gather per-tile input slabs and
    contract on the MXU. ``Wt``/``starts`` come from build_banded_weights.

    xext: f32 ``[..., L]``; returns f32 ``[..., T]``. Slabs are CONTIGUOUS
    windows, so they come from vmapped dynamic_slice (≈8x faster on TPU than
    an arbitrary-index gather); starts must satisfy start + K <= L (clamped
    by the weight builders — offsets were computed against the clamped
    start, so a clamp never misaligns weights).
    """
    nt, K, tile = Wt.shape
    slabs = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(xext, s, K, axis=-1))(starts)
    # HIGH (3-pass bf16) carries f32-comparable error (~2^-24/product) at
    # roughly half the MXU cost of HIGHEST; the fast path's contract vs the
    # exact path is rtol 2e-5 (tests/test_art_resampler.py), far above it.
    out = jnp.einsum("i...k,ikj->...ij", slabs, Wt,
                     precision=jax.lax.Precision.HIGH)
    return out.reshape(*xext.shape[:-1], nt * tile)[..., :T]


@functools.partial(jax.jit, static_argnames=("exact", "compute_second", "half"))
def polyphase_apply(
    xext: jax.Array,
    filters: jax.Array,
    win0x: jax.Array,
    idx1: jax.Array,
    idx2: jax.Array,
    weight: jax.Array,
    mode: jax.Array,
    *,
    half: int,
    exact: bool = True,
    compute_second: bool = True,
) -> jax.Array:
    """Apply one chunk schedule to a batch of streams.

    Args:
      xext: f32 ``[..., L]`` — history + new samples.
      filters: f32 ``[F+1, taps]`` filterbank (ops/sinc.py layout).
      win0x: int32 ``[T]`` window starts, already offset into xext coords.
      idx1, idx2: int32 ``[T]`` filterbank rows.
      weight: f32 ``[T]`` lerp weights (mode 2).
      mode: int8/int32 ``[T]``: 0 direct, 1 single, 2 lerp.
      half: numTaps/2 (static).
      exact: sequential-order f32 accumulation (bit-exact) vs MXU matmul.
      compute_second: statically skip the second dot when the schedule has no
        mode-2 entries (no SUBSAMPLE_INTERPOLATE).

    Returns: f32 ``[..., T]`` resampled output.
    """
    taps = filters.shape[-1]
    xext = xext.astype(jnp.float32)
    w = weight.astype(jnp.float32)

    direct = jnp.take(xext, win0x + (half - 1), axis=-1)  # [..., T]

    if exact:
        f1 = jnp.take(filters, idx1, axis=0)  # [T, taps]
        f2 = jnp.take(filters, idx2, axis=0) if compute_second else f1

        def step(carry, k):
            acc1, acc2 = carry
            xg = jnp.take(xext, win0x + k, axis=-1)  # [..., T]
            acc1 = acc1 + _exact_mul(xg, jnp.take(f1, k, axis=-1))
            if compute_second:
                acc2 = acc2 + _exact_mul(xg, jnp.take(f2, k, axis=-1))
            return (acc1, acc2), None

        zero = jnp.zeros(xext.shape[:-1] + (win0x.shape[0],), jnp.float32)
        (acc1, acc2), _ = jax.lax.scan(step, (zero, zero), jnp.arange(taps))
        if compute_second:
            # NOTE: XLA:CPU contracts this mul-add into an FMA no matter how
            # it is expressed (convert pairs get canonicalized away), so on
            # CPU hosts the interpolated output can differ from the C
            # reference by 1 ulp. XLA:TPU performs no contraction and is
            # bit-exact (verified on hardware); tests encode this policy.
            lerp = _exact_mul(acc2, w) + _exact_mul(acc1, jnp.float32(1.0) - w)
        else:
            lerp = acc1
        out = jnp.where(mode == 0, direct, jnp.where(mode == 1, acc1, lerp))
        return out

    # ---- fast path: banded weight matrix + one MXU matmul -----------------
    L = xext.shape[-1]
    T = win0x.shape[0]
    f1 = jnp.take(filters, idx1, axis=0)
    f2 = jnp.take(filters, idx2, axis=0)
    feff = jnp.where(
        (mode == 2)[:, None], f2 * w[:, None] + f1 * (jnp.float32(1.0) - w)[:, None], f1
    )  # [T, taps]
    # direct-copy outputs become a unit tap at the window center
    unit = jnp.zeros((T, taps), jnp.float32).at[:, half - 1].set(1.0)
    feff = jnp.where((mode == 0)[:, None], unit, feff)
    rows = win0x[None, :] + jnp.arange(taps)[:, None]  # [taps, T]
    cols = jnp.broadcast_to(jnp.arange(T)[None, :], (taps, T))
    W = jnp.zeros((L, T), jnp.float32).at[rows, cols].set(feff.T)
    return jnp.matmul(xext, W, precision=jax.lax.Precision.HIGHEST)
