"""Sequence parallelism: split ONE long stream's time axis across devices.

The reference processes audio strictly sequentially with small carried state
(biquad taps, resampler ring buffer — SURVEY.md §2 SP row). On a TPU pod the
time axis itself can shard: the fast resample path is a pure FIR once the
biquad cascade is folded into the filterbank (ops/biquad.py), so each
output's window touches a bounded input span. Outputs are assigned to the
device that OWNS their window start; each device:

  1. receives its input segment (time-sharded via ``shard_map``),
  2. fetches two fixed-width halos with single ``lax.ppermute`` hops over
     ICI — a LEFT halo (right edge of the previous device; zeros on device 0,
     which is exactly the zero history) and a RIGHT halo (left edge of the
     next device, for windows extending past the segment boundary),
  3. builds its banded weights on device and runs the local MXU contraction.

Matches the single-device fast path to f32 reduction-order rounding (same
per-output dot products; the band's in-slab alignment differs, so the
reduction tree may group addends differently — tested on a virtual 8-device
mesh). IIR-shaped state that cannot be folded
(exact mode) instead uses the associative-scan form (ops/scan.iir2_scan),
whose blockwise decomposition is the same boundary-state-exchange pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.polyphase import banded_weights_device, polyphase_banded

__all__ = ["time_mesh", "sequence_parallel_resample"]

TIME_AXIS = "time"


def time_mesh(devices=None) -> Mesh:
    """1-D mesh over the TIME axis (for few very-long streams; contrast
    parallel/mesh.stream_mesh which shards the batch axis)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (TIME_AXIS,))


def sequence_parallel_resample(x, filters_np, direct_row, grid, mesh: Mesh, *,
                               taps_p: int, K: int, halo: int, tile: int = 128):
    """Resample a long chunk with its time axis sharded over ``mesh``.

    Args:
      x: f32 ``[B, ch, T_in]`` raw input, T_in divisible by mesh size.
      filters_np: f32 ``[F+1, taps_p]`` (possibly biquad-folded) filterbank.
      direct_row: f32 ``[taps_p]`` mode-0 row.
      grid: host phase grid for the WHOLE chunk, with any fold offset already
        applied to ``win0`` (window starts may be negative: zero history).
      halo: halo width, >= taps_p (both the history reach-back on the left
        and the window overhang on the right).
      K: static slab width (ops/polyphase.banded_K).
    Returns: (y f32 ``[B, ch, D*To]``, counts int ``[D]``) — device d's
      outputs are ``y[..., d*To : d*To + counts[d]]``; concatenating them in
      device order yields the ``grid.output_generated`` valid samples.
    """
    D = mesh.devices.size
    B, ch, T_in = x.shape
    assert T_in % D == 0, (T_in, D)
    assert halo >= taps_p, (halo, taps_p)
    T_loc = T_in // D
    # right halo absorbs the padding that lane-aligns L_loc (the weight
    # builder requires L % 128 == 0 for aligned tile starts)
    halo_r = halo + (-(T_loc + 2 * halo)) % 128
    L_loc = T_loc + halo + halo_r
    assert L_loc >= K, (L_loc, K)
    assert T_loc >= halo_r, (T_loc, halo_r)

    gen = int(grid.output_generated)
    win0 = grid.win0[:gen].astype(np.int64)

    # host: assign each output to the device owning its window START (win0 is
    # monotone, so device output ranges are contiguous and globally ordered).
    owner = np.clip(win0 // T_loc, 0, D - 1)
    counts = np.bincount(owner, minlength=D)
    To = max(-(-int(counts.max()) // tile) * tile, tile)

    win0_l = np.zeros((D, To), np.int64)
    g_i1 = np.zeros((D, To), grid.idx1.dtype)
    g_i2 = np.zeros((D, To), grid.idx2.dtype)
    g_w = np.zeros((D, To), grid.weight.dtype)
    g_m = np.zeros((D, To), np.int32)
    pos = 0
    for d in range(D):
        n = int(counts[d])
        sl = slice(pos, pos + n)
        win0_l[d, :n] = win0[sl] - d * T_loc + halo
        win0_l[d, n:] = win0_l[d, n - 1] if n else 0
        g_i1[d, :n] = grid.idx1[sl]
        g_i2[d, :n] = grid.idx2[sl]
        g_w[d, :n] = grid.weight[sl]
        g_m[d, :n] = grid.mode[sl]
        pos += n
    assert win0_l[counts > 0].min() >= 0, "halo too small for history reach-back"
    assert (win0_l + taps_p).max() <= L_loc, "halo too small for window overhang"

    gens = jnp.asarray(counts.astype(np.int32))
    filt = jnp.asarray(filters_np)
    direct = jnp.asarray(direct_row)
    right_perm = [(i, i + 1) for i in range(D - 1)]  # edges flow rightward
    left_perm = [(i + 1, i) for i in range(D - 1)]   # edges flow leftward

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None, TIME_AXIS),) + (P(TIME_AXIS),) * 6,
        out_specs=P(None, None, TIME_AXIS, None))
    def kernel(x_loc, win0x, idx1, idx2, weight, mode, gen_loc):
        lh = jax.lax.ppermute(x_loc[..., -halo:], TIME_AXIS, right_perm)
        rh = jax.lax.ppermute(x_loc[..., :halo_r], TIME_AXIS, left_perm)
        xext = jnp.concatenate([lh, x_loc, rh], axis=-1)   # [B, ch, L_loc]
        Wt, starts = banded_weights_device(
            filt, direct, win0x[0].astype(jnp.int32), idx1[0], idx2[0],
            weight[0], mode[0], gen_loc[0], K=K, taps_p=taps_p, L=L_loc)
        return polyphase_banded(xext, Wt, starts, T=To)[:, :, None, :]

    y = kernel(x, jnp.asarray(win0_l), jnp.asarray(g_i1), jnp.asarray(g_i2),
               jnp.asarray(g_w), jnp.asarray(g_m), gens)
    return y.reshape(B, ch, D * To), counts
