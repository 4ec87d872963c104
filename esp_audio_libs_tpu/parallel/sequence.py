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

__all__ = ["time_mesh", "sequence_parallel_resample",
           "sequence_parallel_iir2", "lpc_companion_scan"]

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


def sequence_parallel_iir2(f, p1, p2, y1, y2, mesh: Mesh):
    """Exact-mode sequence parallelism for the order-2 IIR recurrence
    ``y[t] = f[t] - p1*y[t-1] - p2*y[t-2]`` (the biquad denominator form,
    ops/scan.iir2_sequential): the time axis shards over ``mesh`` and the
    two-value boundary state hops device-to-device over ICI
    (``lax.ppermute``), each device replaying the reference's bit-exact
    sequential op order on its own segment once its true incoming state
    arrives.

    Output and final state are BIT-IDENTICAL to the single-device
    sequential solve: every sample's (f - p1*y1) - p2*y2 executes with
    exactly the operands the global sequential order produces — the
    decomposition moves WHERE each segment is computed, never the math.
    The stage loop serializes devices for a single chunk (state passing is
    inherently sequential in exact mode); a serving loop overlaps
    successive chunks across stages, pipeline-style. This function is the
    end-to-end composition of that boundary-state-exchange pattern.

    Args:
      f: f32 ``[B, T]`` forcing, T divisible by the mesh size.
      p1, p2: scalar f32 recurrence coefficients.
      y1, y2: f32 ``[B]`` initial state (y[-1], y[-2]).
    Returns: (y ``[B, T]``, (y_last ``[B]``, y_prev ``[B]``)).
    """
    from ..ops.scan import iir2_sequential

    D = mesh.devices.size
    B, T = f.shape
    assert T % D == 0, (T, D)
    right_perm = [(i, i + 1) for i in range(D - 1)]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, TIME_AXIS), P(None), P(None)),
        out_specs=(P(None, TIME_AXIS), P(None), P(None)))
    def run(f_loc, y1_0, y2_0):
        idx = jax.lax.axis_index(TIME_AXIS)
        # the carry becomes device-varying after the first stage; mark the
        # replicated initial state as varying up front so the loop types agree
        y1_0 = jax.lax.pcast(y1_0, (TIME_AXIS,), to="varying")
        y2_0 = jax.lax.pcast(y2_0, (TIME_AXIS,), to="varying")

        def stage(s, carry):
            y1c, y2c, out = carry
            yseg, (yl, yp) = iir2_sequential(f_loc, p1, p2, y1c, y2c)
            active = (idx == s)
            out = jnp.where(active, yseg, out)
            # hand the exact outgoing state to the next device; inactive
            # devices send zeros that nobody reads
            s1 = jax.lax.ppermute(jnp.where(active, yl, 0.0), TIME_AXIS, right_perm)
            s2 = jax.lax.ppermute(jnp.where(active, yp, 0.0), TIME_AXIS, right_perm)
            take = (idx == s + 1)
            return (jnp.where(take, s1, y1c), jnp.where(take, s2, y2c), out)

        out0 = jnp.zeros_like(f_loc)
        y1c, y2c, out = jax.lax.fori_loop(0, D, stage, (y1_0, y2_0, out0))
        # replicate the last device's final state (it re-runs the segment —
        # cheap relative to a collective round trip on small B)
        _, (yl, yp) = iir2_sequential(f_loc, p1, p2, y1c, y2c)
        last1 = jax.lax.psum(jnp.where(idx == D - 1, yl, 0.0), TIME_AXIS)
        last2 = jax.lax.psum(jnp.where(idx == D - 1, yp, 0.0), TIME_AXIS)
        return out, last1, last2

    y, yl, yp = run(f, y1, y2)
    return y, (yl, yp)


def lpc_companion_scan(data, coeffs, order, *, max_order: int = 4):
    """Order-k companion-matrix LPC restoration as an ASSOCIATIVE SCAN —
    the SURVEY §2/§5 sequence-parallel form for the FLAC predictor
    recurrence, EXACT for ``shift == 0`` predictors (every fixed-prediction
    subframe, reference flac_decoder.cpp:774-804, and LPC subframes whose
    quantization shift is zero).

    Why the restriction: the general LPC step applies an in-loop floor
    (``(dot) >> shift``, flac_lpc.cpp:104-125), which breaks superposition
    — prefix composition of affine maps no longer commutes with the
    nonlinearity, so NO time-parallel decomposition of the shifted
    recurrence can be exact (each step's floor needs the exact prior
    samples).  With shift 0 the recurrence is affine over the ring
    Z/2^64: y[i] = x[i] + sum_j c[j]*y[i-(order-j)].  Ring arithmetic is
    exact under wraparound (mod is a homomorphism), and the true values
    fit int32 by the reference's own overflow analysis, so the log-depth
    prefix product equals the sequential result BIT-FOR-BIT.

    The affine state rides as v_i = [y[i-k+1..i], 1]; step matrices M_i
    shift the window, inject x[i] through the affine column, and emit
    warm-ups verbatim for i < order.  y[i] is the affine column of the
    prefix product — ``associative_scan`` evaluates all T in O(log T)
    depth, so a long stream's time axis shards across a mesh with only
    the scan's internal boundary exchanges (GSPMD inserts them over ICI).

    This is the latency form (per-sample cost is (k+1)^2 ring MACs x the
    scan's log factor); the batch-throughput form remains ops/lpc.py's
    sequential scan, which amortizes across thousands of lanes.

    Args:
      data: int32 ``[..., T]`` warm-ups + residuals (shift-0 layout).
      coeffs: int32 ``[..., 32]`` oldest-first zero-padded (ops/lpc.py).
      order: int32 ``[...]`` predictor order, <= max_order.
      max_order: static window k (4 covers every fixed predictor).
    Returns: int32 ``[..., T]`` restored samples, bit-identical to
      ``ops.lpc.lpc_restore(..., shift=0)``.
    """
    K = int(max_order)
    T = data.shape[-1]
    batch_shape = data.shape[:-1]
    order_b = order[..., None]

    # c_aligned[j] multiplies window slot j (slot j holds y[i-K+j]) — the
    # same alignment as ops/lpc.py's sequential window.
    k_idx = jnp.arange(K)
    j_idx = k_idx[None, :] - (K - order_b)
    valid = (j_idx >= 0) & (j_idx < order_b)
    j_safe = jnp.clip(j_idx, 0, coeffs.shape[-1] - 1)
    c_aligned = jnp.where(
        valid,
        jnp.take_along_axis(
            jnp.broadcast_to(coeffs, batch_shape + (coeffs.shape[-1],)),
            jnp.broadcast_to(j_safe, batch_shape + (K,)), axis=-1),
        0).astype(jnp.int64)                                   # [..., K]

    x_t = jnp.moveaxis(data, -1, 0).astype(jnp.int64)          # [T, ...]
    i_t = jnp.arange(T, dtype=jnp.int32)
    warm = i_t.reshape((T,) + (1,) * len(batch_shape)) < order  # [T, ...]

    # M_i [(K+1),(K+1)]: rows 0..K-2 shift the window up; row K-1 is the
    # new sample (c row, zeroed during warm-up, plus x[i] in the affine
    # column); row K keeps the affine 1.
    M = jnp.zeros((T,) + batch_shape + (K + 1, K + 1), jnp.int64)
    shift_rows = jnp.eye(K + 1, k=1, dtype=jnp.int64)[: K - 1] if K > 1 \
        else jnp.zeros((0, K + 1), jnp.int64)
    M = M.at[..., : K - 1, :].set(shift_rows)
    c_row = jnp.where(warm[..., None], 0,
                      jnp.broadcast_to(c_aligned, (T,) + batch_shape + (K,)))
    M = M.at[..., K - 1, :K].set(c_row)
    M = M.at[..., K - 1, K].set(x_t)
    M = M.at[..., K, K].set(1)

    def combine(a, b):                       # a earlier, b later: b ∘ a
        return jnp.einsum("...ij,...jk->...ik", b, a)

    prefix = jax.lax.associative_scan(combine, M, axis=0)      # [T, ..., K+1, K+1]
    # v0 = e_affine, so y[i] = (prefix_i @ v0)[K-1] = prefix_i[K-1, K]
    y_t = prefix[..., K - 1, K].astype(jnp.int32)
    return jnp.moveaxis(y_t, 0, -1)
