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

from .scan import exact_mul as _exact_mul

__all__ = ["polyphase_apply"]


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
