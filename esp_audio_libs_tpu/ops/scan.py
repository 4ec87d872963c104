"""Shared recurrence solvers for IIR filters.

Both the DSP-layer DF-II biquad (reference src/dsp/dsps_biquad_f32_ansi.c)
and the ART resampler's DF-I biquad (reference src/resample/art_biquad.cpp)
reduce to the same second-order linear recurrence

    y[i] = f[i] - p1*y[i-1] - p2*y[i-2]

where ``f`` is an elementwise (FIR) function of the input.  On TPU the
sequential form wastes the vector unit, so the fast path rewrites the
recurrence as an associative scan over 2x2 affine maps
``s_i = A s_{i-1} + u_i`` with ``s = (y[i], y[i-1])`` and
``A = [[-p1, -p2], [1, 0]]``.  The 2x2 algebra is expanded into scalar
components so it runs as exact-f32 VPU elementwise math (a 2x2 MXU matmul
would round through bf16 passes on TPU). log2(T) passes, fully batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["iir2_scan", "iir2_sequential", "exact_mul"]


def exact_mul(a, b):
    """f32 multiply with a guaranteed separate IEEE rounding step.

    XLA:CPU's LLVM backend contracts f32 mul+add chains into FMAs (even
    across optimization barriers), breaking bit-parity with the reference
    (compiled -ffp-contract=off) and with XLA:TPU.  A f64 product of two f32
    values is exact (24+24 < 53 mantissa bits), so truncating back to f32 IS
    the IEEE f32 product, and the f64 mul cannot fuse with a f32 add.  Plain
    multiply when x64 is disabled (TPU production path: no contraction).
    """
    if jax.dtypes.canonicalize_dtype(jnp.float64) == jnp.float64:
        return (a.astype(jnp.float64) * b.astype(jnp.float64)).astype(jnp.float32)
    return a * b


def iir2_sequential(f: jax.Array, p1: jax.Array, p2: jax.Array, y1: jax.Array, y2: jax.Array):
    """Order-exact sequential solve of ``y[i] = f[i] - p1*y[i-1] - p2*y[i-2]``.

    Preserves the C reference's op order bit-for-bit: one multiply and one
    subtract per term, in left-to-right order ``(f - p1*y1) - p2*y2``.

    Args:
      f: ``[..., T]`` forcing sequence.
      p1, p2: ``[...]`` recurrence coefficients.
      y1, y2: ``[...]`` initial state (y[-1], y[-2]).
    Returns: (y ``[..., T]``, (y_last, y_prev)).
    """
    ft = jnp.moveaxis(f, -1, 0)

    def step(carry, fi):
        y1, y2 = carry
        y = fi - p1 * y1 - p2 * y2
        return (y, y1), y

    (yl, yp), yt = jax.lax.scan(step, (y1, y2), ft)
    return jnp.moveaxis(yt, 0, -1), (yl, yp)


def iir2_scan(f: jax.Array, p1: jax.Array, p2: jax.Array, y1: jax.Array, y2: jax.Array,
              valid_len=None):
    """Parallel (associative-scan) solve of the same recurrence.

    Same signature/returns as :func:`iir2_sequential`; results agree to f32
    rounding (different association order).  If ``valid_len`` (traced scalar)
    is given, elements at t >= valid_len are identity maps: the recurrence
    freezes there, so the returned final state is (y[valid-1], y[valid-2])
    and outputs beyond valid_len are unspecified.
    """
    T = f.shape[-1]
    shape = f.shape

    def bcast(v):
        return jnp.broadcast_to(v[..., None].astype(jnp.float32), shape)

    ones = jnp.ones(shape, jnp.float32)
    zeros = jnp.zeros(shape, jnp.float32)
    m11, m12 = bcast(-p1), bcast(-p2)
    u1 = f.astype(jnp.float32)
    u2 = zeros
    # fold initial state s_{-1} = (y1, y2) into element 0's offset
    u1 = u1.at[..., 0].add(-p1 * y1 - p2 * y2)
    u2 = u2.at[..., 0].add(y1)
    if valid_len is not None:
        t_idx = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
        invalid = t_idx >= valid_len
        m11 = jnp.where(invalid, jnp.float32(1.0), m11)
        m12 = jnp.where(invalid, jnp.float32(0.0), m12)
        ones = jnp.where(invalid, jnp.float32(0.0), ones)
        zeros_m22 = jnp.where(invalid, jnp.float32(1.0), zeros)
        u1 = jnp.where(invalid, jnp.float32(0.0), u1)
        ones_m21, m22 = ones, zeros_m22
    else:
        ones_m21, m22 = ones, zeros

    def combine(e, g):
        e11, e12, e21, e22, eu1, eu2 = e
        g11, g12, g21, g22, gu1, gu2 = g
        return (
            g11 * e11 + g12 * e21,
            g11 * e12 + g12 * e22,
            g21 * e11 + g22 * e21,
            g21 * e12 + g22 * e22,
            g11 * eu1 + g12 * eu2 + gu1,
            g21 * eu1 + g22 * eu2 + gu2,
        )

    elems = (m11, m12, ones_m21, m22, u1, u2)
    res = jax.lax.associative_scan(combine, elems, axis=f.ndim - 1)
    y = res[4]
    # s_T = (y[last], y[last-1]): the second affine component carries the
    # penultimate state, valid under freezing too.
    return y, (res[4][..., -1], res[5][..., -1])
