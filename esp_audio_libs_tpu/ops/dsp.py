"""Batched DSP primitives: TPU equivalents of the reference's L1 kernel layer.

The reference ships four public DSP kernels with ANSI-C reference
implementations and per-ISA Xtensa assembly fast paths selected at compile
time (reference: include/dsp.h:45-116, src/dsp/*_ansi.c, src/dsp/*.S).  Here
the "fast path" is the XLA/Pallas compilation of the same math over
``[..., n]`` batches; the ANSI semantics (f32 accumulation order, int32
intermediate arithmetic, arithmetic shifts, int16 wraparound) are preserved
exactly so results are bit-identical to the C kernels.

Kernels:
- :func:`dotprod_f32`  — reference src/dsp/dsps_dotprod_f32_ansi.c:17-25
- :func:`biquad_f32`   — reference src/dsp/dsps_biquad_f32_ansi.c:17-25
                         (Direct Form II, coef = {b0,b1,b2,a1,a2}, state w[2])
- :func:`add_s16`      — reference src/dsp/dsps_add_s16_ansi.c:10-27
- :func:`mulc_s16`     — reference src/dsp/dsps_mulc_s16_ansi.c:19-31
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .scan import exact_mul, iir2_scan

__all__ = ["dotprod_f32", "biquad_f32", "add_s16", "mulc_s16", "mix_s16"]


@functools.partial(jax.jit, static_argnames=("exact",))
def dotprod_f32(a: jax.Array, b: jax.Array, *, exact: bool = True) -> jax.Array:
    """``acc = sum_i a[..., i] * b[..., i]`` over the last axis.

    exact=True reproduces the ANSI kernel's sequential f32 accumulation order
    (src/dsp/dsps_dotprod_f32_ansi.c:19-22) — each step is one rounded f32
    multiply and one rounded f32 add, vectorized across the batch dims.
    exact=False uses a single XLA reduction/matmul (fast path, tree order).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if not exact:
        return jnp.einsum("...i,...i->...", a, b, precision=jax.lax.Precision.HIGHEST)
    prod_t_first = jnp.moveaxis(a * b, -1, 0)  # [n, ...]

    def step(acc, p):
        return acc + p, None

    acc0 = jnp.zeros(prod_t_first.shape[1:], jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, prod_t_first)
    return acc


@functools.partial(jax.jit, static_argnames=("exact",))
def biquad_f32(x: jax.Array, coef: jax.Array, w: jax.Array, *, exact: bool = True):
    """Direct-Form-II biquad over the last (time) axis, batched.

    Reference per-sample recurrence (src/dsp/dsps_biquad_f32_ansi.c:18-24)::

        d0   = x[i] - coef[3]*w0 - coef[4]*w1
        y[i] = coef[0]*d0 + coef[1]*w0 + coef[2]*w1
        w1 = w0 ; w0 = d0

    Args:
      x:    f32 ``[..., T]``.
      coef: f32 ``[5]`` = {b0, b1, b2, a1, a2} (shared) or ``[..., 5]``.
      w:    f32 ``[..., 2]`` filter state (w0, w1), returned updated.
      exact: sequential scan preserving the C op order bit-for-bit. The fast
        path splits DF-II into its pure-IIR recurrence solved by a blocked
        associative scan (2x2 affine maps) plus an elementwise 3-tap FIR.

    Returns: (y ``[..., T]``, new_w ``[..., 2]``).
    """
    x = x.astype(jnp.float32)
    coef = jnp.broadcast_to(coef.astype(jnp.float32), x.shape[:-1] + (5,))
    b0, b1, b2 = coef[..., 0], coef[..., 1], coef[..., 2]
    a1, a2 = coef[..., 3], coef[..., 4]
    w0, w1 = w[..., 0].astype(jnp.float32), w[..., 1].astype(jnp.float32)

    if exact:
        xt = jnp.moveaxis(x, -1, 0)

        def step(carry, xi):
            w0, w1 = carry
            d0 = xi - exact_mul(a1, w0) - exact_mul(a2, w1)
            y = exact_mul(b0, d0) + exact_mul(b1, w0) + exact_mul(b2, w1)
            return (d0, w0), y

        (w0f, w1f), yt = jax.lax.scan(step, (w0, w1), xt)
        y = jnp.moveaxis(yt, 0, -1)
        return y, jnp.stack([w0f, w1f], axis=-1)

    # Fast path: the DF-II state d[i] = x[i] - a1*d[i-1] - a2*d[i-2] is a
    # pure 2nd-order IIR solved by the blocked associative scan; the output
    # tap y = b0*d + b1*d1 + b2*d2 is elementwise FIR.
    d, _ = iir2_scan(x, a1, a2, w0, w1)
    d1 = jnp.concatenate([w0[..., None], d[..., :-1]], axis=-1)
    d2 = jnp.concatenate([w1[..., None], d1[..., :-1]], axis=-1)
    y = b0[..., None] * d + b1[..., None] * d1 + b2[..., None] * d2
    new_w = jnp.stack([d[..., -1], d1[..., -1]], axis=-1)
    return y, new_w


@jax.jit
def add_s16(a: jax.Array, b: jax.Array, shift: int | jax.Array = 0) -> jax.Array:
    """int16 add with int32 accumulator and arithmetic right shift.

    ``out[i] = (int32(a[i]) + int32(b[i])) >> shift`` cast back to int16 with
    C wraparound (reference src/dsp/dsps_add_s16_ansi.c:23-26). Strided
    variants are layout concerns handled by callers via slicing.
    """
    acc = a.astype(jnp.int32) + b.astype(jnp.int32)
    return (acc >> shift).astype(jnp.int16)


@jax.jit
def mulc_s16(x: jax.Array, c: jax.Array) -> jax.Array:
    """Q15 multiply-by-constant: ``out[i] = int16((int32(x[i]) * C) >> 15)``
    (reference src/dsp/dsps_mulc_s16_ansi.c:26-29)."""
    acc = x.astype(jnp.int32) * jnp.asarray(c, jnp.int32)
    return (acc >> 15).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("shift",))
def mix_s16(x: jax.Array, gains_q15: jax.Array, shift: int = 0) -> jax.Array:
    """Volume-scale and mix ``S`` int16 streams into one.

    This is the downstream-consumer composition the reference exports
    ``dsps_mulc_s16``/``dsps_add_s16`` for (reference include/dsp.h:45-94 —
    both kernels have no in-repo caller; their consumers are ESPHome's
    mixer/volume stages).  Semantics are exactly the chained kernel calls::

        y[s]  = mulc_s16(x[s], gains_q15[s])          # per-stream volume
        acc   = y[0]
        acc   = add_s16(acc, y[s], shift)  for s = 1..S-1   # left fold

    with the kernels' int32 intermediates, arithmetic shift, and int16
    wraparound preserved — bit-identical to running the C kernels in the
    same order.  ``x`` is ``[S, ..., n]`` int16, ``gains_q15`` ``[S]`` int16
    (Q15: unity ≈ 32767).  ``shift`` is the caller's headroom choice per
    add, as in the C API; 0 wraps on overflow exactly like the reference.
    """
    x = x.astype(jnp.int16)
    gains = jnp.asarray(gains_q15, jnp.int32).reshape(
        (x.shape[0],) + (1,) * (x.ndim - 1))
    scaled = ((x.astype(jnp.int32) * gains) >> 15).astype(jnp.int16)
    if x.shape[0] == 1:
        return scaled[0]

    def step(acc, y):
        return add_s16(acc, y, shift), None

    acc, _ = jax.lax.scan(step, scaled[0], scaled[1:])
    return acc
