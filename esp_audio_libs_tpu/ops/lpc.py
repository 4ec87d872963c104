"""Batched FLAC LPC restoration + stereo decorrelation (device side).

TPU-native equivalent of the reference's LPC module and subframe math
(reference: src/decode/flac/flac_lpc.cpp:85-125 restore_linear_prediction_
{32,64}bit, flac_decoder.cpp:669-712 decode_subframes decorrelation,
:717-731 wasted-bits shift).  The reference restores one subframe at a time
with Xtensa assembly fast paths; here a whole batch of subframes (streams x
channels bucketed to a common block size) restores in one kernel.

The recurrence ``buf[i+order] += (sum_j buf[i+j] * c[j]) >> shift`` is
inherently sequential in ``i``, so the kernel is a ``lax.scan`` over time
carrying a 32-sample window per lane, with all lanes advancing in parallel
(the batch is the vector axis; per-step work is a 32-MAC dot per lane on the
VPU).  Accumulation runs in int64 (emulated on TPU): for streams where the
reference's overflow analysis picks the 32-bit path, no overflow occurs, so
int64 results are bit-identical; the 64-bit path is int64 natively.
Requires ``jax_enable_x64`` (the FLAC model enables checks).

Variable predictor order needs no bucketing: coefficients are zero-padded to
order 32 and lanes emit warm-up samples verbatim for i < order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_ORDER = 32

__all__ = ["lpc_restore", "decorrelate", "MAX_ORDER"]


def _default_unroll() -> int:
    # deep unrolling pays on TPU (amortizes scan-step launch overhead) but
    # multiplies XLA:CPU compile time for long blocks — tests and host-only
    # runs compile far more shapes than they execute
    return 8 if jax.default_backend() == "tpu" else 2


@functools.partial(jax.jit, static_argnames=("unroll", "use64", "max_order"))
def lpc_restore(data: jax.Array, coeffs: jax.Array, order: jax.Array, shift: jax.Array,
                *, unroll: int | None = None, use64: bool = True,
                max_order: int = MAX_ORDER) -> jax.Array:
    """Restore LPC/fixed prediction for a batch of subframes.

    Args:
      data: int32 ``[..., T]`` — warm-up samples in positions ``[0, order)``
        followed by residuals (the reference's in-place layout,
        flac_decoder.cpp:787-789, 814-816).
      coeffs: int32 ``[..., 32]`` — predictor coefficients OLDEST-first
        (reference stores ``coefs[order-1-i] = read_sint(precision)``,
        flac_decoder.cpp:820-824), zero-padded beyond ``order``.
      order: int32 ``[...]`` — predictor order (0 for constant/verbatim:
        the kernel passes data through untouched).
      shift: int32 ``[...]`` — quantization shift (0 for fixed predictors).
      max_order: static upper bound on ``order`` across the batch (any
        class in {4, 8, 12, 16, 32}).  The scan window and per-step dot
        shrink to this width — the dominant orders of real encoders are
        <= 8/12, so an order-bucketed dispatch does 1/4 the MAC work of
        the fixed 32-wide window (the same specialization the reference's
        Xtensa assembly gets from its per-order jump table,
        flac_lpc_32_asm.S:42).  Bit-exact for any max_order >= max(order).
      use64: accumulate the predictor dot in int64.  Pass False only when
        every subframe in the batch passed the front-end's overflow analysis
        (``use64 == 0``, the reference's own 32-bit path selection,
        flac_lpc.cpp:29-83): accumulation then provably fits int32 and runs
        ~4x faster on TPU, where int64 is emulated.  Results are
        bit-identical by construction.

    Returns: int32 ``[..., T]`` restored samples.
    """
    if data.dtype != jnp.int32:
        raise TypeError(f"data must be int32, got {data.dtype}")
    if use64 and jax.dtypes.canonicalize_dtype(jnp.int64) != jnp.int64:
        raise RuntimeError("FLAC LPC restore requires jax_enable_x64 for exact int64 accumulation")

    acc_dtype = jnp.int64 if use64 else jnp.int32
    W = int(max_order)
    T = data.shape[-1]
    batch_shape = data.shape[:-1]
    c_acc = coeffs.astype(acc_dtype)  # [..., 32]
    shift_acc = shift.astype(acc_dtype)
    order_b = order[..., None]  # [..., 1]

    # window[..., k]: sample at time (i - W + k); newest at index W-1
    window0 = jnp.zeros(batch_shape + (W,), jnp.int32)
    data_t = jnp.moveaxis(data, -1, 0)  # [T, ...]

    def step(window, it):
        i, x = it  # x: [...], the warm-up-or-residual at time i
        # predictor taps: sum_j window[32-order+j] * c[j]; with c zero-padded
        # oldest-first, align so that c[j] multiplies the sample at lag
        # (order - j): roll the window so the last `order` entries line up
        # with c[0..order-1].  Equivalent alignment: the reference's
        # buf[i+j]*c[j] for j in [0, order) means c[0] multiplies the OLDEST
        # of the last `order` samples.  With window holding the last 32
        # samples (newest last), the oldest-of-order sits at index 32-order.
        # Shift the window left by (32 - order) per lane so c[j] pairs with
        # window[32 - order + j]; implemented as a gather-free dot against a
        # per-lane rotated coefficient vector prepared below.
        # dtype=acc_dtype is LOAD-BEARING in the 32-bit path: jnp.sum of
        # int32 otherwise upcasts the accumulator to int64 (numpy
        # promotion), which computes the EXACT sum where the reference's
        # int32 `sum += buf[i+j]*coefs[j]` WRAPS (flac_lpc.cpp:85-105).
        # Valid streams never overflow here (can_use_32bit_lpc's guarantee)
        # — but corrupted streams whose CRC still validates do, the
        # reference emits the wrapped value as PCM, and parity requires
        # wrapping with it (found by the oracle-filtered mutation corpus,
        # corpus/independent/).
        dot = jnp.sum(window.astype(acc_dtype) * c_aligned, axis=-1,
                      dtype=acc_dtype)  # [...]
        pred = (dot >> shift_acc).astype(jnp.int32)
        y = jnp.where(i < order, x, x + pred)
        new_window = jnp.concatenate([window[..., 1:], y[..., None]], axis=-1)
        return new_window, y

    # Pre-rotate coefficients once: c_aligned[k] pairs with window index k.
    # window[k] holds the sample at lag (W - k); reference pairing is
    # c[j] <-> lag (order - j), i.e. window index W - order + j.
    k_idx = jnp.arange(W)
    j_idx = k_idx[None, :] - (W - order_b)  # [..., W]
    valid = (j_idx >= 0) & (j_idx < order_b)
    j_safe = jnp.clip(j_idx, 0, MAX_ORDER - 1)
    c_aligned = jnp.where(valid, jnp.take_along_axis(
        jnp.broadcast_to(c_acc, batch_shape + (MAX_ORDER,)),
        jnp.broadcast_to(j_safe, batch_shape + (W,)), axis=-1), 0)

    idx = jnp.arange(T, dtype=jnp.int32)
    _, y_t = jax.lax.scan(step, window0, (idx, data_t),
                          unroll=unroll if unroll is not None else _default_unroll())
    return jnp.moveaxis(y_t, 0, -1)


@jax.jit
def decorrelate(samples: jax.Array, channel_assignment: jax.Array) -> jax.Array:
    """Undo inter-channel decorrelation for stereo frames.

    samples: int32 ``[..., 2, T]`` (already wasted-bits-shifted).
    channel_assignment: int32 ``[...]`` — 0..7 independent, 8 L/S, 9 R/S,
    10 M/S (reference flac_decoder.cpp:691-706).
    """
    ca = channel_assignment[..., None]
    ch0 = samples[..., 0, :]
    ch1 = samples[..., 1, :]
    # 8 (left/side): right = left - side
    ls0, ls1 = ch0, ch0 - ch1
    # 9 (right/side): left = side + right
    rs0, rs1 = ch0 + ch1, ch1
    # 10 (mid/side): right = mid - (side >> 1); left = right + side
    ms_r = ch0 - (ch1 >> 1)
    ms0, ms1 = ms_r + ch1, ms_r
    out0 = jnp.where(ca == 8, ls0, jnp.where(ca == 9, rs0, jnp.where(ca == 10, ms0, ch0)))
    out1 = jnp.where(ca == 8, ls1, jnp.where(ca == 9, rs1, jnp.where(ca == 10, ms1, ch1)))
    return jnp.stack([out0, out1], axis=-2)
