"""ART biquad filters: RBJ-style design + batched Direct-Form-I application.

TPU-native equivalent of the reference's ``art_resampler`` biquad library
(reference: src/resample/art_biquad.cpp:16-93, include/art_biquad.h).  The
reference applies one sample at a time on one stream; here application is a
batched kernel over ``[..., T]`` with the 2nd-order recurrence solved either
sequentially (bit-exact vs the C code) or by a blocked associative scan
(parallel fast path, ops/scan.py).

Coefficient layout matches the reference struct ``BiquadCoefficients``
{a0, a1, a2, b1, b2} where a* are the numerator (gain-folded at init,
art_biquad.cpp:43-51) and b* the denominator.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .scan import exact_mul, iir2_scan, iir2_sequential

__all__ = [
    "biquad_lowpass",
    "biquad_highpass",
    "biquad_init",
    "biquad_apply",
    "BiquadState",
    "biquad_impulse",
    "fold_biquad_into_filterbank",
]


def biquad_lowpass(frequency: float) -> np.ndarray:
    """2nd-order lowpass design, Q = sqrt(0.5)
    (reference src/resample/art_biquad.cpp:16-25). Returns f32[5] {a0,a1,a2,b1,b2}.

    Design math runs in float64 exactly as the C double math, truncating to
    f32 on store (the C struct fields are float).
    """
    Q = math.sqrt(0.5)
    K = math.tan(math.pi * frequency)
    norm = 1.0 / (1.0 + K / Q + K * K)
    a0 = K * K * norm
    return np.array([a0, 2 * a0_f32_double(a0), a0, 2.0 * (K * K - 1.0) * norm,
                     (1.0 - K / Q + K * K) * norm], dtype=np.float32)


def a0_f32_double(a0: float) -> float:
    # The reference computes a1 = 2 * filter->a0 AFTER a0 was truncated to
    # float (art_biquad.cpp:21-22): double multiply of the f32-rounded a0.
    return float(np.float32(a0))


def biquad_highpass(frequency: float) -> np.ndarray:
    """2nd-order highpass design (reference src/resample/art_biquad.cpp:29-38)."""
    Q = math.sqrt(0.5)
    K = math.tan(math.pi * frequency)
    norm = 1.0 / (1.0 + K / Q + K * K)
    a0 = norm
    a1 = -2.0 * norm
    return np.array([a0, a1, a0_f32_double(a0), 2.0 * (K * K - 1.0) * norm,
                     (1.0 - K / Q + K * K) * norm], dtype=np.float32)


def biquad_init(coeffs: np.ndarray, gain: float = 1.0) -> np.ndarray:
    """Fold gain into the numerator (reference art_biquad.cpp:43-51)."""
    c = np.asarray(coeffs, np.float32).copy()
    g = np.float32(gain)
    c[0] = np.float32(c[0] * g)
    c[1] = np.float32(c[1] * g)
    c[2] = np.float32(c[2] * g)
    return c


class BiquadState:
    """Per-stream DF-I state pytree: in_d1/in_d2/out_d1/out_d2, each ``[...]``."""

    @staticmethod
    def zeros(shape=(), dtype=jnp.float32):
        return tuple(jnp.zeros(shape, dtype) for _ in range(4))


def fir_len_for(coeffs: np.ndarray, tol: float = 1e-9, cap: int = 2048) -> int | None:
    """Pick an impulse-response truncation length for the conv fast path.

    The IIR tail decays like r^k with r the pole radius (r = sqrt(b2) for a
    complex pair). Returns a multiple of 128, or None when the poles are too
    close to the unit circle for truncation to be profitable (caller should
    use the associative-scan path instead).
    """
    b2 = float(abs(coeffs[4]))
    b1 = float(abs(coeffs[3]))
    r = max(np.sqrt(b2) if b2 > 0 else 0.0, b1 / 2.0)
    r = min(max(r, 1e-6), 0.999999)
    k = int(np.ceil(np.log(tol) / np.log(r))) if r > tol else 64
    k = ((max(k, 64) + 127) // 128) * 128
    return k if k <= cap else None


def biquad_impulse(coeffs, K: int) -> np.ndarray:
    """f64 impulse response of the DF-I biquad, truncated at K taps.

    Coefficients are first rounded to f32 (the reference stores them as
    float, include/art_biquad.h) then the recurrence runs in f64 — more
    accurate than the reference's f32 per-sample math, which is fine for the
    tolerance-mode fast path this feeds.
    """
    a0, a1, a2, b1, b2 = (float(np.float32(c)) for c in np.asarray(coeffs).reshape(-1)[:5])
    h = np.zeros(K, np.float64)
    x1 = x2 = y1 = y2 = 0.0
    xin = 1.0
    for i in range(K):
        y = a0 * xin + a1 * x1 + a2 * x2 - b1 * y1 - b2 * y2
        h[i] = y
        x2, x1, xin = x1, xin, 0.0
        y2, y1 = y1, y
    return h


def fold_biquad_into_filterbank(filters_np, coeffs, fir_len: int, *, half: int,
                                stages: int = 2):
    """Compose a pre-filter biquad cascade with the sinc filterbank (LTI).

    The wrapper's pre-lowpass (2x the same biquad, resampler.cpp:126-133) and
    the windowed-sinc filter are both LTI, so their cascade is one longer FIR
    per filterbank row: convolving the truncated biquad impulse response into
    every row lets the fast path skip the biquad stages entirely — the
    polyphase matmul does the filtering for free (its FLOPs don't grow: the
    banded tiles just get a wider band).

    out[t] = sum_j h[j] x[n-j] feeding sum_k f[k] x'[win0+k] collapses to
    sum_m g[m] x[win0 - (Lh-1) + m] with g = convolve(f, reversed(h)).

    Returns (folded f32 ``[F+1, taps + Lh - 1]``, direct_row f32 — the mode-0
    "copy" output must itself be lowpassed — and the window-start offset
    Lh - 1 to subtract from win0 / add to the history length).
    """
    h1 = biquad_impulse(coeffs, fir_len)
    h = h1
    for _ in range(stages - 1):
        h = np.convolve(h, h1)
    Lh = len(h)
    rows = np.asarray(filters_np, np.float64)
    folded = np.stack([np.convolve(r, h[::-1]) for r in rows]).astype(np.float32)
    direct = np.zeros(folded.shape[1], np.float32)
    direct[half - 1: half - 1 + Lh] = h[::-1].astype(np.float32)
    return folded, direct, Lh - 1


@functools.partial(jax.jit, static_argnames=("exact", "first_order", "fir_len"))
def biquad_apply(
    x: jax.Array,
    coeffs: jax.Array,
    state,
    *,
    exact: bool = True,
    first_order: bool = False,
    fir_len: int | None = None,
    valid_len=None,
):
    """Batched DF-I biquad over the last (time) axis.

    Reference per-sample op order (src/resample/art_biquad.cpp:84-90)::

        sum = (x*a0) + (in_d1*a1) + (in_d2*a2) - (b1*out_d1) - (b2*out_d2)

    Args:
      x: f32 ``[..., T]``.
      coeffs: f32 ``[5]`` (or broadcastable ``[..., 5]``) {a0,a1,a2,b1,b2},
        already gain-folded via :func:`biquad_init`.
      state: tuple (in_d1, in_d2, out_d1, out_d2) each ``[...]``.
      exact: bit-exact sequential path vs parallel fast paths.
      first_order: reference shortcut when a2 == b2 == 0
        (art_biquad.cpp:49-50, 74-82) — drops the a2/b2 terms, which changes
        f32 rounding, so it must mirror the C branch exactly.
      fir_len: fast path only — truncate the filter's impulse response at
        this length (use :func:`fir_len_for`) and apply it as a blocked
        Toeplitz matmul on the MXU instead of an associative scan. Far
        faster and far cheaper to compile for long T; error ~ pole_radius^K.
      valid_len: optional traced scalar; samples at t >= valid_len do not
        advance the filter state (outputs there are unspecified). Used when
        a fused pipeline processes fixed-size padded chunks.

    Returns: (y ``[..., T]``, new_state).
    """
    x = x.astype(jnp.float32)
    coeffs = jnp.broadcast_to(coeffs.astype(jnp.float32), x.shape[:-1] + (5,))
    a0, a1, a2 = coeffs[..., 0], coeffs[..., 1], coeffs[..., 2]
    b1, b2 = coeffs[..., 3], coeffs[..., 4]
    in_d1, in_d2, out_d1, out_d2 = (s.astype(jnp.float32) for s in state)
    T = x.shape[-1]

    if exact:
        xt = jnp.moveaxis(x, -1, 0)
        ts = jnp.arange(T, dtype=jnp.int32)

        def keep(valid, new, old):
            if valid_len is None:
                return new
            return tuple(jnp.where(valid, n, o) for n, o in zip(new, old))

        if first_order:
            def step(carry, xi_t):
                xi, t = xi_t
                i1, i2, o1, o2 = carry
                y = exact_mul(xi, a0) + exact_mul(i1, a1) - exact_mul(b1, o1)
                new = keep(valid_len is None or t < valid_len, (xi, i1, y, o1), carry)
                return new, y
        else:
            def step(carry, xi_t):
                xi, t = xi_t
                i1, i2, o1, o2 = carry
                y = (exact_mul(xi, a0) + exact_mul(i1, a1) + exact_mul(i2, a2)
                     - exact_mul(b1, o1) - exact_mul(b2, o2))
                new = keep(valid_len is None or t < valid_len, (xi, i1, y, o1), carry)
                return new, y

        new_state, yt = jax.lax.scan(step, (in_d1, in_d2, out_d1, out_d2), (xt, ts))
        return jnp.moveaxis(yt, 0, -1), new_state

    if fir_len is not None:
        return _biquad_conv(x, (a0, a1, a2, b1, b2), (in_d1, in_d2, out_d1, out_d2),
                            fir_len, valid_len)

    # Fast fallback: FIR forcing f[i] = a0*x[i] + a1*x[i-1] + a2*x[i-2]
    # (elementwise), then the IIR y[i] = f[i] - b1*y[i-1] - b2*y[i-2]
    # via blocked associative scan.
    x1 = jnp.concatenate([in_d1[..., None], x[..., :-1]], axis=-1)
    x2 = jnp.concatenate([in_d2[..., None], x1[..., :-1]], axis=-1)
    if first_order:
        f = a0[..., None] * x + a1[..., None] * x1
        y, (yl, yp) = iir2_scan(f, b1, jnp.zeros_like(b2), out_d1, out_d2, valid_len)
    else:
        f = a0[..., None] * x + a1[..., None] * x1 + a2[..., None] * x2
        y, (yl, yp) = iir2_scan(f, b1, b2, out_d1, out_d2, valid_len)
    if valid_len is None:
        new_in = (x[..., -1], x1[..., -1])
    else:
        new_in = (_take_t(x, valid_len - 1, in_d1), _take_t(x, valid_len - 2, in_d2))
    return y, (*new_in, yl, yp)


def _take_t(x, t, fallback):
    """x[..., t] with t traced; t < 0 returns the carried fallback state."""
    v = jnp.take_along_axis(
        x, jnp.broadcast_to(jnp.maximum(t, 0), x.shape[:-1])[..., None], axis=-1
    )[..., 0]
    return jnp.where(t >= 0, v, fallback)


def _biquad_conv(x, coeffs, state, K: int, valid_len):
    """Truncated-impulse-response biquad: one Toeplitz matmul per block.

    The constant-coefficient IIR is linear and time-invariant, so
    ``y = conv(x, h_total) + transient(state)`` where ``h_total`` is the
    biquad's impulse response truncated at K and the transient is a
    state-weighted combination of four K-length unit responses. All
    sequential work collapses into a K-step scalar scan (computing h) and
    the convolution runs as MXU matmuls over blocks of 512 outputs.
    """
    a0, a1, a2, b1, b2 = coeffs
    in_d1, in_d2, out_d1, out_d2 = state
    T = x.shape[-1]
    batch_shape = x.shape[:-1]

    # impulse response of the pure IIR: h[0]=1, h[i] = -b1 h[i-1] - b2 h[i-2]
    def h_step(carry, _):
        h1, h2 = carry
        h = -b1 * h1 - b2 * h2
        return (h, h1), h

    one = jnp.ones(batch_shape, jnp.float32)
    zero = jnp.zeros(batch_shape, jnp.float32)
    _, h_tail = jax.lax.scan(h_step, (one, zero), None, length=K - 1)
    h = jnp.concatenate([one[None], h_tail], axis=0)  # [K, ...]
    h = jnp.moveaxis(h, 0, -1)  # [..., K]
    h1s = jnp.concatenate([zero[..., None], h[..., :-1]], axis=-1)  # h[i-1]
    h2s = jnp.concatenate([zero[..., None], h1s[..., :-1]], axis=-1)  # h[i-2]

    h_total = a0[..., None] * h + a1[..., None] * h1s + a2[..., None] * h2s
    # unit responses to each initial-state component
    g_in1 = a1[..., None] * h + a2[..., None] * h1s
    g_in2 = a2[..., None] * h
    g_o1 = -b1[..., None] * h - b2[..., None] * h1s
    g_o2 = -b2[..., None] * h

    transient = (in_d1[..., None] * g_in1 + in_d2[..., None] * g_in2
                 + out_d1[..., None] * g_o1 + out_d2[..., None] * g_o2)  # [..., K]

    # causal FIR via blocked Toeplitz matmul (requires shared coeffs so the
    # Toeplitz matrix is batch-independent; enforced by taking index 0).
    # Overlapping windows come from two reshapes + a concat (gather-free:
    # a gather here materializes badly-laid-out intermediates on TPU).
    hvec = h_total.reshape(-1, K)[0]  # [K] (coeffs shared across batch)
    M = 1
    for d in batch_shape:
        M *= d
    xf = x.reshape(M, T)
    Tb = max(512, K)  # block size; needs K - 1 <= Tb for the overlap trick
    nb = -(-T // Tb)
    Tp = nb * Tb
    # left-pad K-1 (causal history = zeros; transient handles state), right-pad
    # so the padded length is (nb + 1) * Tb
    xp = jnp.pad(xf, [(0, 0), (K - 1, (nb + 1) * Tb - (K - 1) - T)])
    blocks = xp.reshape(M, nb + 1, Tb)
    xw = jnp.concatenate([blocks[:, :-1, :], blocks[:, 1:, : K - 1]], axis=-1)  # [M, nb, Tb+K-1]
    # Toeplitz: H[r, j] = hvec[j + K - 1 - r] where in range
    r = jnp.arange(K - 1 + Tb)[:, None]
    j = jnp.arange(Tb)[None, :]
    idx = j + (K - 1) - r
    H = jnp.where((idx >= 0) & (idx < K), hvec[jnp.clip(idx, 0, K - 1)], 0.0)
    y = jnp.einsum("mbk,kj->mbj", xw, H, precision=jax.lax.Precision.HIGHEST)
    y = y.reshape(*batch_shape, Tp)[..., :T]
    m = min(K, T)
    y = y.at[..., :m].add(transient[..., :m])

    if valid_len is None:
        new_state = (x[..., -1], _take_t(x, jnp.int32(T - 2), in_d1),
                     y[..., -1], _take_t(y, jnp.int32(T - 2), out_d1))
    else:
        new_state = (
            _take_t(x, valid_len - 1, in_d1), _take_t(x, valid_len - 2, in_d2),
            _take_t(y, valid_len - 1, out_d1), _take_t(y, valid_len - 2, out_d2))
    return y, new_state
