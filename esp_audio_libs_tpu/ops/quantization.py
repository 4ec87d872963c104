"""Batched PCM quantization ops (packed int8/16/24/32 LE <-> float32).

TPU-native equivalent of the reference's ``quantization_utils``
(reference: src/quantization_utils.cpp:6-94, include/quantization_utils.h).
The reference converts one scalar at a time on a microcontroller; here every
op is a vectorized jnp program over ``[..., n]`` tensors so thousands of
streams convert in one fused XLA kernel, and the clipped-sample diagnostic
becomes a reduction.

Bit-exactness notes
-------------------
* ``quantized_to_float``: the reference computes
  ``gain = powf(10f, db/20f)`` then ``gain_factor = gain / 2^k`` (both f32)
  and a single f32 multiply per sample (src/quantization_utils.cpp:8,11,18).
  We compute the gain factor on host with glibc's ``powf`` via ctypes so the
  per-sample device math is the identical single multiply.
* ``float_to_quantized``: ``floorf(x * scalar + 0.5f)`` (round-half-up,
  src/quantization_utils.cpp:61), clip bounds ``(1<<(bits-1))-1`` /
  ``~high_clip`` (:54-56), 8-bit unsigned bias +128 (:53), left shift
  ``(32-bits)%8`` for non-byte-aligned depths (:56), clipped-sample count
  returned (:50). All integer/float steps are mirrored exactly.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .scan import exact_mul

__all__ = [
    "bytes_per_sample",
    "gain_factor",
    "unpack_pcm",
    "pack_pcm",
    "unpack_pcm16_planar2",
    "pack_pcm16_interleave2",
    "int_to_float",
    "float_to_int",
    "quantized_to_float",
    "float_to_quantized",
]


@functools.lru_cache(None)
def _libm():
    lib = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
    lib.powf.restype = ctypes.c_float
    lib.powf.argtypes = [ctypes.c_float, ctypes.c_float]
    return lib


def bytes_per_sample(bits: int) -> int:
    """Packed bytes per sample. Reference packs 1/2/3/4 bytes for
    bits in (0,8], (8,16], (16,24], (24,32] (src/quantization_utils.cpp:10-46)."""
    if not 1 <= bits <= 32:
        raise ValueError(f"bits must be in [1, 32], got {bits}")
    return (max(bits, 2) + 7) // 8 if bits > 8 else 1


def _scale_denominator(bits: int) -> float:
    # Reference gain_factor denominators: 128, 32768, 8388608, 2147483648
    # (src/quantization_utils.cpp:11,18,27,37) chosen by byte class.
    return float(1 << (bytes_per_sample(bits) * 8 - 1))


def gain_factor(bits: int, gain_db: float) -> np.float32:
    """f32 ``powf(10, db/20) / 2^(8B-1)`` exactly as the reference computes it."""
    gain = _libm().powf(np.float32(10.0), np.float32(np.float32(gain_db) / np.float32(20.0)))
    return np.float32(np.float32(gain) / np.float32(_scale_denominator(bits)))


# ----------------------------------------------------------------- unpack/pack


def unpack_pcm(data: jax.Array, bits: int) -> jax.Array:
    """uint8 ``[..., n*B]`` little-endian packed PCM -> int32 ``[..., n]``.

    Mirrors the reference's byte assembly: <=8-bit samples are unsigned with a
    -128 bias (src/quantization_utils.cpp:13-14); wider samples are
    little-endian two's complement sign-extended from their top byte
    (:21-24, :30-34, :40-45).
    """
    nbytes = bytes_per_sample(bits)
    if data.dtype != jnp.uint8:
        raise TypeError(f"expected uint8 packed data, got {data.dtype}")
    *lead, total = data.shape
    if total % nbytes:
        raise ValueError(f"trailing dim {total} not divisible by {nbytes} bytes/sample")
    if nbytes == 2:
        # LE int16 is exactly a bit reinterpretation: one bitcast instead of
        # per-byte shifts (identical values, ~memcpy speed on TPU)
        return jax.lax.bitcast_convert_type(
            data.reshape(*lead, total // 2, 2), jnp.int16).astype(jnp.int32)
    b = data.reshape(*lead, total // nbytes, nbytes).astype(jnp.int32)

    def sext8(v):  # (int32_t)(signed char) cast
        return (v << 24) >> 24

    if nbytes == 1:
        return b[..., 0] - 128
    if nbytes == 3:
        return b[..., 0] + (b[..., 1] << 8) + (sext8(b[..., 2]) << 16)
    # nbytes == 4: the reference sign-extends BOTH byte 2 and byte 3
    # (src/quantization_utils.cpp:40-44), so a set sign bit in byte 2 loses
    # 2^24 relative to a plain LE int32 read. Preserved for bit-exactness.
    return (
        b[..., 0]
        + (b[..., 1] << 8)
        + (sext8(b[..., 2]) << 16)
        + (sext8(b[..., 3]) << 24)
    )


def pack_pcm(samples: jax.Array, bits: int) -> jax.Array:
    """int32 ``[..., n]`` -> uint8 ``[..., n*B]`` little-endian packed PCM.

    Assumes samples already carry the reference's storage convention
    (left-justified within B bytes and +128 bias applied for 8-bit) as
    produced by :func:`float_to_int`.
    """
    nbytes = bytes_per_sample(bits)
    *lead_s, n_s = samples.shape
    if nbytes == 2:
        # truncate-to-int16 + bitcast emits the identical low two LE bytes
        return jax.lax.bitcast_convert_type(
            samples.astype(jnp.int16), jnp.uint8).reshape(*lead_s, n_s * 2)
    if nbytes == 4:
        return jax.lax.bitcast_convert_type(
            samples.astype(jnp.int32), jnp.uint8).reshape(*lead_s, n_s * 4)
    parts = [((samples >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(nbytes)]
    stacked = jnp.stack(parts, axis=-1)  # [..., n, B]
    *lead, n, _ = stacked.shape
    return stacked.reshape(*lead, n * nbytes)


def unpack_pcm16_planar2(data: jax.Array) -> jax.Array:
    """uint8 ``[..., frames*4]`` interleaved stereo s16 -> int32
    ``[..., 2, frames]`` WITHOUT a transpose: one LE frame (L0 L1 R0 R1) is
    one int32 ``L | R<<16``, so de-interleaving is a bitcast plus two
    arithmetic shifts — elementwise, layout-friendly. A [frames, 2] ->
    [2, frames] transpose of f32 costs ~20x more on TPU (minor-dim-2
    relayout). Values identical to unpack_pcm + reshape/transpose."""
    return unpack_pcm16_planar2_raw(data).astype(jnp.int32)


def unpack_pcm16_planar2_raw(data: jax.Array) -> jax.Array:
    """uint8 ``[..., frames*4]`` interleaved stereo s16 -> RAW int16
    ``[..., 2, frames]`` (no widening, no gain): the int16 feed for the
    fused Pallas resample kernel, which folds the gain factor into its
    weight tiles and converts on-chip — half the HBM bytes of the f32
    planes. Same transpose-free bitcast de-interleave as
    :func:`unpack_pcm16_planar2`."""
    *lead, total = data.shape
    v = jax.lax.bitcast_convert_type(
        data.reshape(*lead, total // 4, 4), jnp.int32)        # [..., frames]
    left = ((v << 16) >> 16).astype(jnp.int16)
    right = (v >> 16).astype(jnp.int16)
    return jnp.stack([left, right], axis=-2)                  # [..., 2, frames]


def unpack_pcm16_raw(data: jax.Array) -> jax.Array:
    """uint8 ``[..., frames*2]`` mono s16 -> RAW int16 ``[..., frames]``
    (one bitcast; see unpack_pcm16_planar2_raw for the fused-kernel use)."""
    *lead, total = data.shape
    return jax.lax.bitcast_convert_type(
        data.reshape(*lead, total // 2, 2), jnp.int16)


def pack_pcm16_interleave2(samples: jax.Array) -> jax.Array:
    """int32 ``[..., 2, T]`` (16-bit storage convention) -> uint8
    ``[..., T*4]`` interleaved stereo, transpose-free (inverse of
    unpack_pcm16_planar2): combine into int32 ``L | R<<16`` and bitcast."""
    left = samples[..., 0, :]
    right = samples[..., 1, :]
    v = (left & 0xFFFF) | (right << 16)
    *lead, T = v.shape
    return jax.lax.bitcast_convert_type(v.astype(jnp.int32),
                                        jnp.uint8).reshape(*lead, T * 4)


# -------------------------------------------------------------- int <-> float


def int_to_float(samples: jax.Array, factor) -> jax.Array:
    """int32 samples -> f32 via a single f32 multiply (the reference's only
    per-sample float op, src/quantization_utils.cpp:14,23,33,44)."""
    return samples.astype(jnp.float32) * jnp.float32(factor)


def float_to_int(x: jax.Array, bits: int) -> tuple[jax.Array, jax.Array]:
    """f32 -> storage-convention int32 samples + per-sample clipped mask.

    Mirrors src/quantization_utils.cpp:50-94: round-half-up via
    ``floorf(x*scalar + 0.5f)``, symmetric clip with counting, 32-bit clip
    decided on the raw input, left-justify by ``(32-bits)%8`` and +128 offset
    for <=8-bit output.
    """
    scalar = jnp.float32(np.float32((1 << bits) / 2.0))
    offset = 128 if bits <= 8 else 0
    high_clip = (1 << (bits - 1)) - 1
    low_clip = ~high_clip
    left_shift = (32 - bits) % 8

    # exact_mul: keep the multiply separately rounded (XLA:CPU would
    # otherwise contract x*scalar + 0.5 into an FMA; the reference
    # rounds the product first, src/quantization_utils.cpp:61)
    y = jnp.floor(exact_mul(x, scalar) + jnp.float32(0.5))
    if bits < 32:
        # The reference casts the f32 result straight to int32
        # (src/quantization_utils.cpp:61); on x86 an out-of-range or NaN
        # float converts to INT_MIN (cvttss2si), so hugely positive inputs
        # clip to NEGATIVE full scale. Emulate that cast exactly.
        in_range = (y >= jnp.float32(-2147483648.0)) & (y < jnp.float32(2147483648.0))
        cast = jnp.clip(y, jnp.float32(-2147483648.0), jnp.float32(2147483520.0)).astype(jnp.int32)
        out = jnp.where(in_range, cast, jnp.int32(-2147483648))
        clipped = (out > high_clip) | (out < low_clip)
        out = jnp.clip(out, low_clip, high_clip)
    else:
        # For 32-bit the reference tests the float input directly
        # (src/quantization_utils.cpp:70-78); y may exceed int32 range, so
        # clamp in float space first (the clip branch overrides those lanes).
        clip_hi = x >= jnp.float32(1.0)
        clip_lo = x < jnp.float32(-1.0)
        clipped = clip_hi | clip_lo
        safe = jnp.clip(y, jnp.float32(low_clip), jnp.float32(high_clip)).astype(jnp.int32)
        out = jnp.where(clip_hi, jnp.int32(high_clip), jnp.where(clip_lo, jnp.int32(low_clip), safe))
    if left_shift:
        out = out << left_shift
    if offset:
        out = out + offset
    return out, clipped


# ------------------------------------------------------- packed-byte wrappers


@functools.partial(jax.jit, static_argnames=("bits",))
def _q2f_jit(data, factor, bits):
    return int_to_float(unpack_pcm(data, bits), factor)


@functools.partial(jax.jit, static_argnames=("bits",))
def _f2q_jit(x, bits):
    samples, clipped = float_to_int(x, bits)
    return pack_pcm(samples, bits), jnp.sum(clipped.astype(jnp.uint32))


def quantized_to_float(data: jax.Array, bits: int, gain_db: float = 0.0) -> jax.Array:
    """Packed uint8 ``[..., n*B]`` -> f32 ``[..., n]`` with dB gain.

    Drop-in batched equivalent of the reference
    ``quantization_utils::quantized_to_float`` (src/quantization_utils.cpp:6-48).
    """
    return _q2f_jit(data, gain_factor(bits, gain_db), bits)


def float_to_quantized(x: jax.Array, bits: int) -> tuple[jax.Array, jax.Array]:
    """f32 ``[..., n]`` -> (packed uint8 ``[..., n*B]``, clipped sample count).

    Drop-in batched equivalent of the reference
    ``quantization_utils::float_to_quantized`` (src/quantization_utils.cpp:50-94).
    """
    return _f2q_jit(x, bits)
