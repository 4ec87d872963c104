"""Batched windowed-sinc resampler: the ART resampler lifted to stream batches.

Public semantics mirror the reference C API (reference:
include/art_resampler.h:36-46, src/resample/art_resampler.cpp): the same
filterbank, phase accumulator, ring-buffer timing, dry-run queries and
latency behavior — but one instance processes ``[..., T]`` BATCHES of
streams, with the control plane on host (runtime/phase_grid.py) and all dot
products on device (ops/polyphase.py).

Carried state per instance:
  * phase (offset, input_index) — shared by every stream in the batch, since
    all streams advance in lockstep (same chunk sizes / ratio),
  * ``history`` f32 ``[..., H]`` device tensor — the last H input samples per
    stream (the reference keeps a taps*16 ring per channel,
    art_resampler.cpp:100,128-133; only taps+2 samples are ever reachable by
    a window, so H = taps + 8).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sinc
from ..ops.polyphase import polyphase_apply
from ..runtime.phase_grid import (
    HISTORY_MARGIN,
    PhaseState,
    expected_output,
    phase_grid,
    required_samples,
)
from ..runtime.native import design_filterbank_native

__all__ = ["BatchedResample", "ResampleResult"]


class ResampleResult:
    """Mirror of the reference ResampleResult (include/art_resampler.h:31-33)."""

    def __init__(self, input_used: int, output_generated: int):
        self.input_used = input_used
        self.output_generated = output_generated


@functools.partial(jax.jit, static_argnames=("hist_len", "half", "exact", "compute_second"))
def _chunk_kernel(x, hist, filters, win0, idx1, idx2, weight, mode, used,
                  *, hist_len, half, exact, compute_second):
    """One chunk: concat history, apply schedule, roll history forward."""
    xext = jnp.concatenate([hist, x.astype(jnp.float32)], axis=-1)
    out = polyphase_apply(
        xext, filters, win0 + hist_len, idx1, idx2, weight, mode,
        half=half, exact=exact, compute_second=compute_second)
    # new history = last hist_len samples ending at the last CONSUMED sample
    start = used  # = (hist_len + used) - hist_len
    new_hist = jax.lax.dynamic_slice_in_dim(xext, start, hist_len, axis=-1)
    return out, new_hist


class BatchedResample:
    """Batched equivalent of ``resampleInit``/``resampleProcess*``.

    Args:
      batch_shape: leading dims of the stream tensors, e.g. ``(B,)`` or
        ``(B, C)`` — channels are just another batch dim here (the
        interleaved/planar distinction of the C API is a host layout concern).
      num_taps / num_filters / lowpass_ratio / flags: reference parameters
        (art_resampler.cpp:78-103). Flags: SUBSAMPLE_INTERPOLATE,
        BLACKMAN_HARRIS, INCLUDE_LOWPASS from ops/sinc.py.
      exact: bit-exact sequential-order dot products vs MXU matmul fast path.
    """

    def __init__(self, batch_shape, num_taps: int, num_filters: int,
                 lowpass_ratio: float, flags: int, *, exact: bool = True,
                 dtype=jnp.float32):
        lowpass_ratio, flags = sinc.normalize_lowpass(lowpass_ratio, flags)
        sinc.validate_params(num_taps, num_filters)
        self.batch_shape = tuple(batch_shape)
        self.num_taps = num_taps
        self.num_filters = num_filters
        self.lowpass_ratio = lowpass_ratio
        self.flags = int(flags)
        self.exact = exact
        self.hist_len = num_taps + HISTORY_MARGIN
        self.filters = jnp.asarray(design_filterbank_native(num_taps, num_filters, lowpass_ratio, flags))
        self.state = PhaseState.initial(num_taps)
        self.history = jnp.zeros(self.batch_shape + (self.hist_len,), dtype)

    # ------------------------------------------------------------ queries
    def get_required_samples(self, num_output_frames: int, ratio: float) -> int:
        """reference resampleGetRequiredSamples (art_resampler.cpp:257-279)."""
        return required_samples(self.state, num_output_frames, ratio)

    def get_expected_output(self, num_input_frames: int, ratio: float) -> int:
        """reference resampleGetExpectedOutput (art_resampler.cpp:281-306)."""
        return expected_output(self.state, num_input_frames, ratio)

    def advance_position(self, delta: float) -> None:
        """reference resampleAdvancePosition (art_resampler.cpp:313-318)."""
        self.state.advance(delta)

    def get_position(self) -> float:
        """reference resampleGetPosition (art_resampler.cpp:348)."""
        return self.state.position

    def reset(self) -> None:
        """reference resampleReset (art_resampler.cpp:144-152)."""
        self.state.reset()
        self.history = jnp.zeros_like(self.history)

    # ------------------------------------------------------------ process
    def process(self, x: jax.Array, num_output_frames: int, ratio: float):
        """Resample a chunk.

        Args:
          x: f32 ``batch_shape + (n_in,)`` new input samples per stream.
          num_output_frames: max outputs to generate (space available).
          ratio: output/input rate ratio (reference passes this per call).

        Returns: (out ``batch_shape + (generated,)``, ResampleResult).
        Samples beyond ``result.input_used`` were NOT consumed; the caller
        must resend them (same contract as the reference, which reports
        input_used for exactly this purpose).
        """
        if x.shape[: len(self.batch_shape)] != self.batch_shape:
            raise ValueError(f"expected batch shape {self.batch_shape}, got {x.shape}")
        n_in = x.shape[-1]
        # schedule computes on a scratch phase, committed only after the
        # kernel call succeeds — phase_grid advances its state in place, and
        # a failed dispatch must leave self.state aligned with self.history
        # (retry safety; same contract as models/resampler.py)
        state = dataclasses.replace(self.state)
        grid = phase_grid(state, self.num_filters, self.flags, ratio, n_in, num_output_frames)
        compute_second = bool(self.flags & sinc.SUBSAMPLE_INTERPOLATE)
        out, self.history = _chunk_kernel(
            x, self.history, self.filters,
            jnp.asarray(grid.win0), jnp.asarray(grid.idx1), jnp.asarray(grid.idx2),
            jnp.asarray(grid.weight), jnp.asarray(grid.mode.astype(np.int32)),
            jnp.int32(grid.input_used),
            hist_len=self.hist_len, half=self.num_taps // 2,
            exact=self.exact, compute_second=compute_second)
        self.state = state
        return out[..., : grid.output_generated], ResampleResult(grid.input_used, grid.output_generated)
