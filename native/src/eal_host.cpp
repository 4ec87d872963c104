// esp-audio-libs-tpu native host library.
//
// Host-side control/init code for the TPU framework: everything that is
// inherently serial or needs exact libm semantics runs here; all batched
// numeric work runs on device (JAX/Pallas).  This file is a fresh
// implementation against the behavior documented in SURVEY.md; reference
// citations note which reference semantics each function mirrors.
//
// Components:
//   1. eal_design_filterbank — windowed-sinc polyphase filterbank design
//      (semantics of reference src/resample/art_resampler.cpp:379-419,
//      compiled as C++ so sin/cos/fabs bind to the float overloads).
//   2. eal_phase_grid — closed-form generation of the resampler's
//      per-output-sample schedule (window position, filter index/indices,
//      interpolation weight).  The reference interleaves this control flow
//      with the dot products (art_resampler.cpp:167-243,421-458); we split
//      control (host, this function) from compute (device polyphase kernel)
//      so thousands of streams share one schedule.
//   3. eal_required_samples / eal_expected_output — dry-run queries
//      (semantics of art_resampler.cpp:257-306).

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// 1. Filterbank design
// ---------------------------------------------------------------------------
// flags bits (reference include/art_resampler.h:21-23)
#define EAL_SUBSAMPLE_INTERPOLATE 0x1
#define EAL_BLACKMAN_HARRIS 0x2
#define EAL_INCLUDE_LOWPASS 0x4

// out: [num_filters + 1, num_taps] row-major f32.
// Returns 0 on success, nonzero on invalid parameters
// (envelope: taps multiple of 4 in [4,1024], filters in [2,1024] —
// reference art_resampler.cpp:89-97).
// The design has two phases per filterbank row, both bit-pinned to the
// reference's observable f32 results (parity: tests/test_art_resampler.py
// over the whole 4-1024 envelope; ops/sinc.py re-derives the same math in
// vectorized numpy as an independent cross-check):
//   (a) tap magnitudes: sinc(dist * lowpass) windowed by 4-term
//       Blackman-Harris or Hann.  C++ float overloads of sin/cos/fabs are
//       load-bearing: float args stay in f32 libm, while the M_PI product
//       promotes to double and truncates on store.
//   (b) unity-DC normalization with error diffusion.  The diffusion is
//       ORDER-DEPENDENT, so the tap visit order is part of the bit-exact
//       contract: center tap first, then alternating center-1, center+1,
//       center-2, ... and tap 0 last.  The order is materialized explicitly
//       (same construction as ops/sinc.py) rather than computed by index
//       arithmetic inside the loop.
int eal_design_filterbank(int num_taps, int num_filters, float lowpass_ratio, int flags, float *out) {
  if ((num_taps & 3) || num_taps <= 0 || num_taps > 1024) return 1;
  if (num_filters < 2 || num_filters > 1024) return 2;

  const int center = num_taps / 2;

  // (b)'s tap visit order, shared by every row
  int visit[1024];
  int nv = 0;
  visit[nv++] = center;
  for (int k = 1; k < center; ++k) {
    visit[nv++] = center - k;
    visit[nv++] = center + k;
  }
  visit[nv++] = 0;

  const float bh0 = 0.35875f, bh1 = 0.48829f, bh2 = 0.14128f, bh3 = 0.01168f;

  for (int row = 0; row <= num_filters; ++row) {
    const float frac = (float) row / num_filters;
    float *bank_row = out + (size_t) row * num_taps;

    // (a) magnitudes + running f32 DC sum
    float magnitude[1024];
    float dc_sum = 0.0f;
    for (int t = 0; t < num_taps; ++t) {
      const float dist = fabsf((center - 1) + frac - t) * M_PI;
      float m = 1.0f;
      if (dist != 0.0f) {
        const float arg = dist * lowpass_ratio;
        m = sinf(arg) / arg;
        const float u = dist / center;
        if (flags & EAL_BLACKMAN_HARRIS)
          m *= bh0 + bh1 * cosf(u) + bh2 * cosf(2 * u) + bh3 * cosf(3 * u);
        else
          m *= 0.5f * (1.0f + cosf(u));  // Hann
      }
      magnitude[t] = m;
      dc_sum += m;
    }

    // (b) normalize to unity DC gain, diffusing the f32 rounding error of
    // each emitted tap into the next visit
    const float dc_scale = 1.0f / dc_sum;
    float diffusion = 0.0f;
    for (int k = 0; k < nv; ++k) {
      const int t = visit[k];
      const float scaled = magnitude[t] * dc_scale;
      const float emitted = scaled - diffusion;
      bank_row[t] = emitted;
      diffusion += emitted - scaled;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// 2. Phase grid
// ---------------------------------------------------------------------------
// Simulates the resampler's input/output interleaving for one processing
// chunk and emits a per-output schedule for the device kernel.
//
// The phase accumulator is a sequential f32 recurrence
// (offset += 1.0f/ratio, with ring-buffer wrap subtractions
// art_resampler.cpp:173-197); replicating it exactly is what makes the
// device output bit-identical to the serial reference.
//
// Per output k the schedule is:
//   mode[k]  : 0 = direct copy (integer phase, no lowpass)
//              1 = single filter dot product
//              2 = two filter dot products + linear interpolation
//   win0[k]  : window start index relative to the first NEW input sample of
//              this chunk (>= -(num_taps + 2); device prepends history)
//   idx1/idx2: filterbank rows (idx2 only for mode 2)
//   weight[k]: lerp weight for mode 2 (result = sum2*w + sum1*(1-w))
//
// state in/out: offset (f32 outputOffset), input_index (int).
// Returns via out-params: input_used, output_generated.
void eal_phase_grid(
    // config
    int num_taps, int num_filters, int flags, float ratio,
    // chunk
    int num_input_frames, int num_output_frames,
    // state (in/out)
    float *offset_io, int *input_index_io,
    // schedule out (arrays of length >= num_output_frames)
    int32_t *win0, int32_t *idx1, int32_t *idx2, float *weight, int8_t *mode,
    // results
    int32_t *input_used, int32_t *output_generated) {
  const int half = num_taps / 2;
  const int num_samples = num_taps * 16;  // ring size (art_resampler.cpp:100)
  float offset = *offset_io;
  int input_index = *input_index_io;
  int used = 0, generated = 0;
  const int interpolate = (flags & EAL_SUBSAMPLE_INTERPOLATE) != 0;
  const int lowpass = (flags & EAL_INCLUDE_LOWPASS) != 0;

  while (num_output_frames > 0) {
    if (offset >= input_index - half) {
      if (num_input_frames > 0) {
        if (input_index == num_samples) {
          offset -= num_samples - num_taps;
          input_index -= num_samples - num_taps;
        }
        input_index++;
        used++;
        num_input_frames--;
      } else {
        break;
      }
    } else {
      // emit one output at the current phase
      int src = (int) floorf(offset);         // buffer position
      float frac = offset - floorf(offset);   // f32 fractional phase
      // chunk-relative coordinates: buffer index b maps to r = b - input_index + used
      int rel = src - input_index + used;
      int w0 = rel - half + 1;

      if (frac == 0.0f && !lowpass) {
        mode[generated] = 0;
        win0[generated] = w0;
        idx1[generated] = 0;
        idx2[generated] = 0;
        weight[generated] = 0.0f;
      } else if (!interpolate) {
        mode[generated] = 1;
        win0[generated] = w0;
        idx1[generated] = (int) floorf(frac * num_filters + 0.5f);
        idx2[generated] = 0;
        weight[generated] = 0.0f;
      } else {
        float o = frac * num_filters;
        int i1 = (int) floorf(o);
        float w = o - i1;
        if (w == 0.0f && !lowpass) {
          mode[generated] = 1;
          win0[generated] = w0;
          idx1[generated] = i1;
          idx2[generated] = 0;
          weight[generated] = 0.0f;
        } else {
          mode[generated] = 2;
          win0[generated] = w0;
          idx1[generated] = i1;
          idx2[generated] = i1 + 1;
          weight[generated] = w;
        }
      }
      offset += (1.0f / ratio);
      generated++;
      num_output_frames--;
    }
  }

  *offset_io = offset;
  *input_index_io = input_index;
  *input_used = used;
  *output_generated = generated;
}

// ---------------------------------------------------------------------------
// 3. Dry-run queries (semantics of art_resampler.cpp:257-306)
// ---------------------------------------------------------------------------
unsigned int eal_required_samples(int num_taps, float offset, int input_index, int num_output_frames, float ratio) {
  const int half = num_taps / 2;
  const int num_samples = num_taps * 16;
  unsigned int used = 0;

  while (num_output_frames > 0) {
    if (offset >= input_index - half) {
      if (input_index == num_samples) {
        offset -= num_samples - num_taps;
        input_index -= num_samples - num_taps;
      }
      input_index++;
      used++;
    } else {
      offset += (1.0f / ratio);
      num_output_frames--;
    }
  }
  return used;
}

unsigned int eal_expected_output(int num_taps, float offset, int input_index, int num_input_frames, float ratio) {
  const int half = num_taps / 2;
  const int num_samples = num_taps * 16;
  unsigned int generated = 0;

  while (1) {
    if (offset >= input_index - half) {
      if (num_input_frames > 0) {
        if (input_index == num_samples) {
          offset -= num_samples - num_taps;
          input_index -= num_samples - num_taps;
        }
        input_index++;
        num_input_frames--;
      } else {
        break;
      }
    } else {
      offset += (1.0f / ratio);
      generated++;
    }
  }
  return generated;
}

}  // extern "C"
