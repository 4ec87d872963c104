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
int eal_design_filterbank(int num_taps, int num_filters, float lowpass_ratio, int flags, float *out) {
  if ((num_taps & 3) || num_taps <= 0 || num_taps > 1024) return 1;
  if (num_filters < 2 || num_filters > 1024) return 2;

  const float a0 = 0.35875f, a1 = 0.48829f, a2 = 0.14128f, a3 = 0.01168f;
  const int half = num_taps / 2;

  for (int f = 0; f <= num_filters; ++f) {
    float fraction = (float) f / num_filters;
    float *filter = out + (size_t) f * num_taps;
    float temp[1024];
    float filter_sum = 0.0f;

    for (int i = 0; i < num_taps; ++i) {
      // fabs/sin/cos bind to the float overloads in C++; the M_PI scaling is
      // float*double -> double, truncated to f32 on store
      float dist = fabsf((half - 1) + fraction - i) * M_PI;
      float ratio = dist / half;
      float value;
      if (dist != 0.0f) {
        value = sinf(dist * lowpass_ratio) / (dist * lowpass_ratio);
        if (flags & EAL_BLACKMAN_HARRIS)
          value *= a0 + a1 * cosf(ratio) + a2 * cosf(2 * ratio) + a3 * cosf(3 * ratio);
        else
          value *= 0.5f * (1.0f + cosf(ratio));  // Hann
      } else {
        value = 1.0f;
      }
      filter_sum += temp[i] = value;
    }

    // unity-DC normalization with error diffusion, ping-pong order from the
    // center tap outward
    float scaler = 1.0f / filter_sum, error = 0.0f;
    for (int i = half; i < num_taps; i = num_taps - i - (i >= half)) {
      filter[i] = (temp[i] *= scaler) - error;
      error += filter[i] - temp[i];
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
