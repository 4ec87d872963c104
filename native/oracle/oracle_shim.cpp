// C ABI shim around the reference esp-audio-libs library (/root/reference),
// compiled on the host as a bit-exact test ORACLE for the TPU framework.
//
// This file contains NO ported logic: it only forwards to the reference's
// public C++ API so pytest (via ctypes) can differential-test our JAX/Pallas
// implementations against the reference's exact numerics.

#include <cstdint>
#include <cstring>
#include <cstdlib>

#include "quantization_utils.h"
#include "wav_decoder.h"
#include "flac_decoder.h"
#include "mp3_decoder.h"
#include "art_resampler.h"
#include "art_biquad.h"
#include "resampler.h"
#include "dsp.h"

using namespace esp_audio_libs;

// dsps_biquad_f32_ansi has no declaration in the reference headers; g++
// compiles the defining .c file as C++, so declare it with C++ linkage.
esp_err_t dsps_biquad_f32_ansi(const float *input, float *output, int len, float *coef, float *w);

extern "C" {

// ---------------------------------------------------------------- quantization
void ref_quantized_to_float(const uint8_t *in, float *out, uint32_t n, uint8_t bits, float gain_db) {
  quantization_utils::quantized_to_float(in, out, n, bits, gain_db);
}

uint32_t ref_float_to_quantized(const float *in, uint8_t *out, uint32_t n, uint8_t bits) {
  return quantization_utils::float_to_quantized(in, out, n, bits);
}

// ---------------------------------------------------------------- dsp kernels
int ref_dsps_dotprod_f32(const float *a, const float *b, float *dest, int len) {
  return dsps_dotprod_f32_ansi(a, b, dest, len);
}
int ref_dsps_biquad_f32(const float *input, float *output, int len, float *coef, float *w) {
  return dsps_biquad_f32_ansi(input, output, len, coef, w);
}
int ref_dsps_add_s16(const int16_t *a, const int16_t *b, int16_t *out, int len, int s1, int s2, int so, int shift) {
  return dsps_add_s16_ansi(a, b, out, len, s1, s2, so, shift);
}
int ref_dsps_mulc_s16(const int16_t *in, int16_t *out, int len, int16_t C, int si, int so) {
  return dsps_mulc_s16_ansi(in, out, len, C, si, so);
}

// ---------------------------------------------------------------- art biquad
void ref_biquad_lowpass(double frequency, float *coeffs5) {
  art_resampler::BiquadCoefficients c;
  art_resampler::biquad_lowpass(&c, frequency);
  coeffs5[0] = c.a0; coeffs5[1] = c.a1; coeffs5[2] = c.a2; coeffs5[3] = c.b1; coeffs5[4] = c.b2;
}

void ref_biquad_highpass(double frequency, float *coeffs5) {
  art_resampler::BiquadCoefficients c;
  art_resampler::biquad_highpass(&c, frequency);
  coeffs5[0] = c.a0; coeffs5[1] = c.a1; coeffs5[2] = c.a2; coeffs5[3] = c.b1; coeffs5[4] = c.b2;
}

// state4 = {in_d1, in_d2, out_d1, out_d2}; updated in place.
void ref_biquad_apply_buffer(const float *coeffs5, float gain, float *state4, float *buffer, int num_samples,
                             int stride) {
  art_resampler::BiquadCoefficients c;
  c.a0 = coeffs5[0]; c.a1 = coeffs5[1]; c.a2 = coeffs5[2]; c.b1 = coeffs5[3]; c.b2 = coeffs5[4];
  art_resampler::Biquad f;
  art_resampler::biquad_init(&f, &c, gain);
  f.in_d1 = state4[0]; f.in_d2 = state4[1]; f.out_d1 = state4[2]; f.out_d2 = state4[3];
  art_resampler::biquad_apply_buffer(&f, buffer, num_samples, stride);
  state4[0] = f.in_d1; state4[1] = f.in_d2; state4[2] = f.out_d1; state4[3] = f.out_d2;
}

// ---------------------------------------------------------------- art resampler
void *ref_resample_init(int num_channels, int num_taps, int num_filters, float lowpass_ratio, int flags) {
  return (void *) art_resampler::resampleInit(num_channels, num_taps, num_filters, lowpass_ratio, flags);
}
void ref_resample_free(void *cxt) { art_resampler::resampleFree((art_resampler::Resample *) cxt); }
void ref_resample_reset(void *cxt) { art_resampler::resampleReset((art_resampler::Resample *) cxt); }
void ref_resample_advance_position(void *cxt, float delta) {
  art_resampler::resampleAdvancePosition((art_resampler::Resample *) cxt, delta);
}
float ref_resample_get_position(void *cxt) {
  return art_resampler::resampleGetPosition((art_resampler::Resample *) cxt);
}
unsigned int ref_resample_get_required_samples(void *cxt, int num_out, float ratio) {
  return art_resampler::resampleGetRequiredSamples((art_resampler::Resample *) cxt, num_out, ratio);
}
unsigned int ref_resample_get_expected_output(void *cxt, int num_in, float ratio) {
  return art_resampler::resampleGetExpectedOutput((art_resampler::Resample *) cxt, num_in, ratio);
}
void ref_resample_process_interleaved(void *cxt, const float *input, int num_in, float *output, int num_out,
                                      float ratio, unsigned int *used, unsigned int *generated) {
  art_resampler::ResampleResult r = art_resampler::resampleProcessInterleaved(
      (art_resampler::Resample *) cxt, input, num_in, output, num_out, ratio);
  *used = r.input_used;
  *generated = r.output_generated;
}
// Expose the generated sinc filterbank: copies filter i (0..numFilters) into out[num_taps].
void ref_resample_get_filter(void *cxt, int i, float *out) {
  art_resampler::Resample *c = (art_resampler::Resample *) cxt;
  memcpy(out, c->filters[i], c->numTaps * sizeof(float));
}
float ref_resample_get_output_offset(void *cxt) { return ((art_resampler::Resample *) cxt)->outputOffset; }
int ref_resample_get_input_index(void *cxt) { return ((art_resampler::Resample *) cxt)->inputIndex; }

// ---------------------------------------------------------------- resampler wrapper
void *ref_resampler_create(size_t in_samples, size_t out_samples) {
  return (void *) new resampler::Resampler(in_samples, out_samples);
}
void ref_resampler_destroy(void *r) { delete (resampler::Resampler *) r; }
int ref_resampler_initialize(void *r, float src_rate, float dst_rate, uint8_t src_bits, uint8_t dst_bits,
                             uint8_t channels, int use_pre_post_filter, int subsample_interpolate, uint16_t taps,
                             uint16_t filters) {
  resampler::ResamplerConfiguration cfg;
  cfg.source_sample_rate = src_rate;
  cfg.target_sample_rate = dst_rate;
  cfg.source_bits_per_sample = src_bits;
  cfg.target_bits_per_sample = dst_bits;
  cfg.channels = channels;
  cfg.use_pre_or_post_filter = use_pre_post_filter != 0;
  cfg.subsample_interpolate = subsample_interpolate != 0;
  cfg.number_of_taps = taps;
  cfg.number_of_filters = filters;
  return ((resampler::Resampler *) r)->initialize(cfg) ? 1 : 0;
}
void ref_resampler_resample(void *r, const uint8_t *in, uint8_t *out, size_t in_frames, size_t out_frames_free,
                            float gain_db, size_t *frames_used, size_t *frames_generated,
                            size_t *predicted_frames_used, uint32_t *clipped) {
  resampler::ResamplerResults res =
      ((resampler::Resampler *) r)->resample(in, out, in_frames, out_frames_free, gain_db);
  *frames_used = res.frames_used;
  *frames_generated = res.frames_generated;
  *predicted_frames_used = res.predicted_frames_used;
  *clipped = res.clipped_samples;
}

// ---------------------------------------------------------------- wav decoder
void *ref_wav_create() { return (void *) new wav_decoder::WAVDecoder(); }
void ref_wav_destroy(void *d) { delete (wav_decoder::WAVDecoder *) d; }
void ref_wav_reset(void *d) { ((wav_decoder::WAVDecoder *) d)->reset(); }
int ref_wav_decode_header(void *d, const uint8_t *buf, size_t n) {
  return (int) ((wav_decoder::WAVDecoder *) d)->decode_header(buf, n);
}
int ref_wav_state(void *d) { return (int) ((wav_decoder::WAVDecoder *) d)->state(); }
size_t ref_wav_bytes_processed(void *d) { return ((wav_decoder::WAVDecoder *) d)->bytes_processed(); }
size_t ref_wav_chunk_bytes_left(void *d) { return ((wav_decoder::WAVDecoder *) d)->chunk_bytes_left(); }
uint32_t ref_wav_sample_rate(void *d) { return ((wav_decoder::WAVDecoder *) d)->sample_rate(); }
uint16_t ref_wav_num_channels(void *d) { return ((wav_decoder::WAVDecoder *) d)->num_channels(); }
uint16_t ref_wav_bits_per_sample(void *d) { return ((wav_decoder::WAVDecoder *) d)->bits_per_sample(); }

// ---------------------------------------------------------------- flac decoder
void *ref_flac_create() { return (void *) new flac::FLACDecoder(); }
void ref_flac_destroy(void *d) { delete (flac::FLACDecoder *) d; }
int ref_flac_read_header(void *d, const uint8_t *buf, size_t n) {
  return (int) ((flac::FLACDecoder *) d)->read_header(buf, n);
}
int ref_flac_decode_frame(void *d, const uint8_t *buf, size_t n, uint8_t *out, uint32_t *num_samples) {
  return (int) ((flac::FLACDecoder *) d)->decode_frame(buf, n, out, num_samples);
}
uint32_t ref_flac_num_channels(void *d) { return ((flac::FLACDecoder *) d)->get_num_channels(); }
uint64_t ref_flac_num_samples(void *d) { return ((flac::FLACDecoder *) d)->get_num_samples(); }
uint32_t ref_flac_sample_rate(void *d) { return ((flac::FLACDecoder *) d)->get_sample_rate(); }
uint32_t ref_flac_sample_depth(void *d) { return ((flac::FLACDecoder *) d)->get_sample_depth(); }
uint32_t ref_flac_max_block_size(void *d) { return ((flac::FLACDecoder *) d)->get_max_block_size(); }
uint32_t ref_flac_min_block_size(void *d) { return ((flac::FLACDecoder *) d)->get_min_block_size(); }
uint32_t ref_flac_output_buffer_size_bytes(void *d) {
  return ((flac::FLACDecoder *) d)->get_output_buffer_size_bytes();
}
uint32_t ref_flac_output_bytes_per_sample(void *d) {
  return ((flac::FLACDecoder *) d)->get_output_bytes_per_sample();
}
size_t ref_flac_bytes_index(void *d) { return ((flac::FLACDecoder *) d)->get_bytes_index(); }
void ref_flac_md5(void *d, uint8_t *out16) { memcpy(out16, ((flac::FLACDecoder *) d)->get_md5_signature(), 16); }
void ref_flac_set_crc_check(void *d, int enabled) { ((flac::FLACDecoder *) d)->set_crc_check_enabled(enabled != 0); }
void ref_flac_set_output_32bit(void *d, int enabled) {
  ((flac::FLACDecoder *) d)->set_output_32bit_samples(enabled != 0);
}

// ---------------------------------------------------------------- mp3 decoder
void *ref_mp3_init() { return (void *) helix_decoder::MP3InitDecoder(); }
void ref_mp3_free(void *h) { helix_decoder::MP3FreeDecoder((helix_decoder::HMP3Decoder) h); }
int ref_mp3_find_sync_word(const uint8_t *buf, int n) { return helix_decoder::MP3FindSyncWord(buf, n); }
// Returns error code; *consumed = bytes consumed from inbuf.
int ref_mp3_decode(void *h, const uint8_t *inbuf, int bytes_left, int16_t *outbuf, int use_size, int *consumed) {
  const unsigned char *p = inbuf;
  int left = bytes_left;
  int err = helix_decoder::MP3Decode((helix_decoder::HMP3Decoder) h, &p, &left, outbuf, use_size);
  *consumed = (int) (p - inbuf);
  return err;
}
// ---- MP3 stage taps: drive individual reference pipeline stages with
// caller-provided state, for differential unit tests of the device kernels.
using namespace esp_audio_libs::helix_decoder;

static void fill_frame_header(MP3DecInfo *di, const int32_t *frame) {
  FrameHeader *fh = (FrameHeader *) di->FrameHeaderPS;
  fh->ver = (MPEGVersion) frame[0];
  fh->srIdx = frame[1];
  fh->sMode = (StereoMode) frame[2];
  fh->modeExt = frame[3];
  fh->sfBand = &sfBandTable[fh->ver][fh->srIdx];
  di->nChans = (fh->sMode == Mono ? 1 : 2);
  di->version = fh->ver;
  di->layer = 3;
}

static void fill_sideinfo_sub(SideInfoSub *s, const int32_t *p) {
  s->part23Length = p[0]; s->nBigvals = p[1]; s->globalGain = p[2]; s->sfCompress = p[3];
  s->winSwitchFlag = p[4]; s->blockType = p[5]; s->mixedBlock = p[6];
  s->tableSelect[0] = p[7]; s->tableSelect[1] = p[8]; s->tableSelect[2] = p[9];
  s->subBlockGain[0] = p[10]; s->subBlockGain[1] = p[11]; s->subBlockGain[2] = p[12];
  s->region0Count = p[13]; s->region1Count = p[14]; s->preFlag = p[15];
  s->sfactScale = p[16]; s->count1TableSelect = p[17];
}

static void fill_sf(ScaleFactorInfoSub *d, const int32_t *sf) {
  for (int i = 0; i < 23; i++) d->l[i] = (char) sf[i];
  for (int b = 0; b < 13; b++)
    for (int w = 0; w < 3; w++) d->s[b][w] = (char) sf[23 + b * 3 + w];
}

// inputs per channel: huff[2][576], nzb[2], params[2][24] (front-end layout),
// sf[2][62], frame[4]={ver,srIdx,sMode,modeExt}, sfjs[9]={intensity,slen[4],nr[4]}
// outputs: out[2][576], out_nzb[2], out_gb[2], cbi_out[2][6]
int ref_mp3_stage_dequant(void *h, const int32_t *huff, const int32_t *nzb, const int32_t *params,
                          const int32_t *sf, const int32_t *frame, const int32_t *sfjs_in, int32_t *out,
                          int32_t *out_nzb, int32_t *out_gb, int32_t *cbi_out) {
  MP3DecInfo *di = (MP3DecInfo *) h;
  fill_frame_header(di, frame);
  SideInfo *si = (SideInfo *) di->SideInfoPS;
  ScaleFactorInfo *sfi = (ScaleFactorInfo *) di->ScaleFactorInfoPS;
  HuffmanInfo *hi = (HuffmanInfo *) di->HuffmanInfoPS;
  for (int ch = 0; ch < di->nChans; ch++) {
    fill_sideinfo_sub(&si->sis[0][ch], params + ch * 24);
    fill_sf(&sfi->sfis[0][ch], sf + ch * 62);
    memcpy(hi->huffDecBuf[ch], huff + ch * 576, 576 * sizeof(int32_t));
    hi->nonZeroBound[ch] = nzb[ch];
  }
  sfi->sfjs.intensityScale = sfjs_in[0];
  for (int i = 0; i < 4; i++) {
    sfi->sfjs.slen[i] = sfjs_in[1 + i];
    sfi->sfjs.nr[i] = sfjs_in[5 + i];
  }
  int rc = Dequantize(di, 0);
  DequantInfo *dq = (DequantInfo *) di->DequantInfoPS;
  for (int ch = 0; ch < di->nChans; ch++) {
    memcpy(out + ch * 576, hi->huffDecBuf[ch], 576 * sizeof(int32_t));
    out_nzb[ch] = hi->nonZeroBound[ch];
    out_gb[ch] = hi->gb[ch];
    cbi_out[ch * 6 + 0] = dq->cbi[ch].cbType;
    cbi_out[ch * 6 + 1] = dq->cbi[ch].cbEndL;
    cbi_out[ch * 6 + 2] = dq->cbi[ch].cbEndS[0];
    cbi_out[ch * 6 + 3] = dq->cbi[ch].cbEndS[1];
    cbi_out[ch * 6 + 4] = dq->cbi[ch].cbEndS[2];
    cbi_out[ch * 6 + 5] = dq->cbi[ch].cbEndSMax;
  }
  return rc;
}

// IMDCT one granule, one channel.  state in/out: overBuf[288], prevType,
// prevWinSwitch, numPrevIMDCT, gb; input huff (post-dequant) + nzb.
int ref_mp3_stage_imdct(void *h, int ch_mode_ignored, const int32_t *huff, int32_t nzb, int32_t gb,
                        const int32_t *params, const int32_t *frame, int32_t *over, int32_t *prev_type,
                        int32_t *prev_win_switch, int32_t *num_prev, int32_t *out, int32_t *out_nzb,
                        int32_t *out_gb) {
  MP3DecInfo *di = (MP3DecInfo *) h;
  fill_frame_header(di, frame);
  SideInfo *si = (SideInfo *) di->SideInfoPS;
  HuffmanInfo *hi = (HuffmanInfo *) di->HuffmanInfoPS;
  IMDCTInfo *mi = (IMDCTInfo *) di->IMDCTInfoPS;
  fill_sideinfo_sub(&si->sis[0][0], params);
  memcpy(hi->huffDecBuf[0], huff, 576 * sizeof(int32_t));
  hi->nonZeroBound[0] = nzb;
  hi->gb[0] = gb;
  memcpy(mi->overBuf[0], over, 288 * sizeof(int32_t));
  mi->prevType[0] = *prev_type;
  mi->prevWinSwitch[0] = *prev_win_switch;
  mi->numPrevIMDCT[0] = *num_prev;
  int rc = IMDCT(di, 0, 0);
  memcpy(out, mi->outBuf[0], 18 * 32 * sizeof(int32_t));
  memcpy(over, mi->overBuf[0], 288 * sizeof(int32_t));
  *prev_type = mi->prevType[0];
  *prev_win_switch = mi->prevWinSwitch[0];
  *num_prev = mi->numPrevIMDCT[0];
  *out_nzb = hi->nonZeroBound[0];
  *out_gb = mi->gb[0];
  return rc;
}

// Subband synthesis for one granule (both channels).  state in/out:
// vbuf[2*1088], vindex.  input outBuf [2][18][32] + gb[2].
int ref_mp3_stage_subband(void *h, int nchans, const int32_t *outbuf, const int32_t *gb, int32_t *vbuf,
                          int32_t *vindex, int16_t *pcm) {
  MP3DecInfo *di = (MP3DecInfo *) h;
  di->nChans = nchans;
  IMDCTInfo *mi = (IMDCTInfo *) di->IMDCTInfoPS;
  SubbandInfo *sbi = (SubbandInfo *) di->SubbandInfoPS;
  memcpy(mi->outBuf, outbuf, 2 * 18 * 32 * sizeof(int32_t));
  mi->gb[0] = gb[0];
  mi->gb[1] = gb[1];
  memcpy(sbi->vbuf, vbuf, 2 * VBUF_LENGTH * sizeof(int32_t));
  sbi->vindex = *vindex;
  int rc = Subband(di, pcm);
  memcpy(vbuf, sbi->vbuf, 2 * VBUF_LENGTH * sizeof(int32_t));
  *vindex = sbi->vindex;
  return rc;
}

void ref_mp3_get_last_frame_info(void *h, int *info7) {
  helix_decoder::MP3FrameInfo fi;
  helix_decoder::MP3GetLastFrameInfo((helix_decoder::HMP3Decoder) h, &fi);
  info7[0] = fi.bitrate; info7[1] = fi.nChans; info7[2] = fi.samprate; info7[3] = fi.bitsPerSample;
  info7[4] = fi.outputSamps; info7[5] = fi.layer; info7[6] = fi.version;
}
int ref_mp3_get_next_frame_info(void *h, int *info7, const uint8_t *buf) {
  helix_decoder::MP3FrameInfo fi;
  int err = helix_decoder::MP3GetNextFrameInfo((helix_decoder::HMP3Decoder) h, &fi, buf);
  info7[0] = fi.bitrate; info7[1] = fi.nChans; info7[2] = fi.samprate; info7[3] = fi.bitsPerSample;
  info7[4] = fi.outputSamps; info7[5] = fi.layer; info7[6] = fi.version;
  return err;
}

}  // extern "C"
