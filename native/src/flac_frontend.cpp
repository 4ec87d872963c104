// FLAC bitstream front-end (host side) for esp-audio-libs-tpu.
//
// Fresh implementation of the serial half of FLAC decoding — stream/metadata
// header parsing, frame sync + header parse with CRC8, subframe headers,
// Rice/escape residual decoding, CRC16 — emitting dense per-frame tensors
// (residuals + predictor parameters) for the batched device back-end
// (esp_audio_libs_tpu/ops/lpc.py), which performs LPC restoration, stereo
// decorrelation, wasted-bits shifts and sample packing.
//
// Semantics mirror the reference decoder exactly (error codes, streaming
// resume protocol, byte accounting): see reference
// src/decode/flac/flac_decoder.cpp (SURVEY.md §3.1) — the split is ours, the
// behavior is the reference's.  CRC tables are generated at startup from the
// standard polynomials (CRC-8 poly 0x07, CRC-16 poly 0x8005).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------- result codes
// Values match the reference enum (include/flac_decoder.h:22-44).
enum Result : int32_t {
  OK = 0,
  NO_MORE_FRAMES = 1,
  HEADER_OUT_OF_DATA = 2,
  ERR_OUT_OF_DATA = 3,
  ERR_BAD_MAGIC_NUMBER = 4,
  ERR_SYNC_NOT_FOUND = 5,
  ERR_BAD_BLOCK_SIZE_CODE = 6,
  ERR_BAD_HEADER = 7,
  ERR_RESERVED_CHANNEL_ASSIGNMENT = 8,
  ERR_RESERVED_SUBFRAME_TYPE = 9,
  ERR_BAD_FIXED_PREDICTION_ORDER = 10,
  ERR_RESERVED_RESIDUAL_CODING_METHOD = 11,
  ERR_BLOCK_SIZE_NOT_DIVISIBLE_RICE = 12,
  ERR_MEMORY_ALLOCATION = 13,
  ERR_BLOCK_SIZE_OUT_OF_RANGE = 14,
  ERR_CRC_MISMATCH = 15,
  ERR_BAD_SAMPLE_DEPTH = 16,
};

// ------------------------------------------------------------------ CRC tables
struct CrcTables {
  uint8_t crc8[256];
  uint16_t crc16[256];
  CrcTables() {
    for (int i = 0; i < 256; ++i) {
      uint8_t c8 = (uint8_t) i;
      for (int b = 0; b < 8; ++b) c8 = (c8 & 0x80) ? (uint8_t) ((c8 << 1) ^ 0x07) : (uint8_t) (c8 << 1);
      crc8[i] = c8;
      uint16_t c16 = (uint16_t) (i << 8);
      for (int b = 0; b < 8; ++b) c16 = (c16 & 0x8000) ? (uint16_t) ((c16 << 1) ^ 0x8005) : (uint16_t) (c16 << 1);
      crc16[i] = c16;
    }
  }
};
static const CrcTables kCrc;

static uint8_t crc8(const uint8_t *data, size_t len) {
  uint8_t crc = 0;
  while (len--) crc = kCrc.crc8[crc ^ *data++];
  return crc;
}
static uint16_t crc16(const uint8_t *data, size_t len) {
  uint16_t crc = 0;
  while (len--) crc = kCrc.crc16[(crc >> 8) ^ *data++] ^ (uint16_t) (crc << 8);
  return crc;
}

// -------------------------------------------------------------- LPC bit math
// Overflow analysis deciding 32- vs 64-bit accumulators.  Same decision as
// reference src/decode/flac/flac_lpc.cpp:80-83 (the restored sample and the
// pre-shift prediction sum must both fit in int32), derived here from first
// principles: a worst-case sample magnitude of 2^(depth-1) times the sum of
// absolute coefficient values bounds the dot product; the restored sample
// adds the (ceil-shifted) prediction to a worst-case residual.

// Two's-complement width needed for a non-negative magnitude: value bits
// plus one sign bit.
static uint32_t signed_width(uint64_t v) {
  uint32_t w = 1;
  while (v) {
    ++w;
    v >>= 1;
  }
  return w;
}

static bool can_use_32bit_lpc(uint32_t depth, const int32_t *coefs, uint32_t order, int shift) {
  uint32_t s = shift > 0 ? (uint32_t) shift : 0;
  uint64_t peak = (uint64_t) 1 << (depth - 1);
  uint64_t coef_sum = 0;
  for (uint32_t i = 0; i < order; ++i)
    coef_sum += (uint64_t) (coefs[i] < 0 ? -(int64_t) coefs[i] : (int64_t) coefs[i]);
  uint64_t sum_full = peak * coef_sum;                               // before >> shift
  uint64_t sum_shifted = (sum_full + (((uint64_t) 1 << s) - 1)) >> s;  // ceil(x / 2^s)
  return signed_width(sum_full) <= 32 && signed_width(peak + sum_shifted) <= 32;
}

// ------------------------------------------------------------------- decoder
struct FlacFrontend {
  // --- input window (per read_header/parse_frame call) ---
  const uint8_t *buffer = nullptr;
  size_t buffer_index = 0;
  int64_t bytes_left = 0;
  uint64_t look = 0;      // pending bits, left-justified (next bit = bit 63)
  uint32_t navail = 0;    // count of valid lookahead bits
  bool out_of_data = false;

  // --- STREAMINFO ---
  uint32_t min_block_size = 0, max_block_size = 0;
  uint32_t sample_rate = 0, num_channels = 0, sample_depth = 0;
  uint64_t num_samples = 0;
  uint8_t md5[16] = {0};

  // --- partial header resume state ---
  bool partial_header_read = false;
  bool partial_header_last = false;
  uint32_t partial_header_type = 0;
  uint32_t partial_header_length = 0;
  uint32_t partial_header_bytes_read = 0;
  std::vector<uint8_t> partial_header_data;
  // stored metadata blocks: (type, data)
  std::vector<std::pair<uint32_t, std::vector<uint8_t>>> metadata;
  // per-type size limits (defaults: include/flac_decoder.h:62-69)
  uint32_t max_sizes[8] = {0, 0, 0, 0, 2048, 0, 0, 0};  // [7] = unknown

  bool enable_crc_check = true;
  size_t frame_start_index = 0;
  uint32_t curr_block_size = 0, curr_channel_assign = 0, curr_sample_depth = 0;

  // ------------------------------------------------------------- bit reader
  // 64-bit MSB-first cursor.  The pending bits of the stream sit
  // LEFT-JUSTIFIED in `look` (the very next stream bit is bit 63) and
  // `navail` counts how many of them are valid.  `prime()` tops the
  // lookahead up a byte at a time, so `navail % 8` is invariant across
  // refills and whole unread bytes can always be handed back to the caller
  // (`reset_bit_buffer`), preserving the reference's byte-accounting
  // contract (flac_decoder.cpp:911-1047 — same observable protocol,
  // different machine).  Rice unary runs are consumed in bulk via
  // count-leading-zeros instead of bit-at-a-time.
  void reset_bit_buffer() {
    buffer_index -= navail / 8;
    bytes_left += navail / 8;
    navail = 0;
    look = 0;
  }

  // In header mode, a refill pulls at most 4 bytes.  The reference's
  // streaming-resume protocol leaks its refill granularity through
  // get_bytes_index() when a metadata region runs dry (HEADER_OUT_OF_DATA
  // hands back whole *unconsumed* buffered bytes) — matching the observable
  // resume positions requires matching that granularity in the header
  // region.  Frame parsing has byte-exact accounting only at frame
  // boundaries, so it uses the full 64-bit lookahead.
  bool header_mode = false;

  void prime() {
    if (header_mode) {
      for (int n = 0; n < 4 && bytes_left > 0; ++n) {
        look |= (uint64_t) buffer[buffer_index++] << (56 - navail);
        --bytes_left;
        navail += 8;
      }
      return;
    }
    // Frame mode bulk refill: one unaligned 8-byte big-endian load replaces
    // up to 8 dependent byte loads — same observable state as the byte loop
    // (whole bytes only, navail%8 invariant preserved).  This is the refill
    // under the Rice hot loop; the reference refills 32 bits byte-at-a-time
    // (flac_decoder.cpp:1035-1047).
    if (bytes_left >= 8) {
      uint32_t nbytes = (64 - navail) >> 3;
      if (nbytes) {
        uint64_t chunk;
        std::memcpy(&chunk, buffer + buffer_index, 8);
        chunk = __builtin_bswap64(chunk);
        // keep only the top nbytes*8 bits, append below the pending bits
        chunk = (chunk >> (64 - nbytes * 8)) << (64 - nbytes * 8);
        look |= chunk >> navail;
        buffer_index += nbytes;
        bytes_left -= nbytes;
        navail += nbytes * 8;
      }
      return;
    }
    while (navail <= 56 && bytes_left > 0) {
      look |= (uint64_t) buffer[buffer_index++] << (56 - navail);
      --bytes_left;
      navail += 8;
    }
  }

  uint32_t read_uint(uint32_t num_bits) {
    if (num_bits == 0) return 0;
    if (navail < num_bits) {
      prime();
      if (navail < num_bits) {  // stream exhausted: fail without consuming
        out_of_data = true;
        return 0;
      }
    }
    uint32_t v = (uint32_t) (look >> (64 - num_bits));
    look <<= num_bits;
    navail -= num_bits;
    return v;
  }

  int32_t read_sint(uint32_t num_bits) {
    // Up to 33 bits (32-bit depth + one stereo side bit); result truncates
    // to int32 exactly as the reference's sample pipeline does.
    if (num_bits == 0) return 0;
    if (navail < num_bits) {
      prime();
      if (navail < num_bits) {
        out_of_data = true;
        return 0;
      }
    }
    uint64_t u = num_bits ? look >> (64 - num_bits) : 0;
    look <<= num_bits;
    navail -= num_bits;
    int64_t sign = (int64_t) 1 << (num_bits - 1);
    return (int32_t) (((int64_t) u ^ sign) - sign);
  }

  int32_t read_rice_sint(uint32_t param) {
    // Unary quotient: eat whole runs of zero bits with clz, refilling
    // between runs; then the binary remainder; then zigzag.
    uint32_t q = 0;
    for (;;) {
      if (navail == 0) {
        prime();
        if (navail == 0) {
          out_of_data = true;
          return 0;
        }
      }
      uint32_t lz = look ? (uint32_t) __builtin_clzll(look) : 64;
      if (lz >= navail) {  // every valid bit is zero — consume and refill
        q += navail;
        look = 0;
        navail = 0;
        continue;
      }
      q += lz;  // zeros, then the terminating one-bit
      look = lz >= 63 ? 0 : look << (lz + 1);  // lz+1 may be 64: full drain
      navail -= lz + 1;
      break;
    }
    uint32_t r = read_uint(param);
    uint32_t zz = (q << param) | r;
    return (int32_t) ((zz >> 1) ^ (uint32_t) (-(int32_t) (zz & 1)));
  }

  // Bulk Rice partition decode: the e2e host-leg hot loop (VERDICT r4 #3).
  // Per symbol the fast path is one refill check, one clz and one shift
  // chain — no per-symbol function calls, no separate remainder read.  The
  // slow path (long unary runs, stream tail, out-of-data) falls back to
  // read_rice_sint, which preserves the exact streaming/accounting
  // semantics.  Reference hot loop: flac_decoder.cpp:1018-1047 (bit-at-a-
  // time unary + 32-bit refills); same zigzag/wrap arithmetic, bulk form.
  void read_rice_block(int32_t *p, uint32_t n, uint32_t param) {
    for (uint32_t j = 0; j < n; ++j) {
      if (navail < 48) prime();
      uint32_t lz = look ? (uint32_t) __builtin_clzll(look) : 64;
      uint32_t need = lz + 1 + param;
      if (need <= navail && lz < 48) {
        uint64_t t = look << (lz + 1);           // lz+1 <= 49: defined
        uint32_t r = param ? (uint32_t) (t >> (64 - param)) : 0;
        look = t << param;
        navail -= need;
        uint32_t zz = (lz << param) | r;         // uint32 wrap == reference
        p[j] = (int32_t) ((zz >> 1) ^ (uint32_t) (-(int32_t) (zz & 1)));
      } else {
        p[j] = read_rice_sint(param);
        if (out_of_data) return;
      }
    }
  }

  uint32_t read_aligned_byte() { return read_uint(8); }

  void align_to_byte() {
    uint32_t drop = navail < 8 ? navail : navail % 8;
    look <<= drop;
    navail -= drop;
  }

  // ------------------------------------------------------------ read_header
  // Mirrors reference flac_decoder.cpp:35-176.
  int32_t read_header(const uint8_t *buf, size_t len) {
    int32_t rc = read_header_inner(buf, len);
    header_mode = false;
    return rc;
  }

  int32_t read_header_inner(const uint8_t *buf, size_t len) {
    buffer = buf;
    buffer_index = 0;
    bytes_left = (int64_t) len;
    look = 0;
    navail = 0;
    out_of_data = (len == 0);
    header_mode = true;

    if (!partial_header_read) {
      metadata.clear();
      partial_header_data.clear();
      if (read_uint(32) != 0x664C6143u) return ERR_BAD_MAGIC_NUMBER;  // 'fLaC'
    }

    while (!partial_header_last || partial_header_length > 0) {
      if (bytes_left == 0) {
        partial_header_read = true;
        reset_bit_buffer();
        return HEADER_OUT_OF_DATA;
      }
      if (partial_header_length == 0) {
        partial_header_last = read_uint(1) != 0;
        partial_header_type = read_uint(7);
        partial_header_length = read_uint(24);
        partial_header_bytes_read = 0;
        partial_header_data.clear();
      }

      bool should_skip = false;
      if (partial_header_type != 0) {  // not STREAMINFO
        uint32_t max_size = max_sizes[partial_header_type <= 6 ? partial_header_type : 7];
        if (partial_header_length > max_size) should_skip = true;
      }

      if (partial_header_type == 0) {  // STREAMINFO
        min_block_size = read_uint(16);
        max_block_size = read_uint(16);
        read_uint(24);  // min frame size
        read_uint(24);  // max frame size
        sample_rate = read_uint(20);
        num_channels = read_uint(3) + 1;
        sample_depth = read_uint(5) + 1;
        uint64_t hi = read_uint(4), lo = read_uint(32);
        num_samples = (hi << 32) | lo;
        for (int i = 0; i < 16; ++i) md5[i] = (uint8_t) read_uint(8);
        partial_header_length = 0;
        partial_header_bytes_read = 0;
      } else if (should_skip) {
        uint32_t n = std::min<uint32_t>(partial_header_length - partial_header_bytes_read, (uint32_t) bytes_left);
        for (uint32_t i = 0; i < n; ++i) {
          read_uint(8);
          partial_header_bytes_read++;
        }
        if (partial_header_bytes_read == partial_header_length) {
          partial_header_length = 0;
          partial_header_bytes_read = 0;
          partial_header_data.clear();
        }
      } else {
        uint32_t n = std::min<uint32_t>(partial_header_length - partial_header_bytes_read, (uint32_t) bytes_left);
        partial_header_data.reserve(partial_header_length);
        for (uint32_t i = 0; i < n; ++i) {
          partial_header_data.push_back((uint8_t) read_uint(8));
          partial_header_bytes_read++;
        }
        if (partial_header_bytes_read == partial_header_length) {
          metadata.emplace_back(partial_header_type, std::move(partial_header_data));
          partial_header_data.clear();
          partial_header_length = 0;
          partial_header_bytes_read = 0;
        }
      }
    }

    if (sample_rate == 0 || num_channels == 0 || sample_depth == 0 || max_block_size == 0) return ERR_BAD_HEADER;
    if (min_block_size < 16 || min_block_size > max_block_size || max_block_size > 65535) return ERR_BAD_HEADER;
    reset_bit_buffer();
    return OK;
  }

  // -------------------------------------------------------- frame front-end
  // find_frame_sync mirrors reference flac_decoder.cpp:431-468.
  int32_t find_frame_sync(uint8_t &s0, uint8_t &s1) {
    frame_start_index = 0;
    s0 = s1 = 0;
    bool second_ff = false;
    uint32_t byte;
    align_to_byte();
    while (true) {
      if (second_ff) {
        byte = 0xff;
        second_ff = false;
      } else {
        byte = read_aligned_byte();
        ++frame_start_index;
      }
      if (byte == 0xff) {
        byte = read_aligned_byte();
        ++frame_start_index;
        if (byte == 0xff) {
          second_ff = true;
        } else if (byte >> 1 == 0x7c) {
          s0 = 0xff;
          s1 = (uint8_t) byte;
          frame_start_index -= 2;
          return OK;
        }
      } else if (out_of_data) {
        return ERR_SYNC_NOT_FOUND;
      }
    }
  }

  // decode_frame_header mirrors reference flac_decoder.cpp:470-662.
  int32_t decode_frame_header() {
    uint8_t raw[16];
    uint32_t raw_len = 0;
    uint8_t s0, s1;
    if (find_frame_sync(s0, s1) != OK) return ERR_SYNC_NOT_FOUND;
    raw[raw_len++] = s0;
    raw[raw_len++] = s1;
    if (raw[1] & 0x02) return ERR_BAD_MAGIC_NUMBER;

    uint32_t nb = read_aligned_byte();
    if (nb == 0xff) return ERR_SYNC_NOT_FOUND;
    raw[raw_len++] = (uint8_t) nb;

    uint8_t bs_code = raw[2] >> 4;
    if (bs_code == 0) return ERR_BAD_BLOCK_SIZE_CODE;
    else if (bs_code == 1) curr_block_size = 192;
    else if (bs_code >= 2 && bs_code <= 5) curr_block_size = 576u << (bs_code - 2);
    else if (bs_code == 6 || bs_code == 7) { /* parsed later */ }
    else curr_block_size = 256u << (bs_code - 8);

    uint8_t sr_code = raw[2] & 0x0f;

    nb = read_aligned_byte();
    if (nb == 0xff) return ERR_SYNC_NOT_FOUND;
    raw[raw_len++] = (uint8_t) nb;
    curr_channel_assign = raw[3] >> 4;

    uint8_t bps_code = (raw[3] & 0x0e) >> 1;
    switch (bps_code) {
      case 0: curr_sample_depth = sample_depth; break;
      case 1: curr_sample_depth = 8; break;
      case 2: curr_sample_depth = 12; break;
      case 3: return ERR_BAD_SAMPLE_DEPTH;
      case 4: curr_sample_depth = 16; break;
      case 5: curr_sample_depth = 20; break;
      case 6: curr_sample_depth = 24; break;
      case 7: curr_sample_depth = 32; break;
      default: return ERR_BAD_SAMPLE_DEPTH;
    }

    // coded number (UTF-8-like), skipped
    uint32_t next = read_aligned_byte();
    raw[raw_len++] = (uint8_t) next;
    while (next >= 0xC0) {
      uint8_t b = (uint8_t) read_aligned_byte();
      raw[raw_len++] = b;
      next = (next << 1) & 0xFF;
    }

    if (bs_code == 6) {
      uint8_t b = (uint8_t) read_aligned_byte();
      raw[raw_len++] = b;
      curr_block_size = (uint32_t) b + 1;
    } else if (bs_code == 7) {
      uint8_t b1 = (uint8_t) read_aligned_byte();
      raw[raw_len++] = b1;
      curr_block_size = (uint32_t) b1 << 8;
      uint8_t b2 = (uint8_t) read_aligned_byte();
      raw[raw_len++] = b2;
      curr_block_size |= b2;
      curr_block_size += 1;
    }

    uint32_t frame_rate = 0;
    if (sr_code == 12) {
      uint8_t b = (uint8_t) read_aligned_byte();
      raw[raw_len++] = b;
      frame_rate = (uint32_t) b * 1000;
    } else if (sr_code == 13 || sr_code == 14) {
      uint8_t b1 = (uint8_t) read_aligned_byte();
      raw[raw_len++] = b1;
      uint8_t b2 = (uint8_t) read_aligned_byte();
      raw[raw_len++] = b2;
      frame_rate = ((uint32_t) b1 << 8) | b2;
      if (sr_code == 14) frame_rate *= 10;
    } else if (sr_code == 0) {
      frame_rate = sample_rate;
    } else {
      static const uint32_t rates[] = {88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000, 44100, 48000, 96000};
      if (sr_code >= 1 && sr_code <= 11) frame_rate = rates[sr_code - 1];
      else return ERR_BAD_HEADER;
    }

    if (out_of_data) return ERR_OUT_OF_DATA;

    uint8_t crc_read = (uint8_t) read_aligned_byte();
    if (enable_crc_check) {
      if (crc8(raw, raw_len) != crc_read) return ERR_CRC_MISMATCH;
    }

    uint32_t frame_channels;
    if (curr_channel_assign <= 7) frame_channels = curr_channel_assign + 1;
    else if (curr_channel_assign <= 10) frame_channels = 2;
    else frame_channels = num_channels;
    if (frame_channels != num_channels) return ERR_BAD_HEADER;
    if (bps_code != 0 && curr_sample_depth != sample_depth) return ERR_BAD_HEADER;
    if (frame_rate != sample_rate) return ERR_BAD_HEADER;
    return OK;
  }

  // decode_residuals mirrors reference flac_decoder.cpp:842-905.
  int32_t decode_residuals(int32_t *out, uint32_t warm_up, uint32_t block_size) {
    uint32_t method = read_uint(2);
    if (method >= 2) return ERR_RESERVED_RESIDUAL_CODING_METHOD;
    uint32_t param_bits = method == 1 ? 5 : 4;
    uint32_t escape = method == 1 ? 0x1F : 0xF;

    uint32_t partition_order = read_uint(4);
    uint32_t num_partitions = 1u << partition_order;
    if (block_size % num_partitions) return ERR_BLOCK_SIZE_NOT_DIVISIBLE_RICE;
    // HARDENING DIVERGENCE: the reference computes the first partition's
    // count as unsigned (block_size>>po) - warm_up with no bound
    // (flac_decoder.cpp:865) — when the predictor order exceeds the
    // partition size the subtraction wraps and the write loop runs ~2^32
    // iterations (heap corruption). A valid stream always has
    // warm_up <= block_size >> partition_order; reject otherwise.
    if (warm_up > (block_size >> partition_order)) return ERR_BLOCK_SIZE_NOT_DIVISIBLE_RICE;

    int32_t *p = out + warm_up;
    uint32_t count0 = (block_size >> partition_order) - warm_up;
    uint32_t count = block_size >> partition_order;
    for (uint32_t part = 0; part < num_partitions; ++part) {
      uint32_t n = part == 0 ? count0 : count;
      uint32_t param = read_uint(param_bits);
      if (param < escape) {
        read_rice_block(p, n, param);
        p += n;
      } else {
        uint32_t num_bits = read_uint(5);
        if (num_bits == 0) {
          std::memset(p, 0, n * sizeof(int32_t));
          p += n;
        } else {
          for (uint32_t j = 0; j < n; ++j) *p++ = read_sint(num_bits);
        }
      }
    }
    return OK;
  }

  // One subframe -> residual buffer + params.  Mirrors reference
  // decode_subframe (flac_decoder.cpp:714-772) and the fixed/LPC headers
  // (:774-840), but leaves prediction restoration to the device.
  int32_t parse_subframe(uint32_t block_size, uint32_t depth, int32_t *data, int32_t *order, int32_t *shift,
                         int32_t *wasted, int32_t *use64, int32_t *coeffs /*32*/) {
    read_uint(1);
    uint32_t type = read_uint(6);
    uint32_t w = read_uint(1);
    if (w == 1) {
      while (read_uint(1) == 0) {
        w += 1;
        if (out_of_data) return ERR_OUT_OF_DATA;
      }
    }
    depth -= w;

    *order = 0;
    *shift = 0;
    *wasted = 0;
    *use64 = 0;
    std::memset(coeffs, 0, 32 * sizeof(int32_t));

    if (type == 0) {  // constant: expand on host (shift applied like reference)
      // shift via uint32: << on negative int is UB pre-C++20 (same bits)
      int32_t value = (int32_t) ((uint32_t) read_sint(depth) << w);
      for (uint32_t i = 0; i < block_size; ++i) data[i] = value;
    } else if (type == 1) {  // verbatim
      for (uint32_t i = 0; i < block_size; ++i) data[i] = (int32_t) ((uint32_t) read_sint(depth) << w);
    } else if (type >= 8 && type <= 12) {  // fixed prediction
      uint32_t pre_order = type - 8;
      if (pre_order > 4) return ERR_BAD_FIXED_PREDICTION_ORDER;
      static const int32_t kFixed[5][4] = {{}, {1}, {-1, 2}, {1, -3, 3}, {-1, 4, -6, 4}};
      for (uint32_t i = 0; i < pre_order; ++i) data[i] = read_sint(depth);
      int32_t rc = decode_residuals(data, pre_order, block_size);
      if (rc != OK) return rc;
      *order = (int32_t) pre_order;
      *wasted = (int32_t) w;
      for (uint32_t i = 0; i < pre_order; ++i) coeffs[i] = kFixed[pre_order][i];
      *use64 = can_use_32bit_lpc(depth, coeffs, pre_order, 0) ? 0 : 1;
    } else if (type >= 32 && type <= 63) {  // LPC
      uint32_t lpc_order = type - 31;
      // HARDENING DIVERGENCE: the reference reads `order` warm-up samples
      // unchecked; with block_size (and the output row) smaller than the
      // order this overruns the buffer. More warm-ups than samples is an
      // invalid stream.
      if (lpc_order > block_size) return ERR_BAD_HEADER;
      for (uint32_t i = 0; i < lpc_order; ++i) data[i] = read_sint(depth);
      uint32_t precision = read_uint(4) + 1;
      int32_t sh = read_sint(5);
      for (uint32_t i = 0; i < lpc_order; ++i) coeffs[lpc_order - i - 1] = read_sint(precision);
      int32_t rc = decode_residuals(data, lpc_order, block_size);
      if (rc != OK) return rc;
      *order = (int32_t) lpc_order;
      *shift = sh;
      *wasted = (int32_t) w;
      *use64 = can_use_32bit_lpc(depth, coeffs, lpc_order, sh) ? 0 : 1;
    } else {
      return ERR_RESERVED_SUBFRAME_TYPE;
    }
    return OK;
  }

  // Parse one frame. data: [max_channels, max_block] row-major int32 out.
  // params (per channel): order, shift, wasted, use64 (arrays of size C),
  // coeffs [C, 32].  Mirrors decode_frame (flac_decoder.cpp:185-278) minus
  // the numeric restoration/packing, which the device performs.
  int32_t parse_frame(const uint8_t *buf, size_t len, int32_t *data, size_t data_stride, int32_t *order,
                      int32_t *shift, int32_t *wasted, int32_t *use64, int32_t *coeffs, int32_t *block_size_out,
                      int32_t *chan_assign_out, int32_t *depth_out, int32_t *crc_ok_out) {
    buffer = buf;
    buffer_index = 0;
    bytes_left = (int64_t) len;
    out_of_data = false;
    *crc_ok_out = 1;

    if (bytes_left == 0) return NO_MORE_FRAMES;

    int32_t rc = decode_frame_header();
    if (rc != OK) {
      reset_bit_buffer();
      return rc;
    }
    if (curr_block_size > max_block_size) return ERR_BLOCK_SIZE_OUT_OF_RANGE;

    uint32_t bs = curr_block_size;
    uint32_t ca = curr_channel_assign;
    uint32_t depth = curr_sample_depth;

    if (ca <= 7) {
      for (uint32_t c = 0; c <= ca; ++c) {
        rc = parse_subframe(bs, depth, data + c * data_stride, order + c, shift + c, wasted + c, use64 + c,
                            coeffs + c * 32);
        if (rc != OK) return rc;
      }
    } else if (ca <= 10) {
      // stereo decorrelation modes: side channel gets +1 bit
      rc = parse_subframe(bs, depth + (ca == 9 ? 1 : 0), data, order, shift, wasted, use64, coeffs);
      if (rc != OK) return rc;
      rc = parse_subframe(bs, depth + (ca == 9 ? 0 : 1), data + data_stride, order + 1, shift + 1, wasted + 1,
                          use64 + 1, coeffs + 32);
      if (rc != OK) return rc;
    } else {
      return ERR_RESERVED_CHANNEL_ASSIGNMENT;
    }

    align_to_byte();
    if (navail / 8 + bytes_left < 2) {
      reset_bit_buffer();
      return ERR_OUT_OF_DATA;
    }
    size_t frame_end_index = buffer_index - navail / 8;
    uint16_t crc_read = (uint16_t) read_uint(16);
    if (enable_crc_check && frame_end_index > frame_start_index) {
      uint16_t calc = crc16(buf + frame_start_index, frame_end_index - frame_start_index);
      if (calc != crc_read) {
        *crc_ok_out = 0;
        return ERR_CRC_MISMATCH;
      }
    }

    *block_size_out = (int32_t) bs;
    *chan_assign_out = (int32_t) ca;
    *depth_out = (int32_t) depth;
    reset_bit_buffer();
    return OK;
  }
};

}  // namespace

// ------------------------------------------------------------------ C ABI
extern "C" {

void *eal_flac_create() { return new FlacFrontend(); }
void eal_flac_destroy(void *d) { delete (FlacFrontend *) d; }

int32_t eal_flac_read_header(void *d, const uint8_t *buf, size_t len) {
  return ((FlacFrontend *) d)->read_header(buf, len);
}

void eal_flac_set_max_metadata_size(void *d, int32_t type, uint32_t max_size) {
  FlacFrontend *f = (FlacFrontend *) d;
  f->max_sizes[(type >= 1 && type <= 6) ? type : 7] = max_size;
}
void eal_flac_set_crc_check(void *d, int32_t enabled) { ((FlacFrontend *) d)->enable_crc_check = enabled != 0; }

uint32_t eal_flac_sample_rate(void *d) { return ((FlacFrontend *) d)->sample_rate; }
uint32_t eal_flac_num_channels(void *d) { return ((FlacFrontend *) d)->num_channels; }
uint32_t eal_flac_sample_depth(void *d) { return ((FlacFrontend *) d)->sample_depth; }
uint32_t eal_flac_min_block_size(void *d) { return ((FlacFrontend *) d)->min_block_size; }
uint32_t eal_flac_max_block_size(void *d) { return ((FlacFrontend *) d)->max_block_size; }
uint64_t eal_flac_num_samples(void *d) { return ((FlacFrontend *) d)->num_samples; }
void eal_flac_md5(void *d, uint8_t *out16) { std::memcpy(out16, ((FlacFrontend *) d)->md5, 16); }
size_t eal_flac_bytes_index(void *d) { return ((FlacFrontend *) d)->buffer_index; }
int32_t eal_flac_num_metadata(void *d) { return (int32_t) ((FlacFrontend *) d)->metadata.size(); }
int32_t eal_flac_metadata_info(void *d, int32_t i, int32_t *type, int32_t *length) {
  FlacFrontend *f = (FlacFrontend *) d;
  if (i < 0 || (size_t) i >= f->metadata.size()) return -1;
  *type = (int32_t) f->metadata[i].first;
  *length = (int32_t) f->metadata[i].second.size();
  return 0;
}
int32_t eal_flac_metadata_data(void *d, int32_t i, uint8_t *out) {
  FlacFrontend *f = (FlacFrontend *) d;
  if (i < 0 || (size_t) i >= f->metadata.size()) return -1;
  std::memcpy(out, f->metadata[i].second.data(), f->metadata[i].second.size());
  return 0;
}

int32_t eal_flac_parse_frame(void *d, const uint8_t *buf, size_t len, int32_t *data, size_t data_stride,
                             int32_t *order, int32_t *shift, int32_t *wasted, int32_t *use64, int32_t *coeffs,
                             int32_t *block_size, int32_t *chan_assign, int32_t *depth, int32_t *crc_ok) {
  return ((FlacFrontend *) d)->parse_frame(buf, len, data, data_stride, order, shift, wasted, use64, coeffs,
                                           block_size, chan_assign, depth, crc_ok);
}

// Parse every frame of a stream section in ONE call (the serving front-end:
// SURVEY.md §7 hard part (d) — at fleet batch sizes the per-frame
// Python<->C crossing, not the bit parsing, dominates the host leg).
// Frames append into caller-provided batch arrays shared across the whole
// fleet, so Python does no per-frame work at all:
//   data16 / data32: [*, nch, frame_cap] appended at *slot16/*slot32 —
//     each frame lands in data16 when all its residual/warmup words fit
//     int16 (the dominant case for real audio; halves the device upload),
//     else in data32.  wide[f] says which array, slot[f] the row.
//   order/shift/wasted/use64: [max_frames, nch]; coeffs [max_frames, nch, 32]
//   bs/ca/depth/crc_ok/consumed: [max_frames]
// Returns the number of frames appended; *last_rc holds the result that
// ended the stream (NO_MORE_FRAMES for clean exhaustion, the error code
// otherwise — same per-frame codes as eal_flac_parse_frame).  Stops early
// when max_frames is reached (caller grows its arrays and continues from
// the consumed-bytes position).
int32_t eal_flac_parse_stream(void *d, const uint8_t *buf, size_t len, int32_t max_frames, int32_t frame_cap,
                              int8_t *data8, int16_t *data16, int32_t *data32, int32_t *slot8, int32_t *slot16,
                              int32_t *slot32, int32_t *wide,
                              int32_t *slot, int32_t *order, int32_t *shift, int32_t *wasted, int32_t *use64,
                              int32_t *coeffs, int32_t *bs, int32_t *ca, int32_t *depth, int32_t *crc_ok,
                              int32_t *consumed, int32_t *last_rc) {
  FlacFrontend *fe = (FlacFrontend *) d;
  const int32_t nch = (int32_t) fe->num_channels;
  static thread_local std::vector<int32_t> scratch;
  scratch.resize((size_t) nch * frame_cap);

  size_t pos = 0;
  int32_t nf = 0;
  *last_rc = OK;
  while (pos < len && nf < max_frames) {
    int32_t *fr_order = order + (size_t) nf * nch;
    int32_t *fr_shift = shift + (size_t) nf * nch;
    int32_t *fr_wasted = wasted + (size_t) nf * nch;
    int32_t *fr_use64 = use64 + (size_t) nf * nch;
    int32_t rc = fe->parse_frame(buf + pos, len - pos, scratch.data(), frame_cap, fr_order, fr_shift, fr_wasted,
                                 fr_use64, coeffs + (size_t) nf * nch * 32, bs + nf, ca + nf, depth + nf,
                                 crc_ok + nf);
    consumed[nf] = (int32_t) fe->buffer_index;
    if (rc != OK) {
      *last_rc = rc;
      return nf;
    }
    const int32_t fbs = bs[nf];
    // narrowest width the frame's warmup+residual words fit: int8 covers
    // most well-predicted real audio (residual std is tens of LSBs), int16
    // nearly everything else — each step halves the device upload
    int32_t mn = 0, mx = 0;
    for (int32_t c = 0; c < nch; c++) {
      const int32_t *row = scratch.data() + (size_t) c * frame_cap;
      for (int32_t i = 0; i < fbs; i++) {
        if (row[i] < mn) mn = row[i];
        if (row[i] > mx) mx = row[i];
      }
    }
    if (mn >= -128 && mx <= 127) {
      int8_t *dst = data8 + (size_t) (*slot8) * nch * frame_cap;
      for (int32_t c = 0; c < nch; c++) {
        const int32_t *src = scratch.data() + (size_t) c * frame_cap;
        int8_t *row = dst + (size_t) c * frame_cap;
        for (int32_t i = 0; i < fbs; i++) row[i] = (int8_t) src[i];
      }
      wide[nf] = 0;
      slot[nf] = (*slot8)++;
    } else if (mn >= -32768 && mx <= 32767) {
      int16_t *dst = data16 + (size_t) (*slot16) * nch * frame_cap;
      for (int32_t c = 0; c < nch; c++) {
        const int32_t *src = scratch.data() + (size_t) c * frame_cap;
        int16_t *row = dst + (size_t) c * frame_cap;
        for (int32_t i = 0; i < fbs; i++) row[i] = (int16_t) src[i];
      }
      wide[nf] = 1;
      slot[nf] = (*slot16)++;
    } else {
      std::memcpy(data32 + (size_t) (*slot32) * nch * frame_cap, scratch.data(),
                  (size_t) nch * frame_cap * sizeof(int32_t));
      wide[nf] = 2;
      slot[nf] = (*slot32)++;
    }
    pos += fe->buffer_index;
    nf++;
  }
  return nf;
}

// ---------------------------------------------------------------- checkpoint
// Serializable decoder state (SURVEY.md §5 checkpoint/resume: the reference
// keeps streaming resume state in memory only; here it's exportable so a
// serving layer can migrate streams across workers). The transient input
// pointer is excluded — it is re-established on the next call.

struct FlacStateHeader {
  uint32_t magic;          // 'EALF'
  uint32_t version;
  uint32_t scalars[32];    // fixed-size scalar snapshot (see save)
  uint64_t num_samples;
  uint8_t md5[16];
  uint32_t ph_len;
  uint32_t n_meta;
};

static const uint32_t EAL_FLAC_STATE_MAGIC = 0x45414C46u;

size_t eal_flac_state_size(void *d) {
  FlacFrontend *f = (FlacFrontend *) d;
  size_t n = sizeof(FlacStateHeader) + f->partial_header_data.size();
  for (auto &m : f->metadata) n += 8 + m.second.size();
  return n;
}

int eal_flac_state_save(void *d, uint8_t *out, size_t cap) {
  FlacFrontend *f = (FlacFrontend *) d;
  if (cap < eal_flac_state_size(d)) return -1;
  FlacStateHeader h = {};
  h.magic = EAL_FLAC_STATE_MAGIC;
  h.version = 1;
  uint32_t *s = h.scalars;
  s[0] = f->min_block_size; s[1] = f->max_block_size;
  s[2] = f->sample_rate; s[3] = f->num_channels; s[4] = f->sample_depth;
  s[5] = f->partial_header_read; s[6] = f->partial_header_last;
  s[7] = f->partial_header_type; s[8] = f->partial_header_length;
  s[9] = f->partial_header_bytes_read;
  for (int i = 0; i < 8; i++) s[10 + i] = f->max_sizes[i];
  s[18] = f->enable_crc_check;
  s[19] = (uint32_t) f->frame_start_index;
  s[20] = f->curr_block_size; s[21] = f->curr_channel_assign;
  s[22] = f->curr_sample_depth;
  s[23] = (uint32_t) f->buffer_index;
  h.num_samples = f->num_samples;
  std::memcpy(h.md5, f->md5, 16);
  h.ph_len = (uint32_t) f->partial_header_data.size();
  h.n_meta = (uint32_t) f->metadata.size();
  uint8_t *p = out;
  std::memcpy(p, &h, sizeof h); p += sizeof h;
  if (h.ph_len) {  // empty vector's data() may be null: UB to pass to memcpy
    std::memcpy(p, f->partial_header_data.data(), h.ph_len);
    p += h.ph_len;
  }
  for (auto &m : f->metadata) {
    uint32_t t = m.first, len = (uint32_t) m.second.size();
    std::memcpy(p, &t, 4); p += 4;
    std::memcpy(p, &len, 4); p += 4;
    if (len) { std::memcpy(p, m.second.data(), len); p += len; }
  }
  return 0;
}

int eal_flac_state_load(void *d, const uint8_t *data, size_t len) {
  FlacFrontend *f = (FlacFrontend *) d;
  if (len < sizeof(FlacStateHeader)) return -1;
  FlacStateHeader h;
  std::memcpy(&h, data, sizeof h);
  if (h.magic != EAL_FLAC_STATE_MAGIC || h.version != 1) return -1;
  const uint32_t *s = h.scalars;
  f->buffer = nullptr;          // transient; re-set by the next call
  f->bytes_left = 0;
  f->look = 0;
  f->navail = 0;
  f->out_of_data = false;
  f->min_block_size = s[0]; f->max_block_size = s[1];
  f->sample_rate = s[2]; f->num_channels = s[3]; f->sample_depth = s[4];
  f->partial_header_read = s[5]; f->partial_header_last = s[6];
  f->partial_header_type = s[7]; f->partial_header_length = s[8];
  f->partial_header_bytes_read = s[9];
  for (int i = 0; i < 8; i++) f->max_sizes[i] = s[10 + i];
  f->enable_crc_check = s[18];
  f->frame_start_index = s[19];
  f->curr_block_size = s[20]; f->curr_channel_assign = s[21];
  f->curr_sample_depth = s[22];
  f->buffer_index = s[23];
  f->num_samples = h.num_samples;
  std::memcpy(f->md5, h.md5, 16);
  const uint8_t *p = data + sizeof h;
  if (sizeof h + h.ph_len > len) return -1;
  f->partial_header_data.assign(p, p + h.ph_len); p += h.ph_len;
  f->metadata.clear();
  for (uint32_t i = 0; i < h.n_meta; i++) {
    uint32_t t, l;
    if ((size_t) (p - data) + 8 > len) return -1;
    std::memcpy(&t, p, 4); p += 4;
    std::memcpy(&l, p, 4); p += 4;
    if ((size_t) (p - data) + l > len) return -1;
    f->metadata.emplace_back(t, std::vector<uint8_t>(p, p + l));
    p += l;
  }
  return 0;
}

}  // extern "C"
