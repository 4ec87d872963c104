// Sanitizer fuzz driver for the native host front-ends (SURVEY.md §5
// race-detection/sanitizers row: "host C++ parsers testable under
// ASan/UBSan").  Standalone binary — no Python in the loop — so
// AddressSanitizer/UBSan instrument the exact production parse code:
//
//   * FLAC: read_header + parse_stream over garbage, truncations of valid
//     streams, and any corpus files passed as argv
//   * MP3: parse_frame over garbage with every (useSize, continuation)
//     shape, plus checkpoint save/load round trips
//
// Deterministic xorshift stream generator; any ASan/UBSan report aborts the
// process (CI treats nonzero exit as failure).  Built and run by
// native/sanitize_check.sh.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void *eal_flac_create();
void eal_flac_destroy(void *);
int32_t eal_flac_read_header(void *, const uint8_t *, size_t);
int32_t eal_flac_parse_stream(void *, const uint8_t *, size_t, int32_t, int32_t,
                              int8_t *, int16_t *, int32_t *, int32_t *, int32_t *,
                              int32_t *, int32_t *, int32_t *, int32_t *, int32_t *,
                              int32_t *, int32_t *, int32_t *, int32_t *, int32_t *,
                              int32_t *, int32_t *, int32_t *, int32_t *);
uint32_t eal_flac_num_channels(void *);
uint32_t eal_flac_max_block_size(void *);
size_t eal_flac_state_size(void *);
int eal_flac_state_save(void *, uint8_t *, size_t);
int eal_flac_state_load(void *, const uint8_t *, size_t);

void *eal_mp3_create();
void eal_mp3_destroy(void *);
int eal_mp3_parse_frame(void *, const uint8_t *, int, int, int32_t *, int32_t *,
                        int32_t *, int32_t *, int32_t *, int32_t *, int32_t *, int32_t *);
int eal_mp3_find_sync_word(const uint8_t *, int);
size_t eal_mp3_state_size(void *);
int eal_mp3_state_save(void *, uint8_t *, size_t);
int eal_mp3_state_load(void *, const uint8_t *, size_t);
}

static uint64_t rng_state = 0x243F6A8885A308D3ull;
static uint32_t xrand() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return (uint32_t) (rng_state >> 32);
}

static void fill_random(std::vector<uint8_t> &b) {
  for (auto &x : b) x = (uint8_t) xrand();
}

static void flac_stream_case(const uint8_t *data, size_t len) {
  void *d = eal_flac_create();
  int32_t rc = eal_flac_read_header(d, data, len);
  if (rc == 0) {
    int32_t nch = (int32_t) eal_flac_num_channels(d);
    int32_t mbs = (int32_t) eal_flac_max_block_size(d);
    if (nch >= 1 && nch <= 8 && mbs >= 16 && mbs <= 65535) {
      const int32_t cap = 8;
      std::vector<int8_t> d8((size_t) cap * nch * mbs);
      std::vector<int16_t> d16((size_t) cap * nch * mbs);
      std::vector<int32_t> d32((size_t) cap * nch * mbs);
      int32_t cur[3] = {0, 0, 0};
      std::vector<int32_t> wide(cap), slot(cap), bs(cap), ca(cap), depth(cap),
          crc(cap), cons(cap);
      std::vector<int32_t> order((size_t) cap * nch), shift((size_t) cap * nch),
          wasted((size_t) cap * nch), use64((size_t) cap * nch),
          coeffs((size_t) cap * nch * 32);
      int32_t last_rc = 0;
      eal_flac_parse_stream(d, data, len, cap, mbs, d8.data(), d16.data(), d32.data(),
                            &cur[0], &cur[1], &cur[2], wide.data(), slot.data(),
                            order.data(), shift.data(), wasted.data(), use64.data(),
                            coeffs.data(), bs.data(), ca.data(), depth.data(),
                            crc.data(), cons.data(), &last_rc);
    }
  }
  // checkpoint round trip mid-state
  size_t ss = eal_flac_state_size(d);
  std::vector<uint8_t> st(ss);
  if (eal_flac_state_save(d, st.data(), ss) == 0) eal_flac_state_load(d, st.data(), ss);
  eal_flac_destroy(d);
}

static void mp3_stream_case(const uint8_t *data, size_t len, int use_size) {
  void *h = eal_mp3_create();
  std::vector<int32_t> huff(2 * 2 * 576), params(2 * 2 * 24), sf(2 * 2 * 62),
      frame(16), sfjs(8);
  size_t pos = 0;
  for (int f = 0; f < 6 && pos < len; ++f) {
    int off = eal_mp3_find_sync_word(data + pos, (int) (len - pos));
    if (off < 0) break;
    pos += (size_t) off;
    int32_t consumed = 0, clear = 0, err_gr = 0;
    eal_mp3_parse_frame(h, data + pos, (int) (len - pos), use_size, huff.data(),
                        params.data(), sf.data(), frame.data(), sfjs.data(),
                        &consumed, &clear, &err_gr);
    pos += consumed > 0 ? (size_t) consumed : 1;
  }
  size_t ss = eal_mp3_state_size(h);
  std::vector<uint8_t> st(ss);
  if (eal_mp3_state_save(h, st.data(), ss) == 0) eal_mp3_state_load(h, st.data(), ss);
  eal_mp3_destroy(h);
}

int main(int argc, char **argv) {
  // corpus files (valid + truncations stress resume/error paths hardest)
  for (int a = 1; a < argc; ++a) {
    FILE *f = fopen(argv[a], "rb");
    if (!f) continue;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t) n);
    if (fread(buf.data(), 1, (size_t) n, f) != (size_t) n) { fclose(f); continue; }
    fclose(f);
    flac_stream_case(buf.data(), buf.size());
    for (size_t cut : {buf.size() / 3, buf.size() / 2, buf.size() - 1})
      if (cut > 0 && cut < buf.size()) flac_stream_case(buf.data(), cut);
    mp3_stream_case(buf.data(), buf.size(), 0);
  }

  // garbage fuzz: random buffers, and random buffers seeded with sync-ish
  // headers so the deep parse paths run
  for (int iter = 0; iter < 400; ++iter) {
    std::vector<uint8_t> buf(64 + (xrand() % 4096));
    fill_random(buf);
    if (iter % 3 == 0) { buf[0] = 'f'; buf[1] = 'L'; buf[2] = 'a'; buf[3] = 'C'; }
    if (iter % 3 == 1 && buf.size() > 4) {
      buf[0] = 0xFF; buf[1] = 0xFB;   // MPEG1 L3 sync
      buf[2] = (uint8_t) ((xrand() % 14 + 1) << 4 | (xrand() % 3) << 2);
    }
    flac_stream_case(buf.data(), buf.size());
    mp3_stream_case(buf.data(), buf.size(), (int) (iter & 1));
  }
  printf("sanitize driver: all cases completed\n");
  return 0;
}
