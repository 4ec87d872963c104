// MP3 (MPEG-1/2/2.5 Layer III) bitstream front-end for esp-audio-libs-tpu.
//
// Original implementation of the serial half of MP3 decoding: sync search,
// frame-header and side-info parsing, bit-reservoir management, scalefactor
// unpacking (MPEG-1 scfsi sharing and the MPEG-2/2.5 LSF scheme), and
// Huffman decoding of the spectral data.  It emits dense 576-coefficient
// int32 tensors (magnitude with the sign carried in the MSB, which is what
// the batched device dequantizer consumes) plus all per-granule parameters
// the device back-end needs for dequantization, stereo reconstruction, IMDCT
// and subband synthesis.
//
// Parity contract: observable behavior (error codes, reservoir semantics,
// region partitioning, bit accounting — including the end-of-allotment
// phantom-pad protocol, see SpectralCache) matches the reference decoder —
// reference src/decode/mp3_decoder.cpp:8710-8856 (frame driver), :8304-8477
// (header/side info), :1424-1781 (scalefactors), :7080-7555 (Huffman) — and
// the differential tests pin it byte-exactly.  The machinery is this
// project's own: a single 64-bit MSB-first bit tap (BitTap) serves the
// header/side-info/scalefactor fields, and Huffman decoding walks the
// node-tree tables generated from ISO/IEC 11172-3 Table B.7 by
// tools/gen_huffman_tables.py (build/mp3_huff.h).
//
// Constant tables: build/mp3_tables.h (ISO/IEC 11172-3 data, see NOTICE.md)
// and build/mp3_huff.h (own layout).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <thread>
#include <vector>

#include "../../build/mp3_tables.h"
#include "../../build/mp3_huff.h"

namespace {

// error codes (include/mp3_decoder.h:359-375 values)
enum {
  ERR_NONE = 0,
  ERR_INDATA_UNDERFLOW = -1,
  ERR_MAINDATA_UNDERFLOW = -2,
  ERR_FREE_BITRATE_SYNC = -3,
  ERR_NULL_POINTER = -5,
  ERR_INVALID_FRAMEHEADER = -6,
  ERR_INVALID_SIDEINFO = -7,
  ERR_INVALID_SCALEFACT = -8,
  ERR_INVALID_HUFFCODES = -9,
};

enum { MPEG1 = 0, MPEG2 = 1, MPEG25 = 2 };
enum { Stereo = 0, Joint = 1, Dual = 2, Mono = 3 };

constexpr int MAX_NGRAN = 2, MAX_NCHAN = 2, MAX_NSAMP = 576, MAX_SCFBD = 4;
constexpr int MAINBUF_SIZE = 1940;
constexpr uint8_t SYNCWORDH = 0xff, SYNCWORDL = 0xf0;

// ---------------------------------------------------------------- bit tap
// MSB-first tap over [buf, hard_end): the pending bits sit LEFT-JUSTIFIED in
// a 64-bit lookahead (next stream bit = bit 63) that zero-extends past
// hard_end.  Every consumer tracks a bit *budget* (the field's allotment in
// the frame) and rejects anything that would consume past it, so the
// zero-extension is never observable in accepted output — this replaces the
// reference readers' cache-masking/padding tricks with plain arithmetic.
struct BitTap {
  const uint8_t *cur, *end;
  uint64_t look = 0;
  int have = 0;   // valid lookahead bits
  long used = 0;  // total consumed bits since construction

  BitTap(const uint8_t *buf, const uint8_t *hard_end) : cur(buf), end(hard_end) { top_up(); }

  void top_up() {
    while (have <= 56) {
      look |= (uint64_t) (cur < end ? *cur++ : 0) << (56 - have);
      have += 8;
    }
  }
  uint32_t peek(int n) const { return n ? (uint32_t) (look >> (64 - n)) : 0; }
  void skip(int n) {
    look <<= n;
    have -= n;
    used += n;
  }
  uint32_t take(int n) {  // n <= 32
    if (have < n) top_up();
    uint32_t v = peek(n);
    skip(n);
    return v;
  }
};

// ------------------------------------------------------------- structures
struct SideInfoSub {
  int part23Length, nBigvals, globalGain, sfCompress, winSwitchFlag;
  int blockType, mixedBlock, tableSelect[3], subBlockGain[3];
  int region0Count, region1Count, preFlag, sfactScale, count1TableSelect;
};

struct ScaleFactorSub {
  int l[23];
  int s[13][3];
};

// ------------------------------------------------------------ LSF layout
// ISO/IEC 13818-3 LSF scalefactor partitioning: sfCompress selects one of
// six partition classes (three normal, three for the intensity-coded right
// channel); each class fixes the four field widths and an NRTab row of
// band-group counts.
struct LsfLayout {
  int slen[4];
  int row;
  int preFlag;
  int intensityScale;
};

static LsfLayout lsf_layout(int sfCompress, bool intensity, bool mixed) {
  LsfLayout L = {{0, 0, 0, 0}, 0, 0, 0};
  int c = sfCompress;
  if (!intensity) {
    if (c < 400) {
      L.slen[0] = (c >> 4) / 5;
      L.slen[1] = (c >> 4) % 5;
      L.slen[2] = (c & 15) >> 2;
      L.slen[3] = c & 3;
      L.row = 0;
    } else if (c < 500) {
      c -= 400;
      L.slen[0] = (c >> 2) / 5;
      L.slen[1] = (c >> 2) % 5;
      L.slen[2] = c & 3;
      L.row = 1;
    } else {
      c -= 500;
      L.slen[0] = c / 3;
      L.slen[1] = c % 3;
      if (mixed) {  // mixed blocks shift the two fields down one group
        L.slen[2] = L.slen[1];
        L.slen[1] = L.slen[0];
      }
      L.preFlag = 1;
      L.row = 2;
    }
  } else {
    L.intensityScale = c & 1;
    c >>= 1;
    if (c < 180) {
      L.slen[0] = c / 36;
      L.slen[1] = (c % 36) / 6;
      L.slen[2] = c % 6;
      L.row = 3;
    } else if (c < 244) {
      c -= 180;
      L.slen[0] = (c >> 4) & 3;
      L.slen[1] = (c >> 2) & 3;
      L.slen[2] = c & 3;
      L.row = 4;
    } else {
      c -= 244;
      L.slen[0] = c / 3;
      L.slen[1] = c % 3;
      L.row = 5;
    }
  }
  return L;
}

struct Mp3Frontend {
  // frame header state
  int ver = 0, layer = 0, crc = 0, brIdx = 0, srIdx = 0, paddingBit = 0;
  int sMode = 0, modeExt = 0;
  int nChans = 0, nGrans = 0, nGranSamps = 0, samprate = 0, bitrate = 0, nSlots = 0;
  int mainDataBegin = 0, mainDataBytes = 0;
  int freeBitrateFlag = 0, freeBitrateSlots = 0;
  uint8_t mainBuf[MAINBUF_SIZE];

  int scfsi[MAX_NCHAN][MAX_SCFBD];
  SideInfoSub sis[MAX_NGRAN][MAX_NCHAN];
  ScaleFactorSub sfis[MAX_NGRAN][MAX_NCHAN];
  // intensity-stereo (MPEG2) info: slen[4], nr[4], intensityScale
  int sfjs_slen[4] = {0}, sfjs_nr[4] = {0}, sfjs_intensity = 0;

  // ------------------------------------------------------------ header
  // Field layout per ISO/IEC 11172-3 §2.4.1.3; derived sizes per the
  // reference (UnpackFrameHeader, :8304-8373).  Returns header length or -1.
  int unpack_frame_header(const uint8_t *buf) {
    if ((buf[0] & SYNCWORDH) != SYNCWORDH || (buf[1] & SYNCWORDL) != SYNCWORDL) return -1;
    int verIdx = (buf[1] >> 3) & 0x03;
    ver = (verIdx == 0 ? MPEG25 : ((verIdx & 0x01) ? MPEG1 : MPEG2));
    layer = 4 - ((buf[1] >> 1) & 0x03);
    crc = 1 - ((buf[1] >> 0) & 0x01);
    brIdx = (buf[2] >> 4) & 0x0f;
    srIdx = (buf[2] >> 2) & 0x03;
    paddingBit = (buf[2] >> 1) & 0x01;
    sMode = (buf[3] >> 6) & 0x03;
    modeExt = (buf[3] >> 4) & 0x03;

    if (srIdx == 3 || layer == 4 || brIdx == 15) return -1;
    if (sMode != Joint) modeExt = 0;

    nChans = (sMode == Mono ? 1 : 2);
    samprate = eal_samplerateTab[ver][srIdx];
    nGrans = (ver == MPEG1 ? 2 : 1);
    nGranSamps = eal_samplesPerFrameTab[ver][layer - 1] / nGrans;

    if (brIdx) {
      bitrate = (int) eal_bitrateTab[ver][layer - 1][brIdx] * 1000;
      nSlots = (int) eal_slotTab[ver][srIdx][brIdx] - (int) eal_sideBytesTab[ver][(sMode == Mono ? 0 : 1)] - 4 -
               (crc ? 2 : 0) + (paddingBit ? 1 : 0);
    }
    // brIdx == 0 (free mode): deliberately leave `bitrate` untouched — the
    // frame driver stores the DISCOVERED free bitrate there on the first
    // frame and later frames must keep reporting it (the reference's
    // UnpackFrameHeader has the same contract, mp3_decoder.cpp:8349-8353;
    // the member starts at 0, which is what arms the discovery branch).
    return crc ? 6 : 4;
  }

  // Side info per ISO/IEC 11172-3 §2.4.1.7 / 13818-3 (LSF); the
  // zero-overrides for winSwitch+blockType==0 and the region-count defaults
  // reproduce the reference's bad-frame tolerance (:8389-8477).  Returns the
  // side-info byte count.
  int unpack_side_info(const uint8_t *buf) {
    const bool mpeg1 = (ver == MPEG1);
    const bool mono = (sMode == Mono);
    const int nBytes = mpeg1 ? (mono ? 17 : 32) : (mono ? 9 : 17);
    BitTap tap(buf, buf + nBytes);

    mainDataBegin = tap.take(mpeg1 ? 9 : 8);
    tap.take(mpeg1 ? (mono ? 5 : 3) : (mono ? 1 : 2));  // private bits
    if (mpeg1)
      for (int ch = 0; ch < nChans; ch++)
        for (int bd = 0; bd < MAX_SCFBD; bd++) scfsi[ch][bd] = tap.take(1);

    for (int gr = 0; gr < nGrans; gr++) {
      for (int ch = 0; ch < nChans; ch++) {
        SideInfoSub &g = sis[gr][ch];
        g.part23Length = tap.take(12);
        g.nBigvals = tap.take(9);
        g.globalGain = tap.take(8);
        g.sfCompress = tap.take(mpeg1 ? 4 : 9);
        g.winSwitchFlag = tap.take(1);
        if (g.winSwitchFlag) {
          g.blockType = tap.take(2);
          g.mixedBlock = tap.take(1);
          for (int r = 0; r < 2; r++) g.tableSelect[r] = tap.take(5);
          g.tableSelect[2] = 0;
          for (int w = 0; w < 3; w++) g.subBlockGain[w] = tap.take(3);
          if (g.blockType == 0) {
            // forbidden combination: neutralize the granule
            g.nBigvals = 0;
            g.part23Length = 0;
            g.sfCompress = 0;
          }
          g.region0Count = (g.blockType == 2 && !g.mixedBlock) ? 8 : 7;
          g.region1Count = 20 - g.region0Count;
        } else {
          g.blockType = 0;
          g.mixedBlock = 0;
          for (int r = 0; r < 3; r++) g.tableSelect[r] = tap.take(5);
          g.region0Count = tap.take(4);
          g.region1Count = tap.take(3);
        }
        g.preFlag = mpeg1 ? tap.take(1) : 0;
        g.sfactScale = tap.take(1);
        g.count1TableSelect = tap.take(1);
      }
    }
    return nBytes;
  }

  // ------------------------------------------------------- scalefactors
  // MPEG-1 (ISO/IEC 11172-3 §2.4.2.7): long blocks read 21 bands in four
  // scfsi groups (granule 1 may share each group with granule 0); short
  // blocks read 12 bands x 3 windows (mixed: 8 long bands first).
  void unpack_sf_mpeg1(BitTap *t, const SideInfoSub *s, ScaleFactorSub *sf, const int *scfsi_ch, int gr,
                       const ScaleFactorSub *sfGr0) {
    const int slen0 = eal_SFLenTab[s->sfCompress][0];
    const int slen1 = eal_SFLenTab[s->sfCompress][1];
    if (s->blockType == 2) {
      int sfb = 0;
      if (s->mixedBlock) {
        for (; sfb < 8; sfb++) sf->l[sfb] = t->take(slen0);
        sfb = 3;
      }
      for (; sfb < 12; sfb++) {
        const int sl = sfb < 6 ? slen0 : slen1;
        for (int w = 0; w < 3; w++) sf->s[sfb][w] = t->take(sl);
      }
      sf->s[12][0] = sf->s[12][1] = sf->s[12][2] = 0;
    } else {
      static const int kGroupEnd[MAX_SCFBD] = {6, 11, 16, 21};
      int sfb = 0;
      for (int grp = 0; grp < MAX_SCFBD; grp++) {
        const int sl = grp < 2 ? slen0 : slen1;
        const bool share = (gr != 0) && scfsi_ch[grp];
        for (; sfb < kGroupEnd[grp]; sfb++) sf->l[sfb] = share ? sfGr0->l[sfb] : t->take(sl);
      }
      sf->l[21] = 0;
      sf->l[22] = 0;
    }
  }

  // MPEG-2/2.5 LSF (ISO/IEC 13818-3): four variable-width field groups laid
  // out by lsf_layout(); band-group counts from NRTab by partition class and
  // block shape.
  void unpack_sf_mpeg2(BitTap *t, SideInfoSub *s, ScaleFactorSub *sf, int ch, int mode_ext) {
    const bool intensity = (mode_ext & 0x01) && (ch == 1);
    const LsfLayout L = lsf_layout(s->sfCompress, intensity, s->mixedBlock != 0);
    const int btIdx = s->blockType == 2 ? (s->mixedBlock ? 2 : 1) : 0;

    int nr[4];
    for (int r = 0; r < 4; r++) nr[r] = eal_NRTab[L.row][btIdx][r];

    if (intensity) {  // stash for the device's intensity-stereo stage
      for (int r = 0; r < 4; r++) {
        sfjs_slen[r] = L.slen[r];
        sfjs_nr[r] = nr[r];
      }
      sfjs_intensity = L.intensityScale;
    }
    s->preFlag = L.preFlag;

    if (s->blockType == 2) {
      int sfb = 0, grp = 0;
      if (s->mixedBlock) {  // six long bands with the first width, then short
        for (; sfb < 6; sfb++) sf->l[sfb] = t->take(L.slen[0]);
        sfb = 3;
        grp = 1;
      }
      for (; grp < 4; grp++)
        for (int i = 0; i < nr[grp]; i++, sfb++)
          for (int w = 0; w < 3; w++) sf->s[sfb][w] = t->take(L.slen[grp]);
      sf->s[12][0] = sf->s[12][1] = sf->s[12][2] = 0;
    } else {
      int sfb = 0;
      for (int grp = 0; grp < 4; grp++)
        for (int i = 0; i < nr[grp]; i++, sfb++) sf->l[sfb] = t->take(L.slen[grp]);
      sf->l[21] = 0;
      sf->l[22] = 0;
    }
  }

  // Returns bytes consumed; *bitOffset tracks the sub-byte position exactly
  // like the reference driver expects (UnpackScaleFactors, :1722-1781).
  int unpack_scale_factors(const uint8_t *buf, int *bitOffset, int bitsAvail, int gr, int ch) {
    BitTap tap(buf, buf + ((size_t) (bitsAvail + *bitOffset + 7) >> 3));
    tap.skip(*bitOffset);

    if (ver == MPEG1)
      unpack_sf_mpeg1(&tap, &sis[gr][ch], &sfis[gr][ch], scfsi[ch], gr, &sfis[0][ch]);
    else
      unpack_sf_mpeg2(&tap, &sis[gr][ch], &sfis[gr][ch], ch, modeExt);

    const long total = tap.used;  // bitOffset + field bits
    *bitOffset = (int) (total & 0x07);
    return (int) (total >> 3);
  }
};

// ----------------------------------------------------------------- Huffman
// Spectral-value decoding over the project's own node-tree tables
// (build/mp3_huff.h; see tools/gen_huffman_tables.py for the entry
// encoding).  Magnitudes carry their sign in the MSB; the device
// dequantizer applies two's complement.

// Cache for the spectral sections.  The reference decoder's behavior past
// the end of a granule's bit allotment is observable in ACCEPTED output (the
// fuzz-parity suite covers garbage streams), so this reproduces its
// end-of-allotment protocol exactly (DecodeHuffmanPairs / DecodeHuffmanQuads,
// reference mp3_decoder.cpp:7122-7445): a 32-bit left-justified cache
// refills 16 bits at a time while the allotment lasts; once drained, every
// further refill masks the cache down to the bits genuinely owned and grants
// a block of phantom zero bits (11 for pairs, 10 for quads).  Values that
// dip into the phantom region are still accepted as long as the level stays
// at or above the outstanding grant after the value's sign bits, and the
// final bits-used figure credits unconsumed phantom bits back to the caller.
// `level` counts phantom bits too and may exceed 32 — bits beyond the
// register are zeros by construction, and left shifts keep them zero.
struct SpectralCache {
  const uint8_t *cur;
  uint32_t cache = 0;
  int level = 0;  // bits conceptually in the cache (incl. phantom grants)
  int avail;      // allotment bits not yet moved into the cache
  int pad = 0;    // outstanding phantom grant (0 until the allotment drains)

  SpectralCache(const uint8_t *buf, int budget, int bitOffset) : cur(buf), avail(budget) {
    level = (8 - bitOffset) & 0x07;  // any partial byte enters immediately
    if (level) cache = (uint32_t) (*cur++) << (32 - level);
    avail -= level;  // may go negative: the drain step settles the debt
  }

  // One refill step: 16 fresh bits while they last, else the drain-and-pad
  // grant.  Returns false when nothing at all is left to grant.
  bool refill(int grant) {
    if (avail >= 16) {
      cache |= (uint32_t) (*cur++) << (24 - level);
      cache |= (uint32_t) (*cur++) << (16 - level);
      level += 16;
      avail -= 16;
      return true;
    }
    if (level + avail <= 0) return false;
    if (avail > 0) cache |= (uint32_t) (*cur++) << (24 - level);
    if (avail > 8) cache |= (uint32_t) (*cur++) << (16 - level);
    level += avail;
    avail = 0;
    cache &= (uint32_t) ((int32_t) 0x80000000 >> (level - 1));  // keep owned bits
    pad = grant;
    level += grant;
    return true;
  }

  // Escape-sequence top-up (linbits + sign): byte-at-a-time, allowed to
  // overdraw the allotment by a partial byte, then clamps back to the owned
  // bits.  No phantom grant.  Returns false when the allotment can't cover.
  bool top_up_escape(int need) {
    if (level + avail < need) return false;
    while (level < need) {
      cache |= (uint32_t) (*cur++) << (24 - level);
      level += 8;
      avail -= 8;
    }
    if (avail < 0) {
      level += avail;
      avail = 0;
      cache &= (uint32_t) ((int32_t) 0x80000000 >> (level - 1));
    }
    return true;
  }

  uint32_t peek(int n) const { return cache >> (32 - n); }
  void drop(int n) {
    cache <<= n;
    level -= n;
  }
  bool sign() {  // consume one sign bit: true = negative
    bool s = (cache & 0x80000000u) != 0;
    drop(1);
    return s;
  }
};

// Decode nVals big-value coefficients ((x,y) pairs) of pair table `tabIdx`
// from the `budget`-bit allotment starting at (buf, bitOffset).  Returns the
// bit count consumed (phantom credit included, as the caller's region
// accounting expects), or -1 on allotment exhaustion / reserved table.
//
// The codeword walk descends this project's node tables (build/mp3_huff.h)
// one node per step; the walk pauses for a refill whenever the level drops
// below 11 (max root/sub node width 9 + 2 sign bits) and resumes at the same
// node, so phantom grants can land mid-codeword exactly as in the reference.
static int decode_pairs(int32_t *xy, int nVals, int tabIdx, int budget, const uint8_t *buf, int bitOffset) {
  if (nVals <= 0) return 0;
  if (budget < 0) return -1;

  const int32_t tabOff = eal_pair_node_off[tabIdx];
  if (tabOff == -2) {  // value-less table: the whole region is zeros, no bits
    for (int i = 0; i < nVals; i++) xy[i] = 0;
    return 0;
  }
  if (tabOff == -1) return -1;  // reserved table id: stream error

  const uint16_t *tab = eal_pair_nodes + tabOff;
  const uint16_t *node = tab;
  const int lin = eal_huffLinBits[tabIdx];
  SpectralCache sc(buf, budget, bitOffset);

  while (nVals > 0) {
    if (!sc.refill(11)) return -1;
    while (nVals > 0 && sc.level >= 11) {
      const int nb = node[0];
      const uint16_t e = node[1 + sc.peek(nb)];
      if (!(e & 0x8000)) {  // interior link: descend (walk may pause here)
        sc.drop(nb);
        node = tab + e;
        continue;
      }
      sc.drop((e >> 8) & 0x0f);

      int32_t x = e & 0x0f, y = (e >> 4) & 0x0f;
      if (x == 15 && lin) {
        if (!sc.top_up_escape(lin + 1 + (y ? 1 : 0))) return -1;
        x += (int32_t) sc.peek(lin);
        sc.drop(lin);
      }
      if (x && sc.sign()) x = (int32_t) ((uint32_t) x | 0x80000000u);
      if (y == 15 && lin) {
        if (!sc.top_up_escape(lin + 1)) return -1;
        y += (int32_t) sc.peek(lin);
        sc.drop(lin);
      }
      if (y && sc.sign()) y = (int32_t) ((uint32_t) y | 0x80000000u);

      if (sc.level < sc.pad) return -1;  // consumed into the phantom grant
      *xy++ = x;
      *xy++ = y;
      nVals -= 2;
      node = tab;
    }
  }
  // unused allotment = unread bits + cache level net of the phantom grant
  return budget - (sc.avail + sc.level - sc.pad);
}

// Decode count1-region quads until values or allotment run out.  Returns the
// number of values stored (multiple of 4); exhaustion here is not an error —
// a quad is dropped once it would consume into the phantom grant.
static int decode_quads(int32_t *vwxy, int nVals, int tabIdx, int budget, const uint8_t *buf, int bitOffset) {
  if (budget <= 0) return 0;
  const int qb = eal_quad_bits[tabIdx];
  const uint16_t *lut = eal_quad_lut + eal_quad_offs[tabIdx];
  SpectralCache sc(buf, budget, bitOffset);

  int i = 0;
  while (i < nVals - 3) {
    if (!sc.refill(10)) return i;
    while (i < nVals - 3 && sc.level >= 10) {
      const uint16_t e = lut[sc.peek(qb)];
      sc.drop(e >> 8);
      int32_t q[4];
      for (int k = 0; k < 4; k++) {  // v, w, x, y
        int32_t v = (e >> (3 - k)) & 1;
        if (v && sc.sign()) v = (int32_t) 0x80000001u;
        q[k] = v;
      }
      if (sc.level < sc.pad) return i;
      vwxy[i] = q[0];
      vwxy[i + 1] = q[1];
      vwxy[i + 2] = q[2];
      vwxy[i + 3] = q[3];
      i += 4;
    }
  }
  return i;
}

// Region partitioning (ISO/IEC 11172-3 §2.4.2.7: region boundaries come from
// the scalefactor-band table; reference DecodeHuffman :7470-7555) and the
// three pair regions + count1 quads.  Returns bytes consumed or -1.
static int decode_huffman(Mp3Frontend *fe, const uint8_t *buf, int *bitOffset, int huffBlockBits, int gr, int ch,
                          int32_t *huffDecBuf, int32_t *nonZeroBound) {
  const uint8_t *startBuf = buf;
  SideInfoSub *s = &fe->sis[gr][ch];
  if (huffBlockBits < 0) return -1;

  const int32_t *sfb_l = eal_sfBandLong[fe->ver][fe->srIdx];
  const int32_t *sfb_s = eal_sfBandShort[fe->ver][fe->srIdx];

  int r1Start, r2Start, rEnd[4];
  if (s->winSwitchFlag && s->blockType == 2) {
    if (s->mixedBlock == 0) {
      r1Start = sfb_s[(s->region0Count + 1) / 3] * 3;
    } else {
      if (fe->ver == MPEG1) {
        r1Start = sfb_l[s->region0Count + 1];
      } else {
        int w = sfb_s[4] - sfb_s[3];
        r1Start = sfb_l[6] + 2 * w;
      }
    }
    r2Start = MAX_NSAMP;
  } else {
    r1Start = sfb_l[s->region0Count + 1];
    r2Start = sfb_l[s->region0Count + 1 + s->region1Count + 1];
  }

  rEnd[3] = (2 * s->nBigvals < MAX_NSAMP) ? 2 * s->nBigvals : MAX_NSAMP;
  rEnd[2] = (r2Start < rEnd[3]) ? r2Start : rEnd[3];
  rEnd[1] = (r1Start < rEnd[3]) ? r1Start : rEnd[3];
  rEnd[0] = 0;

  *nonZeroBound = rEnd[3];

  int bitsLeft = huffBlockBits;
  for (int i = 0; i < 3; i++) {
    int bitsUsed = decode_pairs(huffDecBuf + rEnd[i], rEnd[i + 1] - rEnd[i], s->tableSelect[i], bitsLeft, buf,
                                *bitOffset);
    if (bitsUsed < 0 || bitsUsed > bitsLeft) return -1;
    buf += (bitsUsed + *bitOffset) >> 3;
    *bitOffset = (bitsUsed + *bitOffset) & 0x07;
    bitsLeft -= bitsUsed;
  }

  *nonZeroBound += decode_quads(huffDecBuf + rEnd[3], MAX_NSAMP - rEnd[3], s->count1TableSelect, bitsLeft, buf,
                                *bitOffset);

  for (int i = *nonZeroBound; i < MAX_NSAMP; i++) huffDecBuf[i] = 0;

  buf += (bitsLeft + *bitOffset) >> 3;
  *bitOffset = (bitsLeft + *bitOffset) & 0x07;
  return (int) (buf - startBuf);
}

static int find_sync_word(const uint8_t *buf, int nBytes) {
  for (int i = 0; i < nBytes - 1; i++)
    if ((buf[i] & SYNCWORDH) == SYNCWORDH && (buf[i + 1] & SYNCWORDL) == SYNCWORDL) return i;
  return -1;
}

// Free-bitrate frame length discovery: find the next header matching the
// first (reference MP3FindFreeSync, :8570-8610).
static int find_free_sync(const uint8_t *buf, const uint8_t firstFH[4], int nBytes) {
  const uint8_t *bufPtr = buf;
  while (1) {
    int offset = find_sync_word(bufPtr, nBytes);
    bufPtr += offset;
    if (offset < 0) return -1;
    if (bufPtr[0] == firstFH[0] && bufPtr[1] == firstFH[1] && (bufPtr[2] & 0xfc) == (firstFH[2] & 0xfc)) {
      if ((firstFH[2] >> 1) & 0x01) bufPtr--;
      return (int) (bufPtr - buf);
    }
    bufPtr += 3;
    nBytes -= (offset + 3);
  }
}

}  // namespace

// ------------------------------------------------------------------- C ABI
extern "C" {

void *eal_mp3_create() { return new Mp3Frontend(); }
void eal_mp3_destroy(void *h) { delete (Mp3Frontend *) h; }
int eal_mp3_find_sync_word(const uint8_t *buf, int n) { return find_sync_word(buf, n); }

// Parse the serial part of one frame (header, side info, reservoir,
// scalefactors, Huffman).  Mirrors the front half of MP3Decode (:8710-8830).
//
// Outputs:
//   huff      [MAX_NGRAN * MAX_NCHAN * 576] int32 (sign-in-MSB magnitudes)
//   params    [MAX_NGRAN * MAX_NCHAN * 24] int32 per-granule-channel block:
//             [0]=part23Length [1]=nBigvals [2]=globalGain [3]=sfCompress
//             [4]=winSwitchFlag [5]=blockType [6]=mixedBlock
//             [7..9]=tableSelect [10..12]=subBlockGain [13]=region0Count
//             [14]=region1Count [15]=preFlag [16]=sfactScale
//             [17]=count1TableSelect [18]=nonZeroBound
//   sf        [MAX_NGRAN * MAX_NCHAN * 62] int32: l[23] then s[13*3]
//   frame     [16] int32: [0]=ver [1]=layer [2]=sMode [3]=modeExt [4]=srIdx
//             [5]=nChans [6]=nGrans [7]=nGranSamps [8]=samprate [9]=bitrate
//             [10]=nSlots [11]=mainDataBegin [12]=sfjs_intensity
//             [13]=crc [14]=paddingBit
//   sfjs      [8] int32: slen[4], nr[4]
//   consumed  bytes consumed from inbuf
//   clear_out 1 if the caller should zero this frame's PCM (bad frame)
// err_gr: on a mid-frame error (scalefactors/Huffman), the index of the
// granule where parsing failed.  The reference decodes granule-by-granule
// (synthesis for granule g-1 has already updated overlap/vbuf state when
// granule g errors, reference :8807-8854), so the caller must synthesize
// granules < err_gr before zero-filling the frame.
int eal_mp3_parse_frame(void *hctx, const uint8_t *inbuf, int bytesLeft, int useSize, int32_t *huff, int32_t *params,
                        int32_t *sf, int32_t *frame, int32_t *sfjs, int32_t *consumed, int32_t *clear_out,
                        int32_t *err_gr) {
  Mp3Frontend *fe = (Mp3Frontend *) hctx;
  const uint8_t *in0 = inbuf;
  *consumed = 0;
  *clear_out = 0;
  *err_gr = 0;

  // HARDENING DIVERGENCE from the reference: it parses the header and side
  // info without checking bytesLeft (mp3_decoder.cpp:8720-8733), reading up
  // to ~38 bytes past a truncated buffer. Reject short input with the error
  // code and byte accounting the reference's dominant path produces.
  if (bytesLeft < 4) return ERR_INDATA_UNDERFLOW;

  int fhBytes = fe->unpack_frame_header(inbuf);
  if (fhBytes < 0) return ERR_INVALID_FRAMEHEADER;

  {
    const bool mono = (fe->sMode == Mono);
    const int siNeed = (fe->ver == MPEG1) ? (mono ? 17 : 32) : (mono ? 9 : 17);
    if (bytesLeft < fhBytes + siNeed) {
      *clear_out = 1;
      *consumed = bytesLeft;   // truncated final frame: consume the tail
      return ERR_INDATA_UNDERFLOW;
    }
  }
  inbuf += fhBytes;

  int siBytes = fe->unpack_side_info(inbuf);
  if (siBytes < 0) {
    *clear_out = 1;
    *consumed = (int) (inbuf - in0);
    return ERR_INVALID_SIDEINFO;
  }
  inbuf += siBytes;
  bytesLeft -= (fhBytes + siBytes);

  // free-bitrate mode (reference :8737-8751)
  if (fe->bitrate == 0 || fe->freeBitrateFlag) {
    if (!fe->freeBitrateFlag) {
      fe->freeBitrateFlag = 1;
      fe->freeBitrateSlots = find_free_sync(inbuf, inbuf - fhBytes - siBytes, bytesLeft);
      if (fe->freeBitrateSlots < 0) {
        *clear_out = 1;
        *consumed = (int) (inbuf - in0);
        return ERR_FREE_BITRATE_SYNC;
      }
      int freeFrameBytes = fe->freeBitrateSlots + fhBytes + siBytes;
      // the reference computes this in int and overflows (UB) when a false
      // free-bitrate sync lands far away; compute in 64-bit and wrap to the
      // two's-complement value its binaries produce in practice (the value
      // only feeds the frame-info report, not decode math)
      fe->bitrate = (int32_t) (uint32_t) (((int64_t) freeFrameBytes * fe->samprate * 8) /
                                          (fe->nGrans * fe->nGranSamps));
    }
    fe->nSlots = fe->freeBitrateSlots + (fe->paddingBit ? 1 : 0);
  }

  const uint8_t *mainPtr;
  if (useSize) {
    fe->nSlots = bytesLeft;
    if (fe->mainDataBegin != 0 || fe->nSlots <= 0) {
      *clear_out = 1;
      *consumed = (int) (inbuf - in0);
      return ERR_INVALID_FRAMEHEADER;
    }
    // HARDENING DIVERGENCE: the reference stores nSlots unbounded here
    // (mp3_decoder.cpp:8770) and the NEXT useSize=0 frame's reservoir
    // memmove then reads mainBuf + mainDataBytes - mainDataBegin — far
    // past the 1940-byte buffer for a large useSize frame. Clamp the
    // carried accounting to the buffer (the useSize frame itself decodes
    // in place from inbuf and is unaffected).
    fe->mainDataBytes = fe->nSlots < MAINBUF_SIZE ? fe->nSlots : MAINBUF_SIZE;
    mainPtr = inbuf;
    inbuf += fe->nSlots;
  } else {
    if (fe->nSlots > bytesLeft) {
      *clear_out = 1;
      *consumed = (int) (inbuf - in0);
      return ERR_INDATA_UNDERFLOW;
    }
    // HARDENING DIVERGENCE from the reference: its equivalent copies are
    // unguarded (mp3_decoder.cpp:8784-8796) and a crafted stream can make
    // nSlots exceed the 1940-byte main buffer (free-bitrate false sync far
    // away) or go negative (header slot arithmetic at degenerate
    // bitrate/CRC combinations) — heap corruption in the reference, found
    // by native/sanitize_check.sh. Reject such frames instead.
    if (fe->nSlots < 0 ||
        fe->nSlots > MAINBUF_SIZE - (fe->mainDataBytes >= fe->mainDataBegin
                                         ? fe->mainDataBegin
                                         : fe->mainDataBytes)) {
      *clear_out = 1;
      *consumed = (int) (inbuf - in0);
      return ERR_INVALID_FRAMEHEADER;
    }
    if (fe->mainDataBytes >= fe->mainDataBegin) {
      memmove(fe->mainBuf, fe->mainBuf + fe->mainDataBytes - fe->mainDataBegin, fe->mainDataBegin);
      memcpy(fe->mainBuf + fe->mainDataBegin, inbuf, fe->nSlots);
      fe->mainDataBytes = fe->mainDataBegin + fe->nSlots;
      inbuf += fe->nSlots;
      mainPtr = fe->mainBuf;
    } else {
      memcpy(fe->mainBuf + fe->mainDataBytes, inbuf, fe->nSlots);
      fe->mainDataBytes += fe->nSlots;
      inbuf += fe->nSlots;
      *clear_out = 1;
      *consumed = (int) (inbuf - in0);
      return ERR_MAINDATA_UNDERFLOW;
    }
  }

  // fill frame info before the granule loop: a mid-frame error still needs
  // it for the partial-granule synthesis (see err_gr)
  frame[0] = fe->ver; frame[1] = fe->layer; frame[2] = fe->sMode; frame[3] = fe->modeExt;
  frame[4] = fe->srIdx; frame[5] = fe->nChans; frame[6] = fe->nGrans; frame[7] = fe->nGranSamps;
  frame[8] = fe->samprate; frame[9] = fe->bitrate; frame[10] = fe->nSlots; frame[11] = fe->mainDataBegin;
  frame[13] = fe->crc; frame[14] = fe->paddingBit;

  int bitOffset = 0;
  int mainBits = fe->mainDataBytes * 8;

  for (int gr = 0; gr < fe->nGrans; gr++) {
    for (int ch = 0; ch < fe->nChans; ch++) {
      int prevBitOffset = bitOffset;
      int offset = fe->unpack_scale_factors(mainPtr, &bitOffset, mainBits, gr, ch);
      // keep joint-stereo scalefactor info current for partial-granule
      // synthesis after a mid-frame error
      frame[12] = fe->sfjs_intensity;
      for (int i = 0; i < 4; i++) {
        sfjs[i] = fe->sfjs_slen[i];
        sfjs[4 + i] = fe->sfjs_nr[i];
      }
      int sfBlockBits = 8 * offset - prevBitOffset + bitOffset;
      int huffBlockBits = fe->sis[gr][ch].part23Length - sfBlockBits;
      mainPtr += offset;
      mainBits -= sfBlockBits;
      if (offset < 0 || mainBits < huffBlockBits) {
        *clear_out = 1;
        *consumed = (int) (inbuf - in0);
        *err_gr = gr;
        return ERR_INVALID_SCALEFACT;
      }

      prevBitOffset = bitOffset;
      int32_t nzb = 0;
      int32_t *hbuf = huff + ((size_t) gr * MAX_NCHAN + ch) * MAX_NSAMP;
      offset = decode_huffman(fe, mainPtr, &bitOffset, huffBlockBits, gr, ch, hbuf, &nzb);
      if (offset < 0) {
        *clear_out = 1;
        *consumed = (int) (inbuf - in0);
        *err_gr = gr;
        return ERR_INVALID_HUFFCODES;
      }
      mainPtr += offset;
      mainBits -= (8 * offset - prevBitOffset + bitOffset);

      SideInfoSub *s = &fe->sis[gr][ch];
      int32_t *p = params + ((size_t) gr * MAX_NCHAN + ch) * 24;
      p[0] = s->part23Length; p[1] = s->nBigvals; p[2] = s->globalGain; p[3] = s->sfCompress;
      p[4] = s->winSwitchFlag; p[5] = s->blockType; p[6] = s->mixedBlock;
      p[7] = s->tableSelect[0]; p[8] = s->tableSelect[1]; p[9] = s->tableSelect[2];
      p[10] = s->subBlockGain[0]; p[11] = s->subBlockGain[1]; p[12] = s->subBlockGain[2];
      p[13] = s->region0Count; p[14] = s->region1Count; p[15] = s->preFlag;
      p[16] = s->sfactScale; p[17] = s->count1TableSelect; p[18] = nzb;

      int32_t *sfp = sf + ((size_t) gr * MAX_NCHAN + ch) * 62;
      for (int i = 0; i < 23; i++) sfp[i] = fe->sfis[gr][ch].l[i];
      for (int b = 0; b < 13; b++)
        for (int w = 0; w < 3; w++) sfp[23 + b * 3 + w] = fe->sfis[gr][ch].s[b][w];
    }
  }

  frame[12] = fe->sfjs_intensity;
  for (int i = 0; i < 4; i++) {
    sfjs[i] = fe->sfjs_slen[i];
    sfjs[4 + i] = fe->sfjs_nr[i];
  }

  *consumed = (int) (inbuf - in0);
  *err_gr = fe->nGrans;
  return ERR_NONE;
}

// Fleet variant: run the serial front-end for B independent streams in one
// crossing (the MP3 analog of eal_flac_parse_stream — at serving batch
// sizes the per-stream Python<->C hop, not the parsing, dominates the host
// leg).  ctxs[b] == NULL skips stream b (its output rows are untouched and
// rc[b] is set to INT32_MIN as the skip sentinel).  Outputs are the
// eal_mp3_parse_frame arrays batch-stacked along the leading axis.
int eal_mp3_parse_frame_batch(int B, void **ctxs, const uint8_t **bufs, const int32_t *lens, int useSize,
                              int32_t *huff, int32_t *params, int32_t *sf, int32_t *frame, int32_t *sfjs,
                              int32_t *consumed, int32_t *clear_out, int32_t *err_gr, int32_t *rc) {
  const size_t NH = (size_t) MAX_NGRAN * MAX_NCHAN * MAX_NSAMP;
  const size_t NP = (size_t) MAX_NGRAN * MAX_NCHAN * 24;
  const size_t NS = (size_t) MAX_NGRAN * MAX_NCHAN * 62;
  auto run_range = [&](int b0, int b1) {
    for (int b = b0; b < b1; b++) {
      if (!ctxs[b]) {
        rc[b] = INT32_MIN;
        continue;
      }
      rc[b] = eal_mp3_parse_frame(ctxs[b], bufs[b], lens[b], useSize, huff + (size_t) b * NH,
                                  params + (size_t) b * NP, sf + (size_t) b * NS, frame + (size_t) b * 16,
                                  sfjs + (size_t) b * 8, consumed + b, clear_out + b, err_gr + b);
    }
  };
  // Streams are independent (one context + disjoint output rows each), so
  // the serial per-stream entropy decode parallelizes across host cores —
  // SURVEY.md §7 hard part (d): keep the host front-end from starving the
  // device at serving fleet sizes.  Threading only pays above a minimum
  // fleet; the caller already holds no Python state (the ctypes call
  // releases the GIL).
  // EAL_PARSE_THREADS overrides the core-count heuristic (0/unset = auto);
  // lets tests exercise the pool on single-core boxes and deployments pin
  // the parse fleet's footprint next to the transport threads.
  int forced = 0;
  if (const char *env = std::getenv("EAL_PARSE_THREADS")) forced = atoi(env);
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = forced > 0 ? forced : (int) (hw ? hw : 1);
  bool engage = forced > 0 ? (n_threads > 1 && B >= 2)
                           : (n_threads > 1 && B >= 2 * n_threads && B >= 64);
  if (engage) {
    if (forced <= 0 && n_threads > B / 32) n_threads = B / 32;   // >=32 streams per thread when auto-sized
    if (n_threads > B) n_threads = B;
    std::vector<std::thread> pool;
    pool.reserve((size_t) n_threads);
    int per = (B + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int b0 = t * per, b1 = b0 + per < B ? b0 + per : B;
      if (b0 >= b1) break;
      pool.emplace_back(run_range, b0, b1);
    }
    for (auto &th : pool) th.join();
  } else {
    run_range(0, B);
  }
  return 0;
}

// COMPACT per-(stream, granule) parameters: band-level values + section
// bounds only (~230 int32), for DEVICE-side per-sample expansion. The full
// expanded blob (44KB/stream; superseded full-expansion path) — shipping it
// dominates batched decode behind a low-bandwidth transport; everything a
// device gather can reconstruct from static per-format maps stays compact.
//
// Layout (int32):
//   gain_l   [2][22]   per long band:  210 - gg' + sfactMult*(sf + pre)
//   gain_s   [2][13][3] per short band/window
//   pe_l     [2]       long-section processed end (sample idx)
//   short_base[2]      sample idx where the short section starts (== pe_l
//                      after the long loop; dynamic when nzb cut it short)
//   pe_s     [2]       short-section processed end (== out_nzb_short)
//   cb_start_s[2] has_short[2] cb_type[2]
//   sfl1 [23] sfs1 [13][3] il_long [23] il_short [13]   (right-ch stereo)
//   mode_ext, ver_is_mpeg1, intensity_scale
// Total 2*22+2*39+2*6+23+39+23+13+3 = 232 words.
int eal_mp3_granule_params_compact(const int32_t *params, const int32_t *sf,
                                   const int32_t *frame, const int32_t *sfjs,
                                   const int32_t *nzb, int32_t *out) {
  const int IMDCT_SCALE = 2;
  int ver = frame[0], mode_ext = frame[3], sr_idx = frame[4];
  int nch = frame[5];
  const int32_t *sfb_l = eal_sfBandLong[ver][sr_idx];
  const int32_t *sfb_s = eal_sfBandShort[ver][sr_idx];

  int32_t *gain_l = out;              // [2][22]
  int32_t *gain_s = gain_l + 2 * 22;  // [2][39]
  int32_t *pe_l = gain_s + 2 * 39;
  int32_t *short_base = pe_l + 2;
  int32_t *pe_s = short_base + 2;
  int32_t *cb_start_s = pe_s + 2;
  int32_t *has_short = cb_start_s + 2;
  int32_t *cb_type = has_short + 2;
  int32_t *sfl1 = cb_type + 2;        // [23]
  int32_t *sfs1 = sfl1 + 23;          // [39]
  int32_t *il_long = sfs1 + 39;       // [23]
  int32_t *il_short = il_long + 23;   // [13]
  int32_t *scalars = il_short + 13;   // [3]

  for (int i = 0; i < 2 * 22; i++) gain_l[i] = 0;
  for (int i = 0; i < 2 * 39; i++) gain_s[i] = 0;
  for (int c = 0; c < 2; c++) {
    pe_l[c] = short_base[c] = pe_s[c] = 0;
    cb_start_s[c] = has_short[c] = cb_type[c] = 0;
  }

  for (int ch = 0; ch < nch; ch++) {
    const int32_t *p = params + ch * 24;
    int block_type = p[5], mixed = p[6];
    int sfact_mult = 2 * (p[16] + 1);
    int global_gain = p[2];
    if (mode_ext >> 1) global_gain -= 2;
    global_gain += IMDCT_SCALE;

    int cb_end_l, cbs;
    if (block_type == 2) {
      if (mixed) { cb_end_l = (ver == 0) ? 8 : 6; cbs = 3; }
      else       { cb_end_l = 0; cbs = 0; }
    } else {
      cb_end_l = 22; cbs = 13;
    }
    cb_start_s[ch] = cbs;
    has_short[ch] = cbs < 12;
    cb_type[ch] = (block_type != 2) ? 0 : (mixed ? 2 : 1);

    const int32_t *sfl = sf + ch * 62;
    const int32_t *sfs = sf + ch * 62 + 23;
    int i = 0;
    for (int cb = 0; cb < cb_end_l; cb++) {
      int n = sfb_l[cb + 1] - sfb_l[cb];
      gain_l[ch * 22 + cb] =
          210 - global_gain + sfact_mult * (sfl[cb] + (p[15] ? eal_preTab[cb] : 0));
      i += n;
      if (i >= nzb[ch]) break;
    }
    pe_l[ch] = i;
    short_base[ch] = i;
    if (cbs < 12) {
      for (int cb = cbs; cb < 13; cb++) {
        int n = sfb_s[cb + 1] - sfb_s[cb];
        for (int w = 0; w < 3; w++)
          gain_s[ch * 39 + cb * 3 + w] =
              210 - global_gain + 8 * p[10 + w] + sfact_mult * sfs[cb * 3 + w];
        i += 3 * n;
        if (i >= nzb[ch]) break;
      }
      pe_s[ch] = i;
    }
  }

  for (int j = 0; j < 23; j++) sfl1[j] = 0;
  for (int j = 0; j < 39; j++) sfs1[j] = 0;
  for (int j = 0; j < 23; j++) il_long[j] = 0;
  for (int j = 0; j < 13; j++) il_short[j] = 0;
  if (nch == 2) {
    for (int j = 0; j < 23; j++) sfl1[j] = sf[62 + j];
    for (int j = 0; j < 39; j++) sfs1[j] = sf[62 + 23 + j];
    int32_t il[23];
    for (int j = 0; j < 23; j++) il[j] = 0;
    int k = 0;
    for (int r = 0; r < 4; r++) {
      int32_t tmp = (1 << sfjs[r]) - 1;
      for (int c = 0; c < sfjs[4 + r]; c++) {
        if (k < 23) il[k] = tmp;
        k++;
      }
    }
    for (int j = 0; j < 23; j++) il_long[j] = il[j];
    for (int j = 0; j < 13; j++) il_short[j] = il[j];
    il_long[21] = il_long[22] = 1;
    il_short[12] = 1;
  }
  scalars[0] = mode_ext;
  scalars[1] = (ver == 0);
  scalars[2] = frame[12];
  return 0;
}

int eal_mp3_granule_params_compact_batch(int B, const int32_t *params,
                                         const int32_t *sf, const int32_t *frame,
                                         const int32_t *sfjs, const int32_t *nzb,
                                         int32_t *out) {
  const int GP = 2 * 22 + 2 * 39 + 2 * 6 + 23 + 39 + 23 + 13 + 3;
  for (int b = 0; b < B; b++)
    eal_mp3_granule_params_compact(params + b * 2 * 24, sf + b * 2 * 62,
                                   frame + b * 16, sfjs + b * 8, nzb + b * 2,
                                   out + b * GP);
  return 0;
}

// MP3GetLastFrameInfo analog (reference :8613-8634): report the decoder's
// CURRENT stored header state (from the most recent parse), no re-parsing.
// Zero-fills everything when layer != 3, exactly like the reference.
int eal_mp3_last_frame_info(void *hctx, int32_t *info7) {
  Mp3Frontend *fe = (Mp3Frontend *) hctx;
  if (fe->layer != 3) {
    for (int i = 0; i < 7; i++) info7[i] = 0;
    return ERR_NONE;
  }
  info7[0] = fe->bitrate;
  info7[1] = fe->nChans;
  info7[2] = fe->samprate;
  info7[3] = 16;
  info7[4] = fe->nChans * eal_samplesPerFrameTab[fe->ver][fe->layer - 1];
  info7[5] = fe->layer;
  info7[6] = fe->ver;
  return ERR_NONE;
}

// header-only queries (MP3GetNextFrameInfo analog)
int eal_mp3_frame_info(void *hctx, const uint8_t *buf, int32_t *info7) {
  Mp3Frontend *fe = (Mp3Frontend *) hctx;
  if (fe->unpack_frame_header(buf) < 0 || fe->layer != 3) return ERR_INVALID_FRAMEHEADER;
  info7[0] = fe->bitrate;
  info7[1] = fe->nChans;
  info7[2] = fe->samprate;
  info7[3] = 16;
  info7[4] = fe->nChans * eal_samplesPerFrameTab[fe->ver][fe->layer - 1];
  info7[5] = fe->layer;
  info7[6] = fe->ver;
  return ERR_NONE;
}

// ---------------------------------------------------------------- checkpoint
// Mp3Frontend is a POD aggregate (fixed arrays + ints, no owning pointers),
// so the serializable state is a straight byte image (SURVEY.md §5
// checkpoint/resume — the bit reservoir in mainBuf carries cross-frame data,
// reference mp3_decoder.cpp:8782-8801, and survives the round trip).
size_t eal_mp3_state_size(void *) { return sizeof(Mp3Frontend); }

int eal_mp3_state_save(void *h, uint8_t *out, size_t cap) {
  if (cap < sizeof(Mp3Frontend)) return -1;
  std::memcpy(out, h, sizeof(Mp3Frontend));
  return 0;
}

int eal_mp3_state_load(void *h, const uint8_t *data, size_t len) {
  if (len != sizeof(Mp3Frontend)) return -1;
  std::memcpy(h, data, sizeof(Mp3Frontend));
  return 0;
}

}  // extern "C"
