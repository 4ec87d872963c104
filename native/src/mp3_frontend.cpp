// MP3 (MPEG-1/2/2.5 Layer III) bitstream front-end for esp-audio-libs-tpu.
//
// Fresh implementation of the serial half of MP3 decoding: sync search,
// frame-header and side-info parsing, bit-reservoir management,
// scalefactor unpacking (MPEG-1 scfsi sharing and MPEG-2/2.5 variants),
// and Huffman decoding of the spectral data.  It emits dense 576-coefficient
// int32 tensors (Helix's magnitude + sign-in-MSB convention) plus all the
// per-granule parameters the batched device back-end needs for
// dequantization, stereo reconstruction, IMDCT and subband synthesis.
//
// Behavior mirrors the reference Helix decoder exactly (error codes,
// reservoir semantics, region partitioning): reference
// src/decode/mp3_decoder.cpp:1396-1781 (scalefactors), :7080-7555 (Huffman),
// :8135-8477 (bitstream/header/side info), :8710-8856 (frame driver) — the
// host/device split is ours, the bitstream behavior is the standard's.
// Constant tables are the ISO/IEC 11172-3 data extracted to
// build/mp3_tables.h by tools/extract_mp3_tables.py.

#include <cstdint>
#include <cstdlib>
#include <cstring>

#include "../../build/mp3_tables.h"

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
// huffTabType enum values match tools/extract_mp3_tables.py
enum { TabNoBits = 0, TabOneShot = 1, TabLoopNoLinbits = 2, TabLoopLinbits = 3 };

constexpr int MAX_NGRAN = 2, MAX_NCHAN = 2, MAX_NSAMP = 576, MAX_SCFBD = 4;
constexpr int MAINBUF_SIZE = 1940;
constexpr uint8_t SYNCWORDH = 0xff, SYNCWORDL = 0xf0;

// ------------------------------------------------------------- bit reader
// Big-endian 32-bit cache (semantics of reference :8148-8272).
struct Bits {
  const uint8_t *ptr;
  uint32_t cache = 0;
  int cached = 0;
  int nbytes;

  Bits(const uint8_t *p, int n) : ptr(p), nbytes(n) {}

  void refill() {
    if (nbytes >= 4) {
      cache = ((uint32_t) ptr[0] << 24) | ((uint32_t) ptr[1] << 16) | ((uint32_t) ptr[2] << 8) | ptr[3];
      ptr += 4;
      cached = 32;
      nbytes -= 4;
    } else {
      int n = nbytes;
      cache = 0;
      while (n--) {
        cache |= *ptr++;
        cache <<= 8;
      }
      cache <<= (3 - nbytes) * 8;
      cached = 8 * nbytes;
      nbytes = 0;
    }
  }

  uint32_t get(int nbits) {
    nbits &= 0x1f;
    uint32_t data = cache >> (31 - nbits);
    data >>= 1;
    cache <<= nbits;
    cached -= nbits;
    if (cached < 0) {
      uint32_t low = -cached;
      refill();
      data |= cache >> (32 - low);
      cached -= low;
      cache <<= low;
    }
    return data;
  }

  int bits_used(const uint8_t *start, int start_offset) const {
    return (int) (ptr - start) * 8 - cached - start_offset;
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
  // reference UnpackFrameHeader (:8304-8373); returns header length or -1
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
    } else {
      bitrate = 0;
    }
    return crc ? 6 : 4;
  }

  // reference UnpackSideInfo (:8389-8477); returns side-info byte count
  int unpack_side_info(const uint8_t *buf) {
    int nBytes;
    if (ver == MPEG1) {
      nBytes = (sMode == Mono ? 17 : 32);
    } else {
      nBytes = (sMode == Mono ? 9 : 17);
    }
    Bits bsi(buf, nBytes);
    if (ver == MPEG1) {
      mainDataBegin = bsi.get(9);
      bsi.get(sMode == Mono ? 5 : 3);
      for (int ch = 0; ch < nChans; ch++)
        for (int bd = 0; bd < MAX_SCFBD; bd++) scfsi[ch][bd] = bsi.get(1);
    } else {
      mainDataBegin = bsi.get(8);
      bsi.get(sMode == Mono ? 1 : 2);
    }

    for (int gr = 0; gr < nGrans; gr++) {
      for (int ch = 0; ch < nChans; ch++) {
        SideInfoSub *s = &sis[gr][ch];
        s->part23Length = bsi.get(12);
        s->nBigvals = bsi.get(9);
        s->globalGain = bsi.get(8);
        s->sfCompress = bsi.get(ver == MPEG1 ? 4 : 9);
        s->winSwitchFlag = bsi.get(1);
        if (s->winSwitchFlag) {
          s->blockType = bsi.get(2);
          s->mixedBlock = bsi.get(1);
          s->tableSelect[0] = bsi.get(5);
          s->tableSelect[1] = bsi.get(5);
          s->tableSelect[2] = 0;
          s->subBlockGain[0] = bsi.get(3);
          s->subBlockGain[1] = bsi.get(3);
          s->subBlockGain[2] = bsi.get(3);
          if (s->blockType == 0) {
            s->nBigvals = 0;
            s->part23Length = 0;
            s->sfCompress = 0;
          } else if (s->blockType == 2 && s->mixedBlock == 0) {
            s->region0Count = 8;
          } else {
            s->region0Count = 7;
          }
          s->region1Count = 20 - s->region0Count;
        } else {
          s->blockType = 0;
          s->mixedBlock = 0;
          s->tableSelect[0] = bsi.get(5);
          s->tableSelect[1] = bsi.get(5);
          s->tableSelect[2] = bsi.get(5);
          s->region0Count = bsi.get(4);
          s->region1Count = bsi.get(3);
        }
        s->preFlag = (ver == MPEG1 ? bsi.get(1) : 0);
        s->sfactScale = bsi.get(1);
        s->count1TableSelect = bsi.get(1);
      }
    }
    return nBytes;
  }

  // ------------------------------------------------------- scalefactors
  // reference UnpackSFMPEG1 (:1424-1505)
  void unpack_sf_mpeg1(Bits *bsi, SideInfoSub *s, ScaleFactorSub *sf, int *scfsi_ch, int gr, ScaleFactorSub *sfGr0) {
    int slen0 = eal_SFLenTab[s->sfCompress][0];
    int slen1 = eal_SFLenTab[s->sfCompress][1];
    int sfb;
    if (s->blockType == 2) {
      if (s->mixedBlock) {
        for (sfb = 0; sfb < 8; sfb++) sf->l[sfb] = bsi->get(slen0);
        sfb = 3;
      } else {
        sfb = 0;
      }
      for (; sfb < 6; sfb++)
        for (int w = 0; w < 3; w++) sf->s[sfb][w] = bsi->get(slen0);
      for (; sfb < 12; sfb++)
        for (int w = 0; w < 3; w++) sf->s[sfb][w] = bsi->get(slen1);
      sf->s[12][0] = sf->s[12][1] = sf->s[12][2] = 0;
    } else {
      if (gr == 0) {
        for (sfb = 0; sfb < 11; sfb++) sf->l[sfb] = bsi->get(slen0);
        for (sfb = 11; sfb < 21; sfb++) sf->l[sfb] = bsi->get(slen1);
        return;
      }
      sfb = 0;
      if (scfsi_ch[0]) for (; sfb < 6; sfb++) sf->l[sfb] = sfGr0->l[sfb];
      else for (; sfb < 6; sfb++) sf->l[sfb] = bsi->get(slen0);
      if (scfsi_ch[1]) for (; sfb < 11; sfb++) sf->l[sfb] = sfGr0->l[sfb];
      else for (; sfb < 11; sfb++) sf->l[sfb] = bsi->get(slen0);
      if (scfsi_ch[2]) for (; sfb < 16; sfb++) sf->l[sfb] = sfGr0->l[sfb];
      else for (; sfb < 16; sfb++) sf->l[sfb] = bsi->get(slen1);
      if (scfsi_ch[3]) for (; sfb < 21; sfb++) sf->l[sfb] = sfGr0->l[sfb];
      else for (; sfb < 21; sfb++) sf->l[sfb] = bsi->get(slen1);
      sf->l[21] = 0;
      sf->l[22] = 0;
    }
  }

  // reference UnpackSFMPEG2 (:1574-1720)
  void unpack_sf_mpeg2(Bits *bsi, SideInfoSub *s, ScaleFactorSub *sf, int gr, int ch, int mode_ext) {
    (void) gr;
    int slen[4], nr[4];
    int sfCompress = s->sfCompress;
    int preFlag = 0, intensityScale = 0, sfcIdx;

    if (!((mode_ext & 0x01) && (ch == 1))) {
      if (sfCompress < 400) {
        slen[0] = (sfCompress >> 4) / 5;
        slen[1] = (sfCompress >> 4) % 5;
        slen[2] = (sfCompress & 0x0f) >> 2;
        slen[3] = (sfCompress & 0x03);
        sfcIdx = 0;
      } else if (sfCompress < 500) {
        sfCompress -= 400;
        slen[0] = (sfCompress >> 2) / 5;
        slen[1] = (sfCompress >> 2) % 5;
        slen[2] = (sfCompress & 0x03);
        slen[3] = 0;
        sfcIdx = 1;
      } else {
        sfCompress -= 500;
        slen[0] = sfCompress / 3;
        slen[1] = sfCompress % 3;
        slen[2] = slen[3] = 0;
        if (s->mixedBlock) {
          slen[2] = slen[1];
          slen[1] = slen[0];
        }
        preFlag = 1;
        sfcIdx = 2;
      }
    } else {
      intensityScale = sfCompress & 0x01;
      sfCompress >>= 1;
      if (sfCompress < 180) {
        slen[0] = sfCompress / 36;
        slen[1] = (sfCompress % 36) / 6;
        slen[2] = (sfCompress % 36) % 6;
        slen[3] = 0;
        sfcIdx = 3;
      } else if (sfCompress < 244) {
        sfCompress -= 180;
        slen[0] = (sfCompress & 0x3f) >> 4;
        slen[1] = (sfCompress & 0x0f) >> 2;
        slen[2] = (sfCompress & 0x03);
        slen[3] = 0;
        sfcIdx = 4;
      } else {
        sfCompress -= 244;
        slen[0] = sfCompress / 3;
        slen[1] = sfCompress % 3;
        slen[2] = slen[3] = 0;
        sfcIdx = 5;
      }
    }

    int btIdx = 0;
    if (s->blockType == 2) btIdx = (s->mixedBlock ? 2 : 1);
    for (int i = 0; i < 4; i++) nr[i] = eal_NRTab[sfcIdx][btIdx][i];

    if ((mode_ext & 0x01) && (ch == 1)) {
      for (int i = 0; i < 4; i++) {
        sfjs_slen[i] = slen[i];
        sfjs_nr[i] = nr[i];
      }
      sfjs_intensity = intensityScale;
    }
    s->preFlag = preFlag;

    int sfb, nrIdx;
    if (s->blockType == 2) {
      if (s->mixedBlock) {
        for (sfb = 0; sfb < 6; sfb++) sf->l[sfb] = bsi->get(slen[0]);
        sfb = 3;
        nrIdx = 1;
      } else {
        sfb = 0;
        nrIdx = 0;
      }
      for (; nrIdx <= 3; nrIdx++)
        for (int i = 0; i < nr[nrIdx]; i++, sfb++)
          for (int w = 0; w < 3; w++) sf->s[sfb][w] = bsi->get(slen[nrIdx]);
      sf->s[12][0] = sf->s[12][1] = sf->s[12][2] = 0;
    } else {
      sfb = 0;
      for (nrIdx = 0; nrIdx <= 3; nrIdx++)
        for (int i = 0; i < nr[nrIdx]; i++, sfb++) sf->l[sfb] = bsi->get(slen[nrIdx]);
      sf->l[21] = sf->l[22] = 0;
    }
  }

  // reference UnpackScaleFactors (:1722-1781); returns bytes consumed
  int unpack_scale_factors(const uint8_t *buf, int *bitOffset, int bitsAvail, int gr, int ch) {
    const uint8_t *startBuf = buf;
    Bits bsi(buf, (bitsAvail + *bitOffset + 7) / 8);
    if (*bitOffset) bsi.get(*bitOffset);

    if (ver == MPEG1)
      unpack_sf_mpeg1(&bsi, &sis[gr][ch], &sfis[gr][ch], scfsi[ch], gr, &sfis[0][ch]);
    else
      unpack_sf_mpeg2(&bsi, &sis[gr][ch], &sfis[gr][ch], gr, ch, modeExt);

    int bitsUsed = bsi.bits_used(buf, *bitOffset);
    buf += (bitsUsed + *bitOffset) >> 3;
    *bitOffset = (bitsUsed + *bitOffset) & 0x07;
    return (int) (buf - startBuf);
  }
};

// ----------------------------------------------------------------- Huffman
// Magnitude with sign bit stored in the MSB (two's complement applied in the
// device dequantizer) — reference ApplySign (:7095-7099).
static inline void apply_sign(int &x, uint32_t cache) { x |= (int) (cache & 0x80000000u); }

// reference DecodeHuffmanPairs (:7122-7330); returns bits used or -1
static int decode_huffman_pairs(int32_t *xy, int nVals, int tabIdx, int bitsLeft, const uint8_t *buf, int bitOffset) {
  if (nVals <= 0) return 0;
  if (bitsLeft < 0) return -1;
  int startBits = bitsLeft;

  const uint16_t *tBase = eal_huffTable + eal_huffTabOffset[tabIdx];
  int linBits = eal_huffLinBits[tabIdx];
  int tabType = eal_huffTabType[tabIdx];

  uint32_t cache = 0;
  int cachedBits = (8 - bitOffset) & 0x07;
  if (cachedBits) cache = (uint32_t) (*buf++) << (32 - cachedBits);
  bitsLeft -= cachedBits;

  if (tabType == TabNoBits) {
    for (int i = 0; i < nVals; i += 2) {
      xy[i] = 0;
      xy[i + 1] = 0;
    }
    return 0;
  }

  int padBits = 0;
  if (tabType == TabOneShot) {
    int maxBits = tBase[0] & 0x0f;
    tBase++;
    while (nVals > 0) {
      if (bitsLeft >= 16) {
        cache |= (uint32_t) (*buf++) << (24 - cachedBits);
        cache |= (uint32_t) (*buf++) << (16 - cachedBits);
        cachedBits += 16;
        bitsLeft -= 16;
      } else {
        if (cachedBits + bitsLeft <= 0) return -1;
        if (bitsLeft > 0) cache |= (uint32_t) (*buf++) << (24 - cachedBits);
        if (bitsLeft > 8) cache |= (uint32_t) (*buf++) << (16 - cachedBits);
        cachedBits += bitsLeft;
        bitsLeft = 0;
        cache &= (uint32_t) ((int32_t) 0x80000000 >> (cachedBits - 1));
        padBits = 11;
        cachedBits += padBits;
      }
      while (nVals > 0 && cachedBits >= 11) {
        uint16_t cw = tBase[cache >> (32 - maxBits)];
        int len = (cw >> 12) & 0x0f;
        cachedBits -= len;
        cache <<= len;
        int x = (cw >> 4) & 0x0f;
        if (x) {
          apply_sign(x, cache);
          cache <<= 1;
          cachedBits--;
        }
        int y = (cw >> 8) & 0x0f;
        if (y) {
          apply_sign(y, cache);
          cache <<= 1;
          cachedBits--;
        }
        if (cachedBits < padBits) return -1;
        *xy++ = x;
        *xy++ = y;
        nVals -= 2;
      }
    }
    bitsLeft += (cachedBits - padBits);
    return startBits - bitsLeft;
  }

  if (tabType == TabLoopLinbits || tabType == TabLoopNoLinbits) {
    const uint16_t *tCurr = tBase;
    while (nVals > 0) {
      if (bitsLeft >= 16) {
        cache |= (uint32_t) (*buf++) << (24 - cachedBits);
        cache |= (uint32_t) (*buf++) << (16 - cachedBits);
        cachedBits += 16;
        bitsLeft -= 16;
      } else {
        if (cachedBits + bitsLeft <= 0) return -1;
        if (bitsLeft > 0) cache |= (uint32_t) (*buf++) << (24 - cachedBits);
        if (bitsLeft > 8) cache |= (uint32_t) (*buf++) << (16 - cachedBits);
        cachedBits += bitsLeft;
        bitsLeft = 0;
        cache &= (uint32_t) ((int32_t) 0x80000000 >> (cachedBits - 1));
        padBits = 11;
        cachedBits += padBits;
      }
      while (nVals > 0 && cachedBits >= 11) {
        int maxBits = tCurr[0] & 0x0f;
        uint16_t cw = tCurr[(cache >> (32 - maxBits)) + 1];
        int len = (cw >> 12) & 0x0f;
        if (!len) {
          cachedBits -= maxBits;
          cache <<= maxBits;
          tCurr += cw;
          continue;
        }
        cachedBits -= len;
        cache <<= len;

        int x = (cw >> 4) & 0x0f;
        int y = (cw >> 8) & 0x0f;

        if (x == 15 && tabType == TabLoopLinbits) {
          int minBits = linBits + 1 + (y ? 1 : 0);
          if (cachedBits + bitsLeft < minBits) return -1;
          while (cachedBits < minBits) {
            cache |= (uint32_t) (*buf++) << (24 - cachedBits);
            cachedBits += 8;
            bitsLeft -= 8;
          }
          if (bitsLeft < 0) {
            cachedBits += bitsLeft;
            bitsLeft = 0;
            cache &= (uint32_t) ((int32_t) 0x80000000 >> (cachedBits - 1));
          }
          x += (int) (cache >> (32 - linBits));
          cachedBits -= linBits;
          cache <<= linBits;
        }
        if (x) {
          apply_sign(x, cache);
          cache <<= 1;
          cachedBits--;
        }
        if (y == 15 && tabType == TabLoopLinbits) {
          int minBits = linBits + 1;
          if (cachedBits + bitsLeft < minBits) return -1;
          while (cachedBits < minBits) {
            cache |= (uint32_t) (*buf++) << (24 - cachedBits);
            cachedBits += 8;
            bitsLeft -= 8;
          }
          if (bitsLeft < 0) {
            cachedBits += bitsLeft;
            bitsLeft = 0;
            cache &= (uint32_t) ((int32_t) 0x80000000 >> (cachedBits - 1));
          }
          y += (int) (cache >> (32 - linBits));
          cachedBits -= linBits;
          cache <<= linBits;
        }
        if (y) {
          apply_sign(y, cache);
          cache <<= 1;
          cachedBits--;
        }
        if (cachedBits < padBits) return -1;
        *xy++ = x;
        *xy++ = y;
        nVals -= 2;
        tCurr = tBase;
      }
    }
    bitsLeft += (cachedBits - padBits);
    return startBits - bitsLeft;
  }

  return -1;  // invalid table
}

// reference DecodeHuffmanQuads (:7354-7445); returns count decoded
static int decode_huffman_quads(int32_t *vwxy, int nVals, int tabIdx, int bitsLeft, const uint8_t *buf,
                                int bitOffset) {
  if (bitsLeft <= 0) return 0;
  const uint8_t *tBase = eal_quadTable + eal_quadTabOffset[tabIdx];
  int maxBits = eal_quadTabMaxBits[tabIdx];

  uint32_t cache = 0;
  int cachedBits = (8 - bitOffset) & 0x07;
  if (cachedBits) cache = (uint32_t) (*buf++) << (32 - cachedBits);
  bitsLeft -= cachedBits;

  int i = 0, padBits = 0;
  while (i < (nVals - 3)) {
    if (bitsLeft >= 16) {
      cache |= (uint32_t) (*buf++) << (24 - cachedBits);
      cache |= (uint32_t) (*buf++) << (16 - cachedBits);
      cachedBits += 16;
      bitsLeft -= 16;
    } else {
      if (cachedBits + bitsLeft <= 0) return i;
      if (bitsLeft > 0) cache |= (uint32_t) (*buf++) << (24 - cachedBits);
      if (bitsLeft > 8) cache |= (uint32_t) (*buf++) << (16 - cachedBits);
      cachedBits += bitsLeft;
      bitsLeft = 0;
      cache &= (uint32_t) ((int32_t) 0x80000000 >> (cachedBits - 1));
      padBits = 10;
      cachedBits += padBits;
    }
    while (i < (nVals - 3) && cachedBits >= 10) {
      uint8_t cw = tBase[cache >> (32 - maxBits)];
      int len = (cw >> 4) & 0x0f;
      cachedBits -= len;
      cache <<= len;
      int v = (cw >> 3) & 0x01;
      if (v) {
        apply_sign(v, cache);
        cache <<= 1;
        cachedBits--;
      }
      int w = (cw >> 2) & 0x01;
      if (w) {
        apply_sign(w, cache);
        cache <<= 1;
        cachedBits--;
      }
      int x = (cw >> 1) & 0x01;
      if (x) {
        apply_sign(x, cache);
        cache <<= 1;
        cachedBits--;
      }
      int y = (cw >> 0) & 0x01;
      if (y) {
        apply_sign(y, cache);
        cache <<= 1;
        cachedBits--;
      }
      if (cachedBits < padBits) return i;
      *vwxy++ = v;
      *vwxy++ = w;
      *vwxy++ = x;
      *vwxy++ = y;
      i += 4;
    }
  }
  return i;
}

// reference DecodeHuffman (:7470-7555); returns bytes consumed or -1
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
    int bitsUsed = decode_huffman_pairs(huffDecBuf + rEnd[i], rEnd[i + 1] - rEnd[i], s->tableSelect[i], bitsLeft,
                                        buf, *bitOffset);
    if (bitsUsed < 0 || bitsUsed > bitsLeft) return -1;
    buf += (bitsUsed + *bitOffset) >> 3;
    *bitOffset = (bitsUsed + *bitOffset) & 0x07;
    bitsLeft -= bitsUsed;
  }

  *nonZeroBound += decode_huffman_quads(huffDecBuf + rEnd[3], MAX_NSAMP - rEnd[3], s->count1TableSelect, bitsLeft,
                                        buf, *bitOffset);

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

// reference MP3FindFreeSync (:8570-8610)
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

  int fhBytes = fe->unpack_frame_header(inbuf);
  if (fhBytes < 0) return ERR_INVALID_FRAMEHEADER;
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
      fe->bitrate = (freeFrameBytes * fe->samprate * 8) / (fe->nGrans * fe->nGranSamps);
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
    fe->mainDataBytes = fe->nSlots;
    mainPtr = inbuf;
    inbuf += fe->nSlots;
  } else {
    if (fe->nSlots > bytesLeft) {
      *clear_out = 1;
      *consumed = (int) (inbuf - in0);
      return ERR_INDATA_UNDERFLOW;
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

// Per-sample dequant/stereo parameter expansion for one granule (all
// channels). Native transcription of models/mp3.py granule_params (which
// mirrors DequantChannel's control flow, reference mp3_decoder.cpp:657-795
// and the stereo band structure of :1139-1422): the batched decoder calls
// this once per (stream, granule), and on a single-core TPU-VM host the
// Python/numpy version dominates batched decode time.
//
// Output: one packed int32 blob, laid out as (C = 2 channel slots):
//   [0)      gain        [C][576]
//   [1)      band_in     [C][576]
//   [2)      win_in      [C][576]
//   [3)      is_long_in  [C][576]
//   [4)      processed   [C][576]
//   [5)      invperm     [C][576]
//   then     cb_start_s[C], has_short[C], cb_type[C], out_nzb_short[C]
//   then     band_out_l[576], band_out_s[576], win_out[576],
//            sf_right_l[576], sf_right_s[576], il_out_l[576], il_out_s[576]
//   then     sfb_l[23], sfb_s[14]
//   then     mode_ext, ver_is_mpeg1, intensity_scale
// Total: 6*2*576 + 4*2 + 7*576 + 23 + 14 + 3 = 10992 words.
int eal_mp3_granule_params(const int32_t *params /*[2][24]*/, const int32_t *sf /*[2][62]*/,
                           const int32_t *frame /*[16]*/, const int32_t *sfjs /*[8]*/,
                           const int32_t *nzb /*[2]*/, int32_t *out) {
  const int C = 2, N = 576, IMDCT_SCALE = 2;
  int ver = frame[0], s_mode = frame[2], mode_ext = frame[3], sr_idx = frame[4];
  int nch = frame[5];
  (void) s_mode;
  const int32_t *sfb_l = eal_sfBandLong[ver][sr_idx];
  const int32_t *sfb_s = eal_sfBandShort[ver][sr_idx];

  int32_t *gain = out;
  int32_t *band_in = gain + C * N;
  int32_t *win_in = band_in + C * N;
  int32_t *is_long = win_in + C * N;
  int32_t *processed = is_long + C * N;
  int32_t *invperm = processed + C * N;
  int32_t *cb_start_s = invperm + C * N;
  int32_t *has_short = cb_start_s + C;
  int32_t *cb_type = has_short + C;
  int32_t *out_nzb_short = cb_type + C;
  int32_t *band_out_l = out_nzb_short + C;
  int32_t *band_out_s = band_out_l + N;
  int32_t *win_out = band_out_s + N;
  int32_t *sf_right_l = win_out + N;
  int32_t *sf_right_s = sf_right_l + N;
  int32_t *il_out_l = sf_right_s + N;
  int32_t *il_out_s = il_out_l + N;
  int32_t *o_sfb_l = il_out_s + N;
  int32_t *o_sfb_s = o_sfb_l + 23;
  int32_t *scalars = o_sfb_s + 14;

  for (int i = 0; i < C * N; i++) {
    gain[i] = 0; win_in[i] = 0; is_long[i] = 0; processed[i] = 0;
    band_in[i] = -1; invperm[i] = i % N;
  }
  for (int c = 0; c < C; c++) {
    cb_start_s[c] = 0; has_short[c] = 0; cb_type[c] = 0; out_nzb_short[c] = 0;
  }

  for (int ch = 0; ch < nch; ch++) {
    const int32_t *p = params + ch * 24;
    int block_type = p[5], mixed = p[6];
    int sfact_mult = 2 * (p[16] + 1);
    int global_gain = p[2];
    if (mode_ext >> 1) global_gain -= 2;
    global_gain += IMDCT_SCALE;

    int cb_end_l, cbs, cb_end_s;
    if (block_type == 2) {
      if (mixed) { cb_end_l = (ver == 0) ? 8 : 6; cbs = 3; }
      else       { cb_end_l = 0; cbs = 0; }
      cb_end_s = 13;
    } else {
      cb_end_l = 22; cbs = 13; cb_end_s = 13;
    }
    cb_start_s[ch] = cbs;
    has_short[ch] = cbs < 12;
    cb_type[ch] = (block_type != 2) ? 0 : (mixed ? 2 : 1);

    const int32_t *sfl = sf + ch * 62;
    const int32_t *sfs = sf + ch * 62 + 23;  // [13][3]
    int i = 0;
    for (int cb = 0; cb < cb_end_l; cb++) {
      int n = sfb_l[cb + 1] - sfb_l[cb];
      int g = 210 - global_gain + sfact_mult * (sfl[cb] + (p[15] ? eal_preTab[cb] : 0));
      for (int k = 0; k < n; k++) {
        gain[ch * N + i + k] = g;
        band_in[ch * N + i + k] = cb;
        is_long[ch * N + i + k] = 1;
        processed[ch * N + i + k] = 1;
      }
      i += n;
      if (i >= nzb[ch]) break;
    }
    if (cbs < 12) {
      for (int cb = cbs; cb < cb_end_s; cb++) {
        int n = sfb_s[cb + 1] - sfb_s[cb];
        for (int w = 0; w < 3; w++) {
          int g = 210 - global_gain + 8 * p[10 + w] + sfact_mult * sfs[cb * 3 + w];
          for (int k = 0; k < n; k++) {
            gain[ch * N + i + n * w + k] = g;
            band_in[ch * N + i + n * w + k] = cb;
            win_in[ch * N + i + n * w + k] = w;
            processed[ch * N + i + n * w + k] = 1;
          }
        }
        for (int w = 0; w < 3; w++)
          for (int j = 0; j < n; j++)
            invperm[ch * N + i + 3 * j + w] = i + n * w + j;
        i += 3 * n;
        if (i >= nzb[ch]) break;
      }
      out_nzb_short[ch] = i;
    }
  }

  // output-order structure arrays (stereo stage)
  for (int t = 0; t < N; t++) { band_out_l[t] = -1; band_out_s[t] = -1; win_out[t] = 0; }
  for (int cb = 0; cb < 22; cb++)
    for (int t = sfb_l[cb]; t < sfb_l[cb + 1]; t++) band_out_l[t] = cb;
  for (int cb = 0; cb < 13; cb++) {
    int lo = 3 * sfb_s[cb], hi = 3 * sfb_s[cb + 1];
    for (int t = lo; t < hi && t < N; t++) { band_out_s[t] = cb; win_out[t] = (t - lo) % 3; }
  }

  for (int t = 0; t < N; t++) { sf_right_l[t] = 0; sf_right_s[t] = 0; il_out_l[t] = 0; il_out_s[t] = 0; }
  if (nch == 2) {
    const int32_t *sfl1 = sf + 62;
    const int32_t *sfs1 = sf + 62 + 23;
    int32_t il[23];
    for (int k = 0; k < 23; k++) il[k] = 0;
    int k = 0;
    for (int r = 0; r < 4; r++) {
      int32_t tmp = (1 << sfjs[r]) - 1;
      for (int c = 0; c < sfjs[4 + r]; c++) {
        if (k < 23) il[k] = tmp;
        k++;
      }
    }
    int32_t il_long[23], il_short[23];
    for (int j = 0; j < 23; j++) { il_long[j] = il[j]; il_short[j] = il[j]; }
    il_long[21] = il_long[22] = 1;   // reference :1352
    il_short[12] = 1;                // reference :1391
    for (int t = 0; t < N; t++) {
      if (band_out_l[t] >= 0) {
        sf_right_l[t] = sfl1[band_out_l[t]];
        il_out_l[t] = il_long[band_out_l[t]];
      }
      if (band_out_s[t] >= 0) {
        sf_right_s[t] = sfs1[band_out_s[t] * 3 + win_out[t]];
        int b = band_out_s[t] < 0 ? 0 : (band_out_s[t] > 12 ? 12 : band_out_s[t]);
        il_out_s[t] = il_short[b];
      }
    }
  }

  for (int j = 0; j < 23; j++) o_sfb_l[j] = sfb_l[j];
  for (int j = 0; j < 14; j++) o_sfb_s[j] = sfb_s[j];
  scalars[0] = mode_ext;
  scalars[1] = (ver == 0);
  scalars[2] = frame[12];
  return 0;
}

// COMPACT per-(stream, granule) parameters: band-level values + section
// bounds only (~230 int32), for DEVICE-side per-sample expansion. The full
// expanded blob (eal_mp3_granule_params) is 44KB/stream — shipping it
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

// Batched variant: expand B (stream, granule) parameter sets in one call —
// the batched decoder makes one ctypes crossing per granule for the whole
// stream group instead of B Python-side calls (the per-call wrapper cost,
// not the expansion itself, dominates on this host).
int eal_mp3_granule_params_batch(int B, const int32_t *params /*[B][2][24]*/,
                                 const int32_t *sf /*[B][2][62]*/,
                                 const int32_t *frame /*[B][16]*/,
                                 const int32_t *sfjs /*[B][8]*/,
                                 const int32_t *nzb /*[B][2]*/,
                                 int32_t *out /*[B][10992]*/) {
  const int GP = 6 * 2 * 576 + 4 * 2 + 7 * 576 + 23 + 14 + 3;
  for (int b = 0; b < B; b++)
    eal_mp3_granule_params(params + b * 2 * 24, sf + b * 2 * 62, frame + b * 16,
                           sfjs + b * 8, nzb + b * 2, out + b * GP);
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
