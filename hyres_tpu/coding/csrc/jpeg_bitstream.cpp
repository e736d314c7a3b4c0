// Baseline JFIF bitstream assembly / parsing for HyRES-TPU.
//
// The reference gets its JPEG base layer from libturbojpeg / libjpeg
// (/root/reference/models/utils/turbo_jpeg_compression.py:5-60). In the
// TPU-native build the heavy math (color convert, 4:2:0 subsample, 8x8
// DCT, quantization and their inverses) runs on-device as XLA matmuls;
// this file handles ONLY the serial bit-twiddling the TPU shouldn't do:
//
//   encode: quantized DCT coefficient planes -> baseline JFIF bytes
//           (ITU T.81 Annex K standard Huffman tables, 4:2:0 MCUs)
//   decode: baseline JFIF bytes -> quantized coefficient planes + the
//           quant tables (supports our own output and libjpeg/PIL output:
//           arbitrary baseline DHT/DQT, 4:2:0 / 4:4:4 / grayscale, DRI)
//
// Exposed through a plain C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---- ITU T.81 Annex K constants (public standard tables) -------------------

const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

const uint8_t kDcLumBits[17] = {0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0};
const uint8_t kDcLumVals[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
const uint8_t kDcChrBits[17] = {0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0};
const uint8_t kDcChrVals[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};

const uint8_t kAcLumBits[17] = {0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d};
const uint8_t kAcLumVals[162] = {
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

const uint8_t kAcChrBits[17] = {0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77};
const uint8_t kAcChrVals[162] = {
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

// ---- Huffman code derivation (T.81 C.2) -------------------------------------

struct HuffEnc {
  uint16_t code[256];
  uint8_t size[256];
};

void build_enc_table(const uint8_t *bits, const uint8_t *vals, HuffEnc &t) {
  std::memset(t.size, 0, sizeof(t.size));
  uint16_t code = 0;
  int k = 0;
  for (int len = 1; len <= 16; ++len) {
    for (int i = 0; i < bits[len]; ++i, ++k) {
      t.code[vals[k]] = code;
      t.size[vals[k]] = static_cast<uint8_t>(len);
      ++code;
    }
    code <<= 1;
  }
}

struct HuffDec {
  int32_t mincode[17];
  int32_t maxcode[18];  // maxcode[len] = largest code of that length, -1 if none
  int32_t valptr[17];
  uint8_t vals[256];
  int nvals = 0;
};

void build_dec_table(const uint8_t *bits, const uint8_t *vals, HuffDec &t) {
  t.nvals = 0;
  for (int len = 1; len <= 16; ++len) t.nvals += bits[len];
  std::memcpy(t.vals, vals, t.nvals);
  int32_t code = 0;
  int k = 0;
  for (int len = 1; len <= 16; ++len) {
    t.valptr[len] = k;
    t.mincode[len] = code;
    code += bits[len];
    k += bits[len];
    t.maxcode[len] = bits[len] ? code - 1 : -1;
    code <<= 1;
  }
  t.maxcode[17] = 0x7fffffff;
}

// ---- bit IO -----------------------------------------------------------------

struct BitWriter {
  std::vector<uint8_t> &out;
  uint32_t acc = 0;
  int nbits = 0;
  explicit BitWriter(std::vector<uint8_t> &o) : out(o) {}

  void put(uint32_t value, int n) {
    acc = (acc << n) | (value & ((1u << n) - 1));
    nbits += n;
    while (nbits >= 8) {
      const uint8_t b = static_cast<uint8_t>(acc >> (nbits - 8));
      out.push_back(b);
      if (b == 0xFF) out.push_back(0x00);  // byte stuffing
      nbits -= 8;
    }
  }
};

struct BitReader {
  const uint8_t *p;
  const uint8_t *end;
  uint32_t acc = 0;
  int nbits = 0;
  bool hit_marker = false;

  BitReader(const uint8_t *data, const uint8_t *e) : p(data), end(e) {}

  int next_bit() {
    if (nbits == 0) {
      if (p >= end) return 0;
      uint8_t b = *p++;
      if (b == 0xFF) {
        if (p < end && *p == 0x00) {
          ++p;  // stuffed byte
        } else {
          hit_marker = true;
          return 0;
        }
      }
      acc = b;
      nbits = 8;
    }
    --nbits;
    return (acc >> nbits) & 1;
  }
  int32_t get_bits(int n) {
    int32_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | next_bit();
    return v;
  }
  void reset_byte() { nbits = 0; }
};

int bit_size(int v) {
  int a = v < 0 ? -v : v;
  int n = 0;
  while (a) {
    ++n;
    a >>= 1;
  }
  return n;
}

void encode_block(BitWriter &bw, const int16_t *blk, int16_t &dc_pred,
                  const HuffEnc &dc, const HuffEnc &ac) {
  // DC
  const int diff = blk[0] - dc_pred;
  dc_pred = blk[0];
  const int s = bit_size(diff);
  bw.put(dc.code[s], dc.size[s]);
  if (s) bw.put(diff < 0 ? diff + (1 << s) - 1 : diff, s);
  // AC
  int run = 0;
  for (int k = 1; k < 64; ++k) {
    const int v = blk[kZigzag[k]];
    if (v == 0) {
      ++run;
      continue;
    }
    while (run > 15) {
      bw.put(ac.code[0xF0], ac.size[0xF0]);  // ZRL
      run -= 16;
    }
    const int sz = bit_size(v);
    const int rs = (run << 4) | sz;
    bw.put(ac.code[rs], ac.size[rs]);
    bw.put(v < 0 ? v + (1 << sz) - 1 : v, sz);
    run = 0;
  }
  if (run > 0) bw.put(ac.code[0x00], ac.size[0x00]);  // EOB
}

void put_marker(std::vector<uint8_t> &o, uint8_t m) {
  o.push_back(0xFF);
  o.push_back(m);
}
void put_u16(std::vector<uint8_t> &o, uint16_t v) {
  o.push_back(v >> 8);
  o.push_back(v & 0xFF);
}

}  // namespace

extern "C" {

// Encode quantized coefficient planes to a baseline 4:2:0 JFIF stream.
//   y_coef:  (mcu_h*2, mcu_w*2, 64) int16, natural (row-major) order
//   cb/cr:   (mcu_h,   mcu_w,   64) int16
//   qy, qc:  64 x int32 quant tables, natural order
// Returns byte count written to *out_buf (malloc'd; free with hyj_buf_free).
int64_t hyj_encode_420(const int16_t *y_coef, const int16_t *cb_coef,
                       const int16_t *cr_coef, int32_t width, int32_t height,
                       int32_t mcu_w, int32_t mcu_h, const int32_t *qy,
                       const int32_t *qc, uint8_t **out_buf) {
  std::vector<uint8_t> o;
  o.reserve(1 << 16);

  put_marker(o, 0xD8);  // SOI
  // APP0 / JFIF 1.1
  put_marker(o, 0xE0);
  put_u16(o, 16);
  const uint8_t jfif[14] = {'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0};
  o.insert(o.end(), jfif, jfif + 14);
  // DQT x2 (zigzag order on the wire)
  for (int t = 0; t < 2; ++t) {
    const int32_t *q = t == 0 ? qy : qc;
    put_marker(o, 0xDB);
    put_u16(o, 67);
    o.push_back(static_cast<uint8_t>(t));
    for (int k = 0; k < 64; ++k) o.push_back(static_cast<uint8_t>(q[kZigzag[k]]));
  }
  // SOF0: 8-bit, 3 components, 4:2:0
  put_marker(o, 0xC0);
  put_u16(o, 17);
  o.push_back(8);
  put_u16(o, static_cast<uint16_t>(height));
  put_u16(o, static_cast<uint16_t>(width));
  o.push_back(3);
  const uint8_t comp[3][3] = {{1, 0x22, 0}, {2, 0x11, 1}, {3, 0x11, 1}};
  for (auto &c : comp) {
    o.push_back(c[0]);
    o.push_back(c[1]);
    o.push_back(c[2]);
  }
  // DHT x4
  struct {
    uint8_t cls_id;
    const uint8_t *bits;
    const uint8_t *vals;
    int n;
  } tables[4] = {{0x00, kDcLumBits, kDcLumVals, 12},
                 {0x10, kAcLumBits, kAcLumVals, 162},
                 {0x01, kDcChrBits, kDcChrVals, 12},
                 {0x11, kAcChrBits, kAcChrVals, 162}};
  for (auto &t : tables) {
    put_marker(o, 0xC4);
    put_u16(o, static_cast<uint16_t>(3 + 16 + t.n));
    o.push_back(t.cls_id);
    for (int i = 1; i <= 16; ++i) o.push_back(t.bits[i]);
    o.insert(o.end(), t.vals, t.vals + t.n);
  }
  // SOS
  put_marker(o, 0xDA);
  put_u16(o, 12);
  o.push_back(3);
  const uint8_t sos[3][2] = {{1, 0x00}, {2, 0x11}, {3, 0x11}};
  for (auto &c : sos) {
    o.push_back(c[0]);
    o.push_back(c[1]);
  }
  o.push_back(0);
  o.push_back(63);
  o.push_back(0);

  HuffEnc dcl, acl, dcc, acc_;
  build_enc_table(kDcLumBits, kDcLumVals, dcl);
  build_enc_table(kAcLumBits, kAcLumVals, acl);
  build_enc_table(kDcChrBits, kDcChrVals, dcc);
  build_enc_table(kAcChrBits, kAcChrVals, acc_);

  BitWriter bw(o);
  int16_t pred[3] = {0, 0, 0};
  const int yw = mcu_w * 2;  // luma blocks per row
  for (int my = 0; my < mcu_h; ++my) {
    for (int mx = 0; mx < mcu_w; ++mx) {
      for (int by = 0; by < 2; ++by) {
        for (int bx = 0; bx < 2; ++bx) {
          const int16_t *blk =
              y_coef + (static_cast<int64_t>(my * 2 + by) * yw + (mx * 2 + bx)) * 64;
          encode_block(bw, blk, pred[0], dcl, acl);
        }
      }
      const int64_t ci = (static_cast<int64_t>(my) * mcu_w + mx) * 64;
      encode_block(bw, cb_coef + ci, pred[1], dcc, acc_);
      encode_block(bw, cr_coef + ci, pred[2], dcc, acc_);
    }
  }
  // pad final byte with 1-bits
  if (bw.nbits > 0) bw.put((1u << (8 - bw.nbits)) - 1, 8 - bw.nbits);

  put_marker(o, 0xD9);  // EOI

  uint8_t *buf = new uint8_t[o.size()];
  std::memcpy(buf, o.data(), o.size());
  *out_buf = buf;
  return static_cast<int64_t>(o.size());
}

void hyj_buf_free(uint8_t *p) { delete[] p; }

// ---- decoder ----------------------------------------------------------------

struct JDecoder {
  int width = 0, height = 0, ncomp = 0;
  int h[3] = {1, 1, 1}, v[3] = {1, 1, 1};  // sampling factors
  int qtab_id[3] = {0, 0, 0};
  int32_t qtabs[4][64] = {};
  HuffDec dc_tabs[4], ac_tabs[4];
  int dc_id[3] = {0, 0, 0}, ac_id[3] = {0, 0, 0};
  int restart_interval = 0;
  int mcu_w = 0, mcu_h = 0;
  std::vector<int16_t> coeffs[3];  // per component, (blocks_h, blocks_w, 64)
  int blocks_w[3] = {}, blocks_h[3] = {};
};

namespace {

int decode_huff(BitReader &br, const HuffDec &t) {
  int32_t code = br.next_bit();
  int len = 1;
  while (code > t.maxcode[len]) {
    code = (code << 1) | br.next_bit();
    ++len;
    if (len > 16) return -1;
  }
  return t.vals[t.valptr[len] + (code - t.mincode[len])];
}

int32_t extend(int32_t v, int s) {
  return (s && v < (1 << (s - 1))) ? v - (1 << s) + 1 : v;
}

}  // namespace

void *hyj_dec_new(const uint8_t *data, int64_t size) {
  JDecoder *d = new JDecoder();
  const uint8_t *p = data;
  const uint8_t *end = data + size;
  bool got_sof = false;

  auto fail = [&]() -> void * {
    delete d;
    return nullptr;
  };

  if (size < 4 || p[0] != 0xFF || p[1] != 0xD8) return fail();
  p += 2;
  while (p + 4 <= end) {
    if (*p != 0xFF) return fail();
    uint8_t marker = p[1];
    p += 2;
    if (marker == 0xD9) break;
    if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) continue;
    const int seglen = (p[0] << 8) | p[1];
    const uint8_t *seg = p + 2;
    const uint8_t *segend = p + seglen;
    if (segend > end) return fail();

    switch (marker) {
      case 0xDB: {  // DQT
        while (seg < segend) {
          const int prec = seg[0] >> 4, id = seg[0] & 15;
          ++seg;
          if (id > 3 || seg + 64 * (prec ? 2 : 1) > segend) return fail();
          for (int k = 0; k < 64; ++k) {
            int32_t q = prec ? ((seg[0] << 8) | seg[1]) : seg[0];
            seg += prec ? 2 : 1;
            d->qtabs[id][kZigzag[k]] = q;
          }
        }
        break;
      }
      case 0xC4: {  // DHT
        while (seg < segend) {
          if (seg + 17 > segend) return fail();
          const int cls = seg[0] >> 4, id = seg[0] & 15;
          if (id > 3) return fail();
          uint8_t bits[17] = {0};
          int total = 0;
          for (int i = 1; i <= 16; ++i) {
            bits[i] = seg[i];
            total += bits[i];
          }
          if (total > 256 || seg + 17 + total > segend) return fail();
          const uint8_t *vals = seg + 17;
          if (cls == 0)
            build_dec_table(bits, vals, d->dc_tabs[id]);
          else
            build_dec_table(bits, vals, d->ac_tabs[id]);
          seg += 17 + total;
        }
        break;
      }
      case 0xC0:
      case 0xC1: {  // SOF0/1 (baseline / extended sequential)
        if (seg + 6 > segend) return fail();
        d->height = (seg[1] << 8) | seg[2];
        d->width = (seg[3] << 8) | seg[4];
        d->ncomp = seg[5];
        if (d->ncomp != 1 && d->ncomp != 3) return fail();
        if (seg + 6 + 3 * d->ncomp > segend) return fail();
        for (int c = 0; c < d->ncomp; ++c) {
          d->h[c] = seg[7 + c * 3] >> 4;
          d->v[c] = seg[7 + c * 3] & 15;
          d->qtab_id[c] = seg[8 + c * 3];
          if (d->h[c] < 1 || d->h[c] > 2 || d->v[c] < 1 || d->v[c] > 2 ||
              d->qtab_id[c] > 3)
            return fail();
        }
        if (d->width <= 0 || d->height <= 0 || d->width > 1 << 15 ||
            d->height > 1 << 15)
          return fail();
        got_sof = true;
        break;
      }
      case 0xC2:
        return fail();  // progressive unsupported
      case 0xDD:
        if (seg + 2 > segend) return fail();
        d->restart_interval = (seg[0] << 8) | seg[1];
        break;
      case 0xDA: {  // SOS — entropy data follows
        if (!got_sof || seg >= segend) return fail();
        const int ns = seg[0];
        if (ns < 1 || ns > 3 || seg + 1 + 2 * ns > segend) return fail();
        for (int i = 0; i < ns; ++i) {
          // component ids are 1-based in our streams and libjpeg's
          const int ci = i;
          d->dc_id[ci] = seg[2 + i * 2] >> 4;
          d->ac_id[ci] = seg[2 + i * 2] & 15;
          if (d->dc_id[ci] > 3 || d->ac_id[ci] > 3) return fail();
        }
        const uint8_t *scan = segend;

        int hmax = 1, vmax = 1;
        for (int c = 0; c < d->ncomp; ++c) {
          if (d->h[c] > hmax) hmax = d->h[c];
          if (d->v[c] > vmax) vmax = d->v[c];
        }
        d->mcu_w = (d->width + 8 * hmax - 1) / (8 * hmax);
        d->mcu_h = (d->height + 8 * vmax - 1) / (8 * vmax);
        for (int c = 0; c < d->ncomp; ++c) {
          d->blocks_w[c] = d->mcu_w * d->h[c];
          d->blocks_h[c] = d->mcu_h * d->v[c];
          d->coeffs[c].assign(
              static_cast<size_t>(d->blocks_w[c]) * d->blocks_h[c] * 64, 0);
        }

        BitReader br(scan, end);
        int16_t pred[3] = {0, 0, 0};
        int mcu_count = 0;
        for (int my = 0; my < d->mcu_h; ++my) {
          for (int mx = 0; mx < d->mcu_w; ++mx) {
            if (d->restart_interval && mcu_count &&
                mcu_count % d->restart_interval == 0) {
              br.reset_byte();
              // skip RSTn marker
              while (br.p + 1 < end && !(br.p[0] == 0xFF && br.p[1] >= 0xD0 &&
                                         br.p[1] <= 0xD7))
                ++br.p;
              if (br.p + 1 < end) br.p += 2;
              br.hit_marker = false;
              pred[0] = pred[1] = pred[2] = 0;
            }
            for (int c = 0; c < d->ncomp; ++c) {
              for (int by = 0; by < d->v[c]; ++by) {
                for (int bx = 0; bx < d->h[c]; ++bx) {
                  int16_t blk[64] = {0};
                  const int t = decode_huff(br, d->dc_tabs[d->dc_id[c]]);
                  if (t < 0) return fail();
                  const int32_t diff = extend(br.get_bits(t), t);
                  pred[c] = static_cast<int16_t>(pred[c] + diff);
                  blk[0] = pred[c];
                  int k = 1;
                  while (k < 64) {
                    const int rs = decode_huff(br, d->ac_tabs[d->ac_id[c]]);
                    if (rs < 0) return fail();
                    const int r = rs >> 4, s = rs & 15;
                    if (s == 0) {
                      if (r == 15) {
                        k += 16;
                        continue;
                      }
                      break;  // EOB
                    }
                    k += r;
                    if (k > 63) return fail();
                    blk[kZigzag[k]] = static_cast<int16_t>(extend(br.get_bits(s), s));
                    ++k;
                  }
                  const int64_t row = static_cast<int64_t>(my) * d->v[c] + by;
                  const int64_t col = static_cast<int64_t>(mx) * d->h[c] + bx;
                  std::memcpy(
                      d->coeffs[c].data() + (row * d->blocks_w[c] + col) * 64,
                      blk, sizeof(blk));
                }
              }
            }
            ++mcu_count;
          }
        }
        return d;
      }
      default:
        break;  // skip APPn / COM / others
    }
    p = segend;
  }
  return fail();
}

void hyj_dec_free(void *d) { delete static_cast<JDecoder *>(d); }

// info: [width, height, ncomp, mcu_w, mcu_h, h0,v0, h1,v1, h2,v2]
void hyj_dec_info(void *d_, int32_t *out) {
  JDecoder &d = *static_cast<JDecoder *>(d_);
  out[0] = d.width;
  out[1] = d.height;
  out[2] = d.ncomp;
  out[3] = d.mcu_w;
  out[4] = d.mcu_h;
  for (int c = 0; c < 3; ++c) {
    out[5 + c * 2] = d.h[c];
    out[6 + c * 2] = d.v[c];
  }
}

void hyj_dec_coeffs(void *d_, int32_t comp, int16_t *out) {
  JDecoder &d = *static_cast<JDecoder *>(d_);
  std::memcpy(out, d.coeffs[comp].data(), d.coeffs[comp].size() * sizeof(int16_t));
}

void hyj_dec_qtable(void *d_, int32_t comp, int32_t *out64) {
  JDecoder &d = *static_cast<JDecoder *>(d_);
  std::memcpy(out64, d.qtabs[d.qtab_id[comp]], 64 * sizeof(int32_t));
}

}  // extern "C"
