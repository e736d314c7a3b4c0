// Host-side rANS range coder for HyRES-TPU.
//
// A from-scratch C++ implementation of 64-bit rANS (Duda's asymmetric
// numeral systems; the classic public-domain "rans64" construction) with
// the same stream semantics as the coder the reference depends on
// (CompressAI 1.2.6's C++ extension, driven from
// /root/reference/models/cheng2020.py:108-180 and implicitly behind every
// EntropyBottleneck / GaussianConditional compress call):
//
//   * 16-bit quantized CDF tables (total = 1 << 16)
//   * per-symbol CDF row selection through an `indexes` array
//   * an escape slot (last CDF bin) + 4-bit bypass chunks for
//     out-of-range values
//   * LIFO flush: symbols are buffered, then encoded in reverse so the
//     decoder reads them forward.
//
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kPrecision = 16;            // CDF total = 1 << 16
constexpr uint32_t kBypassBits = 4;            // bypass chunk width
constexpr uint32_t kMaxBypass = (1u << kBypassBits) - 1;
constexpr uint64_t kRansLow = 1ull << 31;      // renormalization threshold

struct RansSym {
  uint16_t start;
  uint16_t range;   // 0 marks a bypass chunk (raw `start` bits)
  bool bypass;
};

// ---- core rANS primitives -------------------------------------------------

inline void enc_renorm(uint64_t &st, uint32_t *&ptr, uint32_t freq) {
  const uint64_t x_max = ((kRansLow >> kPrecision) << 32) * freq;
  if (st >= x_max) {
    *--ptr = static_cast<uint32_t>(st);
    st >>= 32;
  }
}

inline void enc_put(uint64_t &st, uint32_t *&ptr, uint32_t start, uint32_t freq) {
  enc_renorm(st, ptr, freq);
  st = ((st / freq) << kPrecision) + (st % freq) + start;
}

inline void enc_put_bits(uint64_t &st, uint32_t *&ptr, uint32_t val, uint32_t nbits) {
  enc_renorm(st, ptr, 1u << (kPrecision - nbits));
  st = (st << nbits) | val;
}

inline void enc_flush(uint64_t st, uint32_t *&ptr) {
  ptr -= 2;
  ptr[0] = static_cast<uint32_t>(st);
  ptr[1] = static_cast<uint32_t>(st >> 32);
}

inline uint64_t dec_init(const uint32_t *&ptr) {
  uint64_t st = (static_cast<uint64_t>(ptr[1]) << 32) | ptr[0];
  ptr += 2;
  return st;
}

// bounded renorm: truncated/corrupt streams feed zeros instead of
// reading past the buffer
inline void dec_renorm(uint64_t &st, const uint32_t *&ptr,
                       const uint32_t *end) {
  if (st < kRansLow) {
    st = (st << 32) | (ptr < end ? *ptr++ : 0u);
  }
}

inline uint32_t dec_get_bits(uint64_t &st, const uint32_t *&ptr,
                             const uint32_t *end, uint32_t nbits) {
  const uint32_t val = static_cast<uint32_t>(st) & ((1u << nbits) - 1);
  st >>= nbits;
  dec_renorm(st, ptr, end);
  return val;
}

// ---- buffered encoder -----------------------------------------------------

struct Encoder {
  std::vector<RansSym> syms;
  std::vector<uint8_t> out;
};

struct Decoder {
  std::vector<uint8_t> data;   // padded copy so we can read 32-bit words
  const uint32_t *ptr = nullptr;
  const uint32_t *end = nullptr;  // hard bound: truncated/corrupt streams
  uint64_t st = 0;
};

inline const int32_t *cdf_row(const int32_t *cdfs, int stride, int idx) {
  return cdfs + static_cast<int64_t>(idx) * stride;
}

}  // namespace

extern "C" {

void *hyc_enc_new() { return new Encoder(); }
void hyc_enc_free(void *e) { delete static_cast<Encoder *>(e); }

// Buffer (symbol, index) pairs; matches BufferedRansEncoder::encode_with_indexes.
void hyc_enc_push(void *e_, const int32_t *symbols, const int32_t *indexes, int64_t n,
                  const int32_t *cdfs, int32_t cdf_stride,
                  const int32_t *cdf_lengths, const int32_t *offsets) {
  Encoder &e = *static_cast<Encoder *>(e_);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t *cdf = cdf_row(cdfs, cdf_stride, idx);
    const int32_t max_value = cdf_lengths[idx] - 2;
    int32_t value = symbols[i] - offsets[idx];

    uint32_t raw_val = 0;
    if (value < 0) {
      raw_val = static_cast<uint32_t>(-2 * value - 1);
      value = max_value;
    } else if (value >= max_value) {
      raw_val = static_cast<uint32_t>(2 * (value - max_value));
      value = max_value;
    }
    e.syms.push_back({static_cast<uint16_t>(cdf[value]),
                      static_cast<uint16_t>(cdf[value + 1] - cdf[value]), false});

    if (value == max_value) {
      // out-of-range: count 4-bit chunks, emit chunk count in saturating
      // 4-bit pieces, then the chunks themselves (LSB first)
      uint32_t n_chunks = 0;
      while ((raw_val >> (n_chunks * kBypassBits)) != 0) ++n_chunks;
      uint32_t v = n_chunks;
      while (v >= kMaxBypass) {
        e.syms.push_back({static_cast<uint16_t>(kMaxBypass), 0, true});
        v -= kMaxBypass;
      }
      e.syms.push_back({static_cast<uint16_t>(v), 0, true});
      for (uint32_t j = 0; j < n_chunks; ++j) {
        e.syms.push_back({static_cast<uint16_t>((raw_val >> (j * kBypassBits)) & kMaxBypass), 0, true});
      }
    }
  }
}

// Encode buffered symbols back-to-front; returns byte size, buffer via hyc_enc_data.
int64_t hyc_enc_flush(void *e_) {
  Encoder &e = *static_cast<Encoder *>(e_);
  std::vector<uint32_t> buf(e.syms.size() + 4);
  uint32_t *ptr = buf.data() + buf.size();
  uint64_t st = kRansLow;

  for (auto it = e.syms.rbegin(); it != e.syms.rend(); ++it) {
    if (it->bypass) {
      enc_put_bits(st, ptr, it->start, kBypassBits);
    } else {
      enc_put(st, ptr, it->start, it->range);
    }
  }
  enc_flush(st, ptr);

  const size_t nbytes =
      (buf.data() + buf.size() - ptr) * sizeof(uint32_t);
  e.out.resize(nbytes);
  std::memcpy(e.out.data(), ptr, nbytes);
  e.syms.clear();
  return static_cast<int64_t>(nbytes);
}

const uint8_t *hyc_enc_data(void *e_) {
  return static_cast<Encoder *>(e_)->out.data();
}

// ---- decoder ----------------------------------------------------------------

void *hyc_dec_new(const uint8_t *data, int64_t size) {
  Decoder *d = new Decoder();
  d->data.assign(data, data + size);
  d->data.resize(((size + 3) / 4) * 4 + 8, 0);  // pad for word reads
  d->ptr = reinterpret_cast<const uint32_t *>(d->data.data());
  d->end = reinterpret_cast<const uint32_t *>(d->data.data() + d->data.size());
  if (size < 8) {  // too short to hold the flushed state: decode zeros
    d->st = kRansLow;
    d->ptr = d->end;
    return d;
  }
  d->st = dec_init(d->ptr);
  return d;
}

void hyc_dec_free(void *d) { delete static_cast<Decoder *>(d); }

void hyc_dec_stream(void *d_, const int32_t *indexes, int64_t n,
                    const int32_t *cdfs, int32_t cdf_stride,
                    const int32_t *cdf_lengths, const int32_t *offsets,
                    int32_t *out) {
  Decoder &d = *static_cast<Decoder *>(d_);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t *cdf = cdf_row(cdfs, cdf_stride, idx);
    const int32_t max_value = cdf_lengths[idx] - 2;

    const uint32_t cum = static_cast<uint32_t>(d.st) & ((1u << kPrecision) - 1);
    // CDF rows are short (<= ~400 entries); linear scan is cache-friendly
    int32_t s = 0;
    while (s < max_value + 1 && static_cast<uint32_t>(cdf[s + 1]) <= cum) ++s;

    const uint32_t start = static_cast<uint32_t>(cdf[s]);
    const uint32_t freq = static_cast<uint32_t>(cdf[s + 1]) - start;
    d.st = freq * (d.st >> kPrecision) + cum - start;
    dec_renorm(d.st, d.ptr, d.end);

    int32_t value = s;
    if (value == max_value) {
      uint32_t n_chunks = 0;
      uint32_t v = dec_get_bits(d.st, d.ptr, d.end, kBypassBits);
      n_chunks = v;
      while (v == kMaxBypass) {
        v = dec_get_bits(d.st, d.ptr, d.end, kBypassBits);
        n_chunks += v;
      }
      uint32_t raw_val = 0;
      for (uint32_t j = 0; j < n_chunks; ++j) {
        raw_val |= dec_get_bits(d.st, d.ptr, d.end, kBypassBits) << (j * kBypassBits);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out[i] = value + offsets[idx];
  }
}

// ---- O(1) decode via symbol lookup tables ------------------------------------
// One 2^16-entry uint16 table per CDF row: cum -> symbol. Built once per
// baked table set (deployment artifact), reused across every decode.

struct SymbolLut {
  std::vector<uint16_t> lut;  // rows * (1 << kPrecision)
  int32_t rows;
};

void *hyc_lut_new(const int32_t *cdfs, int32_t cdf_stride,
                  const int32_t *cdf_lengths, int32_t rows) {
  SymbolLut *l = new SymbolLut();
  l->rows = rows;
  l->lut.resize(static_cast<size_t>(rows) << kPrecision);
  for (int32_t r = 0; r < rows; ++r) {
    const int32_t *cdf = cdf_row(cdfs, cdf_stride, r);
    uint16_t *dst = l->lut.data() + (static_cast<size_t>(r) << kPrecision);
    const int32_t nsym = cdf_lengths[r] - 1;
    for (int32_t s = 0; s < nsym; ++s) {
      for (int32_t c = cdf[s]; c < cdf[s + 1]; ++c) {
        dst[c] = static_cast<uint16_t>(s);
      }
    }
  }
  return l;
}

void hyc_lut_free(void *l) { delete static_cast<SymbolLut *>(l); }

void hyc_dec_stream_lut(void *d_, void *l_, const int32_t *indexes, int64_t n,
                        const int32_t *cdfs, int32_t cdf_stride,
                        const int32_t *cdf_lengths, const int32_t *offsets,
                        int32_t *out) {
  Decoder &d = *static_cast<Decoder *>(d_);
  SymbolLut &l = *static_cast<SymbolLut *>(l_);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t *cdf = cdf_row(cdfs, cdf_stride, idx);
    const int32_t max_value = cdf_lengths[idx] - 2;

    const uint32_t cum = static_cast<uint32_t>(d.st) & ((1u << kPrecision) - 1);
    // hybrid: short CDF rows (sharply peaked) decode faster with a linear
    // scan (cache-resident); long rows use the O(1) table
    int32_t s;
    if (cdf_lengths[idx] <= 32) {
      s = 0;
      while (static_cast<uint32_t>(cdf[s + 1]) <= cum) ++s;
    } else {
      s = l.lut[(static_cast<size_t>(idx) << kPrecision) | cum];
    }

    const uint32_t start = static_cast<uint32_t>(cdf[s]);
    const uint32_t freq = static_cast<uint32_t>(cdf[s + 1]) - start;
    d.st = freq * (d.st >> kPrecision) + cum - start;
    dec_renorm(d.st, d.ptr, d.end);

    int32_t value = s;
    if (value == max_value) {
      uint32_t v = dec_get_bits(d.st, d.ptr, d.end, kBypassBits);
      uint32_t n_chunks = v;
      while (v == kMaxBypass) {
        v = dec_get_bits(d.st, d.ptr, d.end, kBypassBits);
        n_chunks += v;
      }
      uint32_t raw_val = 0;
      for (uint32_t j = 0; j < n_chunks; ++j) {
        raw_val |= dec_get_bits(d.st, d.ptr, d.end, kBypassBits) << (j * kBypassBits);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out[i] = value + offsets[idx];
  }
}

// ---- PMF -> quantized CDF ---------------------------------------------------
// Same construction as tensorflow-compression / the reference's
// `_CXX.pmf_to_quantized_cdf` dependency (triggered via
// /root/reference/src/updata.py:53): round to 16-bit totals, renormalize,
// then steal mass from the lowest-frequency (>1) bin to kill zero-width bins.
int32_t hyc_pmf_to_quantized_cdf(const float *pmf, int32_t n, int32_t precision,
                                 int32_t *out /* n + 1 */) {
  std::vector<uint32_t> cdf(n + 1);
  cdf[0] = 0;
  for (int32_t i = 0; i < n; ++i) {
    float p = pmf[i];
    if (!(p >= 0.f)) p = 0.f;  // clamp NaN/negatives
    cdf[i + 1] = static_cast<uint32_t>(p * (1u << precision) + 0.5f);
  }
  uint64_t total = 0;
  for (int32_t i = 0; i <= n; ++i) total += cdf[i];
  if (total == 0) {
    // degenerate: uniform fallback
    for (int32_t i = 0; i <= n; ++i) cdf[i] = 1;
    cdf[0] = 0;
    total = n;
  }
  for (int32_t i = 0; i <= n; ++i) {
    cdf[i] = static_cast<uint32_t>(
        (static_cast<uint64_t>(1u << precision) * cdf[i]) / total);
  }
  for (int32_t i = 1; i <= n; ++i) cdf[i] += cdf[i - 1];
  cdf[n] = 1u << precision;

  for (int32_t i = 0; i < n; ++i) {
    if (cdf[i] != cdf[i + 1]) continue;
    uint32_t best_freq = ~0u;
    int32_t best = -1;
    for (int32_t j = 0; j < n; ++j) {
      const uint32_t freq = cdf[j + 1] - cdf[j];
      if (freq > 1 && freq < best_freq) {
        best_freq = freq;
        best = j;
      }
    }
    if (best < 0) return -1;  // cannot normalize
    if (best < i) {
      for (int32_t j = best + 1; j <= i; ++j) --cdf[j];
    } else {
      for (int32_t j = i + 1; j <= best; ++j) ++cdf[j];
    }
  }

  for (int32_t i = 0; i <= n; ++i) out[i] = static_cast<int32_t>(cdf[i]);
  return 0;
}

}  // extern "C"
