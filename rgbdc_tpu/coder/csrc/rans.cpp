// TPU-native framework's host-side range coder: 64-bit rANS with
// escape-to-bypass coding for out-of-range symbols.
//
// Functional spec (bitstream-compatible semantics, not a code port) from the
// reference coder: CompressAI/compressai/cpp_exts/rans/rans_interface.cpp
// (probability precision 16, 4-bit bypass chunks, LIFO flush) built on the
// public-domain ryg_rans 64-bit core (third_party/ryg_rans/rans64.h).
//
// Differences from the reference, by design:
//   * a flat C ABI (ctypes-friendly): arrays in, bytes out — no per-symbol
//     Python lists crossing the boundary;
//   * CDFs arrive as one dense int32 [ncdfs, stride] matrix (exactly the
//     layout the table builder produces), not vector<vector>;
//   * symbol lookup in the decoder is a binary search over the strictly
//     increasing CDF rather than a linear scan.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC rans.cpp -o librans.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kPrecision = 16;
constexpr uint32_t kBypassPrecision = 4;
constexpr uint32_t kMaxBypassVal = (1u << kBypassPrecision) - 1;
constexpr uint64_t kRansL = 1ull << 31;

struct RansSymbol {
  uint16_t start;
  uint16_t range;  // 0 means 1 << 16 for bypass? never: ranges fit uint16 here
  bool bypass;
};

// --- 64-bit rANS core -------------------------------------------------------

inline void enc_put(uint64_t &x, uint32_t **pptr, uint32_t start, uint32_t freq) {
  uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
  if (x >= x_max) {
    *pptr -= 1;
    **pptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  x = ((x / freq) << kPrecision) + (x % freq) + start;
}

inline void enc_put_bits(uint64_t &x, uint32_t **pptr, uint32_t val, uint32_t nbits) {
  uint32_t freq = 1u << (16 - nbits);
  uint64_t x_max = ((kRansL >> 16) << 32) * freq;
  if (x >= x_max) {
    *pptr -= 1;
    **pptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  x = (x << nbits) | val;
}

inline void enc_flush(uint64_t x, uint32_t **pptr) {
  *pptr -= 2;
  (*pptr)[0] = static_cast<uint32_t>(x >> 0);
  (*pptr)[1] = static_cast<uint32_t>(x >> 32);
}

inline void dec_init(uint64_t &x, uint32_t **pptr) {
  x = static_cast<uint64_t>((*pptr)[0]) | (static_cast<uint64_t>((*pptr)[1]) << 32);
  *pptr += 2;
}

inline uint32_t dec_get(uint64_t x) { return x & ((1u << kPrecision) - 1); }

inline void dec_advance(uint64_t &x, uint32_t **pptr, uint32_t start, uint32_t freq) {
  uint64_t mask = (1ull << kPrecision) - 1;
  x = freq * (x >> kPrecision) + (x & mask) - start;
  if (x < kRansL) {
    x = (x << 32) | **pptr;
    *pptr += 1;
  }
}

inline uint32_t dec_get_bits(uint64_t &x, uint32_t **pptr, uint32_t nbits) {
  uint32_t val = x & ((1u << nbits) - 1);
  x >>= nbits;
  if (x < kRansL) {
    x = (x << 32) | **pptr;
    *pptr += 1;
  }
  return val;
}

// --- buffered encoder -------------------------------------------------------

struct Encoder {
  std::vector<RansSymbol> syms;
};

template <typename SymT, typename IdxT>
void buffer_symbols(Encoder *enc, const SymT *symbols, const IdxT *indexes,
                    int64_t n, const int32_t *cdfs, int32_t cdf_stride,
                    const int32_t *cdf_lengths, const int32_t *offsets) {
  enc->syms.reserve(enc->syms.size() + static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    const int32_t cdf_idx = static_cast<int32_t>(indexes[i]);
    const int32_t *cdf = cdfs + static_cast<int64_t>(cdf_idx) * cdf_stride;
    const int32_t max_value = cdf_lengths[cdf_idx] - 2;

    int32_t value = static_cast<int32_t>(symbols[i]) - offsets[cdf_idx];
    uint64_t raw_val = 0;  // 64-bit: shift arithmetic stays defined for any int32
    if (value < 0) {
      raw_val = 2ull * static_cast<uint64_t>(-static_cast<int64_t>(value)) - 1;
      value = max_value;
    } else if (value >= max_value) {
      raw_val = 2ull * static_cast<uint64_t>(value - max_value);
      value = max_value;
    }

    enc->syms.push_back({static_cast<uint16_t>(cdf[value]),
                         static_cast<uint16_t>(cdf[value + 1] - cdf[value]),
                         false});

    if (value == max_value) {
      // escape: emit raw_val in 4-bit chunks, preceded by the chunk count
      int32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;

      int32_t val = n_bypass;
      while (val >= static_cast<int32_t>(kMaxBypassVal)) {
        enc->syms.push_back({static_cast<uint16_t>(kMaxBypassVal),
                             static_cast<uint16_t>(kMaxBypassVal + 1), true});
        val -= kMaxBypassVal;
      }
      enc->syms.push_back(
          {static_cast<uint16_t>(val), static_cast<uint16_t>(val + 1), true});
      for (int32_t j = 0; j < n_bypass; ++j) {
        const uint32_t v = (raw_val >> (j * kBypassPrecision)) & kMaxBypassVal;
        enc->syms.push_back(
            {static_cast<uint16_t>(v), static_cast<uint16_t>(v + 1), true});
      }
    }
  }
}

int64_t flush_encoder(Encoder *enc, uint8_t *out, int64_t capacity) {
  // LIFO: encode buffered symbols in reverse, stream written backwards.
  const size_t n = enc->syms.size();
  std::vector<uint32_t> buf(n + 2, 0xCCCCCCCCu);
  uint32_t *ptr = buf.data() + buf.size();

  uint64_t x = kRansL;
  for (size_t k = n; k-- > 0;) {
    const RansSymbol s = enc->syms[k];
    if (!s.bypass) {
      enc_put(x, &ptr, s.start, s.range);
    } else {
      enc_put_bits(x, &ptr, s.start, kBypassPrecision);
    }
  }
  enc_flush(x, &ptr);

  const int64_t nbytes =
      (buf.data() + buf.size() - ptr) * static_cast<int64_t>(sizeof(uint32_t));
  if (nbytes > capacity) return -nbytes;  // caller retries with a larger buffer
  std::memcpy(out, ptr, nbytes);
  enc->syms.clear();
  return nbytes;
}

// --- streaming decoder ------------------------------------------------------

struct Decoder {
  std::string stream;
  uint32_t *ptr = nullptr;
  uint64_t state = 0;
};

inline int32_t find_symbol(const int32_t *cdf, int32_t cdf_len, uint32_t cum_freq) {
  // smallest s with cdf[s+1] > cum_freq; cdf[0]=0, cdf[len-1]=2^16, increasing
  int32_t lo = 0, hi = cdf_len - 1;  // invariant: cdf[lo] <= cum < cdf[hi]
  while (hi - lo > 1) {
    const int32_t mid = (lo + hi) >> 1;
    if (static_cast<uint32_t>(cdf[mid]) <= cum_freq)
      lo = mid;
    else
      hi = mid;
  }
  return lo;
}

template <typename IdxT, typename OutT>
void decode_symbols(Decoder *dec, const IdxT *indexes, int64_t n,
                    const int32_t *cdfs, int32_t cdf_stride,
                    const int32_t *cdf_lengths, const int32_t *offsets,
                    OutT *out) {
  uint64_t x = dec->state;
  uint32_t *ptr = dec->ptr;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t cdf_idx = static_cast<int32_t>(indexes[i]);
    const int32_t *cdf = cdfs + static_cast<int64_t>(cdf_idx) * cdf_stride;
    const int32_t cdf_len = cdf_lengths[cdf_idx];
    const int32_t max_value = cdf_len - 2;

    const uint32_t cum_freq = dec_get(x);
    const int32_t s = find_symbol(cdf, cdf_len, cum_freq);
    dec_advance(x, &ptr, cdf[s], cdf[s + 1] - cdf[s]);

    int32_t value = s;
    if (value == max_value) {
      // escape: read chunk count then the raw value, 4 bits at a time
      uint32_t val = dec_get_bits(x, &ptr, kBypassPrecision);
      int32_t n_bypass = val;
      while (val == kMaxBypassVal) {
        val = dec_get_bits(x, &ptr, kBypassPrecision);
        n_bypass += val;
      }
      uint64_t raw_val = 0;
      for (int32_t j = 0; j < n_bypass; ++j) {
        raw_val |= static_cast<uint64_t>(dec_get_bits(x, &ptr, kBypassPrecision))
                   << (j * kBypassPrecision);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out[i] = static_cast<OutT>(value + offsets[cdf_idx]);
  }
  dec->state = x;
  dec->ptr = ptr;
}

// --- interleaved rans32 (lane-parallel format) -------------------------------
//
// N-lane interleaved rANS with 32-bit states and 16-bit renormalization
// words in ONE shared stream: the encoder walks symbols in reverse and
// emits words backward, so the decoder — walking forward, lane = i % L —
// consumes words in exactly stream order with a single shared pointer.
// This is the wire format a vectorized (TPU) decoder can consume: per
// step, every renormalizing lane takes the next word(s) in lane order.
//
// Layout: [L x uint32 final states][uint16 words...]. Same 16-bit
// probabilities and 4-bit bypass escapes as the LIFO coder.

constexpr uint32_t kRans32L = 1u << 16;

inline void enc32_put(uint32_t &x, uint16_t *&ptr, uint32_t start, uint32_t freq) {
  const uint32_t x_max = freq << 16;
  if (x >= x_max) {
    *--ptr = static_cast<uint16_t>(x);
    x >>= 16;
  }
  x = ((x / freq) << kPrecision) + (x % freq) + start;
}

inline void enc32_put_bits(uint32_t &x, uint16_t *&ptr, uint32_t val, uint32_t nbits) {
  const uint32_t freq = 1u << (16 - nbits);
  const uint32_t x_max = freq << 16;
  if (x >= x_max) {
    *--ptr = static_cast<uint16_t>(x);
    x >>= 16;
  }
  x = (x << nbits) | val;
}

inline uint32_t dec32_get(uint32_t x) { return x & ((1u << kPrecision) - 1); }

inline void dec32_advance(uint32_t &x, const uint16_t *&ptr, uint32_t start,
                          uint32_t freq) {
  x = freq * (x >> kPrecision) + (x & ((1u << kPrecision) - 1)) - start;
  if (x < kRans32L) x = (x << 16) | *ptr++;
}

inline uint32_t dec32_get_bits(uint32_t &x, const uint16_t *&ptr, uint32_t nbits) {
  const uint32_t val = x & ((1u << nbits) - 1);
  x >>= nbits;
  if (x < kRans32L) x = (x << 16) | *ptr++;
  return val;
}

struct Sym32 {
  uint16_t start;
  uint16_t range;
  bool bypass;
};

}  // namespace

// --- C ABI ------------------------------------------------------------------

extern "C" {

void *rans_encoder_new() { return new Encoder(); }
void rans_encoder_free(void *enc) { delete static_cast<Encoder *>(enc); }

void rans_encoder_buffer(void *enc, const int32_t *symbols, const int32_t *indexes,
                         int64_t n, const int32_t *cdfs, int32_t cdf_stride,
                         const int32_t *cdf_lengths, const int32_t *offsets) {
  buffer_symbols(static_cast<Encoder *>(enc), symbols, indexes, n, cdfs,
                 cdf_stride, cdf_lengths, offsets);
}

// compact-dtype variant: int16 symbols + uint8 indexes (the wire format the
// TPU emits — 3 bytes/symbol over the host link instead of 8)
void rans_encoder_buffer_i16u8(void *enc, const int16_t *symbols,
                               const uint8_t *indexes, int64_t n,
                               const int32_t *cdfs, int32_t cdf_stride,
                               const int32_t *cdf_lengths, const int32_t *offsets) {
  buffer_symbols(static_cast<Encoder *>(enc), symbols, indexes, n, cdfs,
                 cdf_stride, cdf_lengths, offsets);
}

// Returns bytes written, or -needed if capacity was insufficient.
int64_t rans_encoder_flush(void *enc, uint8_t *out, int64_t capacity) {
  return flush_encoder(static_cast<Encoder *>(enc), out, capacity);
}

void *rans_decoder_new(const uint8_t *data, int64_t nbytes) {
  auto *dec = new Decoder();
  dec->stream.assign(reinterpret_cast<const char *>(data), nbytes);
  dec->ptr = reinterpret_cast<uint32_t *>(dec->stream.data());
  dec_init(dec->state, &dec->ptr);
  return dec;
}

void rans_decoder_free(void *dec) { delete static_cast<Decoder *>(dec); }

void rans_decoder_decode(void *dec, const int32_t *indexes, int64_t n,
                         const int32_t *cdfs, int32_t cdf_stride,
                         const int32_t *cdf_lengths, const int32_t *offsets,
                         int32_t *out) {
  decode_symbols(static_cast<Decoder *>(dec), indexes, n, cdfs, cdf_stride,
                 cdf_lengths, offsets, out);
}

// compact-dtype variant: uint8 indexes in, int16 symbols out
void rans_decoder_decode_u8i16(void *dec, const uint8_t *indexes, int64_t n,
                               const int32_t *cdfs, int32_t cdf_stride,
                               const int32_t *cdf_lengths, const int32_t *offsets,
                               int16_t *out) {
  decode_symbols(static_cast<Decoder *>(dec), indexes, n, cdfs, cdf_stride,
                 cdf_lengths, offsets, out);
}

// --- interleaved rans32 ABI --------------------------------------------------

// Encode n symbols into the lane-interleaved format. Returns bytes written
// or -needed if capacity is too small. Layout: [lanes x u32 states][u16...].
int64_t rans32_interleaved_encode(const int16_t *symbols, const uint8_t *indexes,
                                  int64_t n, int32_t lanes, const int32_t *cdfs,
                                  int32_t cdf_stride, const int32_t *cdf_lengths,
                                  const int32_t *offsets, uint8_t *out,
                                  int64_t capacity) {
  std::vector<uint32_t> state(lanes, kRans32L);
  // worst case: 6 sub-symbols/symbol, <=1 word each, plus slack
  std::vector<uint16_t> buf(static_cast<size_t>(7 * n + 16 * lanes + 64));
  uint16_t *ptr = buf.data() + buf.size();

  Sym32 subs[24];
  for (int64_t i = n - 1; i >= 0; --i) {
    const int32_t lane = static_cast<int32_t>(i % lanes);
    const int32_t cdf_idx = indexes[i];
    const int32_t *cdf = cdfs + static_cast<int64_t>(cdf_idx) * cdf_stride;
    const int32_t max_value = cdf_lengths[cdf_idx] - 2;

    int32_t value = static_cast<int32_t>(symbols[i]) - offsets[cdf_idx];
    uint64_t raw_val = 0;
    if (value < 0) {
      raw_val = 2ull * static_cast<uint64_t>(-static_cast<int64_t>(value)) - 1;
      value = max_value;
    } else if (value >= max_value) {
      raw_val = 2ull * static_cast<uint64_t>(value - max_value);
      value = max_value;
    }

    // sub-symbols in DECODE order: cdf symbol, count chain, raw chunks
    int ns = 0;
    subs[ns++] = {static_cast<uint16_t>(cdf[value]),
                  static_cast<uint16_t>(cdf[value + 1] - cdf[value]), false};
    if (value == max_value) {
      int32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;
      int32_t val = n_bypass;
      while (val >= static_cast<int32_t>(kMaxBypassVal)) {
        subs[ns++] = {static_cast<uint16_t>(kMaxBypassVal), 0, true};
        val -= kMaxBypassVal;
      }
      subs[ns++] = {static_cast<uint16_t>(val), 0, true};
      for (int32_t j = 0; j < n_bypass; ++j) {
        subs[ns++] = {
            static_cast<uint16_t>((raw_val >> (j * kBypassPrecision)) & kMaxBypassVal),
            0, true};
      }
    }
    // encode in reverse of decode order
    for (int k = ns - 1; k >= 0; --k) {
      if (subs[k].bypass) {
        enc32_put_bits(state[lane], ptr, subs[k].start, kBypassPrecision);
      } else {
        enc32_put(state[lane], ptr, subs[k].start, subs[k].range);
      }
    }
  }

  const int64_t nwords = buf.data() + buf.size() - ptr;
  const int64_t nbytes = 4 * lanes + 2 * nwords;
  if (nbytes > capacity) return -nbytes;
  std::memcpy(out, state.data(), 4 * lanes);
  std::memcpy(out + 4 * lanes, ptr, 2 * nwords);
  return nbytes;
}

// Mirror decode. Returns 0 on success.
int32_t rans32_interleaved_decode(const uint8_t *data, int64_t nbytes,
                                  const uint8_t *indexes, int64_t n, int32_t lanes,
                                  const int32_t *cdfs, int32_t cdf_stride,
                                  const int32_t *cdf_lengths, const int32_t *offsets,
                                  int16_t *out) {
  std::vector<uint32_t> state(lanes);
  std::memcpy(state.data(), data, 4 * lanes);
  const uint16_t *ptr = reinterpret_cast<const uint16_t *>(data + 4 * lanes);

  for (int64_t i = 0; i < n; ++i) {
    const int32_t lane = static_cast<int32_t>(i % lanes);
    const int32_t cdf_idx = indexes[i];
    const int32_t *cdf = cdfs + static_cast<int64_t>(cdf_idx) * cdf_stride;
    const int32_t cdf_len = cdf_lengths[cdf_idx];
    const int32_t max_value = cdf_len - 2;

    const uint32_t cum = dec32_get(state[lane]);
    const int32_t s = find_symbol(cdf, cdf_len, cum);
    dec32_advance(state[lane], ptr, cdf[s], cdf[s + 1] - cdf[s]);

    int32_t value = s;
    if (value == max_value) {
      uint32_t val = dec32_get_bits(state[lane], ptr, kBypassPrecision);
      int32_t n_bypass = val;
      while (val == kMaxBypassVal) {
        val = dec32_get_bits(state[lane], ptr, kBypassPrecision);
        n_bypass += val;
      }
      uint64_t raw_val = 0;
      for (int32_t j = 0; j < n_bypass; ++j) {
        raw_val |= static_cast<uint64_t>(dec32_get_bits(state[lane], ptr,
                                                        kBypassPrecision))
                   << (j * kBypassPrecision);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out[i] = static_cast<int16_t>(value + offsets[cdf_idx]);
  }
  return 0;
}

// --- lane-split rans32 (the TPU decoder's wire format) -----------------------
//
// Unlike the shared-stream interleaved format above, every lane here is a
// fully INDEPENDENT rans32 stream: own 32-bit state, own word buffer.  That
// removes all cross-lane word-ordering dependencies, which is what makes a
// lockstep vectorized (lax.scan) decoder possible — each lane advances
// through its own words regardless of how many bypass chunks other lanes
// consumed (the shared-stream format would serialize lanes whenever any
// lane escapes).
//
// Symbols are assigned to lanes PER CODING GROUP: symbol j of group g goes
// to lane (j % lanes); a lane's sequence is the concatenation of its
// sub-sequences over groups in coding order.  The decoder therefore
// processes each group as ceil(len/lanes) lockstep rows, carrying per-lane
// state/word-position across groups — exactly the structure of the
// phase-serial checkerboard schedule (SURVEY §3.5).
//
// Probability model is unchanged: 16-bit quantized CDFs, 4-bit bypass
// escapes for out-of-range symbols (reference rans_interface.cpp:119-163).
//
// Container: [lanes x u32 final states][lanes x u32 word counts]
//            [concatenated u16 words, lane-major].

namespace {

// decode-order sub-symbols for one (symbol, cdf) pair; returns count (<=24)
inline int build_subs32(int32_t symbol, const int32_t *cdf, int32_t max_value,
                        int32_t offset, Sym32 *subs) {
  int32_t value = symbol - offset;
  uint64_t raw_val = 0;
  if (value < 0) {
    raw_val = 2ull * static_cast<uint64_t>(-static_cast<int64_t>(value)) - 1;
    value = max_value;
  } else if (value >= max_value) {
    raw_val = 2ull * static_cast<uint64_t>(value - max_value);
    value = max_value;
  }
  int ns = 0;
  subs[ns++] = {static_cast<uint16_t>(cdf[value]),
                static_cast<uint16_t>(cdf[value + 1] - cdf[value]), false};
  if (value == max_value) {
    int32_t n_bypass = 0;
    while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;
    int32_t val = n_bypass;
    while (val >= static_cast<int32_t>(kMaxBypassVal)) {
      subs[ns++] = {static_cast<uint16_t>(kMaxBypassVal), 0, true};
      val -= kMaxBypassVal;
    }
    subs[ns++] = {static_cast<uint16_t>(val), 0, true};
    for (int32_t j = 0; j < n_bypass; ++j) {
      subs[ns++] = {
          static_cast<uint16_t>((raw_val >> (j * kBypassPrecision)) & kMaxBypassVal),
          0, true};
    }
  }
  return ns;
}

}  // namespace

// Encode n symbols (sum of group_lens) into the lane-split format.
// Returns bytes written or -needed if capacity is too small.
//
// v2: escape bypass chunks live in a separate per-lane FIFO NIBBLE stream
// instead of being rans-bypass-coded into the main word stream.  The main
// stream therefore consumes AT MOST ONE word per symbol — the property the
// TPU decoder's fixed-cadence word prefetch relies on (coder/rans_tpu.py).
// Bypass chunks are raw 4-bit values either way, so the coded size is
// unchanged up to per-lane padding (<=3 nibbles) + the 4 B/lane count.
//
// Container (compact v3 header — u32 counts cost 12 B/lane, which
// dominated small trained streams at wide lane counts):
//   [u8 version=3][u8 flags: bit0 has_nibbles][u16 zero]
//   [L x u32 states][L x u16 word counts]
//   [L x u16 nibble counts, ONLY when flags.has_nibbles]
//   [u16 words, lane-major]
//   [u16 nibble words, lane-major; 4 nibbles/u16, LS nibble first]
int64_t rans32_lanes_encode(const int16_t *symbols, const uint8_t *indexes,
                            const int64_t *group_lens, int32_t n_groups,
                            int32_t lanes, const int32_t *cdfs,
                            int32_t cdf_stride, const int32_t *cdf_lengths,
                            const int32_t *offsets, uint8_t *out,
                            int64_t capacity) {
  // 1. per-lane symbol index lists (coding order)
  std::vector<std::vector<int64_t>> lane_syms(lanes);
  int64_t total = 0;
  for (int32_t g = 0; g < n_groups; ++g) total += group_lens[g];
  for (int32_t l = 0; l < lanes; ++l)
    lane_syms[l].reserve(static_cast<size_t>(total / lanes + n_groups));
  int64_t base = 0;
  for (int32_t g = 0; g < n_groups; ++g) {
    for (int64_t j = 0; j < group_lens[g]; ++j)
      lane_syms[j % lanes].push_back(base + j);
    base += group_lens[g];
  }

  // 2. encode each lane: forward pass collects escape nibbles (decode
  //    order, FIFO); reverse pass rANS-codes only the CDF symbols (LIFO)
  std::vector<std::vector<uint16_t>> lane_words(lanes);
  std::vector<std::vector<uint16_t>> lane_nibs(lanes);
  std::vector<uint32_t> states(lanes, kRans32L);
  std::vector<uint32_t> wcounts(lanes), ncounts(lanes);
  for (int32_t l = 0; l < lanes; ++l) {
    const auto &seq = lane_syms[l];
    std::vector<uint8_t> nibs;
    for (size_t k = 0; k < seq.size(); ++k) {
      const int64_t i = seq[k];
      const int32_t cdf_idx = indexes[i];
      const int32_t max_value = cdf_lengths[cdf_idx] - 2;
      int32_t value = static_cast<int32_t>(symbols[i]) - offsets[cdf_idx];
      uint64_t raw_val = 0;
      bool esc = false;
      if (value < 0) {
        raw_val = 2ull * static_cast<uint64_t>(-static_cast<int64_t>(value)) - 1;
        esc = true;
      } else if (value >= max_value) {
        raw_val = 2ull * static_cast<uint64_t>(value - max_value);
        esc = true;
      }
      if (esc) {
        int32_t n_bypass = 0;
        while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;
        int32_t val = n_bypass;
        while (val >= static_cast<int32_t>(kMaxBypassVal)) {
          nibs.push_back(static_cast<uint8_t>(kMaxBypassVal));
          val -= kMaxBypassVal;
        }
        nibs.push_back(static_cast<uint8_t>(val));
        for (int32_t j = 0; j < n_bypass; ++j) {
          nibs.push_back(static_cast<uint8_t>(
              (raw_val >> (j * kBypassPrecision)) & kMaxBypassVal));
        }
      }
    }
    // pack nibbles, 4 per u16, least-significant first
    std::vector<uint16_t> nwords((nibs.size() + 3) / 4, 0);
    for (size_t j = 0; j < nibs.size(); ++j)
      nwords[j >> 2] |= static_cast<uint16_t>(nibs[j]) << (4 * (j & 3));

    std::vector<uint16_t> buf(seq.size() + 16);
    uint16_t *ptr = buf.data() + buf.size();
    uint32_t x = kRans32L;
    for (size_t k = seq.size(); k-- > 0;) {
      const int64_t i = seq[k];
      const int32_t cdf_idx = indexes[i];
      const int32_t *cdf = cdfs + static_cast<int64_t>(cdf_idx) * cdf_stride;
      const int32_t max_value = cdf_lengths[cdf_idx] - 2;
      int32_t value = static_cast<int32_t>(symbols[i]) - offsets[cdf_idx];
      if (value < 0 || value >= max_value) value = max_value;
      enc32_put(x, ptr, static_cast<uint32_t>(cdf[value]),
                static_cast<uint32_t>(cdf[value + 1] - cdf[value]));
    }
    states[l] = x;
    const int64_t nwords_l = buf.data() + buf.size() - ptr;
    wcounts[l] = static_cast<uint32_t>(nwords_l);
    ncounts[l] = static_cast<uint32_t>(nibs.size());
    lane_words[l].assign(ptr, ptr + nwords_l);
    lane_nibs[l] = std::move(nwords);
  }

  // 3. serialize (compact v3 header: word/nibble counts as u16, nibble
  //    counts omitted entirely for escape-free streams — the common case
  //    for a trained codec, where the 12 B/lane v2 header dominated small
  //    streams at wide lane counts)
  int64_t nwords_total = 0, nnibw_total = 0;
  bool has_nibs = false;
  for (int32_t l = 0; l < lanes; ++l) {
    nwords_total += wcounts[l];
    nnibw_total += static_cast<int64_t>(lane_nibs[l].size());
    if (ncounts[l]) has_nibs = true;
    if (wcounts[l] > 0xFFFF || ncounts[l] > 0xFFFF) return -3;
  }
  const int64_t nbytes = 4 + 6LL * lanes + (has_nibs ? 2LL * lanes : 0) +
                         2 * (nwords_total + nnibw_total);
  if (nbytes > capacity) return -nbytes;
  out[0] = 3;  // container version
  out[1] = has_nibs ? 1 : 0;
  out[2] = out[3] = 0;
  uint8_t *wp = out + 4;
  std::memcpy(wp, states.data(), 4LL * lanes);
  wp += 4LL * lanes;
  for (int32_t l = 0; l < lanes; ++l) {
    const uint16_t c = static_cast<uint16_t>(wcounts[l]);
    std::memcpy(wp + 2LL * l, &c, 2);
  }
  wp += 2LL * lanes;
  if (has_nibs) {
    for (int32_t l = 0; l < lanes; ++l) {
      const uint16_t c = static_cast<uint16_t>(ncounts[l]);
      std::memcpy(wp + 2LL * l, &c, 2);
    }
    wp += 2LL * lanes;
  }
  for (int32_t l = 0; l < lanes; ++l) {
    std::memcpy(wp, lane_words[l].data(), 2LL * wcounts[l]);
    wp += 2LL * wcounts[l];
  }
  for (int32_t l = 0; l < lanes; ++l) {
    std::memcpy(wp, lane_nibs[l].data(), 2LL * lane_nibs[l].size());
    wp += 2LL * lane_nibs[l].size();
  }
  return nbytes;
}

namespace {

// bounds-checked variants: a malformed container must fail cleanly, never
// read out of bounds (missing words decode as zeros, like the JAX decoder's
// clamped gather)
inline void dec32_advance_b(uint32_t &x, const uint16_t *&ptr,
                            const uint16_t *end, uint32_t start, uint32_t freq) {
  x = freq * (x >> kPrecision) + (x & ((1u << kPrecision) - 1)) - start;
  if (x < kRans32L) x = (x << 16) | (ptr < end ? *ptr++ : 0);
}

inline uint32_t get_nibble_b(const uint16_t *nw, int64_t n_nibs, int64_t &cursor) {
  if (cursor >= n_nibs) { ++cursor; return 0; }
  const uint32_t v = (nw[cursor >> 2] >> (4 * (cursor & 3))) & 0xF;
  ++cursor;
  return v;
}

}  // namespace

// C mirror of the JAX/TPU lane decoder (parity tests). Returns 0 on success,
// negative on a malformed container.
int32_t rans32_lanes_decode(const uint8_t *data, int64_t nbytes,
                            const uint8_t *indexes, const int64_t *group_lens,
                            int32_t n_groups, int32_t lanes,
                            const int32_t *cdfs, int32_t cdf_stride,
                            const int32_t *cdf_lengths, const int32_t *offsets,
                            int16_t *out) {
  if (lanes <= 0 || nbytes < 4 + 6LL * lanes) return -1;
  if (data[0] != 3) return -4;  // container version (compact v3 header)
  const bool has_nibs = (data[1] & 1) != 0;
  std::vector<uint32_t> states(lanes), wcounts(lanes), ncounts(lanes, 0);
  const uint8_t *hp = data + 4;
  std::memcpy(states.data(), hp, 4LL * lanes);
  hp += 4LL * lanes;
  for (int32_t l = 0; l < lanes; ++l) {
    uint16_t c;
    std::memcpy(&c, hp + 2LL * l, 2);
    wcounts[l] = c;
  }
  hp += 2LL * lanes;
  if (has_nibs) {
    if (nbytes < 4 + 8LL * lanes) return -1;
    for (int32_t l = 0; l < lanes; ++l) {
      uint16_t c;
      std::memcpy(&c, hp + 2LL * l, 2);
      ncounts[l] = c;
    }
    hp += 2LL * lanes;
  }
  int64_t nwords_total = 0, nnibw_total = 0;
  for (int32_t l = 0; l < lanes; ++l) {
    nwords_total += wcounts[l];
    nnibw_total += (ncounts[l] + 3) / 4;
  }
  if ((hp - data) + 2 * (nwords_total + nnibw_total) > nbytes) return -2;
  std::vector<const uint16_t *> ptrs(lanes), ends(lanes), nptrs(lanes);
  std::vector<int64_t> ncursor(lanes, 0);
  const uint16_t *wp = reinterpret_cast<const uint16_t *>(hp);
  for (int32_t l = 0; l < lanes; ++l) {
    ptrs[l] = wp;
    wp += wcounts[l];
    ends[l] = wp;
  }
  for (int32_t l = 0; l < lanes; ++l) {
    nptrs[l] = wp;
    wp += (ncounts[l] + 3) / 4;
  }

  int64_t base = 0;
  for (int32_t g = 0; g < n_groups; ++g) {
    for (int64_t j = 0; j < group_lens[g]; ++j) {
      const int32_t l = static_cast<int32_t>(j % lanes);
      const int64_t i = base + j;
      const int32_t cdf_idx = indexes[i];
      const int32_t *cdf = cdfs + static_cast<int64_t>(cdf_idx) * cdf_stride;
      const int32_t cdf_len = cdf_lengths[cdf_idx];
      const int32_t max_value = cdf_len - 2;

      const uint32_t cum = dec32_get(states[l]);
      const int32_t s = find_symbol(cdf, cdf_len, cum);
      dec32_advance_b(states[l], ptrs[l], ends[l], cdf[s], cdf[s + 1] - cdf[s]);

      int32_t value = s;
      if (value == max_value) {
        uint32_t val = get_nibble_b(nptrs[l], ncounts[l], ncursor[l]);
        int32_t n_bypass = val;
        while (val == kMaxBypassVal) {
          val = get_nibble_b(nptrs[l], ncounts[l], ncursor[l]);
          n_bypass += val;
        }
        uint64_t raw_val = 0;
        for (int32_t j2 = 0; j2 < n_bypass && j2 < 16; ++j2) {
          raw_val |= static_cast<uint64_t>(
                         get_nibble_b(nptrs[l], ncounts[l], ncursor[l]))
                     << (j2 * kBypassPrecision);
        }
        value = static_cast<int32_t>(raw_val >> 1);
        if (raw_val & 1) {
          value = -value - 1;
        } else {
          value += max_value;
        }
      }
      out[i] = static_cast<int16_t>(value + offsets[cdf_idx]);
    }
    base += group_lens[g];
  }
  return 0;
}

// pmf [n] float32 -> cdf [n+1] int32 summing to 2^precision.
// Mirrors reference cpp_exts/ops/ops.cpp:24-81 (frequency stealing).
int32_t pmf_to_quantized_cdf(const float *pmf, int32_t n, int32_t precision,
                             int32_t *cdf_out) {
  std::vector<uint32_t> cdf(n + 1);
  cdf[0] = 0;
  for (int32_t i = 0; i < n; ++i) {
    cdf[i + 1] =
        static_cast<uint32_t>(std::lround(static_cast<double>(pmf[i]) * (1 << precision)));
  }
  uint64_t total = 0;
  for (auto v : cdf) total += v;
  if (total == 0) return -1;
  for (auto &v : cdf) {
    v = static_cast<uint32_t>((static_cast<uint64_t>(1 << precision) * v) / total);
  }
  for (int32_t i = 1; i <= n; ++i) cdf[i] += cdf[i - 1];
  cdf[n] = 1u << precision;

  for (int32_t i = 0; i < n; ++i) {
    if (cdf[i] == cdf[i + 1]) {
      uint32_t best_freq = ~0u;
      int32_t best_steal = -1;
      for (int32_t j = 0; j < n; ++j) {
        const uint32_t freq = cdf[j + 1] - cdf[j];
        if (freq > 1 && freq < best_freq) {
          best_freq = freq;
          best_steal = j;
        }
      }
      if (best_steal == -1) return -2;
      if (best_steal < i) {
        for (int32_t j = best_steal + 1; j <= i; ++j) cdf[j]--;
      } else {
        for (int32_t j = i + 1; j <= best_steal; ++j) cdf[j]++;
      }
    }
  }

  for (int32_t i = 0; i <= n; ++i) cdf_out[i] = static_cast<int32_t>(cdf[i]);
  return 0;
}

}  // extern "C"
