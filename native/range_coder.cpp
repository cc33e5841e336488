// nvfpcc_tpu native range coder.
//
// Role parity with the reference's arithmetic coder
// (/root/reference/module_arithmeticcoding.cpp): entropy-code the rounded
// latent symbols under per-channel Gaussian models, bit-exact reciprocal
// between encode and decode.
//
// Design (deliberately different from the reference, and stronger on
// determinism): the reference evaluates float erf() CDFs inside the coder and
// masks float mantissas so encoder/decoder agree (set_FL_MASK,
// module_arithmeticcoding.cpp:93-113). Here the coder consumes *precomputed
// integer cumulative-frequency tables* — all float math happens once on the
// host when the tables are built, and the bitstream depends only on integers,
// so encode/decode symmetry holds by construction.
//
// Algorithm: carry-propagating byte-wise range coder in the LZMA style,
// scaled to a 64-bit range (128-bit low) so tables may use totals up to 2^32
// with negligible precision loss (we use 2^24, finer than the reference's
// mul_factor 1e7).
//
// Exposed as a C ABI for ctypes (nvfpcc_tpu/coder/range_coder.py) and as a
// standalone CLI (native/range_coder_cli.cpp).

#include <cmath>
#include <cstdint>
#include <cstring>

typedef unsigned __int128 uint128;

namespace {

constexpr uint64_t kTop = 1ull << 32;  // renormalization threshold

class ByteSink {
 public:
  ByteSink(uint8_t* buf, long cap) : buf_(buf), cap_(cap), n_(0) {}
  void put(uint8_t b) {
    if (n_ < cap_) buf_[n_] = b;
    n_++;
  }
  long size() const { return n_; }
  bool overflow() const { return n_ > cap_; }

 private:
  uint8_t* buf_;
  long cap_;
  long n_;
};

class RangeEncoder {
 public:
  explicit RangeEncoder(ByteSink* sink)
      : sink_(sink), low_(0), range_(~0ull), cache_(0), cache_size_(1) {}

  // cum_lo/cum_hi are the symbol's cumulative bounds; total is the table sum.
  void encode(uint64_t cum_lo, uint64_t cum_hi, uint64_t total) {
    uint64_t r = range_ / total;
    low_ += (uint128)r * cum_lo;
    range_ = r * (cum_hi - cum_lo);
    while (range_ < kTop) {
      range_ <<= 8;
      shift_low();
    }
  }

  void flush() {
    for (int i = 0; i < 9; i++) shift_low();
  }

 private:
  void shift_low() {
    // Emit the top byte once no future carry can change it.
    const uint64_t low64 = (uint64_t)low_;
    if (low64 < 0xFF00000000000000ull || (uint64_t)(low_ >> 64) != 0) {
      uint8_t carry = (uint8_t)(low_ >> 64);
      do {
        sink_->put((uint8_t)(cache_ + carry));
        cache_ = 0xFF;
      } while (--cache_size_ != 0);
      cache_ = (uint8_t)(low64 >> 56);
    }
    cache_size_++;
    low_ = (uint128)(low64 << 8);
  }

  ByteSink* sink_;
  uint128 low_;
  uint64_t range_;
  uint8_t cache_;
  uint64_t cache_size_;
};

class RangeDecoder {
 public:
  RangeDecoder(const uint8_t* buf, long len) : buf_(buf), len_(len), pos_(0) {
    range_ = ~0ull;
    code_ = 0;
    // First byte is the encoder's dummy cache byte; then 8 code bytes.
    for (int i = 0; i < 9; i++) code_ = (code_ << 8) | next_byte();
  }

  // Returns a value v in [0, total) locating the symbol: cum_lo <= v < cum_hi.
  uint64_t decode_target(uint64_t total) {
    r_ = range_ / total;
    uint64_t v = code_ / r_;
    return v >= total ? total - 1 : v;
  }

  void consume(uint64_t cum_lo, uint64_t cum_hi) {
    code_ -= r_ * cum_lo;
    range_ = r_ * (cum_hi - cum_lo);
    while (range_ < kTop) {
      code_ = (code_ << 8) | next_byte();
      range_ <<= 8;
    }
  }

 private:
  uint8_t next_byte() { return pos_ < len_ ? buf_[pos_++] : 0; }

  const uint8_t* buf_;
  long len_;
  long pos_;
  uint64_t range_;
  uint64_t code_;
  uint64_t r_;
};

// Decode n symbols with an already-initialized decoder. Returns n, or -1 on a
// bad table id. Shared by the one-shot and the stateful (resumable) APIs.
long decode_symbols(RangeDecoder* dec, const int32_t* table_ids, long n,
                    const uint32_t* cum, int ntab, int tabsize,
                    int32_t* out_symbols) {
  const uint64_t total = cum[tabsize - 1];
  for (long i = 0; i < n; i++) {
    const int32_t t = table_ids[i];
    if (t < 0 || t >= ntab) return -1;
    const uint32_t* c = cum + (long)t * tabsize;
    const uint64_t v = dec->decode_target(total);
    // binary search: largest s with c[s] <= v
    int lo = 0, hi = tabsize - 1;
    while (hi - lo > 1) {
      const int mid = (lo + hi) >> 1;
      if (c[mid] <= v)
        lo = mid;
      else
        hi = mid;
    }
    dec->consume(c[lo], c[lo + 1]);
    out_symbols[i] = lo;
  }
  return n;
}

// Resumable decoder handle: owns a copy of the stream plus the decoder state,
// so an autoregressive host coder (nvfpcc_tpu/coder/ctx_coder.py) can decode
// a stream step by step — each step's tables depend on the symbols of the
// previous steps — without re-decoding the prefix every step.
struct DecHandle {
  uint8_t* buf;
  RangeDecoder dec;
  DecHandle(const uint8_t* in, long len)
      : buf(new uint8_t[len > 0 ? len : 1]), dec(nullptr, 0) {
    memcpy(buf, in, len);
    dec = RangeDecoder(buf, len);
  }
  ~DecHandle() { delete[] buf; }
};

}  // namespace

extern "C" {

// Encode n symbols. cum: ntab tables of (tabsize) uint32 cumulative
// frequencies, cum[t][0] == 0, cum[t][tabsize-1] == total (same total for all
// tables). Returns the stream length in bytes, or -1 on overflow/bad input.
long nvfpcc_rc_encode(const int32_t* symbols, const int32_t* table_ids, long n,
                      const uint32_t* cum, int ntab, int tabsize, uint8_t* out,
                      long out_capacity) {
  if (n < 0 || ntab <= 0 || tabsize < 2) return -1;
  const uint64_t total = cum[tabsize - 1];
  ByteSink sink(out, out_capacity);
  RangeEncoder enc(&sink);
  for (long i = 0; i < n; i++) {
    const int32_t s = symbols[i];
    const int32_t t = table_ids[i];
    if (s < 0 || s >= tabsize - 1 || t < 0 || t >= ntab) return -1;
    const uint32_t* c = cum + (long)t * tabsize;
    enc.encode(c[s], c[s + 1], total);
  }
  enc.flush();
  if (sink.overflow()) return -1;
  return sink.size();
}

// Decode n symbols from the stream. Returns n on success, -1 on bad input.
long nvfpcc_rc_decode(const uint8_t* in, long in_len, const int32_t* table_ids,
                      long n, const uint32_t* cum, int ntab, int tabsize,
                      int32_t* out_symbols) {
  if (n < 0 || ntab <= 0 || tabsize < 2) return -1;
  RangeDecoder dec(in, in_len);
  return decode_symbols(&dec, table_ids, n, cum, ntab, tabsize, out_symbols);
}

// --- resumable decoder (stateful across calls) -----------------------------
//
// new -> run (repeatedly, each call with its own tables) -> free. Every table
// set passed to run must share the cumulative total the stream was encoded
// with (the Python layer uses a fixed 2^20 everywhere).

void* nvfpcc_rc_dec_new(const uint8_t* in, long in_len) {
  if (in_len < 0) return nullptr;
  return new DecHandle(in, in_len);
}

long nvfpcc_rc_dec_run(void* handle, const int32_t* table_ids, long n,
                       const uint32_t* cum, int ntab, int tabsize,
                       int32_t* out_symbols) {
  if (handle == nullptr || n < 0 || ntab <= 0 || tabsize < 2) return -1;
  DecHandle* h = static_cast<DecHandle*>(handle);
  return decode_symbols(&h->dec, table_ids, n, cum, ntab, tabsize, out_symbols);
}

void nvfpcc_rc_dec_free(void* handle) {
  delete static_cast<DecHandle*>(handle);
}

// Batch erf for the Gaussian CDF table builder (the Python math.erf loop is
// the hot path when an autoregressive decode touches thousands of distinct
// (sigma, mu) tables). The Python layer verifies this agrees bit-exactly with
// math.erf on a probe set before trusting it (tables are a format contract).
void nvfpcc_erf_batch(const double* x, double* out, long n) {
  for (long i = 0; i < n; i++) out[i] = erf(x[i]);
}

}  // extern "C"
