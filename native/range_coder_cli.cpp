// Standalone CLI over the nvfpcc range coder — out-of-process stream
// cross-checking (the same role as the reference's stdin/stdout coder binary,
// /root/reference/module_arithmeticcoding.cpp:368-432, but over precomputed
// integer cumulative tables instead of in-coder float CDFs).
//
// Binary protocol (all little-endian, matching the in-process ctypes layout):
//   encode:  range_coder_cli e < in > out
//     stdin : i64 n | i32 ntab | i32 tabsize | u32 cum[ntab*tabsize]
//             | i32 table_ids[n] | i32 symbols[n]
//     stdout: i64 stream_len | u8 stream[stream_len]
//   decode:  range_coder_cli d < in > out
//     stdin : i64 n | i32 ntab | i32 tabsize | u32 cum[ntab*tabsize]
//             | i32 table_ids[n] | i64 stream_len | u8 stream[stream_len]
//     stdout: i32 symbols[n]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
long nvfpcc_rc_encode(const int32_t* symbols, const int32_t* table_ids, long n,
                      const uint32_t* cum, int ntab, int tabsize, uint8_t* out,
                      long out_capacity);
long nvfpcc_rc_decode(const uint8_t* in, long in_len, const int32_t* table_ids,
                      long n, const uint32_t* cum, int ntab, int tabsize,
                      int32_t* out_symbols);
}

namespace {

template <typename T>
bool read_exact(T* dst, size_t count) {
  return fread(dst, sizeof(T), count, stdin) == count;
}

template <typename T>
void write_exact(const T* src, size_t count) {
  if (fwrite(src, sizeof(T), count, stdout) != count) {
    fprintf(stderr, "range_coder_cli: short write\n");
    exit(3);
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2 || (argv[1][0] != 'e' && argv[1][0] != 'd')) {
    fprintf(stderr, "usage: range_coder_cli {e|d}  (binary stdin/stdout)\n");
    return 2;
  }
  const bool encode = argv[1][0] == 'e';

  int64_t n = 0;
  int32_t ntab = 0, tabsize = 0;
  if (!read_exact(&n, 1) || !read_exact(&ntab, 1) || !read_exact(&tabsize, 1) ||
      n < 0 || ntab <= 0 || tabsize < 2) {
    fprintf(stderr, "range_coder_cli: bad header\n");
    return 2;
  }
  std::vector<uint32_t> cum((size_t)ntab * tabsize);
  std::vector<int32_t> table_ids((size_t)n);
  if (!read_exact(cum.data(), cum.size()) ||
      !read_exact(table_ids.data(), table_ids.size())) {
    fprintf(stderr, "range_coder_cli: truncated tables/ids\n");
    return 2;
  }

  if (encode) {
    std::vector<int32_t> symbols((size_t)n);
    if (!read_exact(symbols.data(), symbols.size())) {
      fprintf(stderr, "range_coder_cli: truncated symbols\n");
      return 2;
    }
    // worst case ~4 bytes/symbol at total 2^24 plus flush slack
    std::vector<uint8_t> out((size_t)n * 6 + 64);
    long len = nvfpcc_rc_encode(symbols.data(), table_ids.data(), (long)n,
                                cum.data(), ntab, tabsize, out.data(),
                                (long)out.size());
    if (len < 0) {
      fprintf(stderr, "range_coder_cli: encode failed\n");
      return 1;
    }
    int64_t len64 = len;
    write_exact(&len64, 1);
    write_exact(out.data(), (size_t)len);
  } else {
    int64_t stream_len = 0;
    if (!read_exact(&stream_len, 1) || stream_len < 0) {
      fprintf(stderr, "range_coder_cli: bad stream length\n");
      return 2;
    }
    std::vector<uint8_t> stream((size_t)stream_len);
    if (!read_exact(stream.data(), stream.size())) {
      fprintf(stderr, "range_coder_cli: truncated stream\n");
      return 2;
    }
    std::vector<int32_t> symbols((size_t)n);
    long got = nvfpcc_rc_decode(stream.data(), (long)stream_len,
                                table_ids.data(), (long)n, cum.data(), ntab,
                                tabsize, symbols.data());
    if (got != (long)n) {
      fprintf(stderr, "range_coder_cli: decode failed\n");
      return 1;
    }
    write_exact(symbols.data(), symbols.size());
  }
  fflush(stdout);
  return 0;
}
