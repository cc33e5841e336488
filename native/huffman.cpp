// Canonical-Huffman bitstream decoder for nvfpcc_tpu (C ABI, ctypes).
//
// Role parity with the reference's per-bit Python string decoder
// (/root/reference/util_code_quantized_weights.py:129-148) — same canonical
// walk as nvfpcc_tpu/coder/huffman.py::_decode_py, moved to native code so
// decoding the legacy v2-pack weight stream is O(bits) of C, not of Python
// bytecode. The codebook arrives exactly as serialized in the pack: symbols
// sorted by (code length, symbol) with their code lengths; canonical codes
// are rebuilt here with the same recurrence as the Python encoder.

#include <cstdint>

extern "C" {

// Decode n_syms symbols from a byte-padded MSB-first bitstream.
// symbols/lengths: canonical codebook (n_cb entries, lengths ascending).
// Returns 0 on success, -1 on a corrupt stream (walked past the longest
// code or past the end of the stream), -2 on a malformed codebook.
int nvfpcc_huffman_decode(const uint8_t *stream, int64_t stream_bytes,
                          const int64_t *symbols, const uint8_t *lengths,
                          int64_t n_cb, int64_t n_syms, int64_t *out) {
  if (n_cb <= 0) return -2;
  // first_code/first_idx/count per code length (canonical decoding tables)
  const int MAXLEN = 64;
  uint64_t first_code[MAXLEN + 1];
  int64_t first_idx[MAXLEN + 1];
  int64_t count[MAXLEN + 1];
  for (int i = 0; i <= MAXLEN; i++) count[i] = 0;
  int max_len = 0;
  {
    uint64_t code = 0;
    int prev_len = lengths[0];
    if (prev_len <= 0 || prev_len > MAXLEN) return -2;
    for (int64_t i = 0; i < n_cb; i++) {
      const int ln = lengths[i];
      if (ln < prev_len || ln > MAXLEN) return -2;  // must be ascending
      code <<= (ln - prev_len);
      if (count[ln] == 0) {
        first_code[ln] = code;
        first_idx[ln] = i;
      }
      count[ln]++;
      code++;
      prev_len = ln;
      if (ln > max_len) max_len = ln;
    }
  }

  const int64_t total_bits = stream_bytes * 8;
  int64_t pos = 0;
  for (int64_t t = 0; t < n_syms; t++) {
    uint64_t code = 0;
    int ln = 0;
    for (;;) {
      if (pos >= total_bits || ln >= max_len + 1) return -1;
      code = (code << 1) | ((stream[pos >> 3] >> (7 - (pos & 7))) & 1u);
      pos++;
      ln++;
      if (count[ln]) {
        const uint64_t offset = code - first_code[ln];
        if (code >= first_code[ln] && (int64_t)offset < count[ln]) {
          out[t] = symbols[first_idx[ln] + (int64_t)offset];
          break;
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
