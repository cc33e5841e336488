// nvfpcc_tpu native octree partitioner.
//
// Role parity with the reference's octree tool (/root/reference/get_octree.cpp):
// from a voxelized cloud, emit (a) the origins of all occupied level-L leaf
// blocks in the reference's depth-first child-flag traversal order, and
// (b) the breadth-first 8-bit-per-node subtree occupancy string.
//
// Design (deliberately different): the reference builds an explicit pointer
// octree with global voxel/corner hash maps and neighbor links — O(n) pointer
// chasing and ~GBs of node state at vox10. Both outputs depend only on WHICH
// leaf blocks are occupied and on the traversal order, and the depth-first
// flag order (flag = x_bit + 2*y_bit + 4*z_bit per level, z most significant)
// is exactly Morton order of the block coordinates. So: compute 3*L-bit
// Morton keys, radix-sort, deduplicate. ~50 ms for a vox10 cloud, no tree.
//
// Exposed as a C ABI for ctypes (nvfpcc_tpu/octree/native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

namespace {

// interleave the low `level` bits of x,y,z: z -> bit 3k+2, y -> 3k+1, x -> 3k
inline uint64_t morton_key(uint32_t x, uint32_t y, uint32_t z, int level) {
  uint64_t key = 0;
  for (int b = 0; b < level; b++) {
    key |= (uint64_t)((x >> b) & 1u) << (3 * b);
    key |= (uint64_t)((y >> b) & 1u) << (3 * b + 1);
    key |= (uint64_t)((z >> b) & 1u) << (3 * b + 2);
  }
  return key;
}

// LSB-first radix sort on 8-bit digits (keys up to 3*level bits).
void radix_sort(std::vector<uint64_t>& keys, int level) {
  const int bits = 3 * level;
  const int passes = (bits + 7) / 8;
  std::vector<uint64_t> tmp(keys.size());
  for (int p = 0; p < passes; p++) {
    size_t count[257] = {0};
    const int shift = 8 * p;
    for (uint64_t k : keys) count[((k >> shift) & 0xFF) + 1]++;
    for (int i = 0; i < 256; i++) count[i + 1] += count[i];
    for (uint64_t k : keys) tmp[count[(k >> shift) & 0xFF]++] = k;
    keys.swap(tmp);
  }
}

}  // namespace

extern "C" {

// Compute occupied level-`level` block origins in reference traversal order.
// coords: n x 3 int32 voxel coordinates in [0, 2^depth).
// out_origins: capacity cap x 3 int32. Returns the number of blocks, or -1
// on bad input / overflow.
long nvfpcc_octree_origins(const int32_t* coords, long n, int depth, int level,
                           int32_t* out_origins, long cap) {
  if (n < 0 || depth <= 0 || depth > 20 || level < 0 || level > depth) return -1;
  const int shift = depth - level;
  std::vector<uint64_t> keys((size_t)n);
  for (long i = 0; i < n; i++) {
    const int32_t x = coords[3 * i], y = coords[3 * i + 1], z = coords[3 * i + 2];
    if (x < 0 || y < 0 || z < 0) return -1;
    keys[(size_t)i] =
        morton_key((uint32_t)x >> shift, (uint32_t)y >> shift, (uint32_t)z >> shift, level);
  }
  radix_sort(keys, level);

  long m = 0;
  uint64_t prev = ~0ull;
  for (size_t i = 0; i < keys.size(); i++) {
    const uint64_t k = keys[i];
    if (k == prev) continue;
    prev = k;
    if (m >= cap) return -1;
    uint32_t x = 0, y = 0, z = 0;
    for (int b = 0; b < level; b++) {
      x |= (uint32_t)((k >> (3 * b)) & 1) << b;
      y |= (uint32_t)((k >> (3 * b + 1)) & 1) << b;
      z |= (uint32_t)((k >> (3 * b + 2)) & 1) << b;
    }
    out_origins[3 * m] = (int32_t)(x << shift);
    out_origins[3 * m + 1] = (int32_t)(y << shift);
    out_origins[3 * m + 2] = (int32_t)(z << shift);
    m++;
  }
  return m;
}

// Breadth-first 8-bit-per-node occupancy string down to `level` (each node at
// depth <= level emits 8 chars '0'/'1' for its children; occupancy derived
// from the leaf set). out: capacity cap chars (no NUL). Returns the string
// length or -1 on bad input / overflow.
long nvfpcc_octree_occupancy(const int32_t* coords, long n, int depth, int level,
                             char* out, long cap) {
  if (n < 0 || depth <= 0 || depth > 20 || level < 0 || level + 1 > depth) return -1;
  // occupied node keys per tree level, 0..level+1, sorted
  std::vector<std::vector<uint64_t>> occ((size_t)level + 2);
  for (int lv = 0; lv <= level + 1; lv++) {
    const int shift = depth - lv;
    std::vector<uint64_t> keys((size_t)n);
    for (long i = 0; i < n; i++) {
      keys[(size_t)i] = morton_key((uint32_t)coords[3 * i] >> shift,
                                   (uint32_t)coords[3 * i + 1] >> shift,
                                   (uint32_t)coords[3 * i + 2] >> shift, lv);
    }
    radix_sort(keys, lv);
    keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
    occ[(size_t)lv] = std::move(keys);
  }

  auto contains = [](const std::vector<uint64_t>& v, uint64_t k) {
    size_t lo = 0, hi = v.size();
    while (lo < hi) {
      const size_t mid = (lo + hi) / 2;
      if (v[mid] < k)
        lo = mid + 1;
      else
        hi = mid;
    }
    return lo < v.size() && v[lo] == k;
  };

  // BFS over (node level, morton key); root = (0, 0). Child flag f maps to
  // child key = (parent << 3) | morton(xb, yb, zb) = (parent << 3) |
  // (zb*4 + yb*2 + xb) = (parent << 3) | f  — the flag IS the morton digit.
  long pos = 0;
  std::vector<std::pair<int, uint64_t>> queue;
  queue.reserve(occ[(size_t)level].size() * 2 + 1);
  queue.emplace_back(0, 0);
  for (size_t qi = 0; qi < queue.size(); qi++) {
    const int lv = queue[qi].first;
    const uint64_t key = queue[qi].second;
    const int child_lv = lv + 1;
    for (int f = 0; f < 8; f++) {
      const uint64_t child = (key << 3) | (uint64_t)f;
      const bool hit =
          child_lv <= level + 1 && contains(occ[(size_t)child_lv], child);
      if (pos >= cap) return -1;
      out[pos++] = hit ? '1' : '0';
      if (hit && child_lv <= level) queue.emplace_back(child_lv, child);
    }
  }
  return pos;
}

}  // extern "C"
