// fmindex.h — shared blocked-occ FM-index view for the native engines.
//
// Layout mirrors fermi_tpu/index/fmd.py: dense nt6 BWT in [nb+1, 128] byte
// blocks plus exclusive cumulative occ [nb+1, 8] at block starts. rank6(k)
// counts symbols in BWT[0..k-1] (the reference's rld_rank1a(k-1) inclusive
// convention folded the same way as the Python engines). A 32-byte sub-block
// count table built at setup() bounds the per-query scan to <32 bytes.

#ifndef FERMI_NATIVE_FMINDEX_H_
#define FERMI_NATIVE_FMINDEX_H_

#include <cstdint>
#include <vector>

namespace fermi_native {

constexpr int kBlockBits = 7;
constexpr int kBlock = 1 << kBlockBits;

struct Index {
  const uint8_t* blocks = nullptr;  // [nb+1, 128]
  const int64_t* occ = nullptr;     // [nb+1, 8]
  int64_t cnt[8] = {0};
  int64_t n_seqs = 0;
  std::vector<uint8_t> sub;  // [(nb+1)*3][6]: counts over bytes [0,32s)

  void setup(const uint8_t* blocks_, const int64_t* occ_, int64_t n_rows,
             const int64_t* cnt_, int64_t n_seqs_) {
    blocks = blocks_;
    occ = occ_;
    for (int i = 0; i < 8; ++i) cnt[i] = cnt_[i];
    n_seqs = n_seqs_;
    sub.assign((size_t)n_rows * 18, 0);
    for (int64_t b = 0; b < n_rows; ++b) {
      const uint8_t* row = blocks + b * kBlock;
      uint8_t c[6] = {0, 0, 0, 0, 0, 0};
      uint8_t* dst = sub.data() + b * 18;
      for (int s = 0; s < 3; ++s) {
        for (int i = s * 32; i < (s + 1) * 32; ++i) ++c[row[i]];
        for (int j = 0; j < 6; ++j) dst[s * 6 + j] = c[j];
      }
    }
  }

  void rank6(int64_t k, int64_t out[6]) const {
    int64_t blk = k >> kBlockBits;
    int off = (int)(k & (kBlock - 1));
    const int64_t* base = occ + blk * 8;
    const uint8_t* row = blocks + blk * kBlock;
    int s = off >> 5;
    int64_t c[6] = {0, 0, 0, 0, 0, 0};
    if (s) {
      const uint8_t* q = sub.data() + blk * 18 + (s - 1) * 6;
      for (int j = 0; j < 6; ++j) c[j] = q[j];
    }
    for (int i = s << 5; i < off; ++i) ++c[row[i]];
    for (int j = 0; j < 6; ++j) out[j] = base[j] + c[j];
  }

  // counts at both k and k2 (k <= k2); one sub-table hit + two short scans,
  // sharing the scan when both land in the same block
  void rank6_pair(int64_t k, int64_t k2, int64_t lo[6], int64_t hi[6]) const {
    rank6(k, lo);
    int64_t blk = k >> kBlockBits, blk2 = k2 >> kBlockBits;
    if (blk2 != blk) {
      rank6(k2, hi);
      return;
    }
    int off = (int)(k & (kBlock - 1)), off2 = (int)(k2 & (kBlock - 1));
    const uint8_t* row = blocks + blk * kBlock;
    for (int j = 0; j < 6; ++j) hi[j] = lo[j];
    for (int i = off; i < off2; ++i) ++hi[row[i]];
  }

  uint8_t sym_at(int64_t k) const {
    return blocks[(k >> kBlockBits) * kBlock + (k & (kBlock - 1))];
  }

  // hint the lines a future rank6(k) will touch
  void prefetch(int64_t k) const {
    int64_t blk = k >> kBlockBits;
    __builtin_prefetch(blocks + blk * kBlock, 0, 1);
    __builtin_prefetch(blocks + blk * kBlock + 64, 0, 1);
    __builtin_prefetch(occ + blk * 8, 0, 1);
    __builtin_prefetch(sub.data() + blk * 18, 0, 1);
  }
};

inline int comp6(int c) { return (c >= 1 && c <= 4) ? 5 - c : c; }

}  // namespace fermi_native

#endif  // FERMI_NATIVE_FMINDEX_H_
