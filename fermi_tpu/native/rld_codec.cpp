// rld_codec.cpp — byte-exact implementation of fermi's RLD\2 on-disk format
// (run-length, Elias-delta coded BWT with blocked marginal-count headers and a
// sampled rank "frame" index).
//
// This is the host-side I/O boundary of the TPU framework: on disk we speak the
// reference format bit-for-bit (semantics per /root/reference/rld.c:47-263 and
// rld.h:77-115); in memory / on device we use dense blocked occ tables instead.
// The codec is written as a fresh C++ streaming encoder/decoder; only the byte
// format is shared with the reference.
//
// Exposed C ABI (ctypes-friendly):
//   frld_encode_file(run_len, run_sym, n_runs, asize, sbits, path) -> 0/err
//   frld_decode_file(path, &run_len, &run_sym, &n_runs, mcnt_out[asize+1]) -> 0/err
//   frld_free(ptr)
//
// Runs passed in may contain adjacent equal symbols; they are merged exactly as
// rld_enc() would (pending-run merging), so any run decomposition of the same
// BWT string encodes to identical bytes.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <string>

namespace {

constexpr int kSuperBits = 23;                    // words per superblock = 2^23
constexpr uint64_t kSuperWords = 1ull << kSuperBits;

inline int floor_log2(uint64_t v) {              // ilog2 semantics: floor(log2(v)); -1 for 0
  return v ? 63 - __builtin_clzll(v) : -1;
}

// ---------------------------------------------------------------------------
// Encoder
// ---------------------------------------------------------------------------

class RldEncoder {
 public:
  RldEncoder(int asize, int sbits)
      : asize_(asize), asize1_(asize + 1),
        abits_(floor_log2(asize) + 1), sbits_(sbits), ssize_(1 << sbits) {
    hdr16_words_ = (asize1_ * 16 + 63) / 64;
    hdr32_words_ = (asize1_ * 32 + 63) / 64;
    cnt_.assign(asize1_, 0);
    mcnt_.assign(asize1_, 0);
    super_.emplace_back(kSuperWords, 0);
    // block 0 begins at word 0; its zeroed header reads as an all-zero 16-bit
    // header, so the payload cursor starts right after it.
    shead_ = 0;
    p_ = hdr16_words_;
    r_ = 64;
  }

  // Queue a run; adjacent runs with equal symbol are merged before emission.
  void put(int64_t len, int sym) {
    if (len == 0) return;
    if (pend_sym_ != sym) {
      if (pend_len_) emit(pend_len_, pend_sym_);
      pend_len_ = len;
      pend_sym_ = sym;
    } else {
      pend_len_ += len;
    }
  }

  void finish() {
    if (pend_len_) emit(pend_len_, pend_sym_);
    pend_len_ = 0;
    next_block();  // terminal header block
    n_bytes_ = (((uint64_t)(super_.size() - 1) * kSuperWords) + p_) * 8;
    // cnt -> cumulative; mcnt keeps marginals with total in slot 0
    mcnt_ = cnt_;
    uint64_t acc = 0;
    for (int i = 1; i <= asize_; ++i) { acc += cnt_[i]; cnt_[i] = acc; }
    cnt_[0] = 0;
    mcnt_[0] = acc;
    build_frames();
  }

  int dump(const char* path) const {
    FILE* fp = strcmp(path, "-") ? fopen(path, "wb") : stdout;
    if (!fp) return -1;
    uint32_t a = (uint32_t)asize_ << 16 | (uint32_t)sbits_;
    uint64_t zero = 0;
    fwrite("RLD\2", 1, 4, fp);
    fwrite(&a, 4, 1, fp);
    fwrite(&zero, 8, 1, fp);
    fwrite(&n_bytes_, 8, 1, fp);
    fwrite(&n_frames_, 8, 1, fp);
    fwrite(mcnt_.data() + 1, 8, asize_, fp);
    uint64_t words_left = n_bytes_ / 8;
    for (size_t i = 0; i + 1 < super_.size(); ++i, words_left -= kSuperWords)
      fwrite(super_[i].data(), 8, kSuperWords, fp);
    fwrite(super_.back().data(), 8, words_left, fp);
    fwrite(frame_.data(), 8, frame_.size(), fp);
    if (fp != stdout) fclose(fp);
    else fflush(fp);
    return 0;
  }

 private:
  uint64_t* word(uint64_t sb_local) { return &super_.back()[sb_local]; }

  // Last usable word of the current small block: blocks that end a superblock
  // reserve one extra word so the decoder's one-word lookahead stays in bounds.
  uint64_t stail() const {
    return shead_ + ssize_ - (shead_ + ssize_ == kSuperWords ? 2 : 1);
  }

  void next_block() {
    if (stail() + 2 == kSuperWords) {
      super_.emplace_back(kSuperWords, 0);
      shead_ = 0;
    } else {
      shead_ += ssize_;
    }
    uint64_t* h = word(shead_);
    if (cnt_[0] - mcnt_[0] >= 0x8000) {       // 32-bit header
      uint32_t* q = reinterpret_cast<uint32_t*>(h);
      for (int i = 0; i <= asize_; ++i) q[i] = (uint32_t)(cnt_[i] - mcnt_[i]);
      q[0] |= 1u << 31;
      p_ = shead_ + hdr32_words_;
    } else {                                   // 16-bit header
      uint16_t* q = reinterpret_cast<uint16_t*>(h);
      for (int i = 0; i <= asize_; ++i) q[i] = (uint16_t)(cnt_[i] - mcnt_[i]);
      p_ = shead_ + hdr16_words_;
    }
    r_ = 64;
    mcnt_ = cnt_;
  }

  // Elias-delta code for l (>=1): gamma(bits(l)) followed by the low
  // floor(log2(l)) bits of l. Width = 2*floor(log2(bits(l))) + 1 + floor(log2(l)).
  static uint64_t delta_code(int64_t l, int* width) {
    int y = floor_log2((uint64_t)l);
    int z = floor_log2((uint64_t)y + 1);
    *width = (z << 1) + 1 + y;
    return ((uint64_t)l ^ (1ull << y)) | ((uint64_t)(y + 1) << y);
  }

  void emit(int64_t l, int c) {
    int w;
    uint64_t x = delta_code(l, &w) << abits_ | (uint64_t)c;
    w += abits_;
    if (w >= r_ && p_ == stail()) next_block();
    if (w > r_) {
      w -= r_;
      *word(p_) |= x >> w;
      ++p_;
      r_ = 64 - w;
      *word(p_) = x << r_;
    } else {
      r_ -= w;
      *word(p_) |= x << r_;
    }
    cnt_[0] += l;
    cnt_[c + 1] += l;
  }

  // Read a block header at global word offset `gw` (which superblock known
  // from gw); returns total count and adds per-symbol counts into acc[0..asize-1].
  uint64_t read_header(uint64_t gw, uint64_t* acc) const {
    const uint64_t* h = &super_[gw >> kSuperBits][gw & (kSuperWords - 1)];
    uint32_t first = (uint32_t)(*h);
    if (first >> 31) {
      const uint32_t* q = reinterpret_cast<const uint32_t*>(h);
      for (int j = 1; j <= asize_; ++j) acc[j - 1] += q[j];
      return first & 0x7fffffff;
    }
    const uint16_t* q = reinterpret_cast<const uint16_t*>(h);
    for (int j = 1; j <= asize_; ++j) acc[j - 1] += q[j];
    return *reinterpret_cast<const uint16_t*>(h);
  }

  void build_frames() {
    uint64_t n_blks = n_bytes_ * 8 / 64 / ssize_ + 1;
    uint64_t last = (n_bytes_ >> 3) >> sbits_ << sbits_;
    ibits_ = floor_log2(mcnt_[0] / n_blks) + 4;
    n_frames_ = ((mcnt_[0] + (1ull << ibits_) - 1) >> ibits_) + 1;
    frame_.assign(n_frames_ * asize1_, 0);
    std::vector<uint64_t> acc(asize_, 0);
    uint64_t k = 1;
    for (uint64_t i = ssize_; i <= last; i += (uint64_t)ssize_) {
      read_header(i, acc.data());
      uint64_t sum = 0;
      for (int j = 0; j < asize_; ++j) sum += acc[j];
      while (sum >= (k << ibits_)) ++k;
      if (k < n_frames_) {
        uint64_t x = k * asize1_;
        frame_[x] = i;
        for (int j = 0; j < asize_; ++j) frame_[x + 1 + j] = acc[j];
      }
    }
    for (k = 1; k < n_frames_; ++k) {  // back-fill frames skipped by large jumps
      uint64_t x = k * asize1_;
      if (frame_[x] == 0)
        for (int j = 0; j <= asize_; ++j) frame_[x + j] = frame_[x - asize1_ + j];
    }
  }

  int asize_, asize1_, abits_, sbits_, ssize_;
  int hdr16_words_, hdr32_words_;
  std::vector<std::vector<uint64_t>> super_;
  std::vector<uint64_t> cnt_, mcnt_, frame_;
  uint64_t shead_ = 0, p_ = 0, n_bytes_ = 0, n_frames_ = 0;
  int r_ = 64, ibits_ = 0;
  int pend_sym_ = -1;
  int64_t pend_len_ = 0;
};

// ---------------------------------------------------------------------------
// Decoder
// ---------------------------------------------------------------------------

struct DecodeResult {
  std::vector<int64_t> run_len;
  std::vector<uint8_t> run_sym;
  std::vector<uint64_t> mcnt;  // mcnt[0]=total, mcnt[1..asize]=marginals
  int asize = 0, sbits = 0;
};

// Decode the delta-coded payload of one RLD\2 stream into runs.
class RldDecoder {
 public:
  int decode_file(const char* path, DecodeResult* out) {
    FILE* fp = strcmp(path, "-") ? fopen(path, "rb") : stdin;
    if (!fp) return -1;
    char magic[4];
    if (fread(magic, 1, 4, fp) != 4) { if (fp != stdin) fclose(fp); return -2; }
    if (memcmp(magic, "RLD\2", 4) != 0) {
      // raw RLE byte stream fallback (as written by `ropebwt -b`):
      // each byte = len<<3 | sym, len in [1,31]
      int rc = decode_rle_bytes(fp, out);
      if (fp != stdin) fclose(fp);
      return rc;
    }
    uint32_t a;
    uint64_t hdr[3];
    if (fread(&a, 4, 1, fp) != 1 || fread(hdr, 8, 3, fp) != 3) { if (fp != stdin) fclose(fp); return -2; }
    int asize = a >> 16, sbits = a & 0xffff;
    uint64_t n_bytes = hdr[1], n_frames = hdr[2];
    out->asize = asize;
    out->sbits = sbits;
    out->mcnt.assign(asize + 1, 0);
    if (fread(out->mcnt.data() + 1, 8, asize, fp) != (size_t)asize) { if (fp != stdin) fclose(fp); return -2; }
    uint64_t total = 0;
    for (int i = 1; i <= asize; ++i) total += out->mcnt[i];
    out->mcnt[0] = total;
    std::vector<uint64_t> words(n_bytes / 8);
    if (n_bytes && fread(words.data(), 8, n_bytes / 8, fp) != n_bytes / 8) { if (fp != stdin) fclose(fp); return -2; }
    // skip frames (recomputed on encode)
    (void)n_frames;
    if (fp != stdin) fclose(fp);
    return decode_words(words.data(), n_bytes / 8, asize, sbits, out);
  }

  static int decode_rle_bytes(FILE* fp, DecodeResult* out) {
    out->asize = 6;
    out->sbits = 3;
    out->mcnt.assign(7, 0);
    std::vector<uint8_t> buf(1 << 20);
    int last_sym = -1;
    size_t n;
    while ((n = fread(buf.data(), 1, buf.size(), fp)) != 0) {
      for (size_t i = 0; i < n; ++i) {
        int64_t l = buf[i] >> 3;
        int c = buf[i] & 7;
        if (!l || c >= 6) continue;  // c in {6,7} cannot occur in valid RLE6
        if (c == last_sym && !out->run_len.empty()) {
          out->run_len.back() += l;
        } else {
          out->run_len.push_back(l);
          out->run_sym.push_back((uint8_t)c);
          last_sym = c;
        }
        out->mcnt[c + 1] += l;
        out->mcnt[0] += l;
      }
    }
    return 0;
  }

  static int decode_words(const uint64_t* words, uint64_t n_words, int asize,
                          int sbits, DecodeResult* out) {
    const int abits = floor_log2(asize) + 1;
    const int ssize = 1 << sbits;
    const int hdr16 = ((asize + 1) * 16 + 63) / 64;
    const int hdr32 = ((asize + 1) * 32 + 63) / 64;
    const uint64_t last_blk = n_words >> sbits << sbits;
    uint64_t shead = 0;
    while (shead != last_blk) {
      // block payload bounds; the last block of every 2^23-word superblock
      // keeps one spare word (never written) for decoder lookahead
      uint64_t blk_end_in_super = (shead & (kSuperWords - 1)) + ssize;
      uint64_t stail = shead + ssize - (blk_end_in_super == kSuperWords ? 2 : 1);
      uint32_t first = (uint32_t)words[shead];
      uint64_t p = shead + ((first >> 31) ? hdr32 : hdr16);
      int r = 64;
      while (true) {
        uint64_t x = words[p] << (64 - r) |
                     (p != stail && r != 64 ? words[p + 1] >> r : 0);
        int64_t len;
        int w;
        if (x >> 63 == 0) {
          w = (int)(0x333333335555779bull >> ((x >> 59) << 2) & 0xf);
          if (w == 0xb && x >> 58 == 0) break;  // zero padding: end of block
          int64_t y = (int64_t)(x >> (64 - w)) - 1;
          len = (int64_t)(x << w >> (64 - y) | 1ull << y);
          w += (int)y;
        } else {
          w = 1;
          len = 1;
        }
        int c = (int)(x << w >> (64 - abits));
        w += abits;
        if (c > asize) break;  // invalid symbol: end of block
        if (r > w) r -= w;
        else { ++p; r = 64 + r - w; }
        if (!out->run_sym.empty() && out->run_sym.back() == (uint8_t)c)
          out->run_len.back() += len;
        else {
          out->run_len.push_back(len);
          out->run_sym.push_back((uint8_t)c);
        }
      }
      shead += ssize;
      // superblock boundary: nothing special — words are linear in this decoder
    }
    return 0;
  }
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

int frld_encode_file(const int64_t* run_len, const uint8_t* run_sym,
                     int64_t n_runs, int asize, int sbits, const char* path) {
  RldEncoder enc(asize, sbits);
  for (int64_t i = 0; i < n_runs; ++i) enc.put(run_len[i], run_sym[i]);
  enc.finish();
  return enc.dump(path);
}

// Decodes a .fmd (RLD\2 or raw RLE-byte) file into malloc'd run arrays.
// mcnt_out must have room for asize+1 entries (7 for DNA). Returns 0 on success.
int frld_decode_file(const char* path, int64_t** run_len, uint8_t** run_sym,
                     int64_t* n_runs, uint64_t* mcnt_out, int* asize_out) {
  DecodeResult res;
  RldDecoder dec;
  int rc = dec.decode_file(path, &res);
  if (rc) return rc;
  *n_runs = (int64_t)res.run_len.size();
  *run_len = (int64_t*)malloc(res.run_len.size() * sizeof(int64_t) + 1);
  *run_sym = (uint8_t*)malloc(res.run_sym.size() + 1);
  memcpy(*run_len, res.run_len.data(), res.run_len.size() * sizeof(int64_t));
  memcpy(*run_sym, res.run_sym.data(), res.run_sym.size());
  for (int i = 0; i <= res.asize; ++i) mcnt_out[i] = res.mcnt[i];
  *asize_out = res.asize;
  return 0;
}

void frld_free(void* p) { free(p); }

}  // extern "C"
