// Column-wise (BCR) multi-string BWT construction, threaded host engine.
//
// Same cycle mathematics as construct/bcr.py (the tested numpy oracle of
// reference bcr.c:378-460): cycle j inserts, for every read still alive,
// the suffix of length j at position rank_c(B, pos_prev) within class c.
// Like the reference's next_bwt, the rank for the NEXT cycle falls out of
// the merge walk itself (the write iterator's per-symbol emit counters are
// exactly rank at the insert point), so each cycle is ONE walk over each
// class's RLE stream — no separate rank pass.  Fresh design vs the
// reference: coordinates are (class, final-offset-within-class) so no
// absolute positions, no set_bwt re-sort pass, and no per-cycle radix sort
// (6x6 source->destination buckets are order-stable because rank is
// monotone in position); streams are byte-RLE double buffers with bulk
// memcpy of the run ranges between inserts.
//
// Scale design (the round-3 fix for the 10M-read regression): the
// per-insert symbol lookup used to hit a row of the transposed read matrix
// at RANDOM read ids — one cache+TLB miss per strand per cycle once the
// row outgrows L2 (measured 392 s vs linear-scaling 162 s at 2 Gsym).  Now
// the transpose is READ-MAJOR (each strand's reversed 2-bit symbols
// contiguous) and every pending entry carries a uint64 SYMBOL BUFFER with
// the next SYMBUF_K cycles' symbols, refilled for all entries in one
// sequential sweep every SYMBUF_K cycles: one random row access per strand
// per SYMBUF_K cycles instead of per cycle, and the merge walk itself
// touches no cold memory at all.
//
// fbcr_build(text, n, out, n_threads): text is the 0-terminated
// multi-string text (reads in insertion order, sentinels included); out
// receives the BWT (n bytes).  Byte-equal to fsa_bwt / multistring_bwt.

#include <fcntl.h>
#include <sys/mman.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <string>
#include <thread>
#include <vector>

namespace {
inline double now_s() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}
}  // namespace

namespace {

struct Pend {
  int64_t off;    // final insert position within the class stream
  uint32_t read;  // read index
  uint32_t len;   // read length (avoids a random lens[] lookup per insert)
  uint64_t buf;   // 2-bit symbols for cycles [block_start, block_end)
};

// symbols buffered per refill: a u64 loaded at byte (j>>2) and shifted by
// 2*(j&3) keeps >= 29 valid 2-bit lanes; 28 leaves headroom
constexpr int64_t SYMBUF_K = 28;

struct Stream {
  std::vector<uint8_t> runs[2];  // double buffer of (len<<3 | sym) runs
  int cur = 0;
  int64_t cnt[6] = {0, 0, 0, 0, 0, 0};  // per-symbol totals

  std::vector<uint8_t>& now() { return runs[cur]; }
  std::vector<uint8_t>& other() { return runs[cur ^ 1]; }
  void flip() { cur ^= 1; }
};

inline void rle_push(std::vector<uint8_t>& v, int sym, int64_t l) {
  if (!v.empty() && (v.back() & 7) == sym) {
    int64_t have = v.back() >> 3;
    int64_t add = l < 31 - have ? l : 31 - have;
    v.back() = (uint8_t)(((have + add) << 3) | sym);
    l -= add;
  }
  while (l > 0) {
    int64_t take = l < 31 ? l : 31;
    v.push_back((uint8_t)((take << 3) | sym));
    l -= take;
  }
}

struct Bcr {
  Stream S[6];
};

// the cycle machinery, shared by the text and fragments front-ends.
// SymV(j, jb, pend) returns the BWT entry of the suffix inserted at cycle
// j (jb = the current refill-block start); Refill(jb, arr, n) reloads the
// symbol buffers of n pending entries for the block starting at cycle jb
// (no-op on the unbuffered N-containing path, where SymV reads the u8
// row-major transpose directly and prefetching hides what it can).
//
// Pending entries live in 6x6 source->destination bucket vectors with TWO
// generations: the merge walk of class k consumes this generation's
// bkt[*][k] segments IN PLACE (their concatenation is off-sorted: the
// per-segment base addend — count of symbol k in source classes below —
// is nondecreasing, and entries within a segment were pushed in emit-rank
// order) and pushes next cycle's entries into the other generation.  The
// old design copied every pending entry into a per-class array between
// cycles; at 808 Msym that gather pass was 14 s of pure memcpy (30% of
// the build).
//
// pend0[c] seeds generation 0 as the single source-class-0 segment (its
// offs are already final within class c, addend 0).
template <class Refill, class SymV, class Pref>
static void run_cycles(Bcr* B, std::vector<Pend>* pend0, int64_t lmax,
                       double t_entry, int64_t K, Refill&& refill,
                       SymV&& sym_v, Pref&& pref) {
  Stream* S = B->S;
  std::vector<Pend> bkt[2][6][6];  // [generation][source class][dest class]
  for (int c = 0; c < 6; ++c) bkt[0][0][c] = std::move(pend0[c]);
  // base[g][k][c]: addend for segment bkt[g][k][c] = count of symbol c in
  // source classes < k at the time generation g was produced
  int64_t base[2][6][6] = {};
  const bool prof = getenv("FERMI_BCR_PROF") != nullptr;
  double t_merge = 0, t_refill = 0, t0p = now_s();
  const double t_setup = t0p - t_entry;  // offs scan + transpose + cycle 0

  int g = 0;
  for (int64_t jb = 1; jb <= lmax; jb += K) {
    const int64_t je = jb + K - 1 < lmax ? jb + K - 1 : lmax;
    if (prof) t0p = now_s();
    {
      // refill the symbol buffers for this block: one sequential sweep per
      // segment, one random (prefetched) row read per entry
      std::vector<std::thread> th;
      for (int k = 1; k < 6; ++k)
        th.emplace_back([&, k] {
          for (int sc = 0; sc < 6; ++sc)
            refill(jb, bkt[g][sc][k].data(), bkt[g][sc][k].size());
        });
      for (auto& x : th) x.join();
    }
    if (prof) {
      double t1p = now_s();
      t_refill += t1p - t0p;
    }
    for (int64_t j = jb; j <= je; ++j) {
      if (prof) t0p = now_s();
      // merge-insert each class in parallel; emit counters give next ranks
      {
        std::vector<std::thread> th;
        for (int k = 1; k < 6; ++k)  // class 0 never receives inserts
          th.emplace_back([&, k] {
            auto* nxt = bkt[g ^ 1][k];
            for (int c = 0; c < 6; ++c) nxt[c].clear();
            size_t np_ = 0;
            for (int sc = 0; sc < 6; ++sc) np_ += bkt[g][sc][k].size();
            if (np_ == 0) return;
            auto& src = S[k].now();
            auto& dst = S[k].other();
            dst.clear();
            dst.reserve(src.size() + np_ + 16);
            int64_t emc[6] = {0, 0, 0, 0, 0, 0};  // symbols emitted so far
            size_t ri = 0;
            int64_t out_len = 0;
            int64_t carry_len = 0;
            int carry_sym = 0;
            const size_t PF = 12;
            for (int sc = 0; sc < 6; ++sc) {
              const auto& P = bkt[g][sc][k];
              const int64_t addend = base[g][sc][k];
              const size_t ns = P.size();
              for (size_t pi = 0; pi < ns; ++pi) {
                const Pend& p = P[pi];
                if (pi + PF < ns) pref(j, P[pi + PF]);
                int64_t need = addend + p.off - out_len;
                while (need > 0) {
                  if (carry_len) {
                    int64_t take = need < carry_len ? need : carry_len;
                    rle_push(dst, carry_sym, take);
                    emc[carry_sym] += take;
                    carry_len -= take;
                    out_len += take;
                    need -= take;
                    continue;
                  }
                  // merge-push one run, then bulk-copy whole runs that fit
                  int sym = src[ri] & 7;
                  int64_t l = src[ri] >> 3;
                  ++ri;
                  if (l > need) {
                    carry_sym = sym;
                    carry_len = l;
                    continue;
                  }
                  rle_push(dst, sym, l);
                  emc[sym] += l;
                  out_len += l;
                  need -= l;
                  size_t r0 = ri;
                  while (ri < src.size() &&
                         (int64_t)(src[ri] >> 3) <= need) {
                    int64_t rl = src[ri] >> 3;
                    emc[src[ri] & 7] += rl;
                    out_len += rl;
                    need -= rl;
                    ++ri;
                  }
                  if (ri > r0) {
                    dst.insert(dst.end(), src.begin() + r0,
                               src.begin() + ri);
                  }
                }
                int v = sym_v(j, jb, p);
                // emc[v] == rank_v(grown stream, off): the within-class
                // part of next cycle's insert position
                if ((int64_t)p.len >= j + 1)
                  nxt[v].push_back({emc[v], p.read, p.len, p.buf});
                rle_push(dst, v, 1);
                emc[v]++;
                out_len++;
                S[k].cnt[v]++;
              }
            }
            if (carry_len) rle_push(dst, carry_sym, carry_len);
            if (ri < src.size())
              dst.insert(dst.end(), src.begin() + ri, src.end());
            S[k].flip();
            // the source-class-0 segment exists only at generation 0
            // cycle 1 (initial pendings); clear it so the generation's
            // reuse two cycles later doesn't re-merge it
            bkt[g][0][k].clear();
          });
        for (auto& x : th) x.join();
      }
      if (prof) t_merge += now_s() - t0p;
      g ^= 1;
      // bases for the generation just produced: count of symbol c in
      // source classes < k AFTER this cycle's inserts
      for (int c = 0; c < 6; ++c) base[g][0][c] = 0;
      for (int k = 1; k < 6; ++k)
        for (int c = 0; c < 6; ++c)
          base[g][k][c] = base[g][k - 1][c] + S[k - 1].cnt[c];
    }
  }
  if (prof)
    fprintf(stderr, "[bcr prof] setup %.1fs refill %.1fs merge %.1fs\n",
            t_setup, t_refill, t_merge);
}

// read-major reversed 2-bit transpose: row r holds strand r's symbols
// numbered from the END (position i in [1, len] at bit 2*(i & 3) of byte
// i >> 2), so a block refill for cycles [jb, jb+K) is ONE unaligned u64
// load per strand.  Rows are padded so that load never runs off the
// allocation.
struct RevRows {
  std::vector<uint8_t> bytes;
  uint8_t* base = nullptr;
  size_t stride = 0, map_len = 0;
  bool mapped = false;

  ~RevRows() {
    if (mapped) munmap(base, map_len);
  }
  RevRows() = default;
  RevRows(const RevRows&) = delete;
  RevRows& operator=(const RevRows&) = delete;

  // FERMI_BCR_SPILL=<dir>: back the transpose with an (unlinked) temp
  // file instead of anonymous memory when it exceeds FERMI_BCR_SPILL_MIN
  // (default 256 MB) — the out-of-core story of the reference's ld_dump
  // (bcr.c:166-193, ropebwt -f): at 35x-human scale the transpose alone
  // is tens of GB; file-backed pages write back and evict under pressure,
  // so the build's anonymous footprint stays O(streams + pend).
  void alloc(int64_t m, int64_t lmax) {
    stride = (size_t)((((lmax + 2 + 3) >> 2) + 8 + 7) & ~(int64_t)7);
    size_t total = stride * (size_t)m;
    const char* dir = getenv("FERMI_BCR_SPILL");
    size_t minsz = (size_t)256 << 20;
    if (const char* s = getenv("FERMI_BCR_SPILL_MIN"))
      minsz = strtoull(s, nullptr, 10);
    if (dir && *dir && total >= minsz) {
      std::string path = std::string(dir) + "/fermi_bcr_rev_XXXXXX";
      int fd = mkstemp(&path[0]);
      if (fd >= 0) {
        bool ok = ftruncate(fd, (off_t)total) == 0;
        void* p = ok ? mmap(nullptr, total, PROT_READ | PROT_WRITE,
                            MAP_SHARED, fd, 0)
                     : MAP_FAILED;
        unlink(path.c_str());
        close(fd);
        if (p != MAP_FAILED) {
          base = (uint8_t*)p;
          map_len = total;
          mapped = true;
          return;
        }
      }
    }
    bytes.assign(total, 0);
    base = bytes.data();
  }
  inline uint8_t* row(uint32_t r) { return base + stride * r; }
  inline const uint8_t* row(uint32_t r) const { return base + stride * r; }
  // u64 window whose low bits start at rev-position pos (2-bit lanes)
  inline uint64_t window(uint32_t r, int64_t pos) const {
    uint64_t w;
    memcpy(&w, row(r) + (pos >> 2), 8);
    return w >> (2 * (pos & 3));
  }
};

// refill + sym_v pair over a RevRows transpose.  Cycle j consumes the
// read's (j+1)-th symbol from the end, so block [jb, je] loads the window
// at rev-position jb+1.
struct BufferedSyms {
  const RevRows* rr;

  void refill(int64_t jb, Pend* arr, size_t n) const {
    const size_t PF = 16;
    for (size_t i = 0; i < n; ++i) {
      if (i + PF < n)
        __builtin_prefetch(rr->row(arr[i + PF].read) + ((jb + 1) >> 2));
      arr[i].buf = rr->window(arr[i].read, jb + 1);
    }
  }
  inline int sym(int64_t j, int64_t jb, const Pend& p) const {
    if ((int64_t)p.len == j) return 0;
    return (int)((p.buf >> (2 * (j - jb))) & 3) + 1;
  }
};

// Fragments front-end: fwd + rc strands SYNTHESIZED from forward-only
// nt6 fragments (F concatenated without sentinels, offs[nfrag+1]),
// matching build_text's interleave (read 2k = fragment k possibly
// palindrome-trimmed, read 2k+1 = its reverse complement).  Halves the
// text materialization: no rc copy, no sentinel text at all — at 2 Gsym
// the raw build allocated ~14 GB of fresh pages through the text route,
// and fresh faults on this host run at 0.1-1 GB/s.
static void build_streams_frags(const uint8_t* F, const int64_t* offs,
                                int64_t nfrag, int trim_palindrome,
                                int n_threads, Bcr* B) {
  const double t_entry = now_s();
  if (nfrag == 0) return;
  const int64_t m = 2 * nfrag;
  int64_t lmax = 0;
  std::vector<int64_t> lens(m);
  for (int64_t k = 0; k < nfrag; ++k) {
    const uint8_t* s = F + offs[k];
    int64_t l = offs[k + 1] - offs[k];
    if (trim_palindrome && l > 0 && l % 2 == 0) {
      bool pal = true;
      for (int64_t i = 0; i < l; ++i)
        if ((int)s[i] + (int)s[l - 1 - i] != 5) {
          pal = false;
          break;
        }
      if (pal) --l;
    }
    lens[2 * k] = lens[2 * k + 1] = l;
    if (l > lmax) lmax = l;
  }
  RevRows rr;
  rr.alloc(m, lmax);
  {
    int T = n_threads < 1 ? 1 : n_threads;
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t)
      th.emplace_back([&, t] {
        for (int64_t k = t; k < nfrag; k += T) {
          const uint8_t* s = F + offs[k];
          int64_t l = lens[2 * k];
          uint8_t* rf = rr.row((uint32_t)(2 * k));
          uint8_t* rv = rr.row((uint32_t)(2 * k + 1));
          for (int64_t j = 1; j <= l; ++j) {
            // fwd read: j-th from end = s[l-j]; rc read: comp(s[j-1])
            rf[j >> 2] |= (uint8_t)((s[l - j] - 1) << ((j & 3) * 2));
            rv[j >> 2] |= (uint8_t)((4 - s[j - 1]) << ((j & 3) * 2));
          }
        }
      });
    for (auto& x : th) x.join();
  }
  BufferedSyms bs{&rr};

  Stream* S = B->S;
  std::vector<Pend> pend[6];
  {
    auto& v = S[0].now();
    for (int64_t r = 0; r < m; ++r) {
      int64_t k = r >> 1;
      const uint8_t* s = F + offs[k];
      int64_t l = lens[r];
      int sym = l == 0 ? 0
                       : ((r & 1) ? 5 - (int)s[0] : (int)s[l - 1]);
      rle_push(v, sym, 1);
      if (l >= 1)
        pend[sym].push_back({S[0].cnt[sym], (uint32_t)r, (uint32_t)l, 0});
      S[0].cnt[sym]++;
    }
  }
  run_cycles(
      B, pend, lmax, t_entry, SYMBUF_K,
      [&](int64_t jb, Pend* a, size_t n) { bs.refill(jb, a, n); },
      [&](int64_t j, int64_t jb, const Pend& p) { return bs.sym(j, jb, p); },
      [](int64_t, const Pend&) {});
}

// core build: fills B->S from the 0-terminated multi-string text
static void build_streams(const uint8_t* text, int64_t n, int n_threads,
                          Bcr* B) {
  const double t_entry = now_s();
  std::vector<int64_t> offs;
  offs.push_back(0);
  bool has_n = false;
  for (int64_t i = 0; i < n; ++i) {
    if (text[i] == 0) offs.push_back(i + 1);
    has_n |= text[i] == 5;
  }
  int64_t m = (int64_t)offs.size() - 1;
  if (m == 0) return;

  int64_t lmax = 0;
  std::vector<int64_t> lens(m);
  for (int64_t k = 0; k < m; ++k) {
    lens[k] = offs[k + 1] - offs[k] - 1;
    if (lens[k] > lmax) lmax = lens[k];
  }
  // ACGT-only texts use the read-major 2-bit transpose + symbol buffers
  // (see RevRows/BufferedSyms); texts with N fall back to a row-major u8
  // transpose read per cycle (symbol 5 doesn't fit 2 bits), with the merge
  // walk prefetching the lookups
  std::vector<uint8_t> rev;
  RevRows rr;
  if (has_n)
    rev.assign((size_t)(lmax + 2) * m, 0);
  else
    rr.alloc(m, lmax);
  {
    const int64_t TB = 4096;
    int T = n_threads < 1 ? 1 : n_threads;
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t)
      th.emplace_back([&, t] {
        for (int64_t k0 = t * TB; k0 < m; k0 += (int64_t)T * TB) {
          int64_t k1 = k0 + TB < m ? k0 + TB : m;
          for (int64_t k = k0; k < k1; ++k) {
            const uint8_t* s = text + offs[k];
            if (has_n) {
              for (int64_t j = 1; j <= lens[k]; ++j)
                rev[(size_t)j * m + k] = s[lens[k] - j];
            } else {
              uint8_t* rk = rr.row((uint32_t)k);
              for (int64_t j = 1; j <= lens[k]; ++j)
                rk[j >> 2] |= (uint8_t)((s[lens[k] - j] - 1) << ((j & 3) * 2));
            }
          }
        }
      });
    for (auto& x : th) x.join();
  }

  Stream* S = B->S;
  std::vector<Pend> pend[6];

  // cycle 0: the m sentinel suffixes occupy class 0 in read order; their
  // BWT entries are the reads' last characters.  The cycle-1 insert of
  // read k goes into class c at rank_c(S0, k) — a running count over the
  // same values.
  {
    auto& v = S[0].now();
    for (int64_t k = 0; k < m; ++k) {
      int sym = lens[k] ? text[offs[k] + lens[k] - 1] : 0;
      rle_push(v, sym, 1);
      if (lens[k] >= 1)
        pend[sym].push_back({S[0].cnt[sym], (uint32_t)k,
                             (uint32_t)lens[k], 0});
      S[0].cnt[sym]++;
    }
  }

  if (has_n) {
    // v = BWT entry of the suffix inserted at cycle j = symbol j+1 from
    // the end, or the sentinel when the suffix is the whole read
    auto sym_v = [&](int64_t j, int64_t, const Pend& p) -> int {
      if ((int64_t)p.len == j) return 0;
      return rev[(size_t)(j + 1) * m + p.read];
    };
    auto pref = [&](int64_t j, const Pend& p) {
      __builtin_prefetch(&rev[(size_t)(j + 1) * m + p.read]);
    };
    run_cycles(B, pend, lmax, t_entry, lmax + 1,
               [](int64_t, Pend*, size_t) {}, sym_v, pref);
  } else {
    BufferedSyms bs{&rr};
    run_cycles(
        B, pend, lmax, t_entry, SYMBUF_K,
        [&](int64_t jb, Pend* a, size_t n) { bs.refill(jb, a, n); },
        [&](int64_t j, int64_t jb, const Pend& p) {
          return bs.sym(j, jb, p);
        },
        [](int64_t, const Pend&) {});
  }
}

// Two-phase runs hand-off.  The builder holds the BWT as per-class RLE
// byte streams; the old single-call emit malloc'd worst-case syms/lens
// buffers that the Python side then copied and bincounted — at 400 Msym
// random fragments that hand-off (emit 34 s + copy 23 s + bincount 42 s)
// cost 3x the build itself.  Start() counts the maximal runs per class
// (threaded) and reports per-symbol totals straight from the builder's
// emit counters; EmitRuns() fills CALLER-allocated buffers (numpy arrays)
// with one threaded per-class pass, folding the <=5 cross-class boundary
// merges afterwards.
struct BcrHandle {
  Bcr B;
  int64_t start[6];      // global slot of the class's first emitted group
  int64_t groups[6];     // maximal run-groups within the class stream
  int64_t first_len[6];  // total length of the class's first group
  int skip_first[6];     // first group folds into the previous slot
  int64_t nr = 0;
};

// count maximal run-groups in one class stream + its boundary facts
static void scan_class(const std::vector<uint8_t>& v, int64_t* groups,
                       int64_t* first_len, int* first_sym, int* last_sym) {
  *groups = 0;
  *first_len = 0;
  *first_sym = *last_sym = -1;
  int last = -1;
  for (uint8_t r : v) {
    int sym = r & 7;
    if (sym != last) {
      ++*groups;
      last = sym;
    }
    if (*groups == 1) *first_len += r >> 3;
  }
  if (!v.empty()) {
    *first_sym = v.front() & 7;
    *last_sym = v.back() & 7;
  }
}

static BcrHandle* finish_start(BcrHandle* H, int64_t* nr_out,
                               int64_t* cnt_out) {
  int first_sym[6], last_sym[6];
  {
    std::vector<std::thread> th;
    for (int c = 0; c < 6; ++c)
      th.emplace_back([&, c] {
        scan_class(H->B.S[c].now(), &H->groups[c], &H->first_len[c],
                   &first_sym[c], &last_sym[c]);
      });
    for (auto& x : th) x.join();
  }
  int64_t nr = 0;
  int last = -1;
  for (int c = 0; c < 6; ++c) {
    H->skip_first[c] = 0;
    H->start[c] = nr;
    if (H->groups[c] == 0) continue;
    if (first_sym[c] == last) {
      H->skip_first[c] = 1;
      nr += H->groups[c] - 1;
    } else {
      nr += H->groups[c];
    }
    last = last_sym[c];
  }
  H->nr = nr;
  *nr_out = nr;
  for (int s = 0; s < 6; ++s) {
    cnt_out[s] = 0;
    for (int c = 0; c < 6; ++c) cnt_out[s] += H->B.S[c].cnt[s];
  }
  return H;
}

}  // namespace

extern "C" {

int64_t fbcr_build(const uint8_t* text, int64_t n, uint8_t* out,
                   int n_threads) {
  Bcr B;
  build_streams(text, n, n_threads, &B);
  int64_t at = 0;
  for (int c = 0; c < 6; ++c)
    for (uint8_t r : B.S[c].now()) {
      memset(out + at, r & 7, r >> 3);
      at += r >> 3;
    }
  return at;
}

void* fbcr_start_text(const uint8_t* text, int64_t n, int n_threads,
                      int64_t* nr_out, int64_t* cnt_out) {
  BcrHandle* H = new BcrHandle();
  build_streams(text, n, n_threads, &H->B);
  return finish_start(H, nr_out, cnt_out);
}

// fragments-direct variant (rc strands synthesized in the transpose; see
// build_streams_frags).  Same runs as fbcr_start_text over
// build_text(F, offs, both_strands=1, trim=...).
void* fbcr_start_frags(const uint8_t* F, const int64_t* offs, int64_t nfrag,
                       int trim_palindrome, int n_threads, int64_t* nr_out,
                       int64_t* cnt_out) {
  BcrHandle* H = new BcrHandle();
  build_streams_frags(F, offs, nfrag, trim_palindrome, n_threads, &H->B);
  return finish_start(H, nr_out, cnt_out);
}

// fill caller-allocated syms[nr]/lens[nr] with the maximal runs (adjacent
// 31-capped and cross-class-boundary runs merged), then free the handle
void fbcr_emit_runs(void* handle, uint8_t* syms, int64_t* lens) {
  BcrHandle* H = (BcrHandle*)handle;
  {
    std::vector<std::thread> th;
    for (int c = 0; c < 6; ++c)
      th.emplace_back([&, c] {
        const auto& v = H->B.S[c].now();
        if (v.empty()) return;
        // write groups [skip_first .. groups) to slots start[c]..
        int64_t at = H->start[c];
        int64_t g = -1;  // group index within the class
        int last = -1;
        for (uint8_t r : v) {
          int sym = r & 7;
          int64_t l = r >> 3;
          if (sym != last) {
            ++g;
            last = sym;
            if (g >= H->skip_first[c]) {
              syms[at] = (uint8_t)sym;
              lens[at] = l;
              ++at;
            }
          } else if (g >= H->skip_first[c]) {
            lens[at - 1] += l;
          }
        }
      });
    for (auto& x : th) x.join();
  }
  // fold skipped first groups into the previous class's final slot
  for (int c = 1; c < 6; ++c)
    if (H->skip_first[c]) lens[H->start[c] - 1] += H->first_len[c];
  delete H;
}

}  // extern "C"
