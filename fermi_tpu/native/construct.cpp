// construct.cpp — native suffix-array builder for multi-sentinel nt6 text.
//
// Replaces the reference's SA-IS (ksa.c) with a design specific to short-read
// texts: a suffix never compares past its read's sentinel, and sentinels
// order by position (ksa.c:53-54 semantics). So each suffix's sort key is
// (its read-local content, sentinel position) — bounded length. We pack the
// masked window starting at each position into 21 3-bit symbols per uint64
// (one backward recurrence), bucket suffixes by the top 24 bits, and sort
// buckets in parallel with a chunked comparator. O(n * L/21 * log) worst
// case but effectively linear for read-scale L; ~30x faster than the host
// prefix-doubling path at 12M symbols.

#include "oom.h"
#include <fcntl.h>
#include <sys/mman.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <functional>
#include <memory>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {
inline double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}
inline bool fsa_debug() {
  static bool d = getenv("FERMI_FSA_DEBUG") != nullptr;
  return d;
}
#define FSA_TICK(name)                                          \
  do {                                                          \
    if (fsa_debug()) {                                          \
      double t = now_s();                                       \
      fprintf(stderr, "[fsa] %-10s %.2fs\n", name, t - _t0);    \
      _t0 = t;                                                  \
    }                                                           \
  } while (0)
}  // namespace

#include <mutex>

namespace {

// Grow-only scratch arena, reused across fsa_build calls: page-faulting
// fresh memory costs ~0.5 GB/s on VM hosts (measured), so recycling the
// ~30 bytes/symbol of scratch across the pipeline's repeated builds is
// worth a process-lifetime hold. Guarded by a mutex in fsa_build.
struct Arena {
  void* p = nullptr;
  size_t cap = 0;
  void* get(size_t bytes) {
    if (bytes > cap) {
      free(p);
      p = malloc(bytes);
      cap = bytes;
    }
    return p;
  }
};
std::mutex g_fsa_mu;
Arena g_arena_d, g_arena_p, g_arena_r;

// Sort record: the suffix's first packed chunk rides along so the common
// case (mismatch within 21 symbols) never touches P/S at all.
struct Rec {
  uint64_t p0;
  int64_t idx;
};

struct SuffixCmp {
  const uint64_t* P;   // packed masked 21-symbol windows
  const int32_t* D;    // distance to the suffix's sentinel (S[i] - i)
  bool operator()(const Rec& a, const Rec& b) const {
    if (a.p0 != b.p0) return a.p0 < b.p0;
    int64_t i = a.idx, j = b.idx;
    int64_t di = D[i], dj = D[j];
    for (int64_t k = 21;; k += 21) {
      uint64_t ca = (k <= di) ? P[i + k] : 0;
      uint64_t cb = (k <= dj) ? P[j + k] : 0;
      if (ca != cb) return ca < cb;
      if (k >= di && k >= dj) return i + di < j + dj;
    }
  }
};

}  // namespace

extern "C" {

// Pre-fault the fsa_build scratch arenas for an n-symbol text (parallel
// first touch). Call from a background thread while the host assembles the
// text — page faults on fresh memory are the cold build's largest cost on
// VM hosts, and this overlaps them with IO/encode work. ctypes releases the
// GIL during the call, so a plain Python thread suffices.
void fsa_prewarm(int64_t n, int n_threads) {
  if (n <= 0) return;
  if (n_threads < 1) n_threads = 1;
  std::lock_guard<std::mutex> lock(g_fsa_mu);
  struct Span { uint8_t* p; size_t bytes; };
  Span spans[3] = {
      {(uint8_t*)g_arena_d.get(n * sizeof(int32_t)), (size_t)n * 4},
      {(uint8_t*)g_arena_p.get(n * sizeof(uint64_t)), (size_t)n * 8},
      {(uint8_t*)g_arena_r.get(n * sizeof(Rec)), (size_t)n * sizeof(Rec)},
  };
  std::vector<std::thread> th;
  for (int t = 0; t < n_threads; ++t) {
    th.emplace_back([&, t]() {
      for (auto& s : spans) {
        size_t lo = s.bytes * t / n_threads, hi = s.bytes * (t + 1) / n_threads;
        for (size_t i = lo; i < hi; i += 4096) s.p[i] = 0;
      }
    });
  }
  for (auto& t : th) t.join();
}

// Suffix array of a 0-terminated multi-sentinel nt6 text (symbols 0..5,
// sentinel = 0, ordered among themselves by position). sa must hold n
// int64s. Matches fermi_tpu.construct.suffix.suffix_array_multi.
int fsa_build(const uint8_t* text, int64_t n, int64_t* sa, int n_threads) {
  if (n == 0) return 0;
  if (text[n - 1] != 0) return -1;
  if (n_threads < 1) n_threads = 1;
  double _t0 = now_s();
  const int T = n_threads;
  // uninitialized arena buffers: zero-fill would page-fault gigabytes
  // single-threaded; first touch happens inside the parallel passes, and
  // repeat calls reuse already-faulted pages
  std::lock_guard<std::mutex> lock(g_fsa_mu);
  int32_t* D = (int32_t*)g_arena_d.get(n * sizeof(int32_t));
  uint64_t* P = (uint64_t*)g_arena_p.get(n * sizeof(uint64_t));

  // slice boundaries aligned to sentinels: the P/D backward recurrences
  // reset at every sentinel, so slices ending on one are self-contained
  std::vector<int64_t> ends(T + 1);  // slice t covers [ends[t], ends[t+1])
  ends[T] = n;
  for (int t = T - 1; t >= 1; --t) {
    int64_t b = n * t / T;
    int64_t lim = ends[t + 1];
    while (b < lim && text[b - 1] != 0) ++b;  // start just after a sentinel
    ends[t] = b < lim ? b : lim;
  }
  ends[0] = 0;
  auto pass1 = [&](int t) {
    int64_t lo = ends[t], hi = ends[t + 1];
    int32_t d = 0;  // text[hi-1] is a sentinel by construction
    for (int64_t i = hi - 1; i >= lo; --i) {
      if (text[i] == 0) {
        d = 0;
        P[i] = 0;
      } else {
        ++d;
        P[i] = ((uint64_t)text[i] << 60) | (P[i + 1] >> 3);
      }
      D[i] = d;
    }
  };

  // parallel counting sort by the top 21 bits (first 7 symbols); records
  // carry the full first chunk so bucket sorts rarely gather from P/D
  constexpr int kBits = 21;
  constexpr int64_t kBuckets = (int64_t)1 << kBits;
  Rec* recs = (Rec*)g_arena_r.get(n * sizeof(Rec));
  std::vector<std::vector<int32_t>> hist(T);
  auto pass2 = [&](int t) {
    hist[t].assign(kBuckets, 0);
    int64_t lo = ends[t], hi = ends[t + 1];
    for (int64_t i = lo; i < hi; ++i) ++hist[t][P[i] >> (64 - kBits)];
  };
  std::vector<int64_t> off(kBuckets + 1);
  std::vector<std::vector<int64_t>> toff(T);  // per-thread start per bucket
  auto pass3 = [&](int t) {
    int64_t lo = ends[t], hi = ends[t + 1];
    std::vector<int64_t>& cur = toff[t];
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t p = P[i];
      recs[cur[p >> (64 - kBits)]++] = {p, i};
    }
  };

  auto run_par = [&](auto&& fn) {
    if (T == 1) {
      fn(0);
      return;
    }
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t) th.emplace_back(fn, t);
    for (auto& t : th) t.join();
  };
  FSA_TICK("alloc");
  run_par(pass1);
  FSA_TICK("pack");
  run_par(pass2);
  FSA_TICK("count");
  {
    int64_t at = 0;
    for (int64_t b = 0; b < kBuckets; ++b) {
      off[b] = at;
      for (int t = 0; t < T; ++t) at += hist[t][b];
    }
    off[kBuckets] = at;
    for (int t = 0; t < T; ++t) toff[t].resize(kBuckets);
    for (int64_t b = 0; b < kBuckets; ++b) {
      int64_t at2 = off[b];
      for (int t = 0; t < T; ++t) {
        toff[t][b] = at2;
        at2 += hist[t][b];
      }
    }
  }
  FSA_TICK("prefix");
  run_par(pass3);
  FSA_TICK("scatter");

  // parallel per-bucket sort + writeback, buckets dealt in chunks.
  // Buckets are large (only 4^7 distinct letter 7-mers), so each is first
  // MSD-radix'd on the remaining 43 bits of p0 with a per-thread scratch;
  // std::sort with the chunked comparator only handles equal-p0 groups.
  SuffixCmp cmp{P, D};
  std::atomic<int64_t> next(0);
  auto work = [&](int) {
    std::vector<Rec> scratch;
    // recursive MSD byte radix over p0 bits [shift, shift+8)
    std::function<void(Rec*, int64_t, int)> radix = [&](Rec* r, int64_t m,
                                                        int shift) {
      if (m <= 48 || shift < 0) {
        std::sort(r, r + m, cmp);
        return;
      }
      int64_t cnt2[257] = {0};
      for (int64_t i = 0; i < m; ++i)
        ++cnt2[((r[i].p0 >> shift) & 0xff) + 1];
      for (int d = 0; d < 256; ++d) cnt2[d + 1] += cnt2[d];
      if ((size_t)m > scratch.size()) scratch.resize(m);
      int64_t cur[256];
      memcpy(cur, cnt2, sizeof(cur));
      for (int64_t i = 0; i < m; ++i)
        scratch[cur[(r[i].p0 >> shift) & 0xff]++] = r[i];
      memcpy(r, scratch.data(), sizeof(Rec) * m);
      for (int d = 0; d < 256; ++d) {
        int64_t sz = cnt2[d + 1] - cnt2[d];
        if (sz > 1) radix(r + cnt2[d], sz, shift - 8);
      }
    };
    for (;;) {
      int64_t b0 = next.fetch_add(16);
      if (b0 >= kBuckets) break;
      int64_t b1 = std::min(b0 + 16, kBuckets);
      for (int64_t b = b0; b < b1; ++b) {
        int64_t lo = off[b], hi = off[b + 1];
        if (hi - lo > 1) radix(recs + lo, hi - lo, 64 - kBits - 8);
        for (int64_t x = lo; x < hi; ++x) sa[x] = recs[x].idx;
      }
    }
  };
  run_par(work);
  FSA_TICK("sort");
  return 0;
}

// BWT directly (bwt[i] = text[sa[i]-1], 0 when sa[i]==0); avoids a second
// Python-side gather. sa is scratch provided by the caller.
int fsa_bwt(const uint8_t* text, int64_t n, int64_t* sa, uint8_t* bwt,
            int n_threads) {
  int r = fsa_build(text, n, sa, n_threads);
  if (r) return r;
  if (n_threads < 2) {
    for (int64_t i = 0; i < n; ++i)
      bwt[i] = sa[i] ? text[sa[i] - 1] : 0;
    return 0;
  }
  std::vector<std::thread> th;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = n * t / n_threads, hi = n * (t + 1) / n_threads;
    th.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i)
        bwt[i] = sa[i] ? text[sa[i] - 1] : 0;
    });
  }
  for (auto& t : th) t.join();
  return 0;
}

// Assemble the sentinel-terminated fermi text (fwd 0 [rc 0] per read,
// reference cmd.c:458-462 palindrome trim) from concatenated nt6 reads.
// out must hold 2*total+2*n_reads bytes; returns the text length.
int64_t fbuild_text(const uint8_t* seqs, const int64_t* offsets,
                    int64_t n_reads, int both_strands, int trim_palindrome,
                    uint8_t* out) {
  int64_t at = 0;
  for (int64_t r = 0; r < n_reads; ++r) {
    const uint8_t* s = seqs + offsets[r];
    int64_t l = offsets[r + 1] - offsets[r];
    if (both_strands && trim_palindrome && l > 0 && l % 2 == 0) {
      bool pal = true;
      for (int64_t i = 0; i < l; ++i)
        if ((int)s[i] + (int)s[l - 1 - i] != 5) {
          pal = false;
          break;
        }
      if (pal) --l;
    }
    memcpy(out + at, s, l);
    at += l;
    out[at++] = 0;
    if (both_strands) {
      for (int64_t i = 0; i < l; ++i) {
        uint8_t c = s[l - 1 - i];
        out[at + i] = (c >= 1 && c <= 4) ? (uint8_t)(5 - c) : c;
      }
      at += l;
      out[at++] = 0;
    }
  }
  return at;
}

// ASCII read spans -> forward-only nt6 fragments (maximal ACGT runs):
// malloc'd F (concatenated, no sentinels) + offs[nfrag+1].  Feeds the
// fragments-direct BCR (fbcr_build_runs_frags) without ever materializing
// the doubled sentinel text.  Returns nfrag.
int64_t fencode_frags(const uint8_t* data, const int64_t* starts,
                      const int64_t* lens, int64_t n_reads, int n_threads,
                      uint8_t** F_out, int64_t** offs_out) {
  if (n_threads < 1) n_threads = 1;
  const int T = n_threads;
  int8_t tbl[256];
  for (int i = 0; i < 256; ++i) tbl[i] = 0;
  const char* u = "ACGT";
  const char* lo = "acgt";
  for (int i = 0; i < 4; ++i) {
    tbl[(uint8_t)u[i]] = (int8_t)(i + 1);
    tbl[(uint8_t)lo[i]] = (int8_t)(i + 1);
  }
  std::vector<int64_t> split(T + 1);
  for (int t = 0; t <= T; ++t) split[t] = n_reads * t / T;
  std::vector<std::vector<uint8_t>> tF(T);
  std::vector<std::vector<int64_t>> tfl(T);
  auto scan = [&](int t) {
    auto& F = tF[t];
    auto& fl = tfl[t];
    int64_t bytes = 0;
    for (int64_t r = split[t]; r < split[t + 1]; ++r) bytes += lens[r];
    F.reserve(bytes);
    for (int64_t r = split[t]; r < split[t + 1]; ++r) {
      const uint8_t* s = data + starts[r];
      int64_t L = lens[r];
      int64_t fstart = -1;
      for (int64_t i = 0; i <= L; ++i) {
        int8_t c = i < L ? tbl[s[i]] : 0;
        if (c) {
          if (fstart < 0) fstart = (int64_t)F.size();
          F.push_back((uint8_t)c);
        } else if (fstart >= 0) {
          fl.push_back((int64_t)F.size() - fstart);
          fstart = -1;
        }
      }
    }
  };
  {
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t) th.emplace_back(scan, t);
    for (auto& x : th) x.join();
  }
  int64_t total = 0, nfrag = 0;
  for (int t = 0; t < T; ++t) {
    total += (int64_t)tF[t].size();
    nfrag += (int64_t)tfl[t].size();
  }
  uint8_t* F = (uint8_t*)fx_malloc(total + 1, "fbuild_text");
  int64_t* offs = (int64_t*)fx_malloc((nfrag + 1) * sizeof(int64_t), "fbuild_text");
  int64_t fat = 0, oat = 0, acc = 0;
  for (int t = 0; t < T; ++t) {
    memcpy(F + fat, tF[t].data(), tF[t].size());
    fat += (int64_t)tF[t].size();
    for (int64_t x : tfl[t]) {
      offs[oat++] = acc;
      acc += x;
    }
  }
  offs[oat] = acc;
  *F_out = F;
  *offs_out = offs;
  return nfrag;
}

// ASCII read spans -> the sentinel-terminated fermi text directly: encode
// (ACGT upper/lower -> 1..4), split each read at any other byte into
// maximal fragments, then fwd [+ rc, palindrome-trimmed] per fragment via
// fbuild_text.  Replaces the host python chain (str join + table encode +
// edge split + pack, ~6 s per 1M reads).  Returns the text length via a
// malloc'd buffer (frld_free).
int64_t fbuild_text_ascii(const uint8_t* data, const int64_t* starts,
                          const int64_t* lens, int64_t n_reads,
                          int both_strands, int trim_palindrome,
                          int n_threads, uint8_t** out_text) {
  if (n_threads < 1) n_threads = 1;
  const int T = n_threads;
  int8_t tbl[256];
  for (int i = 0; i < 256; ++i) tbl[i] = 0;
  const char* u = "ACGT";
  const char* l = "acgt";
  for (int i = 0; i < 4; ++i) {
    tbl[(uint8_t)u[i]] = (int8_t)(i + 1);
    tbl[(uint8_t)l[i]] = (int8_t)(i + 1);
  }
  std::vector<int64_t> split(T + 1);
  for (int t = 0; t <= T; ++t) split[t] = n_reads * t / T;
  // per-thread fragment stores (F bytes + fragment lengths)
  std::vector<std::vector<uint8_t>> tF(T);
  std::vector<std::vector<int64_t>> tfl(T);
  auto scan = [&](int t) {
    auto& F = tF[t];
    auto& fl = tfl[t];
    int64_t bytes = 0;
    for (int64_t r = split[t]; r < split[t + 1]; ++r) bytes += lens[r];
    F.reserve(bytes);
    for (int64_t r = split[t]; r < split[t + 1]; ++r) {
      const uint8_t* s = data + starts[r];
      int64_t L = lens[r];
      int64_t fstart = -1;
      for (int64_t i = 0; i <= L; ++i) {
        int8_t c = i < L ? tbl[s[i]] : 0;
        if (c) {
          if (fstart < 0) fstart = (int64_t)F.size();
          F.push_back((uint8_t)c);
        } else if (fstart >= 0) {
          fl.push_back((int64_t)F.size() - fstart);
          fstart = -1;
        }
      }
    }
  };
  {
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t) th.emplace_back(scan, t);
    for (auto& x : th) x.join();
  }
  int64_t total = 0, nfrag = 0;
  for (int t = 0; t < T; ++t) {
    total += (int64_t)tF[t].size();
    nfrag += (int64_t)tfl[t].size();
  }
  std::vector<uint8_t> F(total);
  std::vector<int64_t> offs(nfrag + 1);
  {
    int64_t fat = 0, oat = 0, acc = 0;
    for (int t = 0; t < T; ++t) {
      memcpy(F.data() + fat, tF[t].data(), tF[t].size());
      fat += (int64_t)tF[t].size();
      for (int64_t x : tfl[t]) {
        offs[oat++] = acc;
        acc += x;
      }
    }
    offs[oat] = acc;
  }
  uint8_t* out = (uint8_t*)fx_malloc(2 * total + 2 * nfrag + 1, "frld_expand");
  int64_t n = fbuild_text(F.data(), offs.data(), nfrag, both_strands,
                          trim_palindrome, out);
  *out_text = out;
  return n;
}

// Exclusive cumulative occ [n_rows, stride] for padded BWT blocks
// [n_rows, 128] (pad symbol 6+ ignored; columns 6..stride-1 zeroed).
// One pass; replaces six numpy compare-sum sweeps. stride is 6 for the
// HostIndex layout or 8 for the native engines' padded layout.
void focc_build(const uint8_t* blocks, int64_t n_rows, int64_t* occ,
                int stride) {
  int64_t c[6] = {0, 0, 0, 0, 0, 0};
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int j = 0; j < 6; ++j) occ[r * stride + j] = c[j];
    for (int j = 6; j < stride; ++j) occ[r * stride + j] = 0;
    const uint8_t* row = blocks + r * 128;
    for (int i = 0; i < 128; ++i) {
      uint8_t s = row[i];
      if (s < 6) ++c[s];
    }
  }
}

// Expand RLE runs straight into the padded block layout ([nb+1, 128] bytes,
// pad symbol 6) used by HostIndex and the native engines — replaces
// np.repeat + np.full + reshape (three full passes with page faults) with
// one parallel pass.
void fexpand_blocks(const uint8_t* syms, const int64_t* lens, int64_t n_runs,
                    int64_t total, uint8_t* blocks, int64_t n_rows,
                    int n_threads) {
  if (n_threads < 1) n_threads = 1;
  const int T = n_threads;
  // per-thread slice of runs with precomputed start offsets
  std::vector<int64_t> rsplit(T + 1), osplit(T + 1);
  for (int t = 0; t <= T; ++t) rsplit[t] = n_runs * t / T;
  {
    int64_t at = 0;
    int64_t t = 0;
    for (int64_t r = 0; r <= n_runs; ++r) {
      while (t <= T && rsplit[t] == r) osplit[t++] = at;
      if (r < n_runs) at += lens[r];
    }
  }
  auto work = [&](int t) {
    int64_t at = osplit[t];
    for (int64_t r = rsplit[t]; r < rsplit[t + 1]; ++r) {
      memset(blocks + at, syms[r], lens[r]);
      at += lens[r];
    }
    if (t == T - 1) memset(blocks + at, 6, n_rows * 128 - at);
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t) th.emplace_back(work, t);
    for (auto& t : th) t.join();
  }
}

// Nibble-pack padded BWT blocks into int32 words (8 symbols per word; the
// symbol at block offset j*8+s sits in nibble s of word j) — the device
// rank6 SWAR layout (index/fmd.py from_bwt). Replaces an 8-shift numpy
// loop that cost ~20 s at 200 Msym.
void fpack_build(const uint8_t* blocks, int64_t n_rows, int32_t* packed,
                 int n_threads) {
  if (n_threads < 1) n_threads = 1;
  const int T = n_threads;
  auto work = [&](int t) {
    int64_t r0 = n_rows * t / T, r1 = n_rows * (t + 1) / T;
    for (int64_t r = r0; r < r1; ++r) {
      const uint8_t* row = blocks + r * 128;
      int32_t* out = packed + r * 16;
      for (int j = 0; j < 16; ++j) {
        uint32_t w = 0;
        for (int s = 0; s < 8; ++s)
          w |= (uint32_t)(row[j * 8 + s] & 0xF) << (4 * s);
        out[j] = (int32_t)w;
      }
    }
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t) th.emplace_back(work, t);
    for (auto& t : th) t.join();
  }
}

// Number of maximal runs in a BWT — lets the caller size the frle_from_bwt
// buffers exactly (worst-case n-sized buffers cost ~1.8 GB of allocation +
// page faults at 200 Msym; this scan is ~0.1 s).
int64_t frle_count(const uint8_t* bwt, int64_t n) {
  if (n == 0) return 0;
  int64_t nr = 1;
  for (int64_t i = 1; i < n; ++i) nr += bwt[i] != bwt[i - 1];
  return nr;
}

// Run-length extraction from a BWT: writes runs as (sym uint8, len int64)
// into caller buffers sized n; returns the run count.
int64_t frle_from_bwt(const uint8_t* bwt, int64_t n, uint8_t* syms,
                      int64_t* lens) {
  if (n == 0) return 0;
  int64_t nr = 0;
  uint8_t c = bwt[0];
  int64_t l = 1;
  for (int64_t i = 1; i < n; ++i) {
    if (bwt[i] == c) {
      ++l;
    } else {
      syms[nr] = c;
      lens[nr++] = l;
      c = bwt[i];
      l = 1;
    }
  }
  syms[nr] = c;
  lens[nr++] = l;
  return nr;
}

// Plain 4-line FASTQ file -> forward nt6 fragments in ONE pass: mmap the
// file, threaded newline scan + '@'/'+' shape validation + table encode +
// maximal-ACGT-run split, per-thread buffers gathered into two malloc'd
// arrays (F bytes, offs int64[nfrag+1]).  Collapses the python chain
// (f.read -> fastq_seq_spans -> fencode_frags: 4+ full passes over the
// bytes plus a 1 GB copy) into two streaming passes.  Returns len(F), or
// a negative error (not 4-line FASTQ / IO) so the caller can fall back.
int64_t ffastq_frags(const char* path, int n_threads, uint8_t** F_out,
                     int64_t** offs_out, int64_t* nfrag_out) {
  if (n_threads < 1) n_threads = 1;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  off_t flen = lseek(fd, 0, SEEK_END);
  if (flen <= 0) { close(fd); return -1; }
  const uint8_t* data = (const uint8_t*)mmap(nullptr, (size_t)flen,
                                             PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (data == MAP_FAILED) return -1;
  madvise((void*)data, (size_t)flen, MADV_SEQUENTIAL);
  const int64_t n = (int64_t)flen;
  const int T = n_threads;

  // phase A: newline count per chunk
  std::vector<int64_t> cstart(T + 1), nlcnt(T, 0);
  for (int t = 0; t <= T; ++t) cstart[t] = n * t / T;
  {
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t)
      th.emplace_back([&, t] {
        int64_t c = 0;
        const uint8_t* p = data + cstart[t];
        const uint8_t* e = data + cstart[t + 1];
        while (p < e) {
          const uint8_t* q = (const uint8_t*)memchr(p, '\n', e - p);
          if (!q) break;
          ++c;
          p = q + 1;
        }
        nlcnt[t] = c;
      });
    for (auto& x : th) x.join();
  }
  std::vector<int64_t> line_at(T + 1, 0);  // line index at chunk starts
  for (int t = 0; t < T; ++t) line_at[t + 1] = line_at[t] + nlcnt[t];
  int64_t n_lines = line_at[T];
  bool final_nl = data[n - 1] == '\n';
  if (!final_nl) ++n_lines;
  if (n_lines % 4) { munmap((void*)data, (size_t)flen); return -2; }
  const int64_t n_reads = n_lines / 4;

  int8_t tbl[256];
  memset(tbl, 0, sizeof tbl);
  const char* u = "ACGT";
  const char* lo = "acgt";
  for (int i = 0; i < 4; ++i) {
    tbl[(uint8_t)u[i]] = (int8_t)(i + 1);
    tbl[(uint8_t)lo[i]] = (int8_t)(i + 1);
  }

  // phase B: records split across threads; locate each range's byte start
  // by scanning forward from the nearest chunk boundary
  std::vector<std::vector<uint8_t>> tF(T);
  std::vector<std::vector<int64_t>> tfl(T);
  std::vector<int> bad(T, 0);
  auto work = [&](int t) {
    int64_t r0 = n_reads * t / T, r1 = n_reads * (t + 1) / T;
    if (r0 >= r1) return;
    int64_t want_line = 4 * r0;
    // chunk whose starting line index <= want_line
    int c = 0;
    while (c + 1 <= T - 1 && line_at[c + 1] <= want_line) ++c;
    const uint8_t* p = data + cstart[c];
    const uint8_t* end = data + n;
    for (int64_t skip = want_line - line_at[c]; skip > 0; --skip) {
      const uint8_t* q = (const uint8_t*)memchr(p, '\n', end - p);
      if (!q) { bad[t] = 1; return; }
      p = q + 1;
    }
    auto& F = tF[t];
    auto& fl = tfl[t];
    F.reserve((size_t)((r1 - r0) * 110));
    for (int64_t r = r0; r < r1; ++r) {
      // line 0: @name
      if (p >= end || *p != '@') { bad[t] = 1; return; }
      p = (const uint8_t*)memchr(p, '\n', end - p);
      if (!p) { bad[t] = 1; return; }
      ++p;
      // line 1: sequence
      const uint8_t* q = (const uint8_t*)memchr(p, '\n', end - p);
      if (!q) q = end;
      int64_t fstart = -1;
      for (const uint8_t* s = p; s <= q; ++s) {
        int8_t cc = s < q ? tbl[*s] : 0;
        if (cc) {
          if (fstart < 0) fstart = (int64_t)F.size();
          F.push_back((uint8_t)cc);
        } else if (fstart >= 0) {
          fl.push_back((int64_t)F.size() - fstart);
          fstart = -1;
        }
      }
      p = q < end ? q + 1 : end;
      // line 2: +
      if (p >= end || *p != '+') { bad[t] = 1; return; }
      p = (const uint8_t*)memchr(p, '\n', end - p);
      if (!p) { bad[t] = 1; return; }
      ++p;
      // line 3: qualities
      q = (const uint8_t*)memchr(p, '\n', end - p);
      p = q ? q + 1 : end;
    }
  };
  {
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t) th.emplace_back(work, t);
    for (auto& x : th) x.join();
  }
  munmap((void*)data, (size_t)flen);
  for (int t = 0; t < T; ++t)
    if (bad[t]) return -3;

  int64_t total = 0, nfrag = 0;
  std::vector<int64_t> fbase(T + 1, 0), obase(T + 1, 0);
  for (int t = 0; t < T; ++t) {
    fbase[t + 1] = fbase[t] + (int64_t)tF[t].size();
    obase[t + 1] = obase[t] + (int64_t)tfl[t].size();
  }
  total = fbase[T];
  nfrag = obase[T];
  uint8_t* F = (uint8_t*)fx_malloc((size_t)total + 1, "ffastq_frags");
  int64_t* offs = (int64_t*)fx_malloc(((size_t)nfrag + 1) * sizeof(int64_t), "ffastq_frags");
  if (!F || !offs) { free(F); free(offs); return -4; }
  {
    std::vector<std::thread> th;
    for (int t = 0; t < T; ++t)
      th.emplace_back([&, t] {
        memcpy(F + fbase[t], tF[t].data(), tF[t].size());
        int64_t acc = fbase[t], oat = obase[t];
        for (int64_t x : tfl[t]) {
          offs[oat++] = acc;
          acc += x;
        }
      });
    for (auto& x : th) x.join();
  }
  offs[nfrag] = total;
  *F_out = F;
  *offs_out = offs;
  *nfrag_out = nfrag;
  return total;
}

}  // extern "C"
