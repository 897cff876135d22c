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

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct SuffixCmp {
  const uint64_t* P;   // packed masked 21-symbol windows
  const int64_t* S;    // next sentinel position at/after i
  bool operator()(int64_t i, int64_t j) const {
    int64_t si = S[i], sj = S[j];
    for (int64_t k = 0;; k += 21) {
      uint64_t ca = (i + k <= si) ? P[i + k] : 0;
      uint64_t cb = (j + k <= sj) ? P[j + k] : 0;
      if (ca != cb) return ca < cb;
      if (i + k >= si && j + k >= sj) return si < sj;
    }
  }
};

}  // namespace

extern "C" {

// Suffix array of a 0-terminated multi-sentinel nt6 text (symbols 0..5,
// sentinel = 0, ordered among themselves by position). sa must hold n
// int64s. Matches fermi_tpu.construct.suffix.suffix_array_multi.
int fsa_build(const uint8_t* text, int64_t n, int64_t* sa, int n_threads) {
  if (n == 0) return 0;
  if (text[n - 1] != 0) return -1;
  std::vector<int64_t> S(n);
  std::vector<uint64_t> P(n);
  // backward passes: next sentinel + packed masked window
  int64_t s = n - 1;
  P[n - 1] = 0;
  S[n - 1] = n - 1;
  for (int64_t i = n - 2; i >= 0; --i) {
    if (text[i] == 0) {
      s = i;
      P[i] = 0;
    } else {
      P[i] = ((uint64_t)text[i] << 60) | (P[i + 1] >> 3);
    }
    S[i] = s;
  }
  // bucket by top 24 bits (first 8 symbols of the masked window)
  constexpr int kBits = 24;
  constexpr int64_t kBuckets = (int64_t)1 << kBits;
  std::vector<int64_t> cnt(kBuckets + 1, 0);
  for (int64_t i = 0; i < n; ++i) ++cnt[P[i] >> (64 - kBits)];
  std::vector<int64_t> off(kBuckets + 1);
  off[0] = 0;
  for (int64_t b = 0; b < kBuckets; ++b) off[b + 1] = off[b] + cnt[b];
  {
    std::vector<int64_t> cur(off.begin(), off.end() - 1);
    for (int64_t i = 0; i < n; ++i) sa[cur[P[i] >> (64 - kBits)]++] = i;
  }
  // parallel per-bucket sort, largest buckets first
  std::vector<int64_t> todo;
  for (int64_t b = 0; b < kBuckets; ++b)
    if (cnt[b] > 1) todo.push_back(b);
  std::sort(todo.begin(), todo.end(),
            [&](int64_t a, int64_t b) { return cnt[a] > cnt[b]; });
  SuffixCmp cmp{P.data(), S.data()};
  std::atomic<size_t> next(0);
  auto work = [&]() {
    for (;;) {
      size_t t = next.fetch_add(1);
      if (t >= todo.size()) break;
      int64_t b = todo[t];
      std::sort(sa + off[b], sa + off[b + 1], cmp);
    }
  };
  if (n_threads <= 1) {
    work();
  } else {
    std::vector<std::thread> th;
    for (int t = 0; t < n_threads; ++t) th.emplace_back(work);
    for (auto& t : th) t.join();
  }
  return 0;
}

// BWT directly (bwt[i] = text[sa[i]-1], 0 when sa[i]==0); avoids a second
// Python-side gather. sa is scratch provided by the caller.
int fsa_bwt(const uint8_t* text, int64_t n, int64_t* sa, uint8_t* bwt,
            int n_threads) {
  int r = fsa_build(text, n, sa, n_threads);
  if (r) return r;
  for (int64_t i = 0; i < n; ++i)
    bwt[i] = sa[i] ? text[sa[i] - 1] : 0;
  return 0;
}

}  // extern "C"
