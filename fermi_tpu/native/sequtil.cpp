// sequtil.cpp — native kernels for the host stream utilities.
//
// fflt_keep: the fltuniq filter decision (reference seq.c:149-199). A read
// is kept iff it has no non-ACGT base and every k-mer window (rolling,
// break-resetting scan) occurs >= 2 times across the whole file. The
// reference's two-plane presence bitmap is equivalent to a global
// occurrence-count test, computed here with one parallel bucket sort of
// (code, window) pairs instead of a 4^k-bit table.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// nt6-ish code per byte: A/C/G/T (upper or lower) -> 0..3, else -1
inline void build_code_table(int8_t* tbl) {
  for (int i = 0; i < 256; ++i) tbl[i] = -1;
  const char* u = "ACGT";
  const char* l = "acgt";
  for (int i = 0; i < 4; ++i) {
    tbl[(uint8_t)u[i]] = (int8_t)i;
    tbl[(uint8_t)l[i]] = (int8_t)i;
  }
}

}  // namespace

extern "C" {

// seqs: concatenated read bytes (ASCII); offsets[n+1]; keep_out uint8[n].
// Returns 0 on success.
int fflt_keep(const uint8_t* seqs, const int64_t* offsets, int64_t n_reads,
              int k, uint8_t* keep_out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  int8_t tbl[256];
  build_code_table(tbl);
  const uint64_t mask = (k >= 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);

  // pass 1 (parallel over reads): emit (code << 24 | window_id) pairs for
  // every valid window; window ids are per-read dense so <2^24 windows/read
  // is safe for short reads — use global window counter instead: windows
  // are packed per read at win_base[r].
  std::vector<int64_t> win_base(n_reads + 1);
  std::vector<uint8_t> has_inval(n_reads, 0);
  int64_t total_wins = 0;
  for (int64_t r = 0; r < n_reads; ++r) {
    win_base[r] = total_wins;
    int64_t l = offsets[r + 1] - offsets[r];
    if (l >= k) total_wins += l - k + 1;
  }
  win_base[n_reads] = total_wins;

  std::vector<uint64_t> codes(total_wins);  // code per window (dense per read)
  std::vector<uint8_t> win_valid(total_wins, 0);
  std::atomic<int64_t> next_read(0);
  auto pass1 = [&]() {
    for (;;) {
      int64_t r = next_read.fetch_add(256);
      if (r >= n_reads) break;
      int64_t rend = std::min(r + 256, n_reads);
      for (; r < rend; ++r) {
        const uint8_t* s = seqs + offsets[r];
        int64_t l = offsets[r + 1] - offsets[r];
        uint64_t z = 0;
        int run = 0;  // consecutive valid bases ending here
        bool inval = false;
        for (int64_t i = 0; i < l; ++i) {
          int8_t c = tbl[s[i]];
          if (c < 0) {
            inval = true;
            run = 0;
            z = 0;
            continue;
          }
          z = ((z << 2) | (uint64_t)c) & mask;
          if (++run >= k) {
            int64_t w = win_base[r] + (i - k + 1);
            codes[w] = z;
            win_valid[w] = 1;
          }
        }
        has_inval[r] = inval;
      }
    }
  };
  {
    std::vector<std::thread> th;
    for (int t = 0; t < n_threads; ++t) th.emplace_back(pass1);
    for (auto& t : th) t.join();
  }

  // pass 2: global dup detection — bucket (code, window) pairs by the top
  // code bits, sort buckets in parallel, mark members of groups of >= 2
  struct CW {
    uint64_t code;
    int64_t win;
  };
  std::vector<int64_t> valid_wins;
  valid_wins.reserve(total_wins);
  for (int64_t w = 0; w < total_wins; ++w)
    if (win_valid[w]) valid_wins.push_back(w);
  const int64_t nv = (int64_t)valid_wins.size();
  constexpr int kBits = 11;
  constexpr int kBuckets = 1 << kBits;
  const int shift = 2 * k > kBits ? 2 * k - kBits : 0;
  std::vector<std::vector<CW>> buckets(kBuckets);
  {
    std::vector<int64_t> cnt(kBuckets, 0);
    for (int64_t i = 0; i < nv; ++i)
      ++cnt[codes[valid_wins[i]] >> shift];
    for (int b = 0; b < kBuckets; ++b) buckets[b].reserve(cnt[b]);
    for (int64_t i = 0; i < nv; ++i) {
      int64_t w = valid_wins[i];
      buckets[codes[w] >> shift].push_back({codes[w], w});
    }
  }
  std::vector<uint8_t> dup(total_wins, 0);
  std::atomic<int> next_b(0);
  auto pass2 = [&]() {
    for (;;) {
      int b = next_b.fetch_add(1);
      if (b >= kBuckets) break;
      auto& v = buckets[b];
      std::sort(v.begin(), v.end(),
                [](const CW& a, const CW& c) { return a.code < c.code; });
      size_t i = 0;
      while (i < v.size()) {
        size_t j = i + 1;
        while (j < v.size() && v[j].code == v[i].code) ++j;
        if (j - i >= 2)
          for (size_t x = i; x < j; ++x) dup[v[x].win] = 1;
        i = j;
      }
    }
  };
  {
    std::vector<std::thread> th;
    for (int t = 0; t < n_threads; ++t) th.emplace_back(pass2);
    for (auto& t : th) t.join();
  }

  // pass 3: keep = no invalid base and every in-read window dup
  for (int64_t r = 0; r < n_reads; ++r) {
    if (has_inval[r]) {
      keep_out[r] = 0;
      continue;
    }
    bool ok = true;
    for (int64_t w = win_base[r]; w < win_base[r + 1]; ++w)
      if (!dup[w]) {
        ok = false;
        break;
      }
    keep_out[r] = ok ? 1 : 0;
  }
  return 0;
}

}  // extern "C"
