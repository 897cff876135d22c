// unitig.cpp — native unitig construction engine.
//
// Same control flow as fermi_tpu/algos/unitig.py (which mirrors reference
// unitig.c in single-thread seed order and is parity-tested against it);
// this is the fast host path operating directly on the blocked-occ index
// arrays. Output is the MAG text, byte-identical to the Python engine.

#include <algorithm>
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "fmindex.h"

namespace {

using fermi_native::comp6;
using fermi_native::Index;
using fermi_native::kBlock;
using fermi_native::kBlockBits;

struct Intv {
  int64_t kb, kf, sz;
  uint64_t info;
};

// fm6_extend over one interval, all 6 symbols
static void extend6(const Index& e, int64_t kb, int64_t kf, int64_t sz,
                    bool is_back, int64_t KB[6], int64_t KF[6],
                    int64_t SZ[6]) {
  int64_t primary = is_back ? kb : kf;
  int64_t tk[6], tl[6];
  e.rank6_pair(primary, primary + sz, tk, tl);
  int64_t osz[6];
  for (int c = 0; c < 6; ++c) {
    osz[c] = tl[c] - tk[c];
  }
  int64_t outp[6];
  for (int c = 0; c < 6; ++c) outp[c] = e.cnt[c] + tk[c];
  int64_t other[6];
  int64_t base = is_back ? kf : kb;
  other[0] = base;
  other[4] = other[0] + osz[0];
  other[3] = other[4] + osz[4];
  other[2] = other[3] + osz[3];
  other[1] = other[2] + osz[2];
  other[5] = other[1] + osz[1];
  for (int c = 0; c < 6; ++c) {
    SZ[c] = osz[c];
    if (is_back) {
      KB[c] = outp[c];
      KF[c] = other[c];
    } else {
      KB[c] = other[c];
      KF[c] = outp[c];
    }
  }
}

struct Builder {
  Index e;
  int min_match;
  const uint64_t* sorted;  // may be null
  std::vector<uint8_t> used, bend, visited;
  std::string out;

  Builder(const Index& idx, int mm, const uint64_t* srt)
      : e(idx), min_match(mm), sorted(srt) {
    used.assign(e.n_seqs, 0);
    bend.assign(e.n_seqs, 0);
    visited.assign(e.n_seqs, 0);
  }

  void set_bits(int64_t kb, int64_t kf, int64_t sz) {
    if (sorted) {
      for (int64_t i = 0; i < sz; ++i) {
        used[sorted[kb + i] >> 2] = 1;
        used[sorted[kf + i] >> 2] = 1;
      }
    } else {
      for (int64_t i = 0; i < sz; ++i) {
        used[kb + i] = 1;
        used[kf + i] = 1;
      }
    }
  }

  // overlap_intv (unitig.c:38-64)
  Intv overlap_intv(const std::vector<uint8_t>& seq, int j, bool at5,
                    bool inc_sentinel, std::vector<Intv>& out_list) {
    out_list.clear();
    int l = (int)seq.size();
    int dlt = at5 ? 1 : -1;
    int end = at5 ? l : -1;
    int c = seq[j];
    Intv ik{e.cnt[c], e.cnt[comp6(c)], e.cnt[c + 1] - e.cnt[c], 0};
    int depth = 1;
    j += dlt;
    while (j != end) {
      c = at5 ? comp6(seq[j]) : seq[j];
      int64_t KB[6], KF[6], SZ[6];
      extend6(e, ik.kb, ik.kf, ik.sz, !at5, KB, KF, SZ);
      if (SZ[c] == 0) break;
      if (depth >= min_match && SZ[0]) {
        if (inc_sentinel)
          out_list.push_back({KB[0], KF[0], SZ[0], (uint64_t)(j - dlt)});
        else
          out_list.push_back({ik.kb, ik.kf, ik.sz, (uint64_t)(j - dlt)});
      }
      ik = {KB[c], KF[c], SZ[c], 0};
      j += dlt;
      ++depth;
    }
    std::reverse(out_list.begin(), out_list.end());
    return ik;
  }

  // fm6_is_contained (unitig.c:77-91)
  int is_contained(const std::vector<uint8_t>& s, Intv* intv0,
                   std::vector<Intv>& ovlp) {
    assert((int)s.size() > min_match);
    Intv ik = overlap_intv(s, (int)s.size() - 1, false, false, ovlp);
    int ret = 0;
    int64_t KB[6], KF[6], SZ[6];
    extend6(e, ik.kb, ik.kf, ik.sz, true, KB, KF, SZ);
    assert(SZ[0]);
    if (ik.sz != SZ[0]) ret = -1;
    Intv ik2{KB[0], KF[0], SZ[0], 0};
    extend6(e, ik2.kb, ik2.kf, ik2.sz, false, KB, KF, SZ);
    assert(SZ[0]);
    if (ik2.sz != SZ[0]) ret = -1;
    *intv0 = {KB[0], KF[0], SZ[0], 0};
    return ret;
  }

  // fm6_get_nei (unitig.c:93-179); s may grow
  int get_nei(int beg, std::vector<uint8_t>& s, std::vector<Intv>& nei,
              std::vector<Intv>& prev) {
    int ori_l = (int)s.size();
    nei.clear();
    bool is_forked = false;
    if (prev.empty()) {
      std::vector<uint8_t> sub(s.begin() + beg, s.end());
      overlap_intv(sub, (int)sub.size() - 1, false, false, prev);
      if (prev.empty()) return -1;
      for (auto& p : prev) p.info += beg;
    }
    std::vector<int> cat(prev.size(), 0);
    std::vector<Intv> curr;
    while (!prev.empty()) {
      curr.clear();
      size_t J = prev.size();
      for (size_t j = 0; j < J; ++j) {
        if (cat[j] < 0) continue;
        if (j + 1 < J) e.prefetch(prev[j + 1].kf);
        Intv& p = prev[j];
        int64_t KB[6], KF[6], SZ[6];
        extend6(e, p.kb, p.kf, p.sz, false, KB, KF, SZ);
        if (SZ[0] && ori_l != (int)s.size()) {
          int64_t BK[6], BF[6], BS[6];
          extend6(e, KB[0], KF[0], SZ[0], true, BK, BF, BS);
          if (BS[0]) {
            if (SZ[0] == p.sz && p.sz == BS[0]) {
              int cat0 = cat[j];
              uint64_t info = (uint64_t)(ori_l - (int64_t)(p.info & 0xffffffffULL));
              size_t i = j;
              while (i < J && cat[i] == cat0) {
                cat[i] = -1;
                ++i;
              }
              nei.push_back({BK[0], BF[0], BS[0], info});
              continue;
            } else {
              set_bits(BK[0], BF[0], BS[0]);
            }
          }
        }
        if (cat[j] < 0) continue;
        for (int c = 1; c < 5; ++c) {
          if (SZ[c]) {
            int64_t BK[6], BF[6], BS[6];
            extend6(e, KB[c], KF[c], SZ[c], true, BK, BF, BS);
            if (BS[0]) {
              uint64_t info =
                  (p.info & 0xFFFFFFF0FFFFFFFFULL) | ((uint64_t)c << 32);
              curr.push_back({KB[c], KF[c], SZ[c], info});
            }
          }
        }
      }
      if (!curr.empty()) {
        int c = (int)(curr[0].info >> 32 & 0xf);
        s.push_back((uint8_t)comp6(c));
        std::stable_sort(curr.begin(), curr.end(),
                         [](const Intv& a, const Intv& b) {
                           return a.info < b.info;
                         });
        uint64_t last = curr[0].info >> 32;
        cat.assign(curr.size(), 0);
        curr[0].info &= 0xffffffffULL;
        int cat0 = 0;
        for (size_t j = 1; j < curr.size(); ++j) {
          if (curr[j].info >> 32 != last) {
            last = curr[j].info >> 32;
            cat0 = (int)j;
          }
          cat[j] = cat0;
          curr[j].info = (curr[j].info & 0xffffffffULL) | ((uint64_t)cat0 << 36);
        }
        if (cat0 != 0) is_forked = true;
      }
      prev = curr;
    }
    if (nei.empty()) return -1;
    int rbeg = ori_l - (int)(uint32_t)nei[0].info;
    if (nei.size() == 1 && is_forked) {
      // contained-read artifact fixup (unitig.c:158-176)
      Intv ok0{e.cnt[0], e.cnt[0], e.cnt[1] - e.cnt[0], 0};
      // fm6_set_intv(e, 0): x[0]=cnt[0]=0, x[1]=cnt[comp(0)=0]=0, sz=cnt[1]-cnt[0]
      ok0 = {e.cnt[0], e.cnt[comp6(0)], e.cnt[1] - e.cnt[0], 0};
      for (int i = rbeg; i < ori_l; ++i) {
        int64_t KB[6], KF[6], SZ[6];
        extend6(e, ok0.kb, ok0.kf, ok0.sz, false, KB, KF, SZ);
        int c = comp6(s[i]);
        ok0 = {KB[c], KF[c], SZ[c], 0};
      }
      size_t i = ori_l;
      while (i < s.size()) {
        int64_t KB[6], KF[6], SZ[6];
        extend6(e, ok0.kb, ok0.kf, ok0.sz, false, KB, KF, SZ);
        int c0 = -1, nhit = 0;
        for (int c = 1; c < 5; ++c) {
          if (SZ[c] && KB[c] <= nei[0].kb &&
              KB[c] + SZ[c] >= nei[0].kb + nei[0].sz) {
            ++nhit;
            c0 = c;
          }
        }
        if (nhit == 0 && SZ[0]) break;
        assert(nhit == 1);
        s[i] = (uint8_t)comp6(c0);
        ok0 = {KB[c0], KF[c0], SZ[c0], 0};
        ++i;
      }
      s.resize(i);
    }
    if (nei.size() > 1) s.resize(ori_l);
    return rbeg;
  }

  // check_left_simple (unitig.c:186-204)
  int check_left_simple(int beg, int rbeg, const std::vector<uint8_t>& s) {
    std::vector<Intv> prev, curr;
    overlap_intv(s, rbeg, true, true, prev);
    for (int i = rbeg - 1; i >= beg; --i) {
      if (prev.empty()) break;
      curr.clear();
      for (auto& p : prev) {
        int64_t KB[6], KF[6], SZ[6];
        extend6(e, p.kb, p.kf, p.sz, true, KB, KF, SZ);
        if (SZ[0]) set_bits(KB[0], KF[0], SZ[0]);
        if (SZ[0] + SZ[s[i]] != p.sz) return -1;
        curr.push_back({KB[s[i]], KF[s[i]], SZ[s[i]], p.info});
      }
      prev = curr;
    }
    return 0;
  }

  int check_left(int beg, int rbeg, const std::vector<uint8_t>& s,
                 const std::vector<Intv>& nei) {
    assert(nei.size() == 1);
    if (check_left_simple(beg, rbeg, s) == 0) return 0;
    std::vector<uint8_t> rc;
    for (int i = (int)s.size() - 1; i >= rbeg; --i)
      rc.push_back((uint8_t)comp6(s[i]));
    std::vector<Intv> nei2, prev;
    get_nei(0, rc, nei2, prev);
    assert(nei2.size() >= 1);
    return nei2.size() > 1 ? -1 : 0;
  }

  // unitig_unidir (unitig.c:227-262)
  int unidir(std::vector<uint8_t>& s, std::vector<uint8_t>& cov, int beg0,
             int64_t k0, int64_t* end, bool* is_loop, std::vector<Intv>& nei,
             std::vector<Intv> prev) {
    int beg = beg0, ori_l = (int)s.size(), n_reads = 0;
    *is_loop = false;
    nei.clear();
    while (true) {
      int rbeg = get_nei(beg, s, nei, prev);
      prev.clear();
      if (rbeg < 0) break;
      if (nei.size() > 1) {
        bend[*end] = 1;
        break;
      }
      int64_t k = nei[0].kb;
      if (k == *end) break;
      if (bend[k] || check_left(beg, rbeg, s, nei) < 0) {
        bend[k] = 1;
        break;
      }
      if (k == k0) {
        *is_loop = true;
        break;
      }
      if (nei[0].kf == *end) {
        nei.clear();
        break;
      }
      *end = nei[0].kf;
      set_bits(nei[0].kb, nei[0].kf, nei[0].sz);
      ++n_reads;
      while (cov.size() < s.size()) cov.push_back('"');
      cov.resize(s.size());
      for (int i = rbeg; i < ori_l; ++i)
        if (cov[i] != '~') ++cov[i];
      for (size_t i = ori_l; i < s.size(); ++i) cov[i] = '"';
      beg = rbeg;
      ori_l = (int)s.size();
    }
    s.resize(ori_l);
    cov.resize(ori_l);
    return n_reads;
  }

  void retrieve(int64_t x, std::vector<uint8_t>* s, int64_t* final_k) {
    int64_t k = x;
    s->clear();
    while (true) {
      int64_t r[6];
      e.rank6(k, r);
      int c = e.sym_at(k);
      k = e.cnt[c] + r[c];
      if (c == 0) break;
      s->push_back((uint8_t)c);
    }
    std::reverse(s->begin(), s->end());
    *final_k = k;
  }

  // unitig1 (unitig.c:274-317); returns false on skip
  bool unitig1(int64_t seed, std::vector<uint8_t>& s, std::vector<uint8_t>& cov,
               int64_t k_out[2], std::vector<Intv> nei_out[2], int* nsr) {
    if (sorted && used[seed]) return false;
    int64_t k;
    retrieve(seed, &s, &k);
    int seed_len = (int)s.size();
    if ((int)s.size() <= min_match) return false;
    if (!sorted && used[k]) return false;
    Intv intv0;
    std::vector<Intv> ovlp;
    int ret = is_contained(s, &intv0, ovlp);
    set_bits(intv0.kb, intv0.kf, intv0.sz);
    if (ret < 0) return false;
    *nsr = 1;
    cov.assign(s.size(), '"');
    k_out[0] = intv0.kf;
    k_out[1] = intv0.kb;
    nei_out[0].clear();
    nei_out[1].clear();
    std::vector<Intv> nei;
    if (!ovlp.empty()) {
      bool is_loop;
      int nr = unidir(s, cov, 0, intv0.kb, &k_out[0], &is_loop, nei, ovlp);
      *nsr += nr;
      nei_out[0] = nei;
      if (is_loop) {
        nei_out[1].clear();
        nei_out[1].push_back({k_out[0], 0, 0, nei[0].info});
        return true;
      }
    }
    // reverse complement for the other direction
    std::reverse(s.begin(), s.end());
    for (auto& c : s) c = (uint8_t)comp6(c);
    std::reverse(cov.begin(), cov.end());
    bool is_loop;
    int nr = unidir(s, cov, (int)s.size() - seed_len, intv0.kf, &k_out[1],
                    &is_loop, nei, {});
    *nsr += nr;
    nei_out[1] = nei;
    return true;
  }

  void write_mag(const std::vector<uint8_t>& s, const std::vector<uint8_t>& cov,
                 const int64_t k_out[2], const std::vector<Intv> nei_out[2],
                 int nsr) {
    if (s.empty()) return;
    char buf[64];
    out += "@";
    snprintf(buf, sizeof(buf), "%lld:%lld\t%d", (long long)k_out[0],
             (long long)k_out[1], nsr);
    out += buf;
    for (int j = 0; j < 2; ++j) {
      out += "\t";
      if (nei_out[j].empty()) {
        out += ".";
      } else {
        for (auto& p : nei_out[j]) {
          snprintf(buf, sizeof(buf), "%lld,%d;", (long long)p.kb,
                   (int)(int32_t)(p.info & 0xffffffffULL));
          out += buf;
        }
      }
    }
    out += "\n";
    static const char* b6 = "?ACGT?";
    for (auto c : s) out += b6[c];
    out += "\n+\n";
    for (auto c : cov) out += (char)c;
    out += "\n";
  }

  void run() {
    int64_t n1 = e.n_seqs;
    std::vector<uint8_t> s, cov;
    for (int64_t j = 0; j <= (n1 >> 2); ++j) {
      for (int64_t i = (j << 2) | 1; i < (j << 2) + 4 && i < n1; i += 2) {
        int64_t k_out[2];
        std::vector<Intv> nei_out[2];
        int nsr = 0;
        if (!unitig1(i, s, cov, k_out, nei_out, &nsr)) continue;
        if (visited[k_out[0]] || visited[k_out[1]]) continue;
        visited[k_out[0]] = visited[k_out[1]] = 1;
        write_mag(s, cov, k_out, nei_out, nsr);
      }
    }
  }
};

}  // namespace

extern "C" {

// Runs unitig construction; returns malloc'd MAG text (caller frees with
// frld_free) and its length via out_len.
char* funitig_run(const uint8_t* blocks, const int64_t* occ, int64_t n_rows,
                  const int64_t* cnt, int64_t n_seqs, int min_match,
                  const uint64_t* sorted, int64_t* out_len) {
  Index idx;
  idx.setup(blocks, occ, n_rows, cnt, n_seqs);
  Builder b(idx, min_match, sorted);
  b.run();
  *out_len = (int64_t)b.out.size();
  char* p = (char*)malloc(b.out.size() + 1);
  memcpy(p, b.out.data(), b.out.size());
  p[b.out.size()] = 0;
  return p;
}

}  // extern "C"
