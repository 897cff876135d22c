"""Out-of-core mmap index (index/mmapfmd.py vs reference rld_restore_mmap +
rld_rank1a semantics, rld.c:327-446): compressed-domain rank/extend/search
must equal the dense in-memory index, and RSS must stay bounded because the
index is never expanded."""

import ctypes
import os

import numpy as np
import pytest

from fermi_tpu import rld
from fermi_tpu.construct import suffix
from fermi_tpu.core import dna
from fermi_tpu.index.mmapfmd import MmapIndex

from util import random_reads


def _mk_index(tmp_path, reads, name="m.fmd"):
    seqs = [dna.encode(s) for s in reads]
    bwt = suffix.multistring_bwt(suffix.build_text(seqs))
    path = str(tmp_path / name)
    rld.write_fmd(rld.Runs.from_bwt(bwt), path)
    return path, bwt


def _dense_rank6(bwt, ks):
    onehot = np.zeros((bwt.size + 1, 6), np.int64)
    onehot[1:] = np.eye(6, dtype=np.int64)[bwt]
    occ = np.cumsum(onehot, axis=0)
    return occ[ks]


def test_rank6_matches_dense(tmp_path):
    reads = random_reads(200, seed=3, with_genome=True, genome_len=3000)
    path, bwt = _mk_index(tmp_path, reads)
    m = MmapIndex(path)
    assert m.total == bwt.size
    rng = np.random.default_rng(0)
    ks = np.concatenate([[0, 1, bwt.size - 1, bwt.size],
                         rng.integers(0, bwt.size + 1, 500)])
    got = m.rank6(ks)
    assert np.array_equal(got, _dense_rank6(bwt, ks))
    m.close()


def test_rank6_32bit_headers(tmp_path):
    # runs long enough that block symbol counts exceed 0x8000 force the
    # 32-bit header variant (rld.c:121-124 analogue)
    runs_len = [50000, 1, 70000, 2, 100000, 1, 40000]
    runs_sym = [1, 0, 2, 3, 4, 0, 1]
    bwt = np.repeat(np.array(runs_sym, np.uint8),
                    np.array(runs_len, np.int64))
    path = str(tmp_path / "long.fmd")
    rld.write_fmd(rld.Runs.from_bwt(bwt), path)
    m = MmapIndex(path)
    rng = np.random.default_rng(1)
    ks = np.concatenate([[0, bwt.size], rng.integers(0, bwt.size + 1, 300)])
    assert np.array_equal(m.rank6(ks), _dense_rank6(bwt, ks))
    m.close()


def test_extend_and_search_match_fmdindex(tmp_path):
    from fermi_tpu.index.fmd import FMDIndex

    reads = random_reads(120, seed=9, with_genome=True, genome_len=2000)
    path, bwt = _mk_index(tmp_path, reads)
    m = MmapIndex(path)
    idx = FMDIndex.from_bwt(bwt)
    assert np.array_equal(np.asarray(m.cnt), np.asarray(idx.cnt)[:7])
    rng = np.random.default_rng(2)
    kb = rng.integers(0, bwt.size // 2, 64)
    sz = rng.integers(0, bwt.size // 2, 64)
    kf = rng.integers(0, bwt.size // 2, 64)
    for is_back in (True, False):
        KB, KF, SZ = m.extend6(kb, kf, sz, is_back)
        KB2, KF2, SZ2 = (np.asarray(a) for a in
                         idx.extend6(kb, kf, sz, is_back))
        assert np.array_equal(KB, KB2)
        assert np.array_equal(KF, KF2)
        assert np.array_equal(SZ, SZ2)
    # backward search finds every read
    pats = [dna.encode(s) for s in reads[:20]]
    for p, (lo, s) in zip(pats, m.backward_search(pats)):
        assert s >= 1
    # retrieve round-trips sentinel ranks (fwd reads sit at even ranks'
    # positions in *sequence* order; just check all recovered strings are
    # among the input strands)
    strands = {dna.decode(dna.encode(s)) for s in reads}
    strands |= {dna.decode(dna.revcomp(dna.encode(s))) for s in reads}
    got = m.retrieve(np.arange(min(10, m.n_seqs)))
    for g in got:
        assert dna.decode(g) in strands
    m.close()


def _rss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])
    return 0


@pytest.mark.slow
def test_bounded_rss(tmp_path):
    """Stream-encode a ~40M-symbol index (never holding it in RAM), then
    query it mmapped: RSS growth must stay far below the expanded size."""
    from fermi_tpu import native

    lib = native.get_lib()
    h = lib.frld_enc_open(6, 3)
    rng = np.random.default_rng(7)
    total = 0
    target = 40_000_000
    while total < target:
        n = 1 << 18
        lens = rng.geometric(0.25, n).astype(np.int64)
        syms = rng.integers(0, 6, n).astype(np.uint8)
        # avoid accidental adjacent merges mattering: encoder merges itself
        lib.frld_enc_put(
            h, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            syms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
        total += int(lens.sum())
    path = str(tmp_path / "big.fmd")
    assert lib.frld_enc_finish(h, path.encode()) == 0
    size_mb = os.path.getsize(path) / 1e6
    before = _rss_kb()
    m = MmapIndex(path)
    rng2 = np.random.default_rng(8)
    ks = rng2.integers(0, m.total, 20000).astype(np.int64)
    out = m.rank6(ks)
    after = _rss_kb()
    # sanity on the counts at the far end
    assert np.array_equal(m.rank6(np.array([m.total]))[0],
                          np.asarray(m.mcnt[1:7]))
    grow_mb = (after - before) / 1024
    # expanded dense layout would be ~1.6 B/symbol = ~64 MB + occ; the
    # mmap path must touch only sampled pages (frames + hit blocks)
    assert grow_mb < size_mb + 16, (grow_mb, size_mb)
    assert out.shape == (20000, 6)
    m.close()
