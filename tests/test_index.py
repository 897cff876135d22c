"""Device index rank/extend/LF correctness vs brute-force + reference unpack."""

import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from fermi_tpu.core import dna
from fermi_tpu.construct import suffix
from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.search import extend as se

from util import random_reads, build_my_fmd, revcomp_str


@pytest.fixture(scope="module")
def small_index():
    reads = random_reads(80, seed=11, with_genome=True, genome_len=3000)
    text = suffix.build_text([dna.encode(s) for s in reads])
    bwt = suffix.multistring_bwt(text)
    return reads, bwt, FMDIndex.from_bwt(bwt)


def test_rank_vs_bruteforce(small_index):
    _, bwt, idx = small_index
    n = bwt.size
    rng = np.random.default_rng(0)
    ks = np.unique(np.concatenate([
        rng.integers(0, n + 1, 500), [0, 1, n - 1, n]]))
    got = np.asarray(idx.rank6(jnp.asarray(ks)))
    # brute force with cumsum
    onehot = np.zeros((n + 1, 6), np.int64)
    for c in range(6):
        onehot[1:, c] = np.cumsum(bwt == c)
    assert np.array_equal(got, onehot[ks])


def test_sym_and_lf(small_index):
    _, bwt, idx = small_index
    ks = np.arange(0, bwt.size, 7)
    syms = np.asarray(idx.sym_at(jnp.asarray(ks)))
    assert np.array_equal(syms, bwt[ks])


def test_chkbwt_style_self_check(small_index):
    """Port of `fermi chkbwt -r`: decode+count vs rank at every position."""
    _, bwt, idx = small_index
    n = bwt.size
    ks = np.arange(n)
    r = np.asarray(idx.rank6(jnp.asarray(ks + 1)))  # counts over [0..k]
    expect = np.zeros((n, 6), np.int64)
    for c in range(6):
        expect[:, c] = np.cumsum(bwt == c)
    assert np.array_equal(r, expect)
    assert np.array_equal(np.asarray(idx.mcnt)[1:7], expect[-1])


def test_retrieve_matches_reference_unpack(small_index, tmp_path, ref_fermi):
    reads, bwt, idx = small_index
    p = str(tmp_path / "i.fmd")
    build_my_fmd(reads, p)
    out = subprocess.run([ref_fermi, "unpack", p], capture_output=True,
                         check=True).stdout.decode()
    ref_seqs = [line.split("\t")[0] for line in out.strip().split("\n")]
    n_seqs = int(np.asarray(idx.n_seqs))
    seqs, _ = se.retrieve_strings(idx, np.arange(n_seqs), max_len=256)
    mine = [dna.decode(s) for s in seqs]
    assert mine == ref_seqs


def test_backward_search_finds_reads(small_index):
    reads, _, idx = small_index
    maxlen = max(len(s) for s in reads)
    B = len(reads)
    q = np.zeros((B, maxlen), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(reads):
        e = dna.encode(s)
        q[i, :len(e)] = e
        lens[i] = len(e)
    k, l, cnt = se.backward_search(idx, jnp.asarray(q), jnp.asarray(lens), maxlen)
    cnt = np.asarray(cnt)
    assert np.all(cnt >= 1)  # every read occurs in the index
    # a garbage query matching nothing
    junk = np.tile(np.array([1, 2, 3, 4], np.uint8), 12)[None, :]
    k, l, c0 = se.backward_search(
        idx, jnp.asarray(np.pad(junk, ((0, 0), (0, maxlen - junk.shape[1])))),
        jnp.asarray(np.array([junk.shape[1]], np.int32)), maxlen)
    # (may or may not match; just ensure no crash and consistent count)
    assert np.asarray(c0).shape == (1,)


def test_extend_against_bruteforce(small_index):
    """fm6_extend parity: extending interval of string w by symbol a gives
    interval of aw (backward) with correct sizes, and forward/backward starts
    consistent with the complement identity."""
    reads, bwt, idx = small_index
    # build bi-interval of single symbols then extend and compare sizes with
    # counts from a suffix scan of the text
    text = suffix.build_text([dna.encode(s) for s in reads])
    n = text.size

    def count_occ(pat):
        # occurrences of pat in text (as substring not crossing sentinels)
        s = "".join(map(str, text))
        p = "".join(map(str, pat))
        cnt = start = 0
        while True:
            i = s.find(p, start)
            if i < 0:
                return cnt
            cnt += 1
            start = i + 1

    for c in [1, 2, 3, 4]:
        kb, kf, sz = idx.set_intv(jnp.asarray([c], np.int64))
        KB, KF, SZ = idx.extend6(kb, kf, sz, is_back=True)
        for a in [1, 2, 3, 4]:
            assert int(SZ[0, a]) == count_occ([a, c]), (a, c)
