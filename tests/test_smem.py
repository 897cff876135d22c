"""SMEM search parity: our batched kernel vs reference `fermi exact`."""

import subprocess

import numpy as np
import pytest

from fermi_tpu.core import dna
from fermi_tpu.construct import suffix
from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.search import smem as sm

from util import random_reads, write_fasta, build_my_fmd


def _ref_exact(ref_fermi, fmd, fa, self_match=False):
    cmd = [ref_fermi, "exact"] + (["-s"] if self_match else []) + [fmd, fa]
    return subprocess.run(cmd, capture_output=True, check=True).stdout.decode()


def _my_exact(idx, reads, names, self_match=False):
    seqs = [dna.encode(s) for s in reads]
    matches = sm.smem_all(idx, seqs, self_match=self_match)
    out = []
    for name, s, mems in zip(names, seqs, matches):
        out.append(f"SQ\t{name}\t{len(s)}\t{len(mems)}")
        for m in mems:
            out.append("EM\t" + sm.format_smem(idx, m))
        out.append("//")
    return "\n".join(out) + "\n"


@pytest.mark.parametrize("self_match", [False, True])
def test_exact_parity_genome_reads(tmp_path, ref_fermi, self_match):
    # index from genome-sampled reads; query with other reads from the same
    # genome so there are real multi-read SMEMs
    idx_reads = random_reads(150, seed=5, with_genome=True, genome_len=4000)
    qry_reads = random_reads(60, seed=6, with_genome=True, genome_len=4000)
    # make some queries contain mismatches (split SMEMs)
    rng = np.random.default_rng(9)
    qry = []
    for s in qry_reads:
        b = list(s)
        for _ in range(rng.integers(0, 3)):
            b[rng.integers(0, len(b))] = "ACGT"[rng.integers(0, 4)]
        qry.append("".join(b))

    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(idx_reads, fmd)
    fa = str(tmp_path / "q.fa")
    write_fasta(fa, qry)
    ref_out = _ref_exact(ref_fermi, fmd, fa, self_match)

    idx = FMDIndex.restore(fmd)
    names = [f"r{i}" for i in range(len(qry))]
    my_out = _my_exact(idx, qry, names, self_match)
    assert my_out == ref_out


def test_exact_parity_self(tmp_path, ref_fermi):
    # query the index with its own reads (the unitig/seqsort workload shape)
    reads = random_reads(100, seed=12, with_genome=True, genome_len=2500)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    fa = str(tmp_path / "q.fa")
    write_fasta(fa, reads[:40])
    ref_out = _ref_exact(ref_fermi, fmd, fa, self_match=True)
    idx = FMDIndex.restore(fmd)
    my_out = _my_exact(idx, reads[:40], [f"r{i}" for i in range(40)],
                       self_match=True)
    assert my_out == ref_out


def test_exact_parity_random_queries(tmp_path, ref_fermi):
    # queries unrelated to the index: mostly short/no matches
    idx_reads = random_reads(100, seed=1)
    qry = random_reads(50, seed=2, min_len=10, max_len=40)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(idx_reads, fmd)
    fa = str(tmp_path / "q.fa")
    write_fasta(fa, qry)
    ref_out = _ref_exact(ref_fermi, fmd, fa)
    idx = FMDIndex.restore(fmd)
    my_out = _my_exact(idx, qry, [f"r{i}" for i in range(len(qry))])
    assert my_out == ref_out


def test_native_engine_matches_device_kernel(tmp_path, ref_fermi):
    """The sequential native engine and the batched device kernel agree."""
    from fermi_tpu.search.smem import smem_all, smem_all_native

    idx_reads = random_reads(150, seed=5, with_genome=True, genome_len=4000)
    qry = random_reads(40, seed=8, with_genome=True, genome_len=4000)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(idx_reads, fmd)
    idx = FMDIndex.restore(fmd)
    seqs = [dna.encode(s) for s in qry]
    for self_match in (False, True):
        dev = smem_all(idx, seqs, self_match=self_match)
        nat = smem_all_native(idx, seqs, self_match=self_match)
        assert dev == nat, self_match


def test_split_driver_matches_unified(tmp_path, monkeypatch):
    """Phase-split pool driver (fwd pass + per-segment bwd pass) must equal
    the unified kernel exactly, including reads with many restart segments
    (random queries against a genome index restart every few bases, blowing
    the per-read segment budget and riding the redo ladder)."""
    from fermi_tpu.search.smem import smem_all

    idx_reads = random_reads(150, seed=6, with_genome=True, genome_len=4000)
    qry = (random_reads(25, seed=12, with_genome=True, genome_len=4000)
           + random_reads(25, seed=13))     # genome + pure-random queries
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(idx_reads, fmd)
    idx = FMDIndex.restore(fmd)
    seqs = [dna.encode(s) for s in qry]
    monkeypatch.setenv("FERMI_TPU_SMEM_SPLIT", "0")
    want = smem_all(idx, seqs)
    monkeypatch.setenv("FERMI_TPU_SMEM_SPLIT", "1")
    got = smem_all(idx, seqs)
    assert got == want
    # self-match mode through the split path too
    monkeypatch.setenv("FERMI_TPU_SMEM_SPLIT", "0")
    want_sm = smem_all(idx, [dna.encode(s) for s in idx_reads[:20]],
                       self_match=True)
    monkeypatch.setenv("FERMI_TPU_SMEM_SPLIT", "1")
    got_sm = smem_all(idx, [dna.encode(s) for s in idx_reads[:20]],
                      self_match=True)
    assert got_sm == want_sm


def test_redo_tiers_forced_by_tiny_buffers(tmp_path):
    """Tiny maxi/maxm force every lane through the overflow-redo ladder
    (first tier -> 2x tier -> guaranteed-size); results must equal the
    default-buffer run exactly."""
    from fermi_tpu.search.smem import smem_all

    idx_reads = random_reads(150, seed=5, with_genome=True, genome_len=4000)
    qry = random_reads(30, seed=11, with_genome=True, genome_len=4000)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(idx_reads, fmd)
    idx = FMDIndex.restore(fmd)
    seqs = [dna.encode(s) for s in qry]
    want = smem_all(idx, seqs)
    got = smem_all(idx, seqs, maxi=4, maxm=8)
    assert got == want


def test_high_coverage_adaptive_maxi(tmp_path, ref_fermi):
    """25x-coverage index: the default-width pool overflows heavily, the
    redo ladder still produces exact results (parity vs `fermi exact -s`),
    and the coverage adaptation learns a wider per-segment interval width
    so a second call starts above the 3x default."""
    rng = np.random.default_rng(9)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, 9000))
    reads = []
    for _ in range(2500):   # 2500 * 90 / 9000 = 25x
        pos = int(rng.integers(0, len(genome) - 90))
        reads.append(genome[pos:pos + 90])
    fmd = str(tmp_path / "cov25.fmd")
    build_my_fmd(reads, fmd)
    idx = FMDIndex.restore(fmd)
    qreads = reads[:300]
    fa = str(tmp_path / "q.fa")
    write_fasta(fa, qreads)
    names = [f"r{i}" for i in range(len(qreads))]
    ref = _ref_exact(ref_fermi, fmd, fa, self_match=True)
    assert _my_exact(idx, qreads, names, self_match=True) == ref
    # dense index at 25x must have tripped the adaptation
    learned = getattr(idx, "_smem_maxi", 32)
    assert learned > 32, f"adaptation did not engage (learned={learned})"
    # second call starts at the learned width and stays exact
    assert _my_exact(idx, qreads, names, self_match=True) == ref


def test_dump_stall_parity(tmp_path, ref_fermi):
    """Very short queries make nearly every lane finish a segment every
    iteration, overflowing pass A's KD-slot compacted-dump staging and
    exercising the stall-retry path (smem.py _smem_fwd_impl)."""
    idx_reads = random_reads(150, seed=41, with_genome=True, genome_len=3000)
    rng = np.random.default_rng(42)
    qry = []
    for i in range(300):
        src = idx_reads[rng.integers(0, len(idx_reads))]
        L = int(rng.integers(2, 6))
        p = int(rng.integers(0, len(src) - L))
        qry.append(src[p:p + L])
    fmd = str(tmp_path / "st.fmd")
    build_my_fmd(idx_reads, fmd)
    fa = str(tmp_path / "st.fa")
    write_fasta(fa, qry)
    idx = FMDIndex.restore(fmd)
    my_out = _my_exact(idx, qry, [f"r{i}" for i in range(len(qry))])
    ref_out = _ref_exact(ref_fermi, fmd, fa)
    assert my_out == ref_out
