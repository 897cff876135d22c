"""Stable embedding API (fermi_tpu.api) vs the reference high-level API.

The reference exposes fm6_api_readseq/writeseq/seqlen/correct/unitig
(fermi.h:119-123) and exercises them through `fermi example` (example.c).
These tests drive fermi_tpu.api through the same flows and compare against
the reference binary's output.
"""

import io
import subprocess

import pytest

from fermi_tpu import api

from util import random_reads, write_fastq


@pytest.fixture(scope="module")
def readset(tmp_path_factory):
    reads = random_reads(200, seed=91, with_genome=True, genome_len=2500,
                         min_len=60, max_len=90)
    fq = str(tmp_path_factory.mktemp("api") / "in.fq")
    write_fastq(fq, reads)
    return fq, reads


def test_read_write_seqlen(readset):
    fq, reads = readset
    seqs, quals = api.read_seqs(fq)
    assert seqs == [r.upper() for r in reads]
    assert all(len(q) == len(s) for q, s in zip(quals, seqs))
    # fm6_api_seqlen picks the floor(n*q)-th smallest length
    q25 = api.seq_len_quantile(seqs, 0.25)
    assert q25 == sorted(len(s) for s in seqs)[int(len(seqs) * 0.25)]
    buf = io.StringIO()
    api.write_seqs(seqs, quals, buf)
    # @name is the cumulative NUL-terminated offset, as in fm6_api_writeseq
    first = buf.getvalue().splitlines()[0]
    assert first == f"@{len(seqs[0])}"


def test_unitig_clean_matches_reference_example(readset, ref_fermi):
    fq, _ = readset
    seqs, _ = api.read_seqs(fq)
    # fermi example == api.unitig (+ clean with -c): example.c:29-43
    g = api.unitig(seqs)
    buf = io.StringIO()
    api.write_mag(g, buf)
    ref = subprocess.run([ref_fermi, "example", fq], check=True,
                         capture_output=True).stdout.decode()
    assert buf.getvalue() == ref

    g = api.clean(api.unitig(seqs), aggressive=True)
    buf = io.StringIO()
    api.write_mag(g, buf)
    ref = subprocess.run([ref_fermi, "example", "-c", fq], check=True,
                         capture_output=True).stdout.decode()
    assert buf.getvalue() == ref


def test_correct_roundtrip():
    # high-coverage set so the solid-kmer table is unambiguous
    reads = random_reads(300, seed=17, with_genome=True, genome_len=800,
                         min_len=70, max_len=90)
    seqs = [r.upper() for r in reads]
    quals = ["I" * len(s) for s in seqs]
    # introduce one mid-read error; correction must repair it and must
    # not corrupt lengths
    broken = list(seqs)
    s0 = broken[0]
    base = "A" if s0[40] != "A" else "C"
    broken[0] = s0[:40] + base + s0[41:]
    fixed, fq2 = api.correct(broken, quals)
    assert [len(s) for s in fixed] == [len(s) for s in broken]
    assert fixed[0].upper() == s0.upper()
    assert all(len(a) == len(b) for a, b in zip(fq2, quals))


def test_index_roundtrip_and_smem(readset, tmp_path):
    fq, _ = readset
    seqs, _ = api.read_seqs(fq)
    path = str(tmp_path / "api.fmd")
    api.save_index(seqs, path)
    idx = api.load_index(path)
    assert int(idx.n_seqs) == 2 * len(seqs)
    built = api.build_index(seqs)
    assert int(built.total) == int(idx.total)
    # a full read must produce one full-length SMEM
    hits = api.smem(idx, seqs[0])
    assert any(b == 0 and e == len(seqs[0]) for b, e, *_ in hits)
