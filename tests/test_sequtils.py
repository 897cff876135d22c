"""splitfa/fltuniq/trimseq/pe2cofq/cg2cofq/cnt2qual/example parity."""

import gzip
import io
import subprocess
import sys

import numpy as np
import pytest

from fermi_tpu.cli import sequtils as su

from util import random_reads, write_fastq


def _noisy_fastq(tmp_path, seed=81, n=200, paired_names=False):
    rng = np.random.default_rng(seed)
    reads = random_reads(n, seed=seed, with_genome=True, genome_len=3000)
    quals = ["".join(chr(33 + int(rng.integers(2, 41))) for _ in r)
             for r in reads]
    fq = str(tmp_path / "in.fq")
    with open(fq, "w") as f:
        for i, (s, q) in enumerate(zip(reads, quals)):
            name = f"p{i//2}" if paired_names else f"r{i}"
            f.write(f"@{name}\n{s}\n+\n{q}\n")
    return fq


def test_splitfa_parity(tmp_path, ref_fermi):
    fq = _noisy_fastq(tmp_path)
    subprocess.run([ref_fermi, "splitfa", fq, str(tmp_path / "ref"), "3"],
                   check=True, capture_output=True)
    su.splitfa(fq, str(tmp_path / "my"), 3)
    for i in range(3):
        a = gzip.open(str(tmp_path / f"ref.{i:04d}.fq.gz")).read()
        b = gzip.open(str(tmp_path / f"my.{i:04d}.fq.gz")).read()
        assert a == b, i


def test_fltuniq_parity(tmp_path, ref_fermi):
    # duplicated genome reads (k-mers seen twice) + unique junk reads
    reads = random_reads(150, seed=83, with_genome=True, genome_len=2000)
    junk = random_reads(20, seed=84)
    allr = reads + junk + reads[:5]
    fq = str(tmp_path / "in.fq")
    write_fastq(fq, allr)
    ref = subprocess.run([ref_fermi, "fltuniq", "-k", "15", fq], check=True,
                         capture_output=True).stdout.decode()
    buf = io.StringIO()
    su.fltuniq(fq, buf, k=15, verbose=False)
    assert buf.getvalue() == ref


def test_fltuniq_paired_drop(tmp_path, ref_fermi):
    fq = _noisy_fastq(tmp_path, seed=85, paired_names=True)
    ref = subprocess.run([ref_fermi, "fltuniq", "-k", "15", fq], check=True,
                         capture_output=True).stdout.decode()
    buf = io.StringIO()
    su.fltuniq(fq, buf, k=15, verbose=False)
    assert buf.getvalue() == ref


def test_trimseq_parity(tmp_path, ref_fermi):
    fq = _noisy_fastq(tmp_path, seed=87, paired_names=True)
    for flags in ([], ["-q", "10"], ["-l", "40"], ["-N"]):
        ref = subprocess.run([ref_fermi, "trimseq", *flags, fq], check=True,
                             capture_output=True).stdout.decode()
        buf = io.StringIO()
        kw = dict(min_q=3, min_l=20, drop_ambi=True)
        if flags == ["-q", "10"]:
            kw["min_q"] = 10
        if flags == ["-l", "40"]:
            kw["min_l"] = 40
        if flags == ["-N"]:
            kw["drop_ambi"] = False
        su.trimseq(fq, buf, **kw)
        assert buf.getvalue() == ref, flags


def test_pe2cofq_cnt2qual_parity(tmp_path, ref_fermi):
    r1 = random_reads(30, seed=88)
    r2 = random_reads(30, seed=89)
    f1 = str(tmp_path / "1.fq")
    f2 = str(tmp_path / "2.fq")
    with open(f1, "w") as f:
        for i, s in enumerate(r1):
            f.write(f"@p{i}/1\n{s}\n+\n{'I' * len(s)}\n")
    with open(f2, "w") as f:
        for i, s in enumerate(r2):
            f.write(f"@p{i}/2\n{s}\n+\n{'I' * len(s)}\n")
    ref = subprocess.run([ref_fermi, "pe2cofq", f1, f2], check=True,
                         capture_output=True).stdout.decode()
    buf = io.StringIO()
    su.pe2cofq(f1, f2, buf)
    assert buf.getvalue() == ref

    fq = _noisy_fastq(tmp_path, seed=90)
    ref = subprocess.run([ref_fermi, "cnt2qual", fq, "3"], check=True,
                         capture_output=True).stdout.decode()
    buf = io.StringIO()
    su.cnt2qual(fq, buf, q=3)
    assert buf.getvalue() == ref


def test_example_parity(tmp_path, ref_fermi):
    reads = random_reads(200, seed=91, with_genome=True, genome_len=2500,
                         min_len=60, max_len=90)
    fq = str(tmp_path / "in.fq")
    write_fastq(fq, reads)
    for flags in ([], ["-c"], ["-l", "35"]):
        ref = subprocess.run([ref_fermi, "example", *flags, fq], check=True,
                             capture_output=True).stdout.decode()
        from fermi_tpu.cli.main import main
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        try:
            main(["example", *flags, fq])
        finally:
            sys.stdout = old
        assert buf.getvalue() == ref, flags
