"""RLD codec + BWT construction parity with the reference binary."""

import subprocess

import numpy as np
import pytest

from fermi_tpu import rld
from fermi_tpu.core import dna
from fermi_tpu.construct import suffix

from util import random_reads, write_fasta, build_my_fmd


def test_runs_roundtrip_dense():
    rng = np.random.default_rng(0)
    bwt = rng.integers(0, 6, 10000).astype(np.uint8)
    runs = rld.Runs.from_bwt(bwt)
    assert np.array_equal(runs.expand(), bwt)
    assert runs.total == 10000
    # maximal runs: no two adjacent equal symbols
    assert np.all(runs.symbols[1:] != runs.symbols[:-1])


@pytest.mark.parametrize("seed,n", [(0, 50), (1, 300)])
def test_fmd_file_roundtrip(tmp_path, seed, n):
    reads = random_reads(n, seed=seed)
    p = str(tmp_path / "a.fmd")
    runs = build_my_fmd(reads, p)
    back = rld.read_fmd(p)
    assert np.array_equal(back.expand(), runs.expand())
    assert np.array_equal(back.mcnt, runs.mcnt)
    # re-encode identical
    p2 = str(tmp_path / "b.fmd")
    rld.write_fmd(back, p2)
    assert open(p, "rb").read() == open(p2, "rb").read()


def test_build_parity_random(tmp_path, ref_fermi):
    reads = random_reads(200, seed=42)
    fa = str(tmp_path / "reads.fa")
    write_fasta(fa, reads)
    ref_out = str(tmp_path / "ref.fmd")
    subprocess.run([ref_fermi, "build", "-fo", ref_out, fa], check=True,
                   capture_output=True)
    my_out = str(tmp_path / "my.fmd")
    build_my_fmd(reads, my_out)
    assert open(ref_out, "rb").read() == open(my_out, "rb").read()


def test_build_parity_adversarial(tmp_path, ref_fermi):
    """Long homopolymers, duplicates (32-bit headers), rc-palindromes."""
    rng = np.random.default_rng(7)
    reads = []
    for i in range(300):
        kind = i % 4
        if kind == 0:
            reads.append("A" * int(rng.integers(50, 200)))
        elif kind == 1:
            reads.append("ACGT" * 20)
        elif kind == 2:
            reads.append("".join("ACGT"[c] for c in rng.integers(0, 4, 80)))
        else:
            reads.append("GGGGCCCC" * 12)
    reads += ["ACGTACGTACGTACGTAAAATTTTCCCCGGGG"] * 500
    reads += ["AT", "CG", "AACGTT"]  # rc-palindromes exercising the odd-trim
    fa = str(tmp_path / "reads.fa")
    write_fasta(fa, reads)
    ref_out = str(tmp_path / "ref.fmd")
    subprocess.run([ref_fermi, "build", "-fo", ref_out, fa], check=True,
                   capture_output=True)
    my_out = str(tmp_path / "my.fmd")
    build_my_fmd(reads, my_out)
    assert open(ref_out, "rb").read() == open(my_out, "rb").read()


def test_ref_chkbwt_accepts_our_file(tmp_path, ref_fermi):
    """The reference's own index self-check validates our .fmd (rank vs decode)."""
    reads = random_reads(100, seed=3, with_genome=True)
    my_out = str(tmp_path / "my.fmd")
    build_my_fmd(reads, my_out)
    res = subprocess.run([ref_fermi, "chkbwt", "-r", my_out],
                         capture_output=True)
    assert res.returncode == 0, res.stderr.decode()
    assert b"rank(" not in res.stderr  # no rank mismatch lines


def test_palindrome_trim_semantics():
    # even-length self-revcomp read is trimmed by 1 (reference cmd.c:458-462)
    s = dna.encode("AACGTT")
    text = suffix.build_text([s])
    # trimmed: fwd=AACGT(5) + 0 + rc=ACGTT(5) + 0 = 12
    assert text.size == 12
    text2 = suffix.build_text([s], trim_palindrome=False)
    assert text2.size == 14


def test_bcr_spill_parity(monkeypatch, tmp_path):
    """FERMI_BCR_SPILL: the file-backed transpose (the reference's ld_dump
    out-of-core mode, bcr.c:166-193 / ropebwt -f) produces identical runs."""
    import numpy as np

    from fermi_tpu.construct import suffix
    from fermi_tpu.construct.bcr import bcr_runs_native

    rng = np.random.default_rng(3)
    reads = [rng.integers(1, 5, 100).astype(np.uint8) for _ in range(5000)]
    text = suffix.build_text(reads, trim_palindrome=False)
    a = bcr_runs_native(text, n_threads=4)
    monkeypatch.setenv("FERMI_BCR_SPILL", str(tmp_path))
    monkeypatch.setenv("FERMI_BCR_SPILL_MIN", "1")
    b = bcr_runs_native(text, n_threads=4)
    assert np.array_equal(a.lengths, b.lengths)
    assert np.array_equal(a.symbols, b.symbols)
