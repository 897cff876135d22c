"""Error-correction parity: collect + fix vs reference `fermi correct`."""

import subprocess

import numpy as np
import pytest

from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.algos import correct as ec

from util import write_fastq, build_my_fmd


def make_noisy_reads(n=400, genome_len=5000, read_len=80, err=0.01, seed=0):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_len)
    reads, quals = [], []
    for _ in range(n):
        pos = int(rng.integers(0, genome_len - read_len))
        r = genome[pos:pos + read_len].copy()
        q = np.full(read_len, 38)
        nerr = rng.binomial(read_len, err)
        for _ in range(nerr):
            p = int(rng.integers(0, read_len))
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
            q[p] = int(rng.integers(5, 25))
        if rng.random() < 0.5:
            r = 3 - r[::-1]
            q = q[::-1]
        reads.append("".join("ACGT"[c] for c in r))
        quals.append("".join(chr(33 + c) for c in q))
    return reads, quals


@pytest.mark.parametrize("k", [17, 21])
def test_correct_parity(tmp_path, ref_fermi, k):
    reads, quals = make_noisy_reads(seed=3)
    fq = str(tmp_path / "reads.fq")
    write_fastq(fq, reads, quals)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)

    ref = subprocess.run([ref_fermi, "correct", "-t", "2", "-k", str(k), fmd, fq],
                         capture_output=True, check=True).stdout.decode()

    idx = FMDIndex.restore(fmd)
    import io
    buf = io.StringIO()
    ec.ec_correct(idx, fq, buf, w=k, n_threads=2, verbose=False)
    assert buf.getvalue() == ref


def test_correct_parity_autok_with_N(tmp_path, ref_fermi):
    reads, quals = make_noisy_reads(n=300, seed=7)
    # inject some N bases
    rng = np.random.default_rng(1)
    reads = [r if rng.random() < 0.8 else
             r[:10] + "N" + r[11:] for r in reads]
    fq = str(tmp_path / "reads.fq")
    write_fastq(fq, reads, quals)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    ref = subprocess.run([ref_fermi, "correct", fmd, fq],
                         capture_output=True, check=True).stdout.decode()
    idx = FMDIndex.restore(fmd)
    import io
    buf = io.StringIO()
    ec.ec_correct(idx, fq, buf, verbose=False)
    assert buf.getvalue() == ref


def test_collect_counts_match_reference_log(tmp_path, ref_fermi):
    """The informative/ambiguous k-mer counts printed by the reference must
    match our collect stats (validates the whole BFS)."""
    reads, quals = make_noisy_reads(n=200, seed=5)
    fq = str(tmp_path / "reads.fq")
    write_fastq(fq, reads, quals)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    res = subprocess.run([ref_fermi, "correct", "-k", "19", fmd, fq],
                         capture_output=True, check=True)
    import re
    m = re.search(r"collected (\d+) informative and (\d+) ambiguous",
                  res.stderr.decode())
    idx = FMDIndex.restore(fmd)
    cls, key, val, (n_tot, n_info) = ec.collect_solid_kmers(idx, 19, 3)
    assert (int(m.group(1)), int(m.group(2))) == (n_info, n_tot - n_info)


def test_native_collect_matches_device(tmp_path, ref_fermi):
    reads, quals = make_noisy_reads(n=250, seed=11)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    idx = FMDIndex.restore(fmd)
    c1, k1, v1, _ = ec.collect_solid_kmers(idx, 19, 3)
    c2, k2, v2, _ = ec.collect_solid_kmers_native(idx, 19, 3)
    a = sorted(zip(c1.tolist(), k1.tolist(), v1.tolist()))
    b = sorted(zip(c2.tolist(), k2.tolist(), v2.tolist()))
    assert a == b


def test_device_fix_beam_byte_parity(tmp_path, monkeypatch):
    """Device bounded-beam ec fix (search/ecfix_device.py) vs the native
    engine: byte-identical ec.fq through ec_correct, including Ns, junk
    reads, short reads and the redo fallback."""
    import io

    from fermi_tpu.algos import correct as C
    from fermi_tpu.algos.hostindex import HostIndex
    from fermi_tpu.construct import suffix
    from fermi_tpu.core import dna
    from fermi_tpu import rld
    from tests.util import write_fastq

    rng = np.random.default_rng(17)
    glen, L = 5000, 80
    genome = rng.integers(0, 4, glen)
    comp = np.array([3, 2, 1, 0])
    reads, quals = [], []
    for i in range(glen * 20 // L):
        p = int(rng.integers(0, glen - L))
        r = genome[p:p + L].copy()
        qv = np.full(L, 38 + 33, np.uint8)
        ne = rng.binomial(L, 0.01)
        if ne:
            pos = rng.integers(0, L, ne)
            r[pos] = (r[pos] + rng.integers(1, 4, ne)) % 4
            qv[pos] = 14 + 33
        if rng.random() < 0.5:
            r = comp[r][::-1]
            qv = qv[::-1].copy()
        s = "".join("ACGT"[c] for c in r)
        if i % 23 == 0:
            k = int(rng.integers(0, L))
            s = s[:k] + "N" + s[k + 1:]
        reads.append(s)
        quals.append(qv.tobytes().decode("latin1"))
    for _ in range(10):  # junk + short
        reads.append("".join("ACGT"[c] for c in rng.integers(0, 4, L)))
        quals.append(chr(60) * L)
    reads.append("ACGTACGT")
    quals.append(chr(60) * 8)
    fq = str(tmp_path / "r.fq")
    write_fastq(fq, reads, quals)
    text = suffix.build_text([dna.encode(s) for s in reads])
    runs = rld.Runs.from_bwt(suffix.multistring_bwt(text))
    e = HostIndex(runs.expand())
    b1, b2 = io.StringIO(), io.StringIO()
    monkeypatch.delenv("FERMI_TPU_DEVICE_FIX", raising=False)
    C.ec_correct(e, fq, b1, min_occ=3, verbose=False)
    monkeypatch.setenv("FERMI_TPU_DEVICE_FIX", "1")
    C.ec_correct(e, fq, b2, min_occ=3, verbose=False)
    assert b1.getvalue() == b2.getvalue()
