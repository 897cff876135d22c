"""MAG graph cleaning parity vs reference `fermi clean`."""

import subprocess

import numpy as np
import pytest

from util import random_reads, write_fasta, build_my_fmd


def _make_mag(tmp_path, ref_fermi, reads, min_match=30):
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    mag = subprocess.run([ref_fermi, "unitig", "-l", str(min_match), fmd],
                         capture_output=True, check=True).stdout
    mg = str(tmp_path / "p0.mag")
    open(mg, "wb").write(mag)
    return mg


def _noisy_genome_reads(seed, n=700, glen=6000, rl=80, err=0.005):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, glen)
    reads = []
    for _ in range(n):
        pos = int(rng.integers(0, glen - rl))
        r = genome[pos:pos + rl].copy()
        for _ in range(rng.binomial(rl, err)):
            p = int(rng.integers(0, rl))
            r[p] = (r[p] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.5:
            r = 3 - r[::-1]
        reads.append("".join("ACGT"[c] for c in r))
    return reads


def _run_clean(bin_or_mine, mg, flags, ref_fermi=None):
    if bin_or_mine == "ref":
        return subprocess.run([ref_fermi, "clean", *flags, mg],
                              capture_output=True, check=True).stdout.decode()
    from fermi_tpu.cli.main import main
    import io, sys
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        main(["clean", *flags, mg])
    finally:
        sys.stdout = old
    return buf.getvalue()


@pytest.mark.parametrize("flags", [[], ["-C"], ["-CA"]])
def test_clean_parity(tmp_path, ref_fermi, flags):
    reads = _noisy_genome_reads(41)
    mg = _make_mag(tmp_path, ref_fermi, reads)
    ref = _run_clean("ref", mg, flags, ref_fermi)
    mine = _run_clean("mine", mg, flags)
    assert mine == ref


def test_clean_parity_repeats(tmp_path, ref_fermi):
    # tandem-ish repeats to exercise bubbles
    rng = np.random.default_rng(43)
    core = "".join("ACGT"[c] for c in rng.integers(0, 4, 500))
    g1 = core + "".join("ACGT"[c] for c in rng.integers(0, 4, 800)) + core
    reads = [g1[p:p + 75] for p in range(0, len(g1) - 75, 6)]
    # add a SNP haplotype to create a bubble
    g2 = list(g1)
    g2[700] = "A" if g2[700] != "A" else "C"
    g2 = "".join(g2)
    reads += [g2[p:p + 75] for p in range(400, 1100, 11)]
    mg = _make_mag(tmp_path, ref_fermi, reads, min_match=40)
    for flags in ([], ["-C"], ["-C", "-A", "-O", "-F", "-o", "64"]):
        ref = _run_clean("ref", mg, flags, ref_fermi)
        mine = _run_clean("mine", mg, flags)
        assert mine == ref, f"flags={flags}"
