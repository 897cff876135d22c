"""remap parity vs reference (coverage, UR lists, insert stats, breaking)."""

import io
import subprocess

import numpy as np
import pytest

from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.algos.remap import remap

from util import build_my_fmd, revcomp_str


def make_pe_dataset(tmp_path, ref_fermi, seed=61, glen=8000, n_pairs=400,
                    rl=70, insert=250):
    """Paired reads (mates adjacent: 2i, 2i+1) + contigs from unitig+clean."""
    rng = np.random.default_rng(seed)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, glen))
    reads = []
    for _ in range(n_pairs):
        ins = int(rng.normal(insert, 25))
        ins = max(rl + 10, min(ins, glen - 10))
        pos = int(rng.integers(0, glen - ins))
        left = genome[pos:pos + rl]
        right = revcomp_str(genome[pos + ins - rl:pos + ins])
        reads.append(left)
        reads.append(right)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    rank = subprocess.run([ref_fermi, "seqsort", fmd], check=True,
                          capture_output=True).stdout
    rank_f = str(tmp_path / "i.rank")
    open(rank_f, "wb").write(rank)
    mag = subprocess.run([ref_fermi, "unitig", "-l", "40", "-r", rank_f, fmd],
                         check=True, capture_output=True).stdout
    p1 = subprocess.run([ref_fermi, "clean", "-"], input=mag, check=True,
                        capture_output=True).stdout
    ctg = str(tmp_path / "p2.mag")
    open(ctg, "wb").write(p1)
    return fmd, rank_f, ctg


@pytest.mark.parametrize("extra", [[], ["-c", "2"]])
def test_remap_parity(tmp_path, ref_fermi, extra):
    fmd, rank_f, ctg = make_pe_dataset(tmp_path, ref_fermi)
    res = subprocess.run([ref_fermi, "remap", "-r", rank_f, *extra, fmd, ctg],
                         check=True, capture_output=True)
    ref_out = res.stdout.decode()
    ref_stats = [l for l in res.stderr.decode().splitlines() if "avg =" in l]

    idx = FMDIndex.restore(fmd)
    sorted_arr = np.fromfile(rank_f, np.uint64)
    buf = io.StringIO()
    import sys
    err = io.StringIO()
    old = sys.stderr
    sys.stderr = err
    try:
        min_pcv = int(extra[1]) if extra else 0
        remap(idx, ctg, buf, sorted_arr, skip=50, min_pcv=min_pcv,
              max_dist=1000)
    finally:
        sys.stderr = old
    assert buf.getvalue() == ref_out
    # insert-size stats line matches (same avg/std/cap numbers)
    mine_stats = [l for l in err.getvalue().splitlines() if "avg =" in l]
    assert ref_stats[0].split("]")[1] == mine_stats[0].split("]")[1]


def test_remap_unpaired(tmp_path, ref_fermi):
    fmd, rank_f, ctg = make_pe_dataset(tmp_path, ref_fermi, seed=62)
    ref_out = subprocess.run([ref_fermi, "remap", fmd, ctg], check=True,
                             capture_output=True).stdout.decode()
    idx = FMDIndex.restore(fmd)
    buf = io.StringIO()
    remap(idx, ctg, buf, None)
    assert buf.getvalue() == ref_out
