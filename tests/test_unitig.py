"""Unitig construction parity vs reference `fermi unitig` (t=1)."""

import io
import subprocess

import numpy as np
import pytest

from fermi_tpu import rld
from fermi_tpu.algos.hostindex import HostIndex
from fermi_tpu.algos.unitig import fm6_unitig
from fermi_tpu.algos.seqsort import seqsort
from fermi_tpu.index.fmd import FMDIndex

from util import random_reads, build_my_fmd


def _run_both(tmp_path, ref_fermi, reads, min_match, use_rank=False):
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    cmd = [ref_fermi, "unitig", "-l", str(min_match)]
    rank_args = []
    if use_rank:
        rank = subprocess.run([ref_fermi, "seqsort", fmd], capture_output=True,
                              check=True).stdout
        rf = str(tmp_path / "i.rank")
        open(rf, "wb").write(rank)
        rank_args = ["-r", rf]
    ref = subprocess.run(cmd + rank_args + [fmd], capture_output=True,
                         check=True).stdout.decode()

    runs = rld.read_fmd(fmd)
    e = HostIndex(runs.expand())
    sorted_arr = None
    if use_rank:
        sorted_arr = np.frombuffer(rank, np.uint64)
    buf = io.StringIO()
    fm6_unitig(e, min_match, buf, sorted_arr)
    return ref, buf.getvalue()


def test_unitig_parity_simple_overlaps(tmp_path, ref_fermi):
    # tiled reads from one genome -> a few clean unitigs
    rng = np.random.default_rng(31)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    reads = []
    for pos in range(0, 2900, 17):
        reads.append(genome[pos:pos + 80])
    ref, mine = _run_both(tmp_path, ref_fermi, reads, 40)
    assert mine == ref


def test_unitig_parity_genome_reads(tmp_path, ref_fermi):
    reads = random_reads(400, seed=33, with_genome=True, genome_len=4000,
                         min_len=60, max_len=100)
    ref, mine = _run_both(tmp_path, ref_fermi, reads, 30)
    assert mine == ref


def test_unitig_parity_with_rank(tmp_path, ref_fermi):
    reads = random_reads(300, seed=35, with_genome=True, genome_len=2500,
                         min_len=60, max_len=100)
    ref, mine = _run_both(tmp_path, ref_fermi, reads, 30, use_rank=True)
    assert mine == ref


def test_unitig_parity_repetitive(tmp_path, ref_fermi):
    # repeats to force bifurcations / bend bits / loops
    rng = np.random.default_rng(37)
    core = "".join("ACGT"[c] for c in rng.integers(0, 4, 400))
    genome = core + "".join("ACGT"[c] for c in rng.integers(0, 4, 600)) + core \
        + "".join("ACGT"[c] for c in rng.integers(0, 4, 500))
    reads = [genome[p:p + 70] for p in range(0, len(genome) - 70, 9)]
    ref, mine = _run_both(tmp_path, ref_fermi, reads, 35)
    assert mine == ref


def test_native_matches_python_engine(tmp_path, ref_fermi):
    """Both engines produce identical MAG output (the CLI default is native)."""
    import io
    from fermi_tpu import rld
    from fermi_tpu.algos.hostindex import HostIndex
    from fermi_tpu.algos.unitig import UnitigBuilder, fm6_unitig_native
    from fermi_tpu.algos.seqsort import seqsort
    from fermi_tpu.index.fmd import FMDIndex

    reads = random_reads(300, seed=35, with_genome=True, genome_len=2500,
                         min_len=60, max_len=100)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    e = HostIndex(rld.read_fmd(fmd).expand())
    sorted_arr = seqsort(FMDIndex.restore(fmd), verbose=False)
    for srt in (None, sorted_arr):
        buf = io.StringIO()
        UnitigBuilder(e, 30, srt).run(buf)
        nat = fm6_unitig_native(e, 30, srt)
        assert nat == buf.getvalue()


def test_threaded_mode(tmp_path):
    """n_threads>1 follows the reference's `-t N` contract: a valid MAG
    with unique end ids and the same read mass; the gather order is
    deterministic (unlike the reference's interleaved stdout), and
    n_threads=1 through the same entry stays byte-equal to sequential."""
    import io

    from fermi_tpu import rld
    from fermi_tpu.algos.hostindex import HostIndex
    from fermi_tpu.algos import mag as M
    from fermi_tpu.algos.unitig import fm6_unitig_native

    reads = random_reads(500, seed=41, with_genome=True, genome_len=4000,
                         min_len=60, max_len=100)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    e = HostIndex(rld.read_fmd(fmd).expand())
    seq = fm6_unitig_native(e, 30, None, n_threads=1)
    assert seq == fm6_unitig_native(e, 30, None)  # entry default unchanged
    thr = fm6_unitig_native(e, 30, None, n_threads=3)

    def parse(text, name):
        p = str(tmp_path / name)
        with open(p, "w") as f:
            f.write(text)
        return M.mag_read(p, dict(M.DEFAULT_OPT))

    g_seq = parse(seq, "s.mag")
    g_thr = parse(thr, "t.mag")
    ids = [k for v in g_thr.v for k in v.k]
    assert len(ids) == len(set(ids))  # visited dedupe held under threads
    mass = lambda g: sum(v.len for v in g.v)
    # same assembled mass up to boundary-read movement between unitigs
    assert abs(mass(g_thr) - mass(g_seq)) <= 0.02 * mass(g_seq)
