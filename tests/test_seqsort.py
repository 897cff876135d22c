"""seqsort (rank array) parity vs reference `fermi seqsort`."""

import subprocess

import numpy as np

from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.algos.seqsort import seqsort

from util import random_reads, build_my_fmd


def test_seqsort_parity(tmp_path, ref_fermi):
    # genome reads give duplicates + containment; add exact dups explicitly
    reads = random_reads(120, seed=21, with_genome=True, genome_len=2000)
    reads += reads[:10]                 # exact duplicates
    reads += [r[5:60] for r in reads[:8]]  # contained reads
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    ref = subprocess.run([ref_fermi, "seqsort", fmd], capture_output=True,
                         check=True).stdout
    ref_arr = np.frombuffer(ref, np.uint64)
    idx = FMDIndex.restore(fmd)
    mine = seqsort(idx, batch=64, max_len=128, verbose=False)
    assert np.array_equal(mine, ref_arr)
    # native host engine: same array from the same index
    from fermi_tpu.algos.seqsort import seqsort_native
    nat = seqsort_native(idx, n_threads=3, verbose=False)
    assert np.array_equal(nat, ref_arr)
    # and from the HostIndex view
    from fermi_tpu import rld
    from fermi_tpu.algos.hostindex import HostIndex
    h = HostIndex.from_runs(rld.read_fmd(fmd))
    assert np.array_equal(seqsort_native(h, verbose=False), ref_arr)
