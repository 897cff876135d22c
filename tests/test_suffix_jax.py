"""Device suffix sort agrees with the host oracle."""

import numpy as np

from fermi_tpu.core import dna
from fermi_tpu.construct import suffix
from fermi_tpu.construct.suffix_jax import multistring_bwt_device

from util import random_reads


def test_device_bwt_matches_host():
    for seed in (0, 1):
        reads = random_reads(80, seed=seed, with_genome=(seed == 0),
                             genome_len=1500)
        text = suffix.build_text([dna.encode(s) for s in reads])
        host = suffix.multistring_bwt(text)
        dev = multistring_bwt_device(text)
        assert np.array_equal(host, dev)


def test_device_bwt_edge_cases():
    # palindrome-trimmed, duplicates, single read
    for reads in (["ACGT" * 10] * 5, ["A"], ["AT", "CG"],
                  ["ACGTACGT", "ACGTACGT", "TTTT"]):
        text = suffix.build_text([dna.encode(s) for s in reads])
        host = suffix.multistring_bwt(text)
        dev = multistring_bwt_device(text)
        assert np.array_equal(host, dev), reads
