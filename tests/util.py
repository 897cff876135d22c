"""Shared test helpers: synthetic read sets and reference-binary invocation."""

import numpy as np


def random_reads(n, min_len=30, max_len=101, seed=0, with_genome=False,
                 genome_len=5000, coverage=False):
    """Random independent reads, or reads sampled from a random genome."""
    rng = np.random.default_rng(seed)
    if with_genome:
        genome = "".join("ACGT"[c] for c in rng.integers(0, 4, genome_len))
        reads = []
        for _ in range(n):
            L = int(rng.integers(min_len, max_len))
            pos = int(rng.integers(0, genome_len - L))
            s = genome[pos:pos + L]
            if rng.random() < 0.5:
                s = revcomp_str(s)
            reads.append(s)
        return reads
    return ["".join("ACGT"[c] for c in rng.integers(0, 4, rng.integers(min_len, max_len)))
            for _ in range(n)]


_COMP = str.maketrans("ACGT", "TGCA")


def revcomp_str(s: str) -> str:
    return s.translate(_COMP)[::-1]


def write_fasta(path, reads):
    with open(path, "w") as f:
        for i, s in enumerate(reads):
            f.write(f">r{i}\n{s}\n")


def write_fastq(path, reads, quals=None):
    with open(path, "w") as f:
        for i, s in enumerate(reads):
            q = quals[i] if quals else "I" * len(s)
            f.write(f"@r{i}\n{s}\n+\n{q}\n")


def build_my_fmd(reads, path, sbits=3):
    """Build an .fmd with this framework (host prefix-doubling path)."""
    from fermi_tpu.core import dna
    from fermi_tpu.construct import suffix
    from fermi_tpu import rld

    text = suffix.build_text([dna.encode(s) for s in reads])
    runs = rld.Runs.from_bwt(suffix.multistring_bwt(text))
    rld.write_fmd(runs, path, sbits=sbits)
    return runs
