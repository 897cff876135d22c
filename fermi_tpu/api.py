"""Stable embedding API for fermi-tpu.

This is the supported surface for using fermi-tpu as a library, mirroring
the reference's high-level API (fermi.h:119-123: fm6_api_readseq/writeseq/
seqlen/correct/unitig) with an idiomatic Python shape: sequences travel as
lists of str (one entry per read) instead of one NUL-concatenated buffer,
and the assembly graph is returned as an `algos.mag.Mag` object whose
text form round-trips the reference's MAG format.

Everything here is a thin, versioned facade over internal modules; the
internals may move between releases, this module will not.

    from fermi_tpu import api
    seqs, quals = api.read_seqs("reads.fq.gz")
    seqs, quals = api.correct(seqs, quals)          # k-mer error correction
    g = api.unitig(seqs)                            # overlap assembly
    g = api.clean(g, aggressive=True)               # graph cleaning
    api.write_mag(g, sys.stdout)

Index-level primitives (the reference's exact.c/smem.c layer):

    idx = api.build_index(seqs)                     # FMD-index of reads+rc
    api.save_index(idx_runs, "out.fmd")             # byte-exact .fmd
    idx = api.load_index("out.fmd")
    for (start, end, intervals) in api.smem(idx, "ACGT..."):
        ...
"""

from __future__ import annotations

import sys

import numpy as np

DEFAULT_QUAL = 20  # reference fermi.h:10


# ---------------------------------------------------------------------------
# sequence I/O (fm6_api_readseq / writeseq / seqlen — seq.c:385-444)
# ---------------------------------------------------------------------------

def read_seqs(path: str):
    """Read FASTA/FASTQ (optionally gzipped; "-" = stdin) into parallel
    lists of sequence and quality strings (fm6_api_readseq, seq.c:385-408).
    Missing qualities are filled with Q20+33 like the reference."""
    from fermi_tpu.core import fastx

    seqs, quals = [], []
    for r in fastx.read_fastx(path):
        seqs.append(r.seq)
        quals.append(r.qual if r.qual else chr(DEFAULT_QUAL + 33) * len(r.seq))
    return seqs, quals


def write_seqs(seqs, quals=None, out=None):
    """Write reads as FASTQ with positional names, matching
    fm6_api_writeseq's `@<offset>` naming (seq.c:410-430)."""
    out = out or sys.stdout
    pos = 0
    for i, s in enumerate(seqs):
        pos += len(s) + 1
        q = quals[i] if quals else chr(DEFAULT_QUAL + 33) * len(s)
        out.write(f"@{pos - 1}\n{s.upper()}\n+\n{q}\n")


def seq_len_quantile(seqs, quantile: float = 0.25) -> int:
    """Length quantile over the read set (fm6_api_seqlen, seq.c:432-444;
    the reference's ks_ksmall picks the floor(n*q)-th smallest)."""
    lens = np.fromiter((len(s) for s in seqs), np.int64, len(seqs))
    return int(np.partition(lens, int(len(lens) * quantile))
               [int(len(lens) * quantile)])


# ---------------------------------------------------------------------------
# error correction (fm6_api_correct — correct.c:464-511)
# ---------------------------------------------------------------------------

def correct(seqs, quals=None, k: int = -1, min_occ: int = 3,
            n_threads: int = 4):
    """Single-shot k-mer error correction: build an FMD-index over the
    reads, collect solid k-mers, fix every read (correct.c:464-511 with the
    same defaults: w=19 when k<0, min_occ=3, keep_bad, max_corr=0.3).
    Returns (seqs, quals) lists of corrected strings."""
    from fermi_tpu.algos import correct as ec
    from fermi_tpu.core import dna
    from fermi_tpu.construct import suffix
    from fermi_tpu.index.fmd import FMDIndex

    w = k if k > 0 else 19
    if quals is None:
        quals = [chr(DEFAULT_QUAL + 33) * len(s) for s in seqs]
    text = suffix.build_text([dna.encode(s) for s in seqs],
                             trim_palindrome=False)
    idx = FMDIndex.from_bwt(suffix.multistring_bwt(text))
    cls, key, val, _ = ec.collect_solid_kmers(idx, w, min_occ)
    table = ec.SolidTable(w, cls, key, val)
    opt = dict(w=w, min_occ=min_occ, keep_bad=1, is_paired=0, max_corr=0.3,
               trim_l=0, step=5)
    out_s, out_q, _, _ = ec.fix_reads(
        table, opt, [s.encode() for s in seqs],
        [q.encode() for q in quals], n_threads=n_threads)
    return ([s.decode("latin1") for s in out_s],
            [q.decode("latin1") for q in out_q])


# ---------------------------------------------------------------------------
# assembly (fm6_api_unitig — unitig.c:413-434) + graph cleaning
# ---------------------------------------------------------------------------

def unitig(seqs, min_match: int = -1):
    """In-process overlap assembly of a read set: build the FMD-index and
    run the unitig algorithm (fm6_api_unitig, unitig.c:413-434). min_match
    < 0 auto-sizes to 0.33 * the 25% length quantile like the reference.
    Returns an `algos.mag.Mag` graph."""
    from fermi_tpu.algos.scaf import fm6_api_unitig
    from fermi_tpu.core import dna

    if min_match < 0:
        min_match = int(seq_len_quantile(seqs, 0.25) * 0.33 + 0.499)
    blob = b"\x00".join(dna.encode(s).tobytes() for s in seqs) + b"\x00"
    return fm6_api_unitig(min_match, blob)


def clean(g, aggressive: bool = False, **overrides):
    """Clean an assembly graph in place and return it (mag_g_clean,
    mag.c:615-673). `aggressive` enables bubble popping / tip trimming the
    way `fermi clean -CA` does; keyword overrides patch individual fields
    of the option struct (mag_init_opt defaults, mag.c:592-613)."""
    from fermi_tpu.algos import mag as M

    opt = dict(M.DEFAULT_OPT)
    opt["flag_clean"] = True
    if aggressive:
        opt["flag_aggressive"] = True
    opt.update(overrides)
    M.g_clean(g, opt)
    return g


def write_mag(g, out=None):
    """Serialize a Mag graph in the reference's MAG text format
    (mag_v_write, mag.c:149-174)."""
    from fermi_tpu.algos import mag as M

    M.mag_print(g, out or sys.stdout)


# ---------------------------------------------------------------------------
# index-level primitives (build/save/load/query)
# ---------------------------------------------------------------------------

def build_index(seqs):
    """FMD-index over the reads and their reverse complements
    (fm6_build2, build.c:52-70). Returns a device-resident FMDIndex."""
    from fermi_tpu.core import dna
    from fermi_tpu.construct import suffix
    from fermi_tpu.index.fmd import FMDIndex

    text = suffix.build_text([dna.encode(s) for s in seqs],
                             trim_palindrome=False)
    return FMDIndex.from_bwt(suffix.multistring_bwt(text))


def save_index(seqs, path: str):
    """Build and write a byte-exact .fmd file for a read set
    (fm_build + rld_dump; rld.c:242-263)."""
    from fermi_tpu import rld
    from fermi_tpu.core import dna
    from fermi_tpu.construct import suffix

    text = suffix.build_text([dna.encode(s) for s in seqs],
                             trim_palindrome=False)
    runs = rld.Runs.from_bwt(suffix.multistring_bwt(text))
    rld.write_fmd(runs, path)


def load_index(path: str):
    """Load a .fmd file into a device-resident FMDIndex
    (rld_restore, rld.c:288-325)."""
    from fermi_tpu.index.fmd import FMDIndex

    return FMDIndex.restore(path)


def smem(index, seq: str, self_match: bool = False):
    """Supermaximal exact matches of `seq` against the index (fm6_smem,
    smem.c:13-80). Returns a list of (start, end, size, left_closed, kf)
    tuples in query coordinates, in the order the reference emits them."""
    from fermi_tpu.core import dna
    from fermi_tpu.search import smem as S

    q = dna.encode(seq)
    return S.smem_all(index, [q], self_match=self_match)[0]


__all__ = [
    "read_seqs", "write_seqs", "seq_len_quantile", "correct", "unitig",
    "clean", "write_mag", "build_index", "save_index", "load_index", "smem",
]
