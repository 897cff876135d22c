"""The construction QA polygon (SURVEY §4.5): five independent builders —
host SA (suffix.py), device prefix doubling (suffix_jax.py), device
window-sort (wsort.py), device BCR (bcr.py / bcr_jax.py, the reference
bcr.c algorithm), and the B+-rope (bprope.py, the reference bprope6.c
algorithm) — must produce identical multi-string BWTs."""

import numpy as np
import pytest

from fermi_tpu.core import dna
from fermi_tpu.construct import suffix
from fermi_tpu.construct.bcr import bcr_bwt
from fermi_tpu.construct.bcr_jax import bcr_bwt_device
from fermi_tpu.construct.bprope import bpr_bwt
from fermi_tpu.construct.wsort import wsort_bwt

from util import random_reads


def _nt6(reads):
    return [dna.encode(s) for s in reads]


def _cases():
    rng = np.random.default_rng(11)
    cases = [["A"], ["AT", "CG"], ["ACGTACGT", "ACGTACGT", "TTTT"],
             ["ACGT" * 10] * 5, ["ANNGT", "CCNCC"]]
    for seed in (0, 1):
        cases.append(random_reads(60, seed=seed, with_genome=(seed == 0),
                                  genome_len=1200))
    # ragged lengths
    cases.append(["".join(rng.choice(list("ACGT"),
                                     size=rng.integers(1, 90)))
                  for _ in range(40)])
    return cases


@pytest.mark.parametrize("case", range(8))
def test_wsort_matches_host(case):
    reads = _cases()[case]
    text = suffix.build_text(_nt6(reads))
    assert np.array_equal(suffix.multistring_bwt(text), wsort_bwt(text))


@pytest.mark.parametrize("case", range(8))
def test_bcr_numpy_matches_host(case):
    reads = _cases()[case]
    seqs = _nt6(reads)
    ref = suffix.multistring_bwt(
        suffix.build_text(seqs, both_strands=False, trim_palindrome=False))
    assert np.array_equal(ref, bcr_bwt(seqs))


@pytest.mark.parametrize("case", range(8))
def test_bprope_matches_host(case):
    reads = _cases()[case]
    seqs = _nt6(reads)
    ref = suffix.multistring_bwt(
        suffix.build_text(seqs, both_strands=False, trim_palindrome=False))
    assert np.array_equal(ref, bpr_bwt(seqs))


def test_bprope_long_runs_and_scale():
    # leaf/run splitting paths: long homopolymers exceed the 13-bit run cap,
    # and enough reads to force several levels of internal-node splits
    rng = np.random.default_rng(5)
    seqs = [np.full(rng.integers(50, 200), rng.integers(1, 5), np.uint8)
            for _ in range(50)]
    seqs += [rng.integers(1, 5, 100).astype(np.uint8) for _ in range(3000)]
    ref = suffix.multistring_bwt(
        suffix.build_text(seqs, both_strands=False, trim_palindrome=False))
    assert np.array_equal(ref, bpr_bwt(seqs))


def test_cli_ropebwt_engines_agree(tmp_path, ref_fermi):
    """CLI `ropebwt -a {bpr,bcr,sais}` all match the reference binary's
    text output (same fwd/rc interleave + palindrome trim)."""
    import subprocess
    import sys
    from util import write_fasta

    reads = random_reads(40, seed=9, with_genome=True, genome_len=800)
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, reads)
    ref = subprocess.run([ref_fermi, "ropebwt", "-a", "bpr", fa],
                         capture_output=True, check=True).stdout
    for algo in ("bpr", "bcr", "sais"):
        mine = subprocess.run(
            [sys.executable, "-m", "fermi_tpu.cli", "ropebwt", "-a", algo, fa],
            capture_output=True, check=True).stdout
        assert mine == ref, algo


@pytest.mark.parametrize("case", range(8))
def test_bcr_native_matches_host(case):
    from fermi_tpu.construct.bcr import bcr_bwt_native
    reads = _cases()[case]
    text = suffix.build_text(_nt6(reads))
    assert np.array_equal(suffix.multistring_bwt(text), bcr_bwt_native(text))


def test_bcr_native_scale():
    # enough reads for deep RLE streams, several 31-cap run splits, and all
    # 6x6 bucket routes; byte parity with the SA engine
    from fermi_tpu.construct.bcr import bcr_bwt_native
    rng = np.random.default_rng(7)
    seqs = [rng.integers(1, 5, int(rng.integers(40, 150))).astype(np.uint8)
            for _ in range(4000)]
    seqs += [np.full(90, 3, np.uint8)] * 5    # homopolymers
    text = suffix.build_text(seqs, both_strands=True, trim_palindrome=False)
    assert np.array_equal(suffix.multistring_bwt(text), bcr_bwt_native(text))


def test_bcr_frags_direct_matches_host():
    # the pipeline's hot path: rc strands synthesized inside the builder
    # (fbcr_start_frags), incl. the odd palindrome trim (ropebwt.c:25-29)
    # and reads long enough to cross several symbol-buffer refill blocks
    from fermi_tpu.construct.bcr import bcr_runs_from_frags
    from fermi_tpu import rld
    rng = np.random.default_rng(11)
    frags = [rng.integers(1, 5, int(rng.integers(30, 150))).astype(np.uint8)
             for _ in range(1500)]
    pal = np.array([1, 2, 3, 4, 1, 2, 3, 4], np.uint8)
    frags.append(np.concatenate([pal, 5 - pal[::-1]]))  # even palindrome
    F = np.concatenate(frags)
    offs = np.concatenate(
        [[0], np.cumsum([len(f) for f in frags])]).astype(np.int64)
    text = suffix.build_text(frags, both_strands=True, trim_palindrome=True)
    want = rld.Runs.from_bwt(suffix.multistring_bwt(text))
    got = bcr_runs_from_frags(F, offs, trim_palindrome=True, n_threads=4)
    assert np.array_equal(want.symbols, got.symbols)
    assert np.array_equal(want.lengths, got.lengths)


def test_bcr_device_matches_numpy():
    for seed in (3, 4):
        reads = random_reads(50, seed=seed, with_genome=False)
        seqs = _nt6(reads)
        assert np.array_equal(bcr_bwt(seqs), bcr_bwt_device(seqs))


def test_wsort_respects_sentinel_masking():
    # reads where one is a prefix of another: suffix order must stop at the
    # sentinel and fall back to position order
    reads = ["ACGTACGT", "ACGT", "ACG", "AC", "A"]
    text = suffix.build_text(_nt6(reads))
    assert np.array_equal(suffix.multistring_bwt(text), wsort_bwt(text))


def test_wsort_window_boundary_lengths():
    # lengths straddling the 10-symbol word boundary
    for L in (9, 10, 11, 19, 20, 21):
        reads = ["".join(np.random.default_rng(L).choice(list("ACGT"),
                                                         size=L))
                 for _ in range(20)]
        text = suffix.build_text(_nt6(reads))
        assert np.array_equal(suffix.multistring_bwt(text),
                              wsort_bwt(text)), L


def test_blocked_build_matches_host():
    """Blocked wsort + device gap-bit merge == whole-text host SA, at block
    sizes that force 1, 2, and many blocks (reference split->build->merge,
    run-fermi.pl:108-121)."""
    from fermi_tpu.construct.blocked import device_build_bwt, device_build_text

    reads = random_reads(80, seed=7, with_genome=True, genome_len=1500)
    seqs = _nt6(reads)
    text = suffix.build_text(seqs)
    ref = suffix.multistring_bwt(text)
    for blk in (1 << 30, 4000, 700):
        got = device_build_text(text, block_symbols=blk)
        assert np.array_equal(ref, got), blk
    # list-of-reads entry (strand expansion handled by caller): same order
    ends = np.flatnonzero(text == 0)
    starts = np.concatenate([[0], ends[:-1] + 1])
    strands = [text[s:e] for s, e in zip(starts, ends)]
    got = device_build_bwt(strands, block_symbols=2500)
    assert np.array_equal(ref, got)
