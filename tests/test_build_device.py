"""The construction QA triangle (SURVEY §4.5): four independent builders —
host SA (suffix.py), device prefix doubling (suffix_jax.py), device
window-sort (wsort.py), and device BCR (bcr.py / bcr_jax.py, the reference
bcr.c algorithm) — must produce identical multi-string BWTs."""

import numpy as np
import pytest

from fermi_tpu.core import dna
from fermi_tpu.construct import suffix
from fermi_tpu.construct.bcr import bcr_bwt
from fermi_tpu.construct.bcr_jax import bcr_bwt_device
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
