"""Bulk-link unitig reformulation: byte parity with the sequential oracle.

The TPU-first redesign (algos/unitig_bulk.py) splits unitig into
embarrassingly-parallel per-sequence link records + a sequential stitch.
These tests pin the reformulation's core claim: stitch(links) is
byte-identical to UnitigBuilder.run() (itself parity-tested against the
reference binary in test_unitig.py)."""

import io

import numpy as np
import pytest

from fermi_tpu.algos import unitig_bulk as UB
from fermi_tpu.algos.hostindex import HostIndex
from fermi_tpu.algos.unitig import UnitigBuilder
from fermi_tpu.construct import suffix
from fermi_tpu.core import dna
from fermi_tpu import rld
from tests.util import random_reads


def _build(reads, path=None):
    text = suffix.build_text([dna.encode(s) for s in reads])
    runs = rld.Runs.from_bwt(suffix.multistring_bwt(text))
    if path:
        rld.write_fmd(runs, path, sbits=3)
    return HostIndex(runs.expand())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bulk_matches_oracle(seed):
    reads = random_reads(120, min_len=60, max_len=80, seed=seed,
                         with_genome=True, genome_len=1200)
    e = _build(reads)
    b1, b2 = io.StringIO(), io.StringIO()
    UnitigBuilder(e, 30).run(b1)
    stats = UB.fm6_unitig_bulk(e, 30, b2)
    assert b1.getvalue() == b2.getvalue()
    assert stats["tail_recoveries"] == 0


def test_bulk_matches_oracle_coverage_and_rank(tmp_path):
    """25x coverage with errors and exact duplicates, with and without
    a seqsort rank array (the pipeline's -r path)."""
    rng = np.random.default_rng(11)
    glen, L = 2500, 90
    genome = rng.integers(0, 4, glen)
    comp = np.array([3, 2, 1, 0])
    reads = []
    for _ in range(glen * 20 // L):
        p = int(rng.integers(0, glen - L))
        r = genome[p:p + L].copy()
        ne = rng.binomial(L, 0.002)
        if ne:
            pos = rng.integers(0, L, ne)
            r[pos] = (r[pos] + rng.integers(1, 4, ne)) % 4
        if rng.random() < 0.5:
            r = comp[r][::-1]
        reads.append("".join("ACGT"[c] for c in r))
    reads += reads[:20]  # exact duplicates
    fmd = str(tmp_path / "b.fmd")
    e = _build(reads, fmd)
    from fermi_tpu.algos.seqsort import seqsort
    from fermi_tpu.index.fmd import FMDIndex
    srt = seqsort(FMDIndex.restore(fmd), verbose=False)
    for mm in (30, 50):
        for use_srt in (None, srt):
            b1, b2 = io.StringIO(), io.StringIO()
            UnitigBuilder(e, mm, use_srt).run(b1)
            UB.fm6_unitig_bulk(e, mm, b2, sorted_arr=use_srt)
            assert b1.getvalue() == b2.getvalue(), (mm, use_srt is None)


def test_link_record_fields():
    reads = random_reads(60, min_len=50, max_len=60, seed=5,
                         with_genome=True, genome_len=600)
    e = _build(reads)
    seqs, ks = UB.retrieve_all(e)
    lk = UB.compute_link_host(e, seqs[1], 25)
    assert lk.ok
    kb, kf, sz = lk.intv0
    assert 0 <= kb < int(e.n_seqs) and 0 <= kf < int(e.n_seqs) and sz >= 1
    for (nkb, nkf, nsz, ov, ext) in lk.nei:
        assert ov >= 25 and ext >= 1 and nsz >= 1


def test_device_links_match_host_and_stitch(tmp_path):
    """Device kernel (search/unitig_links.py) vs the host spec, record by
    record, then full-chain MAG byte parity through the stitch."""
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search.unitig_links import compute_links_device

    rng = np.random.default_rng(7)
    glen, L = 2000, 80
    genome = rng.integers(0, 4, glen)
    comp = np.array([3, 2, 1, 0])
    reads = []
    for _ in range(glen * 15 // L):
        p = int(rng.integers(0, glen - L))
        r = genome[p:p + L].copy()
        if rng.random() < 0.5:
            r = comp[r][::-1]
        reads.append("".join("ACGT"[c] for c in r))
    reads += reads[:10]
    fmd = str(tmp_path / "d.fmd")
    e = _build(reads, fmd)
    idx = FMDIndex.restore(fmd)
    mm = 30
    seqs, ks = UB.retrieve_all(e)
    links_h = UB.compute_links_host(e, seqs, mm)
    store = compute_links_device(idx, seqs, mm, batch=256)
    assert int(store.redo.sum()) == 0
    for x in range(len(seqs)):
        lh, ld = links_h[x], store[x]
        assert (lh.ok, lh.ret, lh.intv0, lh.has_ovlp, lh.nei, lh.forked,
                lh.sbits) == (ld.ok, ld.ret, ld.intv0, ld.has_ovlp, ld.nei,
                              ld.forked, ld.sbits), x
    b1, b2 = io.StringIO(), io.StringIO()
    UnitigBuilder(e, mm).run(b1)
    UB.stitch(e, store, seqs, ks, mm, b2)
    assert b1.getvalue() == b2.getvalue()


def test_native_stitch_and_cli_device_path(tmp_path, monkeypatch, capsys):
    """stitch_native == Python stitch byte-for-byte, and the CLI device
    dispatch (FERMI_TPU_DEVICE_UNITIG=1) produces the oracle MAG."""
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search.unitig_links import compute_links_device

    rng = np.random.default_rng(13)
    glen, L = 1500, 80
    genome = rng.integers(0, 4, glen)
    comp = np.array([3, 2, 1, 0])
    reads = []
    for _ in range(glen * 12 // L):
        p = int(rng.integers(0, glen - L))
        r = genome[p:p + L].copy()
        if rng.random() < 0.5:
            r = comp[r][::-1]
        reads.append("".join("ACGT"[c] for c in r))
    fmd = str(tmp_path / "cs.fmd")
    e = _build(reads, fmd)
    idx = FMDIndex.restore(fmd)
    mm = 30
    seqs, ks = UB.retrieve_all(e)
    store = compute_links_device(idx, seqs, mm, batch=256)
    b1 = io.StringIO()
    UnitigBuilder(e, mm).run(b1)
    txt, nrec = UB.stitch_native(e, store, seqs, ks, mm)
    assert txt == b1.getvalue()
    # CLI dispatch
    from fermi_tpu.cli import main as climain
    monkeypatch.setenv("FERMI_TPU_DEVICE_UNITIG", "1")
    rc = climain.main(["unitig", "-l", str(mm), fmd])
    assert rc == 0
    out = capsys.readouterr().out
    assert out == b1.getvalue()


def test_device_links_high_coverage(tmp_path):
    """45x coverage with short overlaps: stresses wide interval sets,
    the redo ladder, and dense category groups; full-chain byte parity
    (device links -> native stitch vs the sequential oracle)."""
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search.unitig_links import compute_links_device

    rng = np.random.default_rng(43)
    glen, L, mm, cov = 1200, 92, 28, 42
    genome = rng.integers(0, 4, glen)
    comp = np.array([3, 2, 1, 0])
    reads = []
    for _ in range(glen * cov // L):
        p = int(rng.integers(0, glen - L))
        r = genome[p:p + L].copy()
        ne = rng.binomial(L, rng.uniform(0, 0.02))
        if ne:
            pos = rng.integers(0, L, ne)
            r[pos] = (r[pos] + rng.integers(1, 4, ne)) % 4
        if rng.random() < 0.5:
            r = comp[r][::-1]
        reads.append("".join("ACGT"[c] for c in r))
    fmd = str(tmp_path / "hc.fmd")
    e = _build(reads, fmd)
    idx = FMDIndex.restore(fmd)
    seqs, ks = UB.retrieve_all(e)
    store = compute_links_device(idx, seqs, mm, batch=512)
    b1 = io.StringIO()
    UnitigBuilder(e, mm).run(b1)
    txt, nrec = UB.stitch_native(e, store, seqs, ks, mm)
    assert txt == b1.getvalue()
