"""merge / sub / contrast / bitand / recode parity with the reference."""

import io
import subprocess
import sys

import numpy as np
import pytest

from fermi_tpu import rld
from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.algos.merge import fm_merge
from fermi_tpu.algos.sub import fm_sub, unpack_bitfile, pack_bitfile
from fermi_tpu.algos.contrast import fm6_contrast, sub_conv

from util import random_reads, write_fasta, build_my_fmd


def test_merge_parity(tmp_path, ref_fermi):
    r0 = random_reads(120, seed=51, with_genome=True, genome_len=2000)
    r1 = random_reads(90, seed=52, with_genome=True, genome_len=2000)
    f0 = str(tmp_path / "a.fmd")
    f1 = str(tmp_path / "b.fmd")
    build_my_fmd(r0, f0)
    build_my_fmd(r1, f1)
    out_ref = str(tmp_path / "m_ref.fmd")
    subprocess.run([ref_fermi, "merge", "-fo", out_ref, f0, f1], check=True,
                   capture_output=True)
    e0 = FMDIndex.restore(f0)
    e1 = FMDIndex.restore(f1)
    bwt0 = rld.read_fmd(f0).expand()
    bwt1 = rld.read_fmd(f1).expand()
    merged = fm_merge(e0, bwt0, e1, bwt1)
    out_my = str(tmp_path / "m_my.fmd")
    rld.write_fmd(rld.Runs.from_bwt(merged), out_my)
    assert open(out_ref, "rb").read() == open(out_my, "rb").read()
    # and merging equals building from the concatenated read set
    out_all = str(tmp_path / "all.fmd")
    build_my_fmd(r0 + r1, out_all)
    assert open(out_all, "rb").read() == open(out_my, "rb").read()


def test_sub_parity(tmp_path, ref_fermi):
    reads = random_reads(150, seed=53, with_genome=True, genome_len=2500)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    n_seqs = 2 * len(reads)
    rng = np.random.default_rng(5)
    sel = rng.random(len(reads)) < 0.4
    bits = np.repeat(sel, 2)  # both strands of a read selected together
    bf = str(tmp_path / "sel.bits")
    pack_bitfile(bf, bits)
    ref_out = subprocess.run([ref_fermi, "sub", fmd, bf], check=True,
                             capture_output=True).stdout
    runs = rld.read_fmd(fmd)
    bwt = runs.expand()
    e = FMDIndex.from_bwt(bwt)
    out = fm_sub(e, bwt, unpack_bitfile(bf))
    my = str(tmp_path / "sub_my.fmd")
    rld.write_fmd(rld.Runs.from_bwt(out), my)
    assert open(my, "rb").read() == ref_out
    # complement mode
    ref_out_c = subprocess.run([ref_fermi, "sub", "-c", fmd, bf], check=True,
                               capture_output=True).stdout
    out_c = fm_sub(e, bwt, unpack_bitfile(bf), is_comp=True)
    rld.write_fmd(rld.Runs.from_bwt(out_c), my)
    assert open(my, "rb").read() == ref_out_c


def test_contrast_parity(tmp_path, ref_fermi):
    # two read sets sharing a genome but each with a private region
    rng = np.random.default_rng(7)
    shared = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    priv0 = "".join("ACGT"[c] for c in rng.integers(0, 4, 800))
    priv1 = "".join("ACGT"[c] for c in rng.integers(0, 4, 800))
    g0 = shared + priv0
    g1 = shared + priv1
    reads0 = [g0[p:p + 80] for p in range(0, len(g0) - 80, 11)]
    reads1 = [g1[p:p + 80] for p in range(0, len(g1) - 80, 13)]
    f0 = str(tmp_path / "a.fmd")
    f1 = str(tmp_path / "b.fmd")
    build_my_fmd(reads0, f0)
    build_my_fmd(reads1, f1)
    for f, tag in ((f0, "a"), (f1, "b")):
        rank = subprocess.run([ref_fermi, "seqsort", f], check=True,
                              capture_output=True).stdout
        open(str(tmp_path / f"{tag}.rank"), "wb").write(rank)
    args = [f0, str(tmp_path / "a.rank"), str(tmp_path / "a.sub"),
            f1, str(tmp_path / "b.rank"), str(tmp_path / "b.sub")]
    subprocess.run([ref_fermi, "contrast", "-k", "31", *args], check=True,
                   capture_output=True)
    ref_a = open(str(tmp_path / "a.sub"), "rb").read()
    ref_b = open(str(tmp_path / "b.sub"), "rb").read()

    e0 = FMDIndex.restore(f0)
    e1 = FMDIndex.restore(f1)
    s0, s1 = fm6_contrast(e0, e1, 31, 3)
    for tag, s, ref_bytes in (("a", s0, ref_a), ("b", s1, ref_b)):
        rank = np.fromfile(str(tmp_path / f"{tag}.rank"), np.uint64)
        sel = sub_conv(s, rank)
        my = str(tmp_path / f"{tag}_my.sub")
        pack_bitfile(my, sel)
        assert open(my, "rb").read() == ref_bytes, tag


def test_bitand_and_recode(tmp_path, ref_fermi):
    rng = np.random.default_rng(9)
    a = rng.random(200) < 0.5
    b = rng.random(200) < 0.5
    fa = str(tmp_path / "a.bits")
    fb = str(tmp_path / "b.bits")
    pack_bitfile(fa, a)
    pack_bitfile(fb, b)
    ref = subprocess.run([ref_fermi, "bitand", fa, fb], check=True,
                         capture_output=True).stdout
    from fermi_tpu.cli.main import main
    import contextlib
    buf = io.BytesIO()

    class W:
        buffer = buf
        def write(self, s): pass

    old = sys.stdout
    sys.stdout = W()
    try:
        main(["bitand", fa, fb])
    finally:
        sys.stdout = old
    assert buf.getvalue() == ref
    # recode roundtrip equals reference recode
    reads = random_reads(50, seed=1)
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    ref_rec = subprocess.run([ref_fermi, "recode", fmd], check=True,
                             capture_output=True).stdout
    my = str(tmp_path / "rec.fmd")
    rld.write_fmd(rld.read_fmd(fmd), my)
    assert open(my, "rb").read() == ref_rec


def test_multi_backward_search_matches_merged(tmp_path):
    """fm_multi_backward_search (exact.c:25-57) must report the interval the
    merged index would: distributed search == search on fm_merge result."""
    import numpy as np
    from fermi_tpu.construct import suffix
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.algos.merge import fm_merge
    from fermi_tpu.search.extend import multi_backward_search

    rng = np.random.default_rng(42)
    sets = []
    for ns in (12, 17):
        reads = [rng.integers(1, 5, int(rng.integers(30, 60))).astype(np.uint8)
                 for _ in range(ns)]
        bwt = suffix.multistring_bwt(suffix.build_text(reads))
        sets.append((FMDIndex.from_bwt(bwt), bwt, reads))
    (e0, bwt0, reads0), (e1, bwt1, reads1) = sets
    merged_bwt = fm_merge(e0, bwt0, e1, bwt1)
    em = FMDIndex.from_bwt(merged_bwt)

    def ref_interval(q):
        # scalar backward search on the merged index
        c = int(q[-1])
        k, l = int(em.cnt[c]), int(em.cnt[c + 1])
        for i in range(len(q) - 2, -1, -1):
            c = int(q[i])
            k = int(em.cnt[c]) + int(np.asarray(em.rank6(np.int64(k)))[..., c])
            l = int(em.cnt[c]) + int(np.asarray(em.rank6(np.int64(l)))[..., c])
            if k >= l:
                return 0, -1, 0
        return k, l - 1, l - k
    qs = []
    for r in reads0[:3] + reads1[:3]:
        qs.append(r[5:20])          # present substrings
    qs.append(np.array([1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4], np.uint8))
    qs.append(rng.integers(1, 5, 25).astype(np.uint8))  # likely absent
    for q in qs:
        got = multi_backward_search([e0, e1], q)
        want = ref_interval(q)
        if want[2] == 0:
            assert got[2] == 0, (got, want)
        else:
            assert got == want, (got, want)


def test_fm_append_streaming_matches_merge(tmp_path, ref_fermi):
    """Streaming block append (reference fm_append memory model,
    merge.c:139-209): byte-equal .fmd to the full fm_merge path, and the
    reference binary accepts the appended index."""
    from fermi_tpu.algos.merge import fm_append_streaming
    from fermi_tpu.construct import suffix

    rng = np.random.default_rng(11)
    reads0 = [rng.integers(1, 5, int(rng.integers(40, 90))).astype(np.uint8)
              for _ in range(160)]
    reads1 = [rng.integers(1, 5, int(rng.integers(40, 90))).astype(np.uint8)
              for _ in range(90)]
    text0 = suffix.build_text(reads0)
    text1 = suffix.build_text(reads1)
    bwt0 = suffix.multistring_bwt(text0)
    old = str(tmp_path / "old.fmd")
    rld.write_fmd(rld.Runs.from_bwt(bwt0), old)

    out = str(tmp_path / "appended.fmd")
    fm_append_streaming(old, text1, out)

    bwt1 = suffix.multistring_bwt(text1)
    want = fm_merge(FMDIndex.from_bwt(bwt0), bwt0,
                    FMDIndex.from_bwt(bwt1), bwt1)
    want_path = str(tmp_path / "merged.fmd")
    rld.write_fmd(rld.Runs.from_bwt(want), want_path)
    assert open(out, "rb").read() == open(want_path, "rb").read()
    subprocess.run([ref_fermi, "chkbwt", "-r", out], check=True,
                   capture_output=True)
