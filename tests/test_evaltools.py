"""Evaluation tools behave like the reference rdmd scripts (rdmd is not in
this image, so these are behavioral tests against hand-computed expectations
from the D sources)."""

import io

from fermi_tpu.misc import evaltools as ev


SAM = """@SQ\tSN:chr1\tLN:10000
c1\t0\tchr1\t101\t60\t10S90M\t*\t0\t0\t{}\t*\tNM:i:3
c2\t16\tchr1\t201\t60\t100M\t*\t0\t0\t{}\t*\tNM:i:0
c3\t4\t*\t0\t0\t*\t*\t0\t0\t{}\t*
""".format("A" * 100, "C" * 100, "G" * 200)


def test_sam2iden(tmp_path):
    p = tmp_path / "a.sam"
    p.write_text(SAM)
    out = io.StringIO()
    ev.sam2iden(str(p), out)
    lines = out.getvalue().strip().split("\n")
    assert len(lines) == 2  # unmapped line skipped
    f = lines[0].split("\t")
    # c1: 10S90M, NM 3: qlen=100, clip0=10 -> qstart 10, qend 100, + strand
    assert f[0] == "c1" and f[1] == "10" and f[2] == "100" and f[3] == "+"
    assert f[4] == "chr1" and f[5] == "100" and f[6] == "190"
    assert abs(float(f[8]) - (90 - 3) / 90) < 1e-9
    # c2 reverse strand: start clip[1]=0
    f = lines[1].split("\t")
    assert f[3] == "-" and abs(float(f[8]) - 1.0) < 1e-9


def test_sam2break(tmp_path):
    # one contig split into two alignments on the same chr, small gap
    sam = "\n".join([
        "@SQ\tSN:chr1\tLN:100000",
        "u1\t0\tchr1\t1001\t60\t200M300S\t*\t0\t0\t" + "A" * 500 + "\t*",
        "u1\t0\tchr1\t1301\t60\t200S300M\t*\t0\t0\t" + "A" * 500 + "\t*",
        "u2\t4\t*\t0\t0\t*\t*\t0\t0\t" + "C" * 400 + "\t*",
    ]) + "\n"
    p = tmp_path / "b.sam"
    p.write_text(sam)
    out = io.StringIO()
    ev.sam2break(str(p), out=out)
    txt = out.getvalue()
    assert "Number of unmapped contigs: 1" in txt
    assert "Total length of unmapped contigs: 400" in txt
    assert "Number of break points: 1" in txt
    # gap of 100 ref / 0 query < 500 -> patched, no break remains
    assert "patching gaps short than 500bp: 0" in txt
    assert "Mapped N50: " in txt


def test_asqg2mag(tmp_path):
    asqg = "\n".join([
        "HT\tVN:i:1",
        "VT\tv0\tACGTACGTAC",
        "VT\tv1\tGTACGGGGTT",
        # v0[6..9] overlaps v1[0..3], end-to-end, len 4
        "ED\tv0 v1 6 9 10 0 3 10 0 0".replace(" ", "\t"),
    ]) + "\n"
    p = tmp_path / "g.asqg"
    p.write_text(asqg)
    out = io.StringIO()
    ev.asqg2mag(str(p), out)
    lines = out.getvalue().strip().split("\n")
    # v1 has index 1 -> idd = 1<<1|0 = 2
    assert lines[0] == ">0:1\t1\t.\t2,4;"
    assert lines[1] == "ACGTACGTAC"
    assert lines[2] == ">2:3\t1\t1,4;\t."
    assert lines[3] == "GTACGGGGTT"
