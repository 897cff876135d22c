"""IO-layer regression tests: gzip subprocess reader error handling.

The reference chain reads .gz through zlib (kseq.h) and fails on corrupt
members; our `gzip -dc` subprocess path must not turn a truncated input
into a silent clean EOF (ADVICE round 4, medium)."""
import gzip
import pytest

from fermi_tpu.core.fastx import read_fastx


def test_truncated_gzip_raises(tmp_path):
    p = tmp_path / "x.fq.gz"
    data = b"".join(b"@r%d\nACGTACGTACGT\n+\nIIIIIIIIIIII\n" % i
                    for i in range(5000))
    full = gzip.compress(data)
    p.write_bytes(full[: len(full) // 2])  # truncated mid-member
    with pytest.raises(OSError):
        list(read_fastx(str(p)))


def test_intact_gzip_ok(tmp_path):
    p = tmp_path / "y.fq.gz"
    p.write_bytes(gzip.compress(b"@r1\nACGT\n+\nIIII\n"))
    recs = list(read_fastx(str(p)))
    assert len(recs) == 1 and recs[0].seq == "ACGT"


def test_early_abandon_no_error(tmp_path):
    # breaking out of iteration kills the child; close() must not raise
    p = tmp_path / "z.fq.gz"
    data = b"".join(b"@r%d\nACGT\n+\nIIII\n" % i for i in range(200000))
    p.write_bytes(gzip.compress(data))
    it = read_fastx(str(p))
    next(it)
    it.close()
