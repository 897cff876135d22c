"""Out-of-core blocked record cache (.fmd.blk): parity + bounded RSS.

The `-M` path: fmblk_build streams a compressed .fmd into the interleaved
record layout the native engines use (fmindex.h), and every engine can mmap
it instead of receiving resident arrays.  Parity oracle: the same engines
on the dense in-RAM path (reference counterpart rld_restore_mmap,
rld.c:327-346; every command takes -M, cmd.c:54-69).
"""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

from fermi_tpu import rld
from fermi_tpu.algos.hostindex import HostIndex
from fermi_tpu.algos.seqsort import seqsort_native
from fermi_tpu.algos.unitig import fm6_unitig_native
from fermi_tpu.construct import suffix
from fermi_tpu.core import dna
from fermi_tpu.index.blkidx import BlkIndex, ensure_blk

from util import random_reads


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    reads = random_reads(900, seed=5, with_genome=True, genome_len=9000,
                         min_len=60, max_len=100)
    text = suffix.build_text([dna.encode(r) for r in reads],
                             trim_palindrome=False)
    bwt = suffix.multistring_bwt(text)
    path = str(tmp_path_factory.mktemp("blk") / "t.fmd")
    rld.write_fmd(rld.Runs.from_bwt(bwt), path)
    return path, bwt, reads


def test_blk_build_and_info(built):
    path, bwt, _ = built
    blk = ensure_blk(path)
    assert blk.total == len(bwt)
    assert blk.cnt[6] == len(bwt)
    assert blk.n_rows == (len(bwt) + 127) // 128 + 1
    # rebuilding is a no-op when fresh
    blk2 = ensure_blk(path)
    assert blk2.n_seqs == blk.n_seqs


def test_blk_records_match_dense(built):
    """The cache's records must be byte-identical to what Index::setup
    builds from the dense arrays (same occ rows, same sub tables)."""
    path, bwt, _ = built
    blk = ensure_blk(path)
    raw = np.fromfile(blk.path, np.uint8)[4096:].reshape(-1, 192)
    # dense reference layout
    n = len(bwt)
    nb = (n + 127) // 128
    padded = np.full((nb + 1) * 128, 6, np.uint8)
    padded[:n] = bwt
    blocks = padded.reshape(nb + 1, 128)
    assert np.array_equal(raw[:, :128], blocks)
    hist = np.zeros((nb + 1, 8), np.int64)
    for c in range(6):
        hist[:, c] = (blocks == c).sum(axis=1)
    occ = np.zeros_like(hist)
    np.cumsum(hist[:-1], axis=0, out=occ[1:])
    got_occ = raw[:, 128:152].view(np.uint32).reshape(-1, 6)
    assert np.array_equal(got_occ, occ[:, :6].astype(np.uint32))
    # sub-block tables: cumulative counts over bytes [0,32s)
    sub = raw[:, 152:170].reshape(-1, 3, 6)
    c = np.zeros((nb + 1, 8), np.int64)
    for s in range(3):
        seg = blocks[:, s * 32:(s + 1) * 32]
        for j in range(8):
            c[:, j] += (seg == j).sum(axis=1)
        assert np.array_equal(sub[:, s, :], c[:, :6].astype(np.uint8)), s


def test_blk_engine_parity(built):
    path, bwt, reads = built
    blk = ensure_blk(path)
    host = HostIndex(bwt)

    # seqsort
    s_blk = seqsort_native(blk, verbose=False)
    s_host = seqsort_native(host, verbose=False)
    assert np.array_equal(s_blk, s_host)

    # unitig (with rank array, like the pipeline)
    u_blk = fm6_unitig_native(blk, 40, s_blk)
    u_host = fm6_unitig_native(host, 40, s_host)
    assert u_blk == u_host

    # SMEM
    from fermi_tpu.search.smem import smem_all_native
    qs = [dna.encode(r) for r in reads[:50]]
    m_blk = smem_all_native(blk, qs, self_match=True)
    m_host = smem_all_native(host, qs, self_match=True)
    assert m_blk == m_host

    # EC collect
    from fermi_tpu.algos.correct import collect_solid_kmers_native
    cb = collect_solid_kmers_native(blk, 17, 3)
    ch = collect_solid_kmers_native(host, 17, 3)
    assert cb[3] == ch[3]
    key = lambda r: sorted(zip(r[0].tolist(), r[1].tolist(), r[2].tolist()))
    assert key(cb) == key(ch)


def _cli(argv):
    import io

    from fermi_tpu.cli.main import main

    raw = io.BytesIO()
    wrap = io.TextIOWrapper(raw, encoding="latin1", newline="")
    old = sys.stdout
    sys.stdout = wrap
    try:
        main(argv)
        wrap.flush()
    finally:
        sys.stdout = old
    return raw.getvalue()


def test_cli_dash_M_parity(built, tmp_path):
    """Every `-M`-wired command must produce identical output off the
    mmapped cache (reference: -M on all commands, cmd.c:54-69)."""
    path, bwt, reads = built
    fq = str(tmp_path / "q.fq")
    with open(fq, "w") as f:
        for i, r in enumerate(reads[:40]):
            f.write(f"@q{i}\n{r}\n+\n{'I' * len(r)}\n")

    assert _cli(["exact", "-M", path, fq]) == _cli(["exact", path, fq])
    assert (_cli(["unpack", "-M", "-i", "0", "-i", "5", path])
            == _cli(["unpack", "-i", "0", "-i", "5", path]))
    import contextlib
    import io as _io

    rank_m = _cli(["seqrank", "-M", "-t", "2", path])
    rank_d = _cli(["seqrank", path])
    assert rank_m == rank_d
    rank_file = str(tmp_path / "t.rank")
    with open(rank_file, "wb") as f:
        f.write(rank_m)
    assert (_cli(["unitig", "-M", "-l", "40", "-r", rank_file, path])
            == _cli(["unitig", "-l", "40", "-r", rank_file, path]))
    with contextlib.redirect_stderr(_io.StringIO()):
        assert _cli(["chkbwt", "-M", "-r", "-p", path]) \
            == _cli(["chkbwt", "-r", "-p", path])
        assert (_cli(["correct", "-M", "-t", "2", path, fq])
                == _cli(["correct", "-t", "2", path, fq]))
        contigs = str(tmp_path / "p0.mag")
        with open(contigs, "wb") as f:
            f.write(_cli(["unitig", "-l", "40", "-r", rank_file, path]))
        assert (_cli(["remap", "-M", "-r", rank_file, path, contigs])
                == _cli(["remap", "-r", rank_file, path, contigs]))


def _vm_data_script(body: str, headroom_mb: int) -> str:
    """Script that measures its own VmData after imports, caps RLIMIT_DATA
    at VmData + headroom, then runs `body`."""
    return f"""
import ctypes, resource
import numpy as np
from fermi_tpu.index.blkidx import BlkIndex
from fermi_tpu.search.smem import smem_all_native
from fermi_tpu.algos.hostindex import HostIndex
from fermi_tpu import rld, native
native.get_lib()
vmdata = 0
with open('/proc/self/status') as f:
    for line in f:
        if line.startswith('VmData'):
            vmdata = int(line.split()[1]) << 10
cap = vmdata + ({headroom_mb} << 20)
resource.setrlimit(resource.RLIMIT_DATA, (cap, cap))
{body}
"""


@pytest.mark.slow
def test_blk_bounded_rss(tmp_path):
    """SMEM off a .fmd.blk cache under an anonymous-memory cap far below
    the dense index size must succeed (records are file-backed, evictable);
    the dense in-RAM path under the same cap must fail.  This is the `-M`
    memory model: index size no longer bounds process memory."""
    from fermi_tpu import native

    lib = native.get_lib()
    h = lib.frld_enc_open(6, 3)
    rng = np.random.default_rng(7)
    total = 0
    while total < 120_000_000:
        n = 1 << 18
        lens = rng.geometric(0.25, n).astype(np.int64)
        syms = rng.integers(0, 6, n).astype(np.uint8)
        lib.frld_enc_put(
            h, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            syms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
        total += int(lens.sum())
    path = str(tmp_path / "big.fmd")
    assert lib.frld_enc_finish(h, path.encode()) == 0
    blk = ensure_blk(path)
    assert blk.total == total

    qs = "[np.random.default_rng(3).integers(1, 5, 24).astype(np.uint8) for _ in range(64)]"
    run = lambda body: subprocess.run(
        [sys.executable, "-c", _vm_data_script(body, 100)],
        capture_output=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # blk path: must complete under the cap
    ok = run(f"""
blk = BlkIndex({blk.path!r})
res = smem_all_native(blk, {qs})
print("OK", sum(len(r) for r in res))
""")
    assert ok.returncode == 0, ok.stderr.decode()[-800:]
    # dense path: expanding + building resident records must exceed the cap
    bad = run(f"""
runs = rld.read_fmd({path!r})
host = HostIndex(runs.expand())
res = smem_all_native(host, {qs})
print("UNEXPECTED", sum(len(r) for r in res))
""")
    assert bad.returncode != 0, bad.stdout.decode()[:200]
