"""uint32 index domain: the 2-4 Gsym tier (index/fmd.py _pick_idtype).

Indexes in [2^31, 2^32) symbols run every device kernel in uint32 instead
of (TPU-emulated) int64 and keep the fused rank row.  These tests force
the uint32 domain on small indexes (FERMI_TPU_IDX_DTYPE) and assert parity
with the default int32 path across the query kernels.
"""

import numpy as np
import pytest

from fermi_tpu.core import dna
from fermi_tpu.construct import suffix
from fermi_tpu.index import fmd as fmdmod
from fermi_tpu.index.fmd import FMDIndex

from util import random_reads


@pytest.fixture()
def force_uint32(monkeypatch):
    monkeypatch.setenv("FERMI_TPU_IDX_DTYPE", "uint32")


def monkeypatch_env_int32():
    # the force_uint32 fixture's monkeypatch restores the var at teardown
    import os
    os.environ["FERMI_TPU_IDX_DTYPE"] = "int32"


def _bwt(reads):
    text = suffix.build_text([dna.encode(s) for s in reads])
    return suffix.multistring_bwt(text)


def test_pick_idtype_thresholds():
    assert fmdmod._pick_idtype(1000) == np.int32
    assert fmdmod._pick_idtype(2**31) == np.uint32
    assert fmdmod._pick_idtype(2**32 - fmdmod.BLOCK - 1) == np.uint32
    assert fmdmod._pick_idtype(2**32) == np.int64


def test_rank_extend_parity(force_uint32):
    reads = random_reads(80, seed=3, with_genome=True, genome_len=3000)
    bwt = _bwt(reads)
    idx_u = FMDIndex.from_bwt(bwt)
    assert idx_u.idtype == np.uint32
    assert idx_u.fused is not None
    monkeypatch_env_int32()
    idx_i = FMDIndex.from_bwt(bwt)
    assert idx_i.idtype == np.int32

    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    ks = rng.integers(0, bwt.size + 1, 512)
    r_u = np.asarray(idx_u.rank6(jnp.asarray(ks.astype(np.uint32))))
    r_i = np.asarray(idx_i.rank6(jnp.asarray(ks.astype(np.int32))))
    np.testing.assert_array_equal(r_u.astype(np.int64), r_i.astype(np.int64))

    kb = rng.integers(0, bwt.size // 2, 128)
    sz = rng.integers(1, 50, 128)
    kf = rng.integers(0, bwt.size // 2, 128)
    for is_back in (True, False):
        out_u = idx_u.extend6(jnp.asarray(kb.astype(np.uint32)),
                              jnp.asarray(kf.astype(np.uint32)),
                              jnp.asarray(sz.astype(np.uint32)), is_back)
        out_i = idx_i.extend6(jnp.asarray(kb.astype(np.int32)),
                              jnp.asarray(kf.astype(np.int32)),
                              jnp.asarray(sz.astype(np.int32)), is_back)
        for a, b in zip(out_u, out_i):
            np.testing.assert_array_equal(
                np.asarray(a).astype(np.int64),
                np.asarray(b).astype(np.int64))


def test_smem_parity(force_uint32):
    from fermi_tpu.search import smem as sm

    idx_reads = random_reads(120, seed=11, with_genome=True, genome_len=3000)
    qry = random_reads(40, seed=12, with_genome=True, genome_len=3000)
    bwt = _bwt(idx_reads)
    idx_u = FMDIndex.from_bwt(bwt)
    assert idx_u.idtype == np.uint32
    monkeypatch_env_int32()
    idx_i = FMDIndex.from_bwt(bwt)

    seqs = [dna.encode(s) for s in qry]
    for self_match in (False, True):
        out_u = sm.smem_all(idx_u, seqs, self_match=self_match)
        out_i = sm.smem_all(idx_i, seqs, self_match=self_match)
        assert [[tuple(int(x) for x in m) for m in r] for r in out_u] == \
               [[tuple(int(x) for x in m) for m in r] for r in out_i]


def test_walks_parity(force_uint32):
    from fermi_tpu.search import extend

    import jax.numpy as jnp

    idx_reads = random_reads(60, seed=21, with_genome=True, genome_len=2000)
    bwt = _bwt(idx_reads)
    idx_u = FMDIndex.from_bwt(bwt)
    monkeypatch_env_int32()
    idx_i = FMDIndex.from_bwt(bwt)
    n_seqs = int(np.asarray(idx_i.mcnt[1]))
    ids = np.arange(0, n_seqs, 3, dtype=np.int64)

    out_u = extend.seqrank_walk(idx_u, jnp.asarray(ids.astype(np.uint32)),
                                max_iters=256)
    out_i = extend.seqrank_walk(idx_i, jnp.asarray(ids.astype(np.int32)),
                                max_iters=256)
    for a, b in zip(out_u, out_i):
        np.testing.assert_array_equal(np.asarray(a).astype(np.int64),
                                      np.asarray(b).astype(np.int64))

    # backward search parity
    qry = random_reads(30, seed=22, with_genome=True, genome_len=2000)
    seqs = [dna.encode(s) for s in qry]
    max_len = max(len(s) for s in seqs)
    q = np.zeros((len(seqs), max_len), np.uint8)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        q[i, :len(s)] = s
        lens[i] = len(s)
    bu = extend.backward_search(idx_u, jnp.asarray(q), jnp.asarray(lens),
                                max_len)
    bi = extend.backward_search(idx_i, jnp.asarray(q), jnp.asarray(lens),
                                max_len)
    # compare only matching lanes: (k, l) are undefined where cnt == 0
    cu, ci = np.asarray(bu[2]), np.asarray(bi[2])
    np.testing.assert_array_equal(cu.astype(np.int64), ci.astype(np.int64))
    hit = ci.astype(np.int64) > 0
    for a, b in zip(bu[:2], bi[:2]):
        np.testing.assert_array_equal(np.asarray(a)[hit].astype(np.int64),
                                      np.asarray(b)[hit].astype(np.int64))
