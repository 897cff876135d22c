"""Distributed-layer tests on the virtual 8-device CPU mesh (conftest).

Covers the dist/ module end-to-end: arbitrary dp×tp meshes, tp-sharded rank
parity, the FULL sharded SMEM state-machine kernel vs the single-device
path, and the distributed merge (dp-sharded gap walks + device interleave)
vs the host fm_merge — all byte-equal assertions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fermi_tpu.core import dna
from fermi_tpu.construct import suffix
from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.dist import sharded as sh

from util import random_reads


def _index_from(reads_txt):
    seqs = [dna.encode(s) for s in reads_txt]
    bwt = suffix.multistring_bwt(suffix.build_text(seqs))
    return FMDIndex.from_bwt(bwt), seqs, bwt


@pytest.fixture(scope="module")
def setup():
    idx_reads = random_reads(160, seed=5, with_genome=True, genome_len=4000)
    qry = random_reads(50, seed=21, with_genome=True, genome_len=4000)
    rng = np.random.default_rng(33)
    qmut = []
    for s in qry:
        b = list(s)
        for _ in range(rng.integers(0, 3)):
            b[rng.integers(0, len(b))] = "ACGT"[rng.integers(0, 4)]
        qmut.append("".join(b))
    index, _, bwt = _index_from(idx_reads)
    qseqs = [dna.encode(s) for s in qmut]
    return index, bwt, qseqs


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2)])
def test_make_mesh_arbitrary_shapes(dp, tp):
    mesh = sh.make_mesh(dp=dp, tp=tp)
    assert mesh.shape["dp"] == dp and mesh.shape["tp"] == tp


def test_make_mesh_rejects_oversize():
    with pytest.raises(ValueError):
        sh.make_mesh(dp=8, tp=2)


@pytest.mark.parametrize("tp", [2, 8])
def test_tp_sharded_rank_parity(setup, tp):
    index, _, _ = setup
    mesh = sh.make_mesh(dp=8 // tp, tp=tp)
    arrays = sh.shard_index(index, mesh)
    n = int(np.asarray(index.mcnt[0]))
    rng = np.random.default_rng(0)
    ks = rng.integers(0, n + 1, 64).astype(np.int64)

    from functools import partial
    from jax.sharding import PartitionSpec as P
    from fermi_tpu.dist.sharded import shard_map

    @partial(shard_map, mesh=mesh,
             in_specs=(P("tp", None), P("tp", None), P(), P(), P("dp")),
             out_specs=P("dp", None))
    def run(packed_l, occ_l, cnt, mcnt, k):
        view = sh._TpIndexView(packed_l, occ_l, cnt, mcnt)
        return view.rank6(k)

    got = np.asarray(run(*arrays, jnp.asarray(ks.astype(index.idtype))))
    want = np.asarray(index.rank6(jnp.asarray(ks)))
    assert (got == want).all()


@pytest.mark.parametrize("tp", [2])
def test_tp_sharded_lf_parity(setup, tp):
    index, _, _ = setup
    mesh = sh.make_mesh(dp=8 // tp, tp=tp)
    arrays = sh.shard_index(index, mesh)
    n = int(np.asarray(index.mcnt[0]))
    rng = np.random.default_rng(1)
    ks = rng.integers(0, n, 64).astype(np.int64)

    from functools import partial
    from jax.sharding import PartitionSpec as P
    from fermi_tpu.dist.sharded import shard_map

    @partial(shard_map, mesh=mesh,
             in_specs=(P("tp", None), P("tp", None), P(), P(), P("dp")),
             out_specs=(P("dp"), P("dp")))
    def run(packed_l, occ_l, cnt, mcnt, k):
        view = sh._TpIndexView(packed_l, occ_l, cnt, mcnt)
        return view.lf(k)

    gc, gk = map(np.asarray, run(*arrays, jnp.asarray(ks.astype(index.idtype))))
    wc, wk = map(np.asarray, index.lf(jnp.asarray(ks)))
    assert (gc == wc).all() and (gk == wk).all()


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_smem_matches_single_device(setup, dp, tp):
    from fermi_tpu.search.smem import smem_all

    index, _, qseqs = setup
    mesh = sh.make_mesh(dp=dp, tp=tp)
    want = smem_all(index, qseqs)
    eng = sh.ShardedSMEM(index, mesh)
    for self_match in (False, True):
        got = eng.smem_all(qseqs, self_match=self_match)
        want = smem_all(index, qseqs, self_match=self_match)
        assert got == want, (dp, tp, self_match)


def test_sharded_smem_overflow_ladder(setup):
    """Tiny buffers force the redo ladder through the sharded kernel too."""
    from fermi_tpu.search.smem import smem_all

    index, _, qseqs = setup
    mesh = sh.make_mesh(dp=4, tp=2)
    eng = sh.ShardedSMEM(index, mesh)
    got = eng.smem_all(qseqs, maxi=4, maxm=8)
    assert got == smem_all(index, qseqs)


@pytest.mark.parametrize("dp,tp", [(4, 2), (8, 1)])
def test_distributed_merge_byte_parity(dp, tp):
    from fermi_tpu.algos.merge import fm_merge

    r0 = random_reads(60, seed=7, with_genome=True, genome_len=1500)
    r1 = random_reads(40, seed=8, with_genome=True, genome_len=1500)
    e0, _, bwt0 = _index_from(r0)
    e1, _, bwt1 = _index_from(r1)
    want = fm_merge(e0, bwt0, e1, bwt1)
    mesh = sh.make_mesh(dp=dp, tp=tp)
    got = sh.fm_merge_sharded(e0, bwt0, e1, bwt1, mesh, batch=64)
    assert np.array_equal(got, want)
    # merged index must be a valid BWT of the union (rank totals agree)
    em = FMDIndex.from_bwt(got)
    assert int(np.asarray(em.mcnt[1])) == (int(np.asarray(e0.mcnt[1]))
                                           + int(np.asarray(e1.mcnt[1])))


def test_interleave_device_matches_numpy():
    from fermi_tpu.algos.merge import merge_bwts

    rng = np.random.default_rng(2)
    n0, n1 = 777, 555
    bits = np.zeros(n0 + n1, bool)
    bits[rng.choice(n0 + n1, n1, replace=False)] = True
    bwt0 = rng.integers(0, 6, n0).astype(np.uint8)
    bwt1 = rng.integers(0, 6, n1).astype(np.uint8)
    mesh = sh.make_mesh(dp=8, tp=1)
    got = sh.interleave_device(mesh, bwt0, bwt1, bits)
    assert np.array_equal(got, merge_bwts(bwt0, bwt1, bits))


def test_build_fmd_distributed_byte_parity():
    """dp-sharded block build + hierarchical mesh merges == direct build
    of the concatenation (SURVEY P2)."""
    from fermi_tpu.construct import suffix
    from fermi_tpu.core import dna
    from fermi_tpu.dist.sharded import build_fmd_distributed
    from tests.util import random_reads

    reads = random_reads(60, min_len=40, max_len=70, seed=3,
                         with_genome=True, genome_len=900)
    enc = [dna.encode(s) for s in reads]
    # reference: one build over all reads (reads + rc interleaved)
    whole = suffix.build_text(enc)
    want = suffix.multistring_bwt(whole)
    # 4 shards in order
    per = (len(enc) + 3) // 4
    shards = [suffix.build_text(enc[i * per:(i + 1) * per])
              for i in range(4) if enc[i * per:(i + 1) * per]]
    mesh = sh.make_mesh(dp=4, tp=2)
    got = build_fmd_distributed(shards, mesh)
    assert np.array_equal(got, want)
