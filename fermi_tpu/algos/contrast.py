"""Contrast assembly support (reference cmp.c): select reads carrying k-mers
unique to one of two indexes.

The synchronized dual-index DFS becomes a level-synchronous dual BFS: one
batched extend6 on each index per level, host compaction. When one side's
interval dies the other side's subtree is harvested (collect_tips) by the
same frontier machinery.
"""

import numpy as np
import jax.numpy as jnp

from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.algos.correct import _extend_batched

SUF_LEN = 4


def _descend_all(e: FMDIndex, suf_len: int):
    """Intervals of all 4^suf_len suffixes, indexed like cmp.c descend():
    suffix id bits: base added at step i in bits [2i, 2i+2)."""
    kb = np.zeros(1, np.int64)
    kf = np.zeros(1, np.int64)
    sz = np.asarray([int(np.asarray(e.mcnt[0]))], np.int64)
    # first symbol via set_intv
    cnt = np.asarray(e.cnt)
    kb = cnt[1:5].astype(np.int64)
    kf = cnt[np.array([4, 3, 2, 1])].astype(np.int64)
    sz = (cnt[2:6] - cnt[1:5]).astype(np.int64)
    ids = np.arange(4, dtype=np.int64)
    for i in range(1, suf_len):
        KB, KF, SZ = _extend_batched(e, kb, kf, sz, 1 << 18)
        kb = KB[:, 1:5].reshape(-1)
        kf = KF[:, 1:5].reshape(-1)
        sz = SZ[:, 1:5].reshape(-1)
        ids = (ids[:, None] | (np.arange(4, dtype=np.int64) << (2 * i))).reshape(-1)
    order = np.argsort(ids, kind="stable")
    return kb[order], kf[order], sz[order]


def collect_tips_batch(e: FMDIndex, kb, kf, sz, bits: np.ndarray,
                       batch=1 << 18):
    """Mark sentinel ranks of all reads reachable by backward extension from
    the given intervals (cmp.c:22-43), whole frontier at once."""
    kb = np.asarray(kb, np.int64)
    kf = np.asarray(kf, np.int64)
    sz = np.asarray(sz, np.int64)
    while len(kb):
        KB, KF, SZ = _extend_batched(e, kb, kf, sz, batch)
        # sentinel hits: ranges [KB[:,0], KB[:,0]+SZ[:,0])
        s0 = SZ[:, 0]
        hit = s0 > 0
        for b, n in zip(KB[hit, 0], s0[hit]):
            bits[b: b + n] = True
        kb = KB[:, 1:5].reshape(-1)
        kf = KF[:, 1:5].reshape(-1)
        csz = SZ[:, 1:5].reshape(-1)
        keep = csz > 0
        kb, kf, sz = kb[keep], kf[keep], csz[keep]


def fm6_contrast(e0: FMDIndex, e1: FMDIndex, kmer: int, min_occ: int):
    """Returns (sub0, sub1): bool arrays over sentinel-rank space marking
    reads that contain a k-mer absent from the other index."""
    n0 = int(np.asarray(e0.mcnt[1]))
    n1 = int(np.asarray(e1.mcnt[1]))
    sub0 = np.zeros(n0, bool)
    sub1 = np.zeros(n1, bool)
    kb0, kf0, sz0 = _descend_all(e0, SUF_LEN)
    kb1, kf1, sz1 = _descend_all(e1, SUF_LEN)
    # paired frontier: keep entries where both sides were explored
    depth = SUF_LEN
    while len(kb0) and depth < kmer:
        dead0 = sz0 == 0
        dead1 = sz1 == 0
        if dead0.any():
            collect_tips_batch(e1, kb1[dead0], kf1[dead0], sz1[dead0], sub1)
        if dead1.any():
            collect_tips_batch(e0, kb0[dead1], kf0[dead1], sz0[dead1], sub0)
        both = ~dead0 & ~dead1
        kb0, kf0, sz0 = kb0[both], kf0[both], sz0[both]
        kb1, kf1, sz1 = kb1[both], kf1[both], sz1[both]
        if not len(kb0):
            break
        KB0, KF0, SZ0 = _extend_batched(e0, kb0, kf0, sz0, 1 << 18)
        KB1, KF1, SZ1 = _extend_batched(e1, kb1, kf1, sz1, 1 << 18)
        c0 = SZ0[:, 1:5].reshape(-1)
        c1 = SZ1[:, 1:5].reshape(-1)
        keep = (c0 >= min_occ) | (c1 >= min_occ)
        kb0 = KB0[:, 1:5].reshape(-1)[keep]
        kf0 = KF0[:, 1:5].reshape(-1)[keep]
        sz0 = c0[keep]
        kb1 = KB1[:, 1:5].reshape(-1)[keep]
        kf1 = KF1[:, 1:5].reshape(-1)[keep]
        sz1 = c1[keep]
        depth += 1
    # final level: entries at depth==kmer with a dead side still collect
    if len(kb0):
        dead0 = sz0 == 0
        dead1 = sz1 == 0
        if dead0.any():
            collect_tips_batch(e1, kb1[dead0], kf1[dead0], sz1[dead0], sub1)
        if dead1.any():
            collect_tips_batch(e0, kb0[dead1], kf0[dead1], sz0[dead1], sub0)
    return sub0, sub1


def sub_conv(sub: np.ndarray, rank: np.ndarray) -> np.ndarray:
    """Rank-space selection -> read-id-space (cmp.c:128-144)."""
    n = len(sub)
    out = np.zeros(n, bool)
    sel = np.flatnonzero(sub)
    ids = (rank[sel] >> np.uint64(2)).astype(np.int64)
    out[ids] = True
    # pair symmetry assert (cmp.c:141-142)
    assert np.array_equal(out[0::2], out[1::2]), "contrast pair asymmetry"
    return out
