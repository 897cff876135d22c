"""chkbwt-style property tests over the rank kernels.

The reference's de-facto index unit test is `fermi chkbwt -r`: decode the
whole BWT and cross-validate rank at every position against running symbol
counts (cmd.c:85-116).  Here the same property is asserted for all three
rank paths — dense one-hot (oracle), nibble-packed XLA SWAR, and the Pallas
kernel (interpreter mode on the CPU test backend) — at every position of a
random BWT, plus block-boundary edge cases.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fermi_tpu.index.fmd import FMDIndex, _swar_rank_count
from fermi_tpu.ops import rank_pallas


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(42)
    # non-uniform symbol mix incl. long runs (RLE-ish) and rare symbols
    parts = [rng.integers(0, 6, 3000).astype(np.uint8),
             np.full(700, 3, np.uint8),
             np.full(5, 5, np.uint8),
             rng.integers(1, 5, 2000).astype(np.uint8)]
    bwt = np.concatenate(parts)
    idx = FMDIndex.from_bwt(bwt)
    n = bwt.size
    want = np.zeros((n + 1, 6), np.int64)
    for c in range(6):
        want[1:, c] = np.cumsum(bwt == c)
    ks = np.arange(n + 1, dtype=np.int64)
    return idx, ks, want


def test_dense_rank_full_sweep(case):
    idx, ks, want = case
    got = np.asarray(idx.rank6_dense(jnp.asarray(ks)))
    assert (got == want).all()


def test_packed_swar_rank_full_sweep(case):
    idx, ks, want = case
    blk = ks >> 7
    off = (ks & 127).astype(np.int32)
    words = np.asarray(idx.bwt_packed)[blk]
    within = np.asarray(_swar_rank_count(jnp.asarray(words),
                                         jnp.asarray(off)))
    base = np.asarray(idx.occ)[blk][:, :6]
    assert (base + within == want).all()


def test_rank6_default_matches_oracle(case):
    idx, ks, want = case
    got = np.asarray(idx.rank6(jnp.asarray(ks)))
    assert (got == want).all()


def test_pallas_kernel_full_sweep(case):
    idx, ks, want = case
    blk = ks >> 7
    off = (ks & 127).astype(np.int32)
    words = np.asarray(idx.bwt_packed)[blk]
    cnts = np.asarray(rank_pallas.rank_block_counts(
        jnp.asarray(words.astype(np.int32)), jnp.asarray(off),
        interpret=True))
    base = np.asarray(idx.occ)[blk][:, :6]
    assert (cnts[:, 6:] == 0).all()
    assert (base + cnts[:, :6] == want).all()


def test_rank_batched_shapes(case):
    """rank6 over [B, W] query matrices (the SMEM kernel's shape)."""
    idx, ks, want = case
    rng = np.random.default_rng(3)
    sel = rng.integers(0, len(ks), (64, 32))
    got = np.asarray(idx.rank6(jnp.asarray(ks[sel])))
    assert (got == want[sel]).all()


def test_mcnt_consistency(case):
    """Final rank row equals the marginal counts (chkbwt's last check)."""
    idx, ks, want = case
    total = np.asarray(idx.rank6(jnp.asarray(ks[-1:])))[0]
    assert (total == np.asarray(idx.mcnt)[1:7]).all()
