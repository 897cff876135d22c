"""Device (TPU) BCR multi-string BWT construction.

The reference's production builder (/root/reference/bcr.c:378-460) inserts
one column of symbols per cycle into the growing partial BWT, keeping reads
sorted with a per-class radix sort and rewriting an RLE rope.  On TPU the
whole cycle collapses to fixed-shape vector passes (see construct/bcr.py for
the numpy oracle and the correctness argument):

  * insert positions  t = C[c] + rank_c(B, pos)  are provably DISTINCT and
    monotone within a class (the partial-BWT entry at a read's position is
    exactly the symbol it inserts next), so no sort of any kind is needed —
    reads never have to be reordered, the per-read state is just `pos`;
  * rank is a rebuilt blocked-occ (one [NB,6] count + cumsum) plus an
    [m,128] block gather — the same layout the query index uses;
  * the dense insert is an indicator scatter + tiled cumsum + one
    N-element monotone gather (old_idx = y - #inserts_at_or_before(y)).

Complexity is O(N * Lmax) element traffic like the reference's rll rewrite,
but each cycle is ~10 large VPU ops instead of a pointer walk, and the whole
build is ONE jit with a lax.fori_loop over cycles — no per-cycle dispatch.
Unlike the prefix-doubling builder (suffix_jax.py) there is no whole-text
lax.sort, so the working set stays O(N) bytes and scales to multi-hundred-
megabase texts in HBM.
"""

from functools import partial

import numpy as np

from fermi_tpu import jaxcfg  # noqa: F401

import jax
import jax.numpy as jnp

from .suffix_jax import _tiled_cumsum


@partial(jax.jit, static_argnames=("N",))
def _bcr_cycles(rev, lens, N: int):
    """Run all BCR cycles; returns the length-N multi-string BWT.

    rev : [Lmax+2, m] uint8 — rev[j, k] = seqs[k][len_k - j] (row 0 unused,
          rows past a read's end are 0 = sentinel).
    lens: [m] int32 read lengths.
    N   : total BWT length = sum(lens) + m (static).
    """
    Lmax = rev.shape[0] - 2
    m = rev.shape[1]
    NB = (N + 127) // 128
    NP = NB * 128                  # block-aligned capacity
    i32 = jnp.int32
    jN = jnp.arange(NP, dtype=i32)
    j128 = jnp.arange(128, dtype=i32)

    # cycle-0 state: sentinels occupy B[0..m) in read order, BWT entry =
    # last char of each read
    B0 = jnp.zeros(NP, jnp.uint8).at[jnp.arange(m)].set(rev[1])
    A0 = jnp.zeros(6, i32).at[0].set(m)
    pos0 = jnp.arange(m, dtype=i32)
    n0 = i32(m)

    def body(j, st):
        B, A, pos, n = st
        alive = lens >= j
        c = jax.lax.dynamic_index_in_dim(rev, j, keepdims=False).astype(i32)
        v = jax.lax.dynamic_index_in_dim(rev, j + 1, keepdims=False)

        # blocked occ of B[:n] (stale bytes past n masked to class 6)
        Bm = jnp.where(jN < n, B, jnp.uint8(6))
        blocks = Bm.reshape(NB, 128)
        cnt = jnp.stack([(blocks == cc).sum(axis=1, dtype=i32)
                         for cc in range(6)], axis=1)            # [NB, 6]
        occ = jnp.concatenate(
            [jnp.zeros((1, 6), i32),
             jnp.stack([_tiled_cumsum(cnt[:, cc]) for cc in range(6)],
                       axis=1)], axis=0)                          # [NB+1, 6]

        # rank_c(B, pos): block row gather + masked within-block count
        blk, off = pos >> 7, pos & 127
        rows = blocks[blk]                                        # [m, 128]
        within = ((rows == c[:, None].astype(jnp.uint8))
                  & (j128[None, :] < off[:, None])).sum(axis=1, dtype=i32)
        rank = occ[blk, c] + within

        # class offsets AFTER this cycle's inserts (reference set_bwt order)
        A = A + jnp.sum(jax.nn.one_hot(c, 6, dtype=i32)
                        * alive[:, None], axis=0)
        C = jnp.concatenate([jnp.zeros(1, i32), jnp.cumsum(A)[:5]])
        t = jnp.where(alive, C[c] + rank, i32(NP))                # drops

        # dense insert: B'[t_i] = v_i, everything else shifts up by the
        # number of inserts at-or-before it (t distinct -> ind is 0/1)
        ind = jnp.zeros(NP, i32).at[t].add(1, mode="drop")
        nb = _tiled_cumsum(ind)
        moved = B[jnp.clip(jN - nb, 0, NP - 1)]
        B = jnp.where(ind > 0, jnp.uint8(0), moved).at[t].set(v, mode="drop")
        pos = jnp.where(alive, t, pos)
        n = n + jnp.sum(alive, dtype=i32)
        # x64 mode promotes some reductions; pin the carry dtypes
        return B, A.astype(i32), pos.astype(i32), n.astype(i32)

    B, _, _, n = jax.lax.fori_loop(1, Lmax + 1, body, (B0, A0, pos0, n0))
    return B, n


def bcr_bwt_device(seqs: list[np.ndarray]) -> np.ndarray:
    """Multi-string BWT of nt6 reads on the device; byte-identical to
    suffix.multistring_bwt(build_text(seqs, both_strands=False,
    trim_palindrome=False)) and to the reference's ksa/bcr builders."""
    m = len(seqs)
    if m == 0:
        return np.zeros(0, np.uint8)
    lens = np.array([len(s) for s in seqs], np.int64)
    if (lens == 0).any():
        raise ValueError("empty read")
    Lmax = int(lens.max())
    N = int((lens + 1).sum())
    rev = np.zeros((Lmax + 2, m), np.uint8)
    for k, s in enumerate(seqs):
        rev[1: lens[k] + 1, k] = s[::-1]
    B, n = _bcr_cycles(jnp.asarray(rev), jnp.asarray(lens, jnp.int32), N)
    assert int(n) == N, (int(n), N)
    return np.asarray(B)[:N]
