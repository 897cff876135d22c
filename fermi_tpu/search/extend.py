"""Batched FM-index primitives: backward search and sequence retrieval.

Each function processes a whole batch of queries as array lanes; per-lane
early termination is a mask, the loop bound is the padded length. Semantics
follow reference exact.c (fm_backward_search:7-23, fm_retrieve:59-70).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fermi_tpu.index.fmd import FMDIndex


@partial(jax.jit, static_argnames=("max_len",))
def backward_search(index: FMDIndex, queries: jnp.ndarray, lengths: jnp.ndarray,
                    max_len: int):
    """Exact-match interval for each query string.

    queries: uint8 [B, max_len] right-aligned is NOT required — strings are
    processed from their last base; pad tail with zeros and give true lengths.
    Returns (sa_beg, sa_end, count): int [B]; count==0 means no match.
    """
    B = queries.shape[0]
    idt = index.idtype
    last = jnp.take_along_axis(queries, (lengths - 1)[:, None], axis=1)[:, 0]
    lasti = last.astype(jnp.int32)
    k = index.cnt[lasti].astype(idt)
    l = (index.cnt[lasti + 1] - 1).astype(idt)
    alive = lengths > 0

    def body(i, carry):
        k, l, alive = carry
        # process position lengths-2-i (from the right)
        pos = lengths - 2 - i
        active = alive & (pos >= 0)
        c = jnp.take_along_axis(queries, jnp.maximum(pos, 0)[:, None], axis=1)[:, 0]
        ci = c.astype(jnp.int32)
        ok = index.rank6(k)          # rank over [0..k-1]
        ol = index.rank6(l + 1)      # rank over [0..l]
        nk = index.cnt[ci] + jnp.take_along_axis(ok, ci[:, None], axis=1)[:, 0]
        nl = index.cnt[ci] + jnp.take_along_axis(ol, ci[:, None], axis=1)[:, 0] - 1
        k = jnp.where(active, nk, k)
        l = jnp.where(active, nl, l)
        alive = alive & jnp.where(active, nk <= nl, True)
        return k, l, alive

    k, l, alive = jax.lax.fori_loop(0, max_len - 1, body, (k, l, alive))
    ok = alive & (k <= l)
    cnt = jnp.where(ok, l - k + 1, 0)
    return k, l, cnt


@partial(jax.jit, static_argnames=("max_len",))
def retrieve(index: FMDIndex, x: jnp.ndarray, max_len: int):
    """Retrieve the x-th sequence by LF-walking from sentinel rank x
    (reference fm_retrieve). Returns (seq, length, prev_rank):
    seq uint8 [B, max_len] — the sequence REVERSED (as the walk emits it);
    prev_rank — the sentinel rank reached at the walk's end (the return value
    of fm_retrieve, used by seqsort).
    """
    B = x.shape[0]
    idt = index.idtype
    k = x.astype(idt)
    out = jnp.zeros((B, max_len), dtype=jnp.uint8)
    length = jnp.zeros(B, dtype=jnp.int32)
    done = jnp.zeros(B, dtype=bool)

    def body(i, carry):
        k, out, length, done = carry
        # index.lf gives k' = cnt[c] + rank6(k)[c], which equals the
        # reference's cnt[c] + rank_inclusive(k)[c] - 1 (exact.c:66)
        c, kp = index.lf(k)
        hit_end = c == 0
        emit = ~done & ~hit_end
        out = out.at[:, i].set(jnp.where(emit, c, 0))
        length = length + emit.astype(jnp.int32)
        k = jnp.where(done, k, kp)
        done = done | hit_end
        return k, out, length, done

    k, out, length, done = jax.lax.fori_loop(0, max_len, body,
                                             (k, out, length, done))
    return out, length, k


def retrieve_strings(index: FMDIndex, ids, max_len: int = 512):
    """Host convenience: retrieve sequences as forward nt6 numpy arrays."""
    ids = jnp.asarray(np.asarray(ids, dtype=np.int64))
    seq_rev, lengths, k = retrieve(index, ids, max_len)
    seq_rev = np.asarray(seq_rev)
    lengths = np.asarray(lengths)
    return [seq_rev[i, :lengths[i]][::-1].copy() for i in range(len(ids))], np.asarray(k)
