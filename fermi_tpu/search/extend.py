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


def multi_backward_search(indexes, q):
    """Backward search across several indexes at once (reference
    exact.c:25-57 fm_multi_backward_search — present but with a disabled
    harness there). Tracks one (k, l) per index; an emptied index keeps
    LF-advancing its insert point so the final sums are the interval the
    MERGED index would report. Returns (sa_beg, sa_end, size) in merged
    coordinates, size 0 when no index matches.

    indexes: objects with rank6(k) -> counts over BWT[0..k-1] and cnt
    (FMDIndex or HostIndex). q: nt6 symbol sequence, searched right to
    left like the reference.
    """
    import numpy as np

    q = np.asarray(q)
    n = len(indexes)
    if n == 0 or q.size == 0:
        return 0, -1, 0
    def rank_c(e, k, c):
        return int(np.asarray(e.rank6(np.int64(k)))[..., c])

    c = int(q[-1])
    ks = [int(np.asarray(e.cnt[c])) for e in indexes]
    ls = [int(np.asarray(e.cnt[c + 1])) for e in indexes]
    done = [False] * n
    finished = 0
    for i in range(q.size - 2, -1, -1):
        c = int(q[i])
        for j, e in enumerate(indexes):
            cnt_c = int(np.asarray(e.cnt[c]))
            ok = rank_c(e, ks[j], c)
            if not done[j]:
                ol = rank_c(e, ls[j], c)
                ks[j] = cnt_c + ok
                ls[j] = cnt_c + ol
                if ks[j] == ls[j]:
                    done[j] = True
                    finished += 1
            else:
                ks[j] = ls[j] = cnt_c + ok
        if finished == n:
            break
    if finished == n:
        return 0, -1, 0
    sa_beg = sum(ks)
    sa_end = sum(ls) - 1
    return sa_beg, sa_end, sa_end - sa_beg + 1


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

    def cond(carry):
        i, k, out, length, done = carry
        return (i < max_len) & ~jnp.all(done)

    def body(carry):
        i, k, out, length, done = carry
        # index.lf gives k' = cnt[c] + rank6(k)[c], which equals the
        # reference's cnt[c] + rank_inclusive(k)[c] - 1 (exact.c:66)
        c, kp = index.lf(k)
        hit_end = c == 0
        emit = ~done & ~hit_end
        out = out.at[:, i].set(jnp.where(emit, c, 0))
        length = length + emit.astype(jnp.int32)
        k = jnp.where(done, k, kp)
        done = done | hit_end
        return i + 1, k, out, length, done

    _, k, out, length, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), k, out, length, done))
    return out, length, k


@partial(jax.jit, static_argnames=("max_len",))
def retrieve2(index: FMDIndex, x: jnp.ndarray, max_len: int):
    """Batched fm6_retrieve (exact.c:100-127): LF-walk from sentinel rank x
    while tracking the bi-interval of the read-so-far; ends with sentinel
    extensions that detect containment.

    Returns (seq_rev, length, k, kb, kf, sz, contained):
    k — the read's own sentinel rank; (kb, kf, sz) — bi-interval of the full
    read bounded by sentinels; contained — bit1: left-, bit2: right-contained.
    """
    B = x.shape[0]
    idt = index.idtype
    k = x.astype(idt)
    out = jnp.zeros((B, max_len), dtype=jnp.uint8)
    length = jnp.zeros(B, dtype=jnp.int32)
    done = jnp.zeros(B, dtype=bool)
    kb = jnp.zeros(B, idt)
    kf = jnp.zeros(B, idt)
    sz = jnp.zeros(B, idt)

    def cond(carry):
        i, k, out, length, done, kb, kf, sz = carry
        return (i < max_len) & ~jnp.all(done)

    def body(carry):
        i, k, out, length, done, kb, kf, sz = carry
        c, kp = index.lf(k)
        ci = c.astype(jnp.int32)
        hit_end = c == 0
        emit = ~done & ~hit_end
        out = out.at[:, i].set(jnp.where(emit, c, 0))
        length = length + emit.astype(jnp.int32)
        # interval update for emitting lanes
        first = length == 1  # this step emitted the first symbol
        skb, skf, ssz = index.set_intv(ci)
        KB, KF, SZ = index.extend6(kb, kf, sz, is_back=True)
        ekb = jnp.take_along_axis(KB, ci[:, None], axis=1)[:, 0]
        ekf = jnp.take_along_axis(KF, ci[:, None], axis=1)[:, 0]
        esz = jnp.take_along_axis(SZ, ci[:, None], axis=1)[:, 0]
        one = sz == 1
        nkb = jnp.where(first, skb, jnp.where(one, kp, ekb))
        nkf = jnp.where(first, skf, jnp.where(one, kf, ekf))
        nsz = jnp.where(first, ssz, jnp.where(one, sz, esz))
        kb = jnp.where(emit, nkb, kb)
        kf = jnp.where(emit, nkf, kf)
        sz = jnp.where(emit, nsz, sz)
        k = jnp.where(done, k, kp)
        done = done | hit_end
        return i + 1, k, out, length, done, kb, kf, sz

    _, k, out, length, done, kb, kf, sz = jax.lax.while_loop(
        cond, body, (jnp.int32(0), k, out, length, done, kb, kf, sz))
    # final sentinel extensions (left containment then right)
    contained = jnp.zeros(B, jnp.int32)
    KB, KF, SZ = index.extend6(kb, kf, sz, is_back=True)
    left = (SZ[:, 0] != sz) & (sz != 1)
    kb2 = jnp.where(sz == 1, k, KB[:, 0])
    kf2 = jnp.where(sz == 1, kf, KF[:, 0])
    sz2 = jnp.where(sz == 1, sz, SZ[:, 0])
    contained = contained | left.astype(jnp.int32)
    KB, KF, SZ = index.extend6(kb2, kf2, sz2, is_back=False)
    right = SZ[:, 0] != sz2
    contained = contained | (right.astype(jnp.int32) << 1)
    return out, length, k, KB[:, 0], KF[:, 0], SZ[:, 0], contained


@partial(jax.jit, static_argnames=("max_iters", "unroll"))
def seqrank_walk(index: FMDIndex, x: jnp.ndarray, max_iters: int,
                 unroll: int = 4):
    """retrieve2 minus the sequence buffer: LF-walk from sentinel rank x
    tracking only the full-read bi-interval — all seqsort needs
    (reference seqsort.c:12-35 calls fm6_retrieve but uses only the
    interval and flags).

    retrieve2's [B, max_len] u8 output is a while-loop carry, so XLA
    round-trips the whole buffer through VMEM every iteration and the
    column write pads to (8,128) tiles; at B=8192/max_len=4096 that is a
    33 MB carry per ~103 iterations and dominated the pipeline's rank
    stage (140.8 s of 494.5 s at 500k pairs).  This walk carries only
    [B] scalars and fuses the three per-step rank queries (LF symbol,
    interval start, interval end) into one stacked rank6 battery.

    Returns (k, kb, kf, sz, contained) with retrieve2 semantics.
    """
    B = x.shape[0]
    idt = index.idtype
    k = x.astype(idt)
    done = jnp.zeros(B, dtype=bool)
    started = jnp.zeros(B, dtype=bool)
    kb = jnp.zeros(B, idt)
    kf = jnp.zeros(B, idt)
    sz = jnp.zeros(B, idt)

    def cond(carry):
        i, k, done, started, kb, kf, sz = carry
        return (i < max_iters) & ~jnp.all(done)

    def body(carry):
        i, k, done, started, kb, kf, sz = carry
        c = index.sym_at(k)
        ci = c.astype(jnp.int32)
        r = index.rank6(jnp.stack([k, kb, kb + sz], axis=0))   # [3, B, 6]
        kp = index.cnt[ci] + \
            jnp.take_along_axis(r[0], ci[:, None], axis=-1)[:, 0]
        hit_end = c == 0
        emit = ~done & ~hit_end
        first = emit & ~started
        # backward extend6 of (kb, kf, sz) by symbol c, from the stacked ranks
        tk = r[1]
        osz = r[2] - tk
        ekb = index.cnt[ci] + jnp.take_along_axis(tk, ci[:, None], axis=-1)[:, 0]
        esz = jnp.take_along_axis(osz, ci[:, None], axis=-1)[:, 0]
        # forward-strand start via the complement-ordering identity (0,4,3,2,1,5)
        off = jnp.stack([
            jnp.zeros_like(osz[:, 0]),
            osz[:, 0] + osz[:, 4] + osz[:, 3] + osz[:, 2],
            osz[:, 0] + osz[:, 4] + osz[:, 3],
            osz[:, 0] + osz[:, 4],
            osz[:, 0],
            osz[:, 0] + osz[:, 4] + osz[:, 3] + osz[:, 2] + osz[:, 1],
        ], axis=-1)
        ekf = kf + jnp.take_along_axis(off, ci[:, None], axis=-1)[:, 0]
        skb, skf, ssz = index.set_intv(ci)
        one = sz == 1
        nkb = jnp.where(first, skb, jnp.where(one, kp, ekb))
        nkf = jnp.where(first, skf, jnp.where(one, kf, ekf))
        nsz = jnp.where(first, ssz, jnp.where(one, sz, esz))
        kb = jnp.where(emit, nkb, kb)
        kf = jnp.where(emit, nkf, kf)
        sz = jnp.where(emit, nsz, sz)
        started = started | emit
        k = jnp.where(done, k, kp)
        done = done | hit_end
        return i + 1, k, done, started, kb, kf, sz

    def body_n(carry):
        # the body is idempotent for done lanes, so unrolled extra steps
        # never change results; unrolling amortizes the per-iteration
        # carry round-trip DMA (same effect measured on the SMEM kernel)
        for _ in range(max(1, unroll)):
            carry = body(carry)
        return carry

    _, k, done, started, kb, kf, sz = jax.lax.while_loop(
        cond, body_n, (jnp.int32(0), k, done, started, kb, kf, sz))
    contained = jnp.zeros(B, jnp.int32)
    KB, KF, SZ = index.extend6(kb, kf, sz, is_back=True)
    left = (SZ[:, 0] != sz) & (sz != 1)
    kb2 = jnp.where(sz == 1, k, KB[:, 0])
    kf2 = jnp.where(sz == 1, kf, KF[:, 0])
    sz2 = jnp.where(sz == 1, sz, SZ[:, 0])
    contained = contained | left.astype(jnp.int32)
    KB, KF, SZ = index.extend6(kb2, kf2, sz2, is_back=False)
    right = SZ[:, 0] != sz2
    contained = contained | (right.astype(jnp.int32) << 1)
    return k, KB[:, 0], KF[:, 0], SZ[:, 0], contained


def retrieve_strings(index: FMDIndex, ids, max_len: int = 512):
    """Host convenience: retrieve sequences as forward nt6 numpy arrays."""
    ids = jnp.asarray(np.asarray(ids, dtype=np.int64))
    seq_rev, lengths, k = retrieve(index, ids, max_len)
    seq_rev = np.asarray(seq_rev)
    lengths = np.asarray(lengths)
    return [seq_rev[i, :lengths[i]][::-1].copy() for i in range(len(ids))], np.asarray(k)
