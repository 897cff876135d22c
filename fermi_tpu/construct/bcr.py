"""BCR column-wise multi-string BWT construction, TPU-first.

The reference's production builder (/root/reference/bcr.c:378-460) processes
reads column by column from the last character toward the first: each cycle
inserts one new symbol per active read into the partial BWT.  Its per-cycle
machinery (set_bwt counting sort, per-class radix rs_sort, rll RLE
merge-rewrite, 4 spin-CAS worker threads) is replaced here by batched
device-wide vector passes:

  * the per-read insert position is  p = C[c] + rank_c(B, pos)  where c is
    the symbol being inserted and pos the read's previous insert position —
    rank is a batched blocked-occ query (one gather + masked count per read);
  * reads stay sorted by insert position; the reference's radix sort
    collapses to a 6-bucket *stable partition* per cycle (rank is monotone
    in pos within a symbol class, so class-partitioning preserves order);
  * the insertion itself (rll merge-rewrite in the reference) becomes a
    dense rebuild: an indicator/prefix-sum over the new BWT length plus a
    gather-free staircase shift, all VPU-friendly fixed-shape ops.

This module holds the algorithm in plain numpy — the oracle the JAX/Pallas
device build (bcr_jax.py) is tested against, and itself parity-tested
against the SA-based multistring_bwt (tests/test_bcr.py).

Key invariant (why no rank over *future* inserts is needed): the partial BWT
entry of a read's current longest suffix already holds the character that
will be prepended next cycle, so rank_c over the stored array counts the
simultaneous batch inserts automatically (the reference relies on the same
property via its class-sequential merge).
"""

import numpy as np


def bcr_bwt_native(text: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """Threaded native BCR (native/bcr.cpp) over a 0-terminated multi-string
    text; byte-equal to multistring_bwt(text).  One RLE merge walk per class
    per cycle — the next cycle's ranks fall out of the walk's emit counters
    (reference next_bwt's trick, bcr.c:439-443).  Beats the SA engine above
    ~100 Msym of short reads (16.2 s vs 20.6 s at 202 Msym on 4 cores)."""
    import ctypes
    from fermi_tpu import native

    lib = native.get_lib()
    text = np.ascontiguousarray(text, np.uint8)
    out = np.empty(text.size, np.uint8)
    n = lib.fbcr_build(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), text.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    assert n == text.size, (n, text.size)
    return out


def _emit_runs(lib, handle, nr, cnt, total):
    """Phase 2 of the two-phase hand-off: fill caller-owned numpy buffers
    (no worst-case malloc, no copy) and take mcnt from the builder's own
    emit counters (no host bincount over the run arrays)."""
    import ctypes
    from fermi_tpu import rld

    symbols = np.empty(nr, np.uint8)
    lengths = np.empty(nr, np.int64)
    lib.fbcr_emit_runs(
        handle, symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    mcnt = np.zeros(7, np.uint64)
    mcnt[0] = total
    mcnt[1:] = cnt.astype(np.uint64)
    return rld.Runs(lengths, symbols, mcnt, 6)


def bcr_runs_native(text: np.ndarray, n_threads: int = 4):
    """Native BCR straight to RLE runs (rld.Runs) — skips the dense-BWT
    emit + re-scan of bcr_bwt_native + Runs.from_bwt (two full passes and
    worst-case buffers at 200 Msym)."""
    import ctypes
    from fermi_tpu import native

    lib = native.get_lib()
    text = np.ascontiguousarray(text, np.uint8)
    nr = ctypes.c_int64()
    cnt = np.zeros(6, np.int64)
    handle = lib.fbcr_start_text(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), text.size,
        n_threads, ctypes.byref(nr),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return _emit_runs(lib, handle, nr.value, cnt, text.size)


def bcr_runs_from_frags(F: np.ndarray, offsets: np.ndarray,
                        trim_palindrome: bool = True, n_threads: int = 4):
    """Native BCR straight from forward-only nt6 fragments: the reverse-
    complement strands are synthesized inside the builder's transpose, so
    the doubled sentinel text never exists (fresh-page faults on the bench
    host run at 0.1-1 GB/s, and the text route allocated ~14 GB at 2 Gsym).
    Equals bcr_runs_native(build_text(frags))."""
    import ctypes
    from fermi_tpu import native
    from fermi_tpu import rld

    lib = native.get_lib()
    F = np.ascontiguousarray(F, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    nr = ctypes.c_int64()
    cnt = np.zeros(6, np.int64)
    handle = lib.fbcr_start_frags(
        F.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(offsets) - 1, int(trim_palindrome), n_threads,
        ctypes.byref(nr),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return _emit_runs(lib, handle, nr.value, cnt, int(cnt.sum()))


def bcr_bwt(seqs: list[np.ndarray]) -> np.ndarray:
    """Multi-string BWT of nt6 reads (each implicitly $-terminated), byte
    identical to suffix.multistring_bwt(build_text(seqs, both_strands=False,
    trim_palindrome=False)).

    Sentinels compare below letters and among themselves by read index
    (reference ksa_bwt convention: BWT entry 0 wherever the suffix is a
    whole read)."""
    m = len(seqs)
    if m == 0:
        return np.zeros(0, np.uint8)
    lens = np.array([len(s) for s in seqs], np.int64)
    if (lens == 0).any():
        raise ValueError("empty read")
    Lmax = int(lens.max())
    N = int((lens + 1).sum())

    # reads transposed from the end: rev[j, k] = seqs[k][len_k - j], so cycle
    # j reads row j contiguously; row 0 unused, rows beyond a read's length
    # hold 0 (the sentinel inserted at cycle len_k + 1 wants value 0 too).
    rev = np.zeros((Lmax + 2, m), np.uint8)
    for k, s in enumerate(seqs):
        rev[1: lens[k] + 1, k] = s[::-1]

    # cycle-0 state: the 0-suffixes (sentinels) occupy B[0..m) in read
    # order; their BWT entries are the last characters.
    B = np.empty(N, np.uint8)
    B[:m] = rev[1]
    n = m                      # current partial-BWT length
    order = np.arange(m)       # read ids sorted by current insert position
    pos = np.arange(m)         # insert position of read order[i] in B[:n]
    # A[c] = number of suffixes currently in B whose first char is c
    A = np.zeros(6, np.int64)
    A[0] = m

    for j in range(1, Lmax + 1):
        alive = lens[order] >= j
        if not alive.any():
            break
        order, pos = order[alive], pos[alive]
        c = rev[j, order].astype(np.int64)        # symbol being inserted
        v = rev[j + 1, order]                     # its BWT entry (next char)

        # stable partition by class: reads sorted by (c, pos) — pos is
        # already ascending, so a stable counting sort on c suffices
        part = np.argsort(c, kind="stable")
        order, pos, c, v = order[part], pos[part], c[part], v[part]

        # rank_c(B, pos) + updated cumulative counts -> absolute positions
        # in the grown BWT
        rank = _rank_at(B[:n], pos, c)
        np.add.at(A, c, 1)
        C = np.concatenate([[0], np.cumsum(A)[:5]])
        t = C[c] + rank                            # sorted ascending

        # dense insert: B'[t_i] = v_i, old symbols shift up
        nb = np.zeros(n + len(t), np.int64)
        nb[t] = 1
        nb = np.cumsum(nb)
        y = np.arange(n + len(t))
        is_new = np.zeros(n + len(t), bool)
        is_new[t] = True
        newB = np.empty(n + len(t), np.uint8)
        newB[is_new] = v
        newB[~is_new] = B[(y - nb)[~is_new]]
        n += len(t)
        B[:n] = newB
        pos = t

    assert n == N, (n, N)
    return B[:N]


def _rank_at(B: np.ndarray, pos: np.ndarray, c: np.ndarray) -> np.ndarray:
    """#occurrences of c[i] in B[:pos[i]] for each query (exclusive rank)."""
    # occ per 128-block, then masked count within the block — the same
    # blocked layout the device index uses (index/fmd.py)
    n = B.size
    nb = (n + 127) // 128
    pad = np.full(nb * 128, 6, np.uint8)
    pad[:n] = B
    blocks = pad.reshape(nb, 128)
    occ = np.zeros((nb + 1, 6), np.int64)
    for cc in range(6):
        np.cumsum((blocks == cc).sum(axis=1), out=occ[1:, cc])
    blk, off = pos >> 7, pos & 127
    rows = blocks[blk]
    within = ((rows == c[:, None])
              & (np.arange(128) < off[:, None])).sum(axis=1)
    return occ[blk, c] + within
