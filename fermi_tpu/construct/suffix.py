"""Multi-string BWT construction by prefix doubling.

The reference builds its FMD-index with SA-IS over a text where every sentinel
(0) is a distinct symbol ordered by its position (/root/reference/ksa.c:53-54).
That order is exactly reproduced here without SA-IS: give every sentinel a
unique initial rank equal to its ordinal among sentinels (all below letters),
then run Manber–Myers prefix doubling. Because reads are short, ranks converge
after ceil(log2(max_read_len+2)) rounds — each round one lexsort, fully
vectorized. The same batched-sort structure runs on TPU (see suffix_jax).

The resulting BWT is canonical for the text, so encoding it with the RLD codec
yields .fmd files byte-identical to reference `fermi build`.
"""

import os

import numpy as np

from fermi_tpu.core import dna


def build_text(seqs: list[np.ndarray], both_strands: bool = True,
               trim_palindrome: bool = True) -> np.ndarray:
    """Concatenate reads (optionally + their reverse complements, fermi-style)
    into a sentinel-terminated nt6 text: fwd0 0 rc0 0 fwd1 0 rc1 0 ...

    trim_palindrome mirrors reference cmd.c:458-462 / ropebwt.c:25-29: an
    even-length read equal to its own reverse complement loses its last base so
    fwd and rc differ.
    """
    if not seqs:
        return np.zeros(0, np.uint8)
    F = np.concatenate([np.asarray(s, np.uint8) for s in seqs])
    lens = np.array([len(s) for s in seqs], np.int64)
    lib = _native()
    if lib is not None:
        import ctypes
        offsets = np.concatenate([[0], np.cumsum(lens)])
        out = np.empty(int(2 * lens.sum() + 2 * len(seqs)), np.uint8)
        F = np.ascontiguousarray(F)
        n = lib.fbuild_text(
            F.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(seqs), int(both_strands), int(trim_palindrome),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out[:n]
    sf = np.concatenate([[0], np.cumsum(lens)])[:-1]
    if trim_palindrome and both_strands:
        # vectorized is_revcomp_palindrome over all reads at once
        ar = np.arange(F.size)
        mirror = np.repeat(2 * sf + lens - 1, lens) - ar
        ok = (F.astype(np.int16) + F[mirror]) == 5
        cs = np.concatenate([[0], np.cumsum(ok)])
        all_ok = (cs[sf + lens] - cs[sf]) == lens
        pal = (lens % 2 == 0) & (lens > 0) & all_ok
        if pal.any():
            keep = np.ones(F.size, bool)
            keep[sf[pal] + lens[pal] - 1] = False
            F = F[keep]
            lens = lens - pal
            sf = np.concatenate([[0], np.cumsum(lens)])[:-1]
    if not both_strands:
        o = np.concatenate([[0], np.cumsum(lens + 1)])[:-1]
        out = np.zeros(int((lens + 1).sum()), np.uint8)
        out[np.arange(F.size) + np.repeat(o - sf, lens)] = F
        return out
    # per read: fwd, 0, revcomp, 0 — both scatters in one vector pass
    o = np.concatenate([[0], np.cumsum(2 * lens + 2)])[:-1]
    out = np.zeros(int((2 * lens + 2).sum()), np.uint8)
    ar = np.arange(F.size)
    out[ar + np.repeat(o - sf, lens)] = F
    comp = np.where((F >= 1) & (F <= 4), 5 - F, F).astype(np.uint8)
    out[np.repeat(o + 2 * lens + sf, lens) - ar] = comp
    return out


def build_text_packed(F: np.ndarray, offsets: np.ndarray,
                      both_strands: bool = True,
                      trim_palindrome: bool = True) -> np.ndarray:
    """build_text over reads already packed as (concatenated nt6, offsets)."""
    n_reads = len(offsets) - 1
    if n_reads <= 0:
        return np.zeros(0, np.uint8)
    lib = _native()
    F = np.ascontiguousarray(F, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    if lib is not None:
        import ctypes
        out = np.empty(int(2 * F.size + 2 * n_reads), np.uint8)
        n = lib.fbuild_text(
            F.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_reads, int(both_strands), int(trim_palindrome),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out[:n]
    seqs = [F[offsets[i]:offsets[i + 1]] for i in range(n_reads)]
    return build_text(seqs, both_strands, trim_palindrome)


def _native():
    try:
        from fermi_tpu import native
        return native.get_lib()
    except Exception:
        return None


def suffix_array_multi(text: np.ndarray, use_native: bool = True) -> np.ndarray:
    """Suffix array of a 0-terminated multi-sentinel text.

    Sentinels compare below all letters and among themselves by position.
    Dispatches to the threaded native builder (native/construct.cpp) when
    available; the numpy prefix-doubling path below is the portable oracle.
    """
    t8 = np.ascontiguousarray(text, dtype=np.uint8)
    n = t8.size
    if use_native and n:
        lib = _native()
        if lib is not None:
            import ctypes
            sa = np.empty(n, np.int64)
            r = lib.fsa_build(
                t8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
                sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                min(os.cpu_count() or 1, 16))
            if r == 0:
                return sa
    return _suffix_array_multi_numpy(text)


def _suffix_array_multi_numpy(text: np.ndarray) -> np.ndarray:
    t = np.asarray(text, dtype=np.int64)
    n = t.size
    if n == 0:
        return np.zeros(0, np.int64)
    is_sent = t == 0
    n_sent = int(is_sent.sum())
    if t[-1] != 0:
        raise ValueError("text must end with a sentinel (0)")
    # unique rank per sentinel; letters shifted above all sentinels
    rank = np.where(is_sent, np.cumsum(is_sent) - 1, n_sent - 1 + t)
    # round 1 over the full text; rank convention afterwards: a suffix's rank
    # is the index (within `order`) of the FIRST member of its group — any
    # distinct total order works for comparisons, and this one lets groups
    # refine in place (Larsson–Sadakane)
    key2 = np.full(n, -1, dtype=np.int64)
    key2[: n - 1] = rank[1:]
    order = np.lexsort((key2, rank))
    r1 = rank[order]
    r2 = key2[order]
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
    idx = np.arange(n, dtype=np.int64)
    group_start = np.maximum.accumulate(np.where(boundary, idx, 0))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = group_start
    h = 2
    # later rounds re-sort only members of non-singleton groups; groups
    # shrink geometrically since reads are short
    while True:
        sorted_rank = rank[order]
        dup_adj = np.empty(n, dtype=bool)
        dup_adj[0] = False
        dup_adj[1:] = sorted_rank[1:] == sorted_rank[:-1]
        in_group = dup_adj.copy()
        in_group[:-1] |= dup_adj[1:]
        if not in_group.any():
            return order.astype(np.int64)
        sel = np.flatnonzero(in_group)      # slots in `order` to refine
        pos = order[sel]                    # text positions occupying them
        key2s = np.where(pos + h < n, rank[np.minimum(pos + h, n - 1)], -1)
        sub = np.lexsort((key2s, rank[pos]))
        sp = pos[sub]                       # refined occupants of slots sel
        r1s = rank[sp]
        r2s = key2s[sub]
        m = len(sel)
        b = np.empty(m, dtype=bool)
        b[0] = True
        b[1:] = (r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])
        gs = np.maximum.accumulate(np.where(b, np.arange(m, dtype=np.int64),
                                            0))
        order[sel] = sp
        rank[sp] = sel[gs]
        h *= 2


def bwt_from_sa(text: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """BWT[i] = text[SA[i]-1], with 0 where SA[i]==0 (reference ksa_bwt rule)."""
    t = np.asarray(text, dtype=np.uint8)
    sa = np.asarray(sa)
    out = np.where(sa > 0, t[sa - 1], 0).astype(np.uint8)
    return out


def multistring_bwt(text: np.ndarray) -> np.ndarray:
    t8 = np.ascontiguousarray(text, dtype=np.uint8)
    n = t8.size
    lib = _native()
    if lib is not None and n:
        import ctypes
        sa = np.empty(n, np.int64)
        bwt = np.empty(n, np.uint8)
        r = lib.fsa_bwt(
            t8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            bwt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            min(os.cpu_count() or 1, 16))
        if r == 0:
            return bwt
    return bwt_from_sa(text, suffix_array_multi(text))


def suffix_array_multi_numpy(text: np.ndarray) -> np.ndarray:
    """Portable numpy oracle (prefix doubling with subset refinement)."""
    return _suffix_array_multi_numpy(text)
