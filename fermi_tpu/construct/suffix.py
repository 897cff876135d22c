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
    parts = []
    for s in seqs:
        s = np.asarray(s, dtype=np.uint8)
        if trim_palindrome and both_strands and dna.is_revcomp_palindrome(s):
            s = s[:-1]
        parts.append(s)
        parts.append(np.zeros(1, np.uint8))
        if both_strands:
            parts.append(dna.revcomp(s))
            parts.append(np.zeros(1, np.uint8))
    if not parts:
        return np.zeros(0, np.uint8)
    return np.concatenate(parts)


def suffix_array_multi(text: np.ndarray) -> np.ndarray:
    """Suffix array of a 0-terminated multi-sentinel text (numpy host path).

    Sentinels compare below all letters and among themselves by position.
    """
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
    h = 1
    order = None
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - h] = rank[h:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank_sorted = np.cumsum(changed)
        if new_rank_sorted[-1] == n - 1:
            return order.astype(np.int64)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank_sorted
        h *= 2


def bwt_from_sa(text: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """BWT[i] = text[SA[i]-1], with 0 where SA[i]==0 (reference ksa_bwt rule)."""
    t = np.asarray(text, dtype=np.uint8)
    sa = np.asarray(sa)
    out = np.where(sa > 0, t[sa - 1], 0).astype(np.uint8)
    return out


def multistring_bwt(text: np.ndarray) -> np.ndarray:
    return bwt_from_sa(text, suffix_array_multi(text))
