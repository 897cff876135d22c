"""seqsort / seqrank: the rank -> read-id permutation (reference seqsort.c).

For every forward-strand sequence id i (even), retrieve its sentinel rank k and
full-read bi-interval, then record sorted[k] = i<<2 | contained<<1 | dup, plus
the mirrored entry for the reverse complement. All retrieval walks run batched
on device (search.extend.retrieve2); the scatter is a host numpy write.
"""

import sys

import numpy as np
import jax.numpy as jnp

from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.search.extend import seqrank_walk


def seqsort_native(index, n_threads: int = 4,
                   verbose: bool = True) -> np.ndarray:
    """Host engine (native/seqsort.cpp): same walk as seqrank_walk, striped
    threads.  Accepts FMDIndex or HostIndex (blocked layout)."""
    import ctypes
    from fermi_tpu import native
    from fermi_tpu.search.smem import _native_index_arrays

    lib = native.get_lib()
    from fermi_tpu.index.blkidx import BlkIndex
    if isinstance(index, BlkIndex):  # out-of-core `-M` path
        sorted_arr = np.zeros(index.n_seqs, np.uint64)
        rc = lib.fseqsort_blk(
            index.path.encode(),
            sorted_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n_threads)
        if rc:
            raise OSError(f"fseqsort_blk failed on {index.path}")
    else:
        blocks, occ, cnt, n_seqs = _native_index_arrays(index)
        sorted_arr = np.zeros(n_seqs, np.uint64)
        lib.fseqsort(
            blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            occ.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            blocks.shape[0],
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_seqs,
            sorted_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n_threads)
    if verbose:
        _report(sorted_arr)
    return sorted_arr


def _report(sorted_arr):
    zeros = int((sorted_arr == 0).sum())
    ncont = int(((sorted_arr != 0) & (sorted_arr & 2 != 0)).sum())
    ndup = int(((sorted_arr != 0) & (sorted_arr & 2 == 0)
                & (sorted_arr & 1 != 0)).sum())
    sys.stderr.write(
        f"[M::seqsort] #zeros={zeros}, #contained={ncont}, #duplicates={ndup}\n")


def seqsort(index: FMDIndex, batch: int = 32768, max_len: int = 1 << 12,
            verbose: bool = True) -> np.ndarray:
    n_seqs = int(np.asarray(index.mcnt[1]))
    sorted_arr = np.zeros(n_seqs, np.uint64)
    ids = np.arange(0, n_seqs, 2, dtype=np.int64)
    for lo in range(0, len(ids), batch):
        chunk = ids[lo: lo + batch]
        m = len(chunk)
        pad = batch - m
        x = jnp.asarray(np.pad(chunk, (0, pad)))
        k, kb, kf, sz, contained = seqrank_walk(index, x, max_len)
        k = np.asarray(k)[:m].astype(np.int64)
        kb = np.asarray(kb)[:m].astype(np.int64)
        kf = np.asarray(kf)[:m].astype(np.int64)
        sz = np.asarray(sz)[:m].astype(np.int64)
        contained = np.asarray(contained)[:m]
        flag = ((contained != 0).astype(np.uint64) << 1) | \
               ((sz > 1) & (k != kb)).astype(np.uint64)
        i64 = chunk.astype(np.uint64)
        sorted_arr[k] = i64 << 2 | flag
        l = k - kb
        mirror = np.where(kb != kf, kf + l, k + 1)
        sorted_arr[mirror] = (i64 | 1) << 2 | flag
    if verbose:
        _report(sorted_arr)
    return sorted_arr
