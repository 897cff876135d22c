"""k-mer error correction.

Phase 1 (collect) runs on device: the reference's per-suffix DFS over the
(k+1)-mer trie (correct.c:35-87) becomes a level-synchronous backward BFS —
each level one batched extend6 over the whole frontier, with host-side
compaction of surviving intervals. Phase 2 (fix) is the best-first search per
read; it runs in native/ec.cpp across threads (see that file for why), fed by
the device-built solid-kmer table.

Output is byte-identical to reference `fermi correct`.
"""

import ctypes
import os
import math
import sys

import numpy as np
import jax.numpy as jnp

from fermi_tpu import native
from fermi_tpu.index.fmd import FMDIndex

MAX_KMER = 27


def auto_k(total_symbols: int) -> int:
    w = int(math.log(total_symbols) / math.log(4) + 8.499)
    return min(w, MAX_KMER)


def _index_carrays(index):
    """(blocks u8 [nb,128], occ i64 [nb,8], cnt i64 [8]) contiguous views.

    Accepts FMDIndex (device arrays) or algos.hostindex.HostIndex (numpy,
    same blocked layout) — the native engines see identical memory."""
    blocks = getattr(index, "bwt_blocks", None)
    if blocks is None:
        blocks = index.blocks
    blocks = np.ascontiguousarray(np.asarray(blocks))
    occ = getattr(index, "occ8", None)
    if occ is None:
        occ_src = np.asarray(index.occ).astype(np.int64, copy=False)
        occ = np.zeros((occ_src.shape[0], 8), np.int64)
        occ[:, : occ_src.shape[1]] = occ_src
    cnt = np.zeros(8, np.int64)
    cnt_src = np.asarray(index.cnt).astype(np.int64, copy=False)
    cnt[: len(cnt_src)] = cnt_src
    return blocks, occ, cnt


def collect_solid_kmers_native(index: FMDIndex, w: int, min_occ: int,
                               n_threads: int | None = None):
    """Native DFS collect (native/smem.cpp fec_collect) — same (cls,key,val)
    set as the device BFS, without chunked-dispatch overhead; suffix classes
    are DFS'd in parallel."""
    import ctypes
    import os
    from fermi_tpu import native

    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    lib = native.get_lib()
    counts = np.zeros(3, np.int64)
    from fermi_tpu.index.blkidx import BlkIndex
    if isinstance(index, BlkIndex):  # out-of-core `-M` path
        ptr = lib.fec_collect_blk(
            index.path.encode(), w, min_occ, n_threads,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if counts[0] < 0:
            raise OSError(f"fec_collect_blk failed on {index.path}")
    else:
        blocks, occ, cnt = _index_carrays(index)
        ptr = lib.fec_collect(
            blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            occ.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            blocks.shape[0],
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            int(np.asarray(index.mcnt[1])), w, min_occ, n_threads,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    n = int(counts[0])
    try:
        flat = np.ctypeslib.as_array(ptr, shape=(3 * n + 1,))[: 3 * n]             .reshape(n, 3).copy()
    finally:
        lib.frld_free(ctypes.cast(ptr, ctypes.c_void_p))
    cls = flat[:, 0].astype(np.int64)
    key = flat[:, 1].astype(np.uint32)
    val = flat[:, 2].astype(np.uint8)
    return cls, key, val, (int(counts[1]), int(counts[2]))


def collect_solid_kmers(index: FMDIndex, w: int, min_occ: int,
                        batch: int = 1 << 18):
    """Enumerate solid (k+1)-mers: for every w-mer with a dominant preceding
    base of >= min_occ occurrences, compute the packed key/value of reference
    ec_collect (correct.c:56-75).

    Returns (cls, key, val): np arrays — suffix class id, uint32 key
    (prefix<<2 | best_base), uint8 value (ratio<<3 | min(rest,7)).
    """
    suf_len = w - 15 if w > 15 else 1
    idt = index.idtype

    # phase 1: enumerate depth-suf_len suffix intervals with their class ids
    kb = np.zeros(1, np.int64)
    kf = np.zeros(1, np.int64)
    sz = np.asarray([int(index.mcnt[0])], np.int64)
    cls = np.zeros(1, np.int64)
    for d in range(suf_len):
        KB, KF, SZ = _extend_batched(index, kb, kf, sz, batch)
        # children c = 1..4, class bit (c-1) << 2d
        kb = KB[:, 1:5].reshape(-1)
        kf = KF[:, 1:5].reshape(-1)
        csz = SZ[:, 1:5].reshape(-1)
        ccls = (cls[:, None] | (np.arange(4, dtype=np.int64) << (2 * d))).reshape(-1)
        keep = csz > 0
        kb, kf, sz, cls = kb[keep], kf[keep], csz[keep], ccls[keep]

    # phase 2: descend to depth w keeping counts >= min_occ
    key = np.zeros(len(kb), np.uint32)
    for d in range(suf_len, w):
        KB, KF, SZ = _extend_batched(index, kb, kf, sz, batch)
        kb = KB[:, 1:5].reshape(-1)
        kf = KF[:, 1:5].reshape(-1)
        csz = SZ[:, 1:5].reshape(-1)
        ccls = np.repeat(cls, 4)
        ckey = (key[:, None] | (np.arange(4, dtype=np.uint32) << (2 * (d - suf_len)))).reshape(-1)
        keep = csz >= min_occ
        kb, kf, sz, cls, key = kb[keep], kf[keep], csz[keep], ccls[keep], ckey[keep]

    # final extension: pick dominant preceding base, compute value
    KB, KF, SZ = _extend_batched(index, kb, kf, sz, batch)
    ext = SZ[:, 1:5]                      # counts of A,C,G,T prepends
    max_c = np.argmax(ext, axis=1)        # first max = smallest c (ref ties)
    mx = ext[np.arange(len(ext)), max_c]
    keep = mx >= min_occ
    kb, sz, cls, key, max_c, mx = (kb[keep], sz[keep], cls[keep], key[keep],
                                   max_c[keep], mx[keep])
    SZk = SZ[keep]
    rest = sz - mx - SZk[:, 0] - SZk[:, 5]
    r = np.where(rest == 0, mx.astype(np.float64),
                 mx.astype(np.float64) / np.maximum(rest, 1))
    r = np.minimum(r, 31.0)
    n_info = int((( rest <= 7) & (r >= min_occ)).sum())
    val = ((r + 0.499).astype(np.int64) << 3 | np.minimum(rest, 7)).astype(np.uint8)
    out_key = (key << 2 | max_c.astype(np.uint32)).astype(np.uint32)
    return cls, out_key, val, (len(val), n_info)


import jax as _jax


@_jax.jit
def _extend_back_dev(index, kb, kf, sz):
    return index.extend6(kb, kf, sz, is_back=True)


def _extend_batched(index: FMDIndex, kb, kf, sz, batch):
    """Backward extend6 over a host frontier, chunked through the device.

    Chunks are padded to powers of two so XLA compiles O(log batch) shapes
    instead of one program per frontier size."""
    n = len(kb)
    KB = np.empty((n, 6), np.int64)
    KF = np.empty((n, 6), np.int64)
    SZ = np.empty((n, 6), np.int64)
    for lo in range(0, max(n, 1), batch):
        hi = min(lo + batch, n)
        m = hi - lo
        if m <= 0:
            break
        padded = 1 << (m - 1).bit_length()
        pad = padded - m
        kb_d = jnp.asarray(np.pad(kb[lo:hi], (0, pad)))
        kf_d = jnp.asarray(np.pad(kf[lo:hi], (0, pad)))
        sz_d = jnp.asarray(np.pad(sz[lo:hi], (0, pad)))
        A, B, C = _extend_back_dev(index, kb_d, kf_d, sz_d)
        KB[lo:hi] = np.asarray(A)[:m]
        KF[lo:hi] = np.asarray(B)[:m]
        SZ[lo:hi] = np.asarray(C)[:m]
    return KB, KF, SZ


class SolidTable:
    """Host handle over the native per-class hash tables."""

    def __init__(self, w: int, cls, key, val):
        suf_len = w - 15 if w > 15 else 1
        suf_num = 1 << (2 * suf_len)
        order = np.argsort(cls, kind="stable")
        cls_s = cls[order]
        self._keys = np.ascontiguousarray(key[order])
        self._vals = np.ascontiguousarray(val[order])
        self._offsets = np.zeros(suf_num + 1, np.int64)
        counts = np.bincount(cls_s, minlength=suf_num)
        np.cumsum(counts, out=self._offsets[1:])
        lib = native.get_lib()
        self._lib = lib
        self._ctx = lib.fec_create(
            w, suf_len,
            self._keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            self._vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))

    def __del__(self):
        if getattr(self, "_ctx", None):
            self._lib.fec_destroy(self._ctx)
            self._ctx = None


class _EcOpt(ctypes.Structure):
    _fields_ = [("w", ctypes.c_int), ("min_occ", ctypes.c_int),
                ("keep_bad", ctypes.c_int), ("is_paired", ctypes.c_int),
                ("trim_l", ctypes.c_int), ("step", ctypes.c_int),
                ("max_corr", ctypes.c_float)]


def fix_reads(table: SolidTable, opt, seqs: list[bytes], quals: list[bytes],
              n_threads: int = 8):
    """Correct a batch of reads. Returns (seqs, quals, info) — corrected ASCII
    sequences (case marks corrections), adjusted quals, per-read info word."""
    n = len(seqs)
    offsets = np.zeros(n + 1, np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    seq_buf = np.frombuffer(b"".join(seqs), np.uint8).copy()
    qual_buf = np.frombuffer(b"".join(quals), np.uint8).copy()
    info = np.zeros(n, np.int32)
    copt = _EcOpt(w=opt["w"], min_occ=opt["min_occ"],
                  keep_bad=int(opt.get("keep_bad", 0)),
                  is_paired=int(opt.get("is_paired", 0)),
                  trim_l=opt.get("trim_l", 0), step=opt.get("step", 5),
                  max_corr=opt.get("max_corr", 0.3))
    lib = table._lib
    lib.fec_fix.restype = ctypes.c_uint64
    n_query = lib.fec_fix(
        table._ctx, ctypes.byref(copt), n,
        seq_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        qual_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        info.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    out_seqs = [seq_buf[offsets[i]:offsets[i + 1]].tobytes() for i in range(n)]
    out_quals = [qual_buf[offsets[i]:offsets[i + 1]].tobytes() for i in range(n)]
    return out_seqs, out_quals, info, n_query


def wants_device_collect() -> bool:
    """Collect-phase platform dispatch: device BFS on a directly-attached
    TPU, native DFS on cpu / over the tunneled dev chip.
    FERMI_TPU_DEVICE_COLLECT=1/0 forces."""
    mode = os.environ.get("FERMI_TPU_DEVICE_COLLECT", "auto")
    if mode == "1":
        return True
    if mode != "auto":
        return False
    plat = os.environ.get("JAX_PLATFORMS", "").lower()
    return "tpu" in plat and "axon" not in plat


def ec_correct(index: FMDIndex, fastx_path: str, out_fp, w: int = -1,
               min_occ: int = 3, keep_bad=False, is_paired=False,
               max_corr=0.3, trim_l=0, step=5, n_threads: int = 8,
               verbose: bool = True):
    """Full `fermi correct` pipeline; writes corrected FASTQ to out_fp
    (byte-identical to the reference)."""
    from fermi_tpu.core import fastx

    if w < 0:
        w = auto_k(int(np.asarray(index.mcnt[0])))
        if verbose:
            sys.stderr.write(f"[M::ec_correct] set k-mer length to {w}\n")
    # collect dispatch mirrors the pipeline's builder dispatch: the device
    # BFS on a directly-attached TPU, the native DFS on cpu or over the
    # tunneled dev chip (where h2d/d2h round-trips dominate).  Both produce
    # the identical (cls, key, val) set (tests/test_correct.py).
    if wants_device_collect() and isinstance(index, FMDIndex):
        cls, key, val, (n_tot, n_info) = collect_solid_kmers(
            index, w, min_occ)
    else:
        cls, key, val, (n_tot, n_info) = collect_solid_kmers_native(
            index, w, min_occ)
    if verbose:
        sys.stderr.write(
            f"[M::ec_correct] collected {n_info} informative and "
            f"{n_tot - n_info} ambiguous k-mers\n")
    table = SolidTable(w, cls, key, val)
    opt = dict(w=w, min_occ=min_occ, keep_bad=keep_bad, is_paired=is_paired,
               max_corr=max_corr, trim_l=trim_l, step=step)
    # device beam fix (search/ecfix_device.py): FERMI_TPU_DEVICE_FIX=1;
    # flagged reads fall back to the native engine for exact parity
    dev_table = None
    if os.environ.get("FERMI_TPU_DEVICE_FIX", "0") == "1":
        from fermi_tpu.search.ecfix_device import (build_device_table,
                                                   fix_reads_device)
        dev_table = build_device_table(cls, key, val, w)

    BATCH = 1_000_000
    pending_s, pending_q, base_id = [], [], 0

    def flush():
        nonlocal base_id
        if not pending_s:
            return
        if dev_table is not None:
            seqs, quals, info, st = fix_reads_device(
                dev_table, opt, pending_s, pending_q, native_table=table,
                n_threads=n_threads)
            if verbose:
                sys.stderr.write(
                    f"[M::ec_correct] device fix: {st['n']} reads, "
                    f"{st['n_redo']} native redos\n")
        else:
            seqs, quals, info, _ = fix_reads(table, opt, pending_s,
                                             pending_q, n_threads)
        emit(out_fp, seqs, quals, info, base_id, opt)
        base_id += len(pending_s)
        pending_s.clear()
        pending_q.clear()

    paths = [fastx_path] if isinstance(fastx_path, str) else fastx_path
    for path in paths:
        for rec in fastx.read_fastx(path):
            pending_s.append(rec.seq.encode())
            q = rec.qual.encode() if rec.qual else bytes([33 + 15] * len(rec.seq))
            pending_q.append(q)
            if len(pending_s) >= BATCH:
                flush()
    flush()


def emit(out_fp, seqs, quals, info, base_id, opt):
    """Reference output loop (correct.c:401-428): drop bad reads (and their
    mates when paired), rename to @id_qsum_scorediff, optional trim."""
    n = len(seqs)
    bad = (info >> 16 & 1).astype(bool)
    parts = []
    for i in range(n):
        k = base_id + i
        is_bad = bad[i]
        if opt.get("is_paired"):
            mate = i ^ 1
            if 0 <= mate < n and bad[mate]:
                is_bad = True
        if is_bad and not opt.get("keep_bad"):
            continue
        qsum = int(info[i]) & 0xffff
        sdiff = int(info[i]) >> 18
        sep = " " if opt.get("is_paired") else "_"
        name = k >> 1 if opt.get("is_paired") else k
        s, q = seqs[i], quals[i]
        tl = opt.get("trim_l", 0)
        if tl and tl < len(s):
            s, q = s[:tl], q[:tl]
        parts.append(f"@{name}{sep}{qsum}{sep}{sdiff}\n")
        parts.append(s.decode() + "\n+\n" + q.decode() + "\n")
    out_fp.write("".join(parts))
