"""remap: contig coverage + paired-end statistics (reference smem.c:114-394).

Contigs are the queries, the read index the database. SMEMs per contig come
from the batched device kernel (search.smem); per-contig pairing bookkeeping
follows the reference exactly, including khash bucket order (pykhash) since
the emitted UR:Z: lists feed the scaffolder in bucket-scan order.
"""

import os
import sys

import numpy as np

from fermi_tpu.core import dna
from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu.search import smem as sm
from fermi_tpu.algos.pykhash import KHash64

FM_MASK30 = 0x3FFFFFFF


def paircov(e_n_seqs, sorted_arr, mems, length, skip, max_dist, h: KHash64,
            rec):
    """Reference paircov (smem.c:140-204) for one contig, given its SMEMs."""
    cov = np.zeros(length + 1, np.int32)
    pcv = np.zeros(length + 1, np.int32)
    n_supp = 0
    unpaired = []
    for (start, end, size, closed, kf) in mems:
        if closed and kf < e_n_seqs:
            cov[start:end] += 1
            n_supp += 1
            if skip <= 0 or sorted_arr is None:
                continue
            for l in range(size):
                k = int(sorted_arr[kf + l] >> np.uint64(2))
                if (k & 1) == 0:
                    to_add = 0
                    kk = h.get(k)
                    beg = 0
                    if kk != h.n_buckets:
                        beg = h.vals[kk] >> 32
                        e_ = end
                        if e_ - beg < max_dist:
                            rec[0] += 1
                            rec[1] += e_ - beg
                            rec[2] += (e_ - beg) * (e_ - beg)
                        else:
                            to_add = 1
                    else:
                        to_add = 1
                    if to_add:
                        unpaired.append((k ^ 1, start << 32 | end))
                        continue
                    beg += skip
                    e_ -= skip
                    if beg > e_:
                        beg, e_ = e_, beg
                    if beg < 0:
                        beg = 0
                    if e_ > length:
                        e_ = length
                    pcv[beg:e_] += 1
                    h.delete(kk)
                else:
                    kk, _ = h.put(k ^ 3)
                    h.vals[kk] = start << 32 | end
    for key, val in h.items_in_bucket_order():
        unpaired.append((key ^ 2, val))
    h.clear()
    return (np.minimum(cov[:length], 255).astype(np.uint8),
            np.minimum(pcv[:length], 255).astype(np.uint8), n_supp, unpaired)


def mask_pcv(seq_u8, pcv, skip, min_pcv):
    """Case-mask a contig by paired coverage (smem.c:209-229). seq_u8: nt6
    array; returns ASCII bytes with lowercase = unsupported."""
    l = len(seq_u8)
    UP = np.frombuffer(b"$ACGTN", np.uint8)
    LO = np.frombuffer(b"$acgtn", np.uint8)
    out = np.empty(l, np.uint8)
    sup = pcv >= min_pcv
    idx = np.flatnonzero(sup)
    if idx.size == 0:
        return UP[seq_u8].tobytes()
    beg, end = int(idx[0]), int(idx[-1]) + 1
    for i in range(0, beg):
        out[i] = UP[seq_u8[i]] if beg < skip << 1 else LO[seq_u8[i]]
    for i in range(end, l):
        out[i] = UP[seq_u8[i]] if l - end < skip << 1 else LO[seq_u8[i]]
    mid = np.arange(beg, end)
    out[mid] = np.where(sup[mid], UP[seq_u8[mid]], LO[seq_u8[mid]])
    return out.tobytes()


def remap(index: FMDIndex, contigs_path: str, out_fp, sorted_arr=None,
          skip=50, min_pcv=0, max_dist=1000, batch=512):
    """Full `fermi remap`; writes annotated/broken contigs to out_fp and the
    insert-size line to stderr. Returns (avg, std, cap) for the pipeline.

    Fast path: native SMEM results (raw flat rows) feed the native paircov
    engine (native/remap.cpp) — the Python tuple marshaling plus pykhash
    pairing loop cost ~19 s of a 24 s remap stage at 1M reads.  The Python
    paircov below is kept as the byte-exact oracle and the fallback."""
    from fermi_tpu.core import fastx

    n_seqs = int(np.asarray(index.mcnt[1]))
    rec = [0, 0, 0]
    h = KHash64()
    if sorted_arr is None:
        skip, min_pcv = -1, 0
    native_pc = _NativePaircov.try_create(index, sorted_arr, skip, max_dist,
                                          n_seqs)
    recs = list(fastx.read_fastx(contigs_path))
    for lo in range(0, len(recs), batch):
        chunk = recs[lo: lo + batch]
        seqs = [dna.encode(r.seq) for r in chunk]
        if native_pc is not None:
            outs = native_pc.run_batch(seqs)
        else:
            all_mems = sm.smem_all(index, seqs)
            outs = None
        for t, (rec_i, s) in enumerate(zip(chunk, seqs)):
            l = len(s)
            if outs is not None:
                cov, pcv, n_supp, unpaired = outs[t]
            else:
                if h.n_buckets >= 256:
                    h = KHash64()
                cov, pcv, n_supp, unpaired = paircov(
                    n_seqs, sorted_arr, all_mems[t], l, skip, max_dist, h,
                    rec)
            cov_q = np.minimum(cov.astype(np.int32) + 33, 126).astype(np.uint8)
            if min_pcv > 0:
                masked = mask_pcv(s, pcv, skip, min_pcv)
                _emit_broken(out_fp, rec_i.name, masked, cov_q, n_supp)
            else:
                hdr = f"@{rec_i.name}"
                if rec_i.comment:
                    c = rec_i.comment
                    j = 0
                    neg = c[:1] == "-"
                    j = 1 if neg else 0
                    while j < len(c) and c[j].isdigit():
                        j += 1
                    if j > (1 if neg else 0) and j < len(c) and c[j].isspace():
                        hdr += f"\t{n_supp}\t{c[j+1:]}"
                if unpaired:
                    hdr += "\tUR:Z:" + "".join(
                        f"{x},{y >> 32},{y & 0xFFFFFFFF};"
                        for x, y in unpaired)
                out_fp.write(hdr + "\n")
                out_fp.write(dna.decode(s) + "\n+\n")
                out_fp.write(cov_q.tobytes().decode("latin1") + "\n")
    if native_pc is not None:
        rec = native_pc.stats()
        native_pc.close()
    avg = rec[1] / rec[0] if rec[0] else 0.0
    std = (rec[2] / rec[0] - avg * avg) ** 0.5 if rec[0] else 0.0
    cap = int(avg + std * 2.0 + 1.499)
    sys.stderr.write(f"[M::remap] avg = {avg:.2f} std = {std:.2f} cap = {cap}\n")
    return avg, std, cap


class _NativePaircov:
    """SMEM (raw) + paircov through native/remap.cpp; one engine instance
    per remap call (the pairing hash persists across batches, exactly like
    the Python path's `h`)."""

    def __init__(self, lib, index, sorted_arr, skip, max_dist, n_seqs):
        import ctypes
        self.ct = ctypes
        self.lib = lib
        self.index = index
        self.n_seqs = n_seqs
        self.sorted_arr = (np.ascontiguousarray(sorted_arr, np.uint64)
                           if sorted_arr is not None else None)
        self.hd = lib.fpaircov_create(int(skip), int(max_dist))

    @classmethod
    def try_create(cls, index, sorted_arr, skip, max_dist, n_seqs):
        if os.environ.get("FERMI_TPU_NATIVE_PAIRCOV", "1") != "1":
            return None
        try:
            from fermi_tpu import native
            lib = native.get_lib()
        except Exception:
            return None
        return cls(lib, index, sorted_arr, skip, max_dist, n_seqs)

    def run_batch(self, seqs):
        ct = self.ct
        flat, counts = sm.smem_all_native_raw(self.index, seqs)
        lens = np.array([len(s) for s in seqs], np.int64)
        flat = np.ascontiguousarray(flat, np.int64)
        counts = np.ascontiguousarray(counts, np.int64)
        total_len = int(lens.sum())
        cov = np.zeros(total_len, np.uint8)
        pcv = np.zeros(total_len, np.uint8)
        n_supp = np.zeros(len(seqs), np.int64)
        # every full-length member can yield at most one unpaired entry
        # (directly or via the hash drain)
        cap = int(flat[:, 2].sum()) + len(seqs) + 8 if len(flat) else 8
        unp_k = np.zeros(cap, np.int64)
        unp_v = np.zeros(cap, np.int64)
        unp_counts = np.zeros(len(seqs), np.int64)
        sa = self.sorted_arr
        self.lib.fpaircov_batch(
            self.hd,
            flat.ctypes.data_as(ct.POINTER(ct.c_int64)),
            counts.ctypes.data_as(ct.POINTER(ct.c_int64)),
            lens.ctypes.data_as(ct.POINTER(ct.c_int64)),
            len(seqs),
            sa.ctypes.data_as(ct.POINTER(ct.c_uint64)) if sa is not None
            else ct.cast(None, ct.POINTER(ct.c_uint64)),
            self.n_seqs,
            cov.ctypes.data_as(ct.POINTER(ct.c_uint8)),
            pcv.ctypes.data_as(ct.POINTER(ct.c_uint8)),
            n_supp.ctypes.data_as(ct.POINTER(ct.c_int64)),
            unp_k.ctypes.data_as(ct.POINTER(ct.c_int64)),
            unp_v.ctypes.data_as(ct.POINTER(ct.c_int64)),
            unp_counts.ctypes.data_as(ct.POINTER(ct.c_int64)))
        outs = []
        co = uo = 0
        for t, s in enumerate(seqs):
            l = len(s)
            nu = int(unp_counts[t])
            unpaired = list(zip(unp_k[uo: uo + nu].tolist(),
                                unp_v[uo: uo + nu].tolist()))
            outs.append((cov[co: co + l], pcv[co: co + l],
                         int(n_supp[t]), unpaired))
            co += l
            uo += nu
        return outs

    def stats(self):
        rec = np.zeros(3, np.int64)
        self.lib.fpaircov_stats(
            self.hd, rec.ctypes.data_as(self.ct.POINTER(self.ct.c_int64)))
        return [int(rec[0]), int(rec[1]), int(rec[2])]

    def close(self):
        self.lib.fpaircov_destroy(self.hd)
        self.hd = None


def _emit_broken(out_fp, name, masked: bytes, cov_q, n_supp):
    """Split a case-masked contig at lowercase stretches (smem.c:255-272)."""
    l = len(masked)
    s = masked.decode("latin1")
    j = 0
    while j < l and not s[j].isupper():
        j += 1
    beg = j
    k = 0
    j = beg + 1
    while j <= l:
        cur_low = s[j].islower() if j < l else False
        prev_up = s[j - 1].isupper() if j >= 1 else False
        if (cur_low or j == l) and prev_up:
            out_fp.write(f"@{name}_{k}\t{j - beg}\t{n_supp}\n")
            out_fp.write(s[beg:j] + "\n+\n")
            out_fp.write(cov_q[beg:j].tobytes().decode("latin1") + "\n")
            k += 1
        if j < l and s[j].isupper() and s[j - 1].islower():
            beg = j
        j += 1
