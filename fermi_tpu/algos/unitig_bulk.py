"""Bulk-link unitig: the TPU-first reformulation of the assembly core.

KEY INSIGHT (this is the redesign, not a port): the reference's
fm6_get_nei at a contig tip (reference unitig.c:93-179) only ever reads
the bases of the LAST consumed read -- by construction the contig tail
s[beg:] always equals that read's full sequence -- so the
neighbor-extension result of every possible tip is a pure per-stored-
sequence property of the (immutable) FMD index.  Assembly therefore
splits into:

  pass 1 -- "links" (bulk, embarrassingly parallel, device): for every
    stored sequence x in [0, n_seqs) compute a LINK RECORD from its
    bases alone: the overlap walk + containment bi-interval
    (unitig.c:38-91) and the full get_nei round loop (unitig.c:93-179),
    recording neighbor intervals, fork flags, and the used-bit
    intervals the sequential algorithm would set.  No shared state.

  pass 2 -- "stitch" (host, exact replay): a sequential walk that
    replays unitig1 / unitig_unidir (unitig.c:227-317, 333-357) in the
    reference t=1 seed order over the precomputed records.  The only
    index queries left on this path are check_left verifications
    (unitig.c:186-225, ~4% of total query volume); everything else is
    array lookups.  Output is byte-identical to the sequential oracle.

This file holds the host (numpy) implementation of pass 1 -- the exact
specification the device kernel is differentially tested against --
and the stitch.
"""

import numpy as np

from fermi_tpu.algos.unitig import UnitigBuilder, comp6, mag_v_format


class Link:
    """Per-stored-sequence link record (all ranks are absolute)."""

    __slots__ = ("ok", "ret", "intv0", "has_ovlp", "nei",
                 "forked", "sbits", "redo")

    def __init__(self):
        self.ok = False        # record valid (len > min_match)
        self.ret = 0           # is_contained verdict (-1 contained)
        self.intv0 = (0, 0, 0)  # sentinel-bounded bi-interval of the seq
        self.has_ovlp = False  # overlap list non-empty
        self.nei = []          # [(kb, kf, sz, ov, ext)] in append order
        self.forked = False    # is_forked at get_nei return
        self.sbits = []        # [(kb, kf, sz)] used-interval side effects
        self.redo = False      # device overflow -> host recompute


def _extend1(e, kb, kf, sz, is_back):
    KB, KF, SZ = e.extend6(np.array([kb], np.int64), np.array([kf], np.int64),
                           np.array([sz], np.int64), is_back)
    return KB[0], KF[0], SZ[0]


def overlap_walk(e, R, min_match):
    """fm6_overlap_intv(R, min_match, |R|-1, at5=0, inc_sentinel=0)
    (unitig.c:38-64): backward walk over R recording, per depth >=
    min_match with a live sentinel branch, the pre-sentinel interval and
    the overlap start offset.  Returns (ik_full, ovlp)."""
    l = len(R)
    ik = [*e.set_intv(int(R[l - 1])), 0]
    out = []
    depth, j = 1, l - 2
    while j != -1:
        c = int(R[j])
        KB, KF, SZ = _extend1(e, ik[0], ik[1], ik[2], True)
        if SZ[c] == 0:
            break
        if depth >= min_match and SZ[0]:
            out.append([ik[0], ik[1], ik[2], j + 1])
        ik = [int(KB[c]), int(KF[c]), int(SZ[c]), 0]
        j -= 1
        depth += 1
    out.reverse()
    return ik, out


def compute_link_host(e, R, min_match):
    """Exact host computation of one link record (the device spec).

    Mirrors fm6_is_contained (unitig.c:77-91) + fm6_get_nei
    (unitig.c:93-179) called at tip R with prev = the overlap list --
    as the sequential algorithm does both for seeds and for every
    consumed-read continuation.  Used-bit side effects are RECORDED
    (sbits) instead of applied; the sequence mutations of get_nei
    (base appends, fork trims, the contained-read re-derive of
    unitig.c:158-176) have no effect outside the call and are reduced
    to an append counter."""
    lk = Link()
    if len(R) <= min_match:
        return lk
    lk.ok = True
    ik, ovlp = overlap_walk(e, R, min_match)
    lk.has_ovlp = bool(ovlp)

    # -- is_contained tail (unitig.c:82-90)
    KB, KF, SZ = _extend1(e, ik[0], ik[1], ik[2], True)
    assert SZ[0]
    ret = -1 if ik[2] != SZ[0] else 0
    ik2 = (int(KB[0]), int(KF[0]), int(SZ[0]))
    KB, KF, SZ = _extend1(e, ik2[0], ik2[1], ik2[2], False)
    assert SZ[0]
    if ik2[2] != SZ[0]:
        ret = -1
    lk.ret = ret
    lk.intv0 = (int(KB[0]), int(KF[0]), int(SZ[0]))

    # -- get_nei rounds (unitig.c:109-155), prev = ovlp, beg = 0
    prev = [list(p) for p in ovlp]
    cat = [0] * len(prev)
    appended = 0          # len(s) - ori_l in the reference
    while prev:
        J = len(prev)
        kb = np.fromiter((p[0] for p in prev), np.int64, J)
        kf = np.fromiter((p[1] for p in prev), np.int64, J)
        sz = np.fromiter((p[2] for p in prev), np.int64, J)
        KB, KF, SZ = e.extend6(kb, kf, sz, False)          # forward
        # backward sentinel test of all 5 candidate columns
        flat_kb = np.concatenate([KB[:, c] for c in range(5)])
        flat_kf = np.concatenate([KF[:, c] for c in range(5)])
        flat_sz = np.concatenate([SZ[:, c] for c in range(5)])
        BKB, BKF, BSZ = e.extend6(flat_kb, flat_kf, flat_sz, True)
        curr = []
        for j in range(J):
            if cat[j] < 0:
                continue
            p = prev[j]
            ok0_sz = int(SZ[j, 0])
            if ok0_sz and appended != 0:
                sb = (int(BKB[j, 0]), int(BKF[j, 0]), int(BSZ[j, 0]))
                if sb[2]:
                    if ok0_sz == p[2] and p[2] == sb[2]:
                        cat0 = cat[j]
                        i = j
                        while i < J and cat[i] == cat0:
                            cat[i] = -1
                            i += 1
                        lk.nei.append((sb[0], sb[1], sb[2],
                                       len(R) - (p[3] & 0xffffffff),
                                       appended))
                        continue
                    else:
                        lk.sbits.append(sb)
            if cat[j] < 0:
                continue
            for c in range(1, 5):
                if SZ[j, c]:
                    r = c * J + j
                    if BSZ[r, 0]:
                        info = (p[3] & 0xFFFFFFF0FFFFFFFF) | c << 32
                        curr.append([int(KB[j, c]), int(KF[j, c]),
                                     int(SZ[j, c]), info])
        if curr:
            appended += 1
            curr.sort(key=lambda q: q[3])
            last = curr[0][3] >> 32
            cat = [0] * len(curr)
            curr[0][3] &= 0xffffffff
            cat0 = 0
            for j in range(1, len(curr)):
                if curr[j][3] >> 32 != last:
                    last = curr[j][3] >> 32
                    cat0 = j
                cat[j] = cat0
                curr[j][3] = (curr[j][3] & 0xffffffff) | cat0 << 36
            if cat0 != 0:
                lk.forked = True
        prev = curr
    return lk


def retrieve_all(e, n=None):
    """Sequences + fm_retrieve final ranks for every stored sequence."""
    n = int(e.n_seqs) if n is None else n
    seqs, ks = e.retrieve_batch(np.arange(n, dtype=np.int64))
    return seqs, ks


def compute_links_host(e, seqs, min_match):
    return [compute_link_host(e, s, min_match) for s in seqs]


def stitch(e, links, seqs, own_ks, min_match, out_fp, sorted_arr=None):
    """Sequential replay of fm6_unitig t=1 (unitig.c:319-357) over
    precomputed link records.  Records flagged .redo (device overflow)
    are recomputed exactly on host.  `stats` counters are returned for
    observability (oracle-recovery events should be ~0)."""
    n1 = int(e.n_seqs)
    b = UnitigBuilder(e, min_match, sorted_arr)
    used, bend, visited = b.used, b.bend, b.visited
    stats = {"links_redone": 0, "tail_recoveries": 0, "rc_misses": 0}
    # Rank-domain bridge: nei/intv0 identities are ranks of the sentinel
    # PRECEDING a read in the text (what fm_retrieve returns as k), while
    # seqs/links are indexed by the rank retrieve started from.  own_ks
    # is that bijection; invert it to look members up.
    inv = np.empty(n1, np.int64)
    inv[np.asarray(own_ks[:n1], np.int64)] = np.arange(n1)

    def get_link(x):
        lk = links[x]
        if lk is None or lk.redo:
            stats["links_redone"] += 1
            lk = compute_link_host(e, seqs[x], min_match)
            links[x] = lk
        return lk

    def link_for_string(R):
        lk = compute_link_host(e, np.asarray(R, np.uint8), min_match)
        return lk

    def find_member(nei_entry, tip):
        """The consumed read: the sentinel-interval member whose full
        sequence equals the contig tail s[rbeg:] extended to its end."""
        kb, kf, sz, ov, ext = nei_entry
        want = ov + ext
        for i in range(sz):
            x = int(inv[kb + i])
            sx = seqs[x]
            if len(sx) != want:
                continue
            if all(int(sx[t]) == tip[t] for t in range(len(tip))):
                return x
        return -1

    def unidir(s, cov, beg0, k0, end, first_lk):
        beg, ori_l, n_reads = beg0, len(s), 0
        is_loop = False
        lk = first_lk
        nei = []
        while True:
            for t in lk.sbits:
                b.set_bits(t)
            nei = lk.nei
            if not nei:
                break
            rbeg = ori_l - nei[0][3]
            if len(nei) > 1:
                bend[end] = True
                break
            # single neighbor: the reference's get_nei has already grown
            # s to the consumed read's end at this point (unitig.c:155);
            # replay that before check_left, which walks the extended s.
            x = find_member(nei[0], s[rbeg:])
            if x >= 0:
                s.extend(int(c) for c in seqs[x][ori_l - rbeg:])
                next_lk = None  # resolved lazily below (only on accept)
            else:
                # no stored sequence equals the tip context: recover
                # the appended bases + next link exactly
                stats["tail_recoveries"] += 1
                bb = UnitigBuilder(e, min_match, sorted_arr)
                bb.used = None   # side effects already applied via sbits
                s2 = list(s)
                rb2, nei2 = bb.get_nei(beg, s2, [])
                assert rb2 == rbeg and len(nei2) == 1
                s = s2
            k = nei[0][0]
            if k == end:
                break
            if bend[k] or b.check_left(
                    beg, rbeg, s, [list(nei[0][:4])]) < 0:
                bend[k] = True
                break
            if k == k0:
                is_loop = True
                break
            if nei[0][1] == end:
                nei = []
                break
            end = nei[0][1]
            b.set_bits(nei[0][:3])
            n_reads += 1
            del cov[len(s):]
            while len(cov) < len(s):
                cov.append(ord('"'))
            for i in range(rbeg, ori_l):
                if cov[i] != ord('~'):
                    cov[i] += 1
            beg, ori_l = rbeg, len(s)
            lk = get_link(x) if x >= 0 else link_for_string(s[rbeg:])
        del s[ori_l:]
        del cov[ori_l:]
        return n_reads, end, is_loop, [(p[0], p[3]) for p in nei], s

    def rc_link(intv0, R):
        """Link of the reverse complement: any member of the RC side of
        the sentinel-bounded bi-interval stores exactly RC(R)."""
        rc = [comp6(int(c)) for c in R[::-1]]
        for i in range(intv0[2]):
            x = int(inv[intv0[1] + i])
            sx = seqs[x]
            if len(sx) == len(rc) and all(int(sx[t]) == rc[t]
                                          for t in range(len(rc))):
                return get_link(x)
        stats["rc_misses"] += 1
        return link_for_string(rc)

    def unitig1(seed):
        if sorted_arr is not None and used[seed]:
            return None
        R = seqs[seed]
        if len(R) <= min_match:
            return None
        if sorted_arr is None and used[own_ks[seed]]:
            return None
        lk = get_link(seed)
        intv0 = lk.intv0
        b.set_bits(intv0)
        if lk.ret < 0:
            return None
        n_reads = 1
        s = [int(c) for c in R]
        seed_len = len(s)
        cov = [ord('"')] * len(s)
        end = [intv0[1], intv0[0]]
        nei_out = [[], []]
        if lk.has_ovlp:
            nr, end0, is_loop, nei, s = unidir(s, cov, 0, intv0[0],
                                               end[0], lk)
            n_reads += nr
            end[0] = end0
            nei_out[0] = nei
            if is_loop:
                nei_out[1] = [(end[0], nei[0][1])]
                return dict(seq=s, cov=cov, k=end, nei=nei_out, nsr=n_reads)
        s = [comp6(c) for c in s[::-1]]
        cov.reverse()
        nr, end1, is_loop, nei, s = unidir(s, cov, len(s) - seed_len,
                                           intv0[1], end[1],
                                           rc_link(intv0, R))
        n_reads += nr
        end[1] = end1
        nei_out[1] = nei
        return dict(seq=s, cov=cov, k=end, nei=nei_out, nsr=n_reads)

    for j in range(0, (n1 >> 2) + 1):
        for i in range(j << 2 | 1, min((j << 2) + 4, n1), 2):
            z = unitig1(i)
            if z is None:
                continue
            k0, k1 = z["k"]
            if visited[k0] or visited[k1]:
                continue
            visited[k0] = visited[k1] = True
            out_fp.write(mag_v_format(z))
    return stats


def fm6_unitig_bulk(e, min_match, out_fp, sorted_arr=None, links=None,
                    seqs=None, own_ks=None):
    """Bulk-link unitig entry: host-oracle links unless provided."""
    if seqs is None or own_ks is None:
        seqs, own_ks = retrieve_all(e)
    if links is None:
        links = compute_links_host(e, seqs, min_match)
    return stitch(e, links, seqs, own_ks, min_match, out_fp, sorted_arr)


def stitch_native(e, store, seqs, own_ks, min_match, sorted_arr=None):
    """C++ stitch (native/unitig.cpp funitig_stitch) over a LinkStore:
    the production pass-2.  Byte-identical to stitch() (tested); redo
    rows and check_left run in the native engine.  Returns (mag_text,
    n_recover)."""
    import ctypes

    from fermi_tpu import native

    lib = native.get_lib()
    n = int(e.n_seqs)
    flat = np.concatenate(seqs) if n else np.zeros(0, np.uint8)
    flat = np.ascontiguousarray(flat, np.uint8)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offs[1:])
    ks = np.ascontiguousarray(np.asarray(own_ks[:n], np.int64))
    srt_ptr = None
    if sorted_arr is not None:
        sorted_arr = np.ascontiguousarray(sorted_arr, dtype=np.uint64)
        srt_ptr = sorted_arr.ctypes.data_as(ctypes.c_void_p)
    blocks = np.ascontiguousarray(e.blocks)
    occ = getattr(e, "occ8", None)
    if occ is None:
        occ6 = e.occ.astype(np.int64, copy=False)
        occ = np.zeros((occ6.shape[0], 8), np.int64)
        occ[:, : occ6.shape[1]] = occ6
    cnt8 = np.zeros(8, np.int64)
    cnt8[:7] = np.asarray(e.cnt, np.int64)[:7]
    cnt8[7] = cnt8[6]
    idt64 = 1 if store.nei_buf[0].dtype == np.int64 else 0
    nmax = store.nei_buf[0].shape[1]
    sbmax = store.sb_buf[0].shape[1]

    def p(a, t):
        return np.ascontiguousarray(a).ctypes.data_as(ctypes.POINTER(t))

    out_len = ctypes.c_int64()
    n_rec = ctypes.c_int64()
    u8, i8, i32, i64 = (ctypes.c_uint8, ctypes.c_int8, ctypes.c_int32,
                        ctypes.c_int64)
    ptr = lib.funitig_stitch(
        p(blocks, u8), p(occ, i64), blocks.shape[0], p(cnt8, i64), n,
        min_match, srt_ptr, p(flat, u8), p(offs, i64), p(ks, i64),
        p(store.valid.view(np.uint8), u8), p(store.ret, i8),
        p(store.intv0, i64), p(store.has_ovlp.view(np.uint8), u8),
        np.ascontiguousarray(store.nei_buf[0]).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(store.nei_buf[1]).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(store.nei_buf[2]).ctypes.data_as(ctypes.c_void_p),
        p(store.nei_buf[3], i32), p(store.nei_buf[4], i32),
        p(store.nein, i32), nmax,
        np.ascontiguousarray(store.sb_buf[0]).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(store.sb_buf[1]).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(store.sb_buf[2]).ctypes.data_as(ctypes.c_void_p),
        p(store.sbn, i32), sbmax,
        p(store.redo.view(np.uint8), u8), idt64,
        ctypes.byref(out_len), ctypes.byref(n_rec))
    try:
        text = ctypes.string_at(ptr, out_len.value).decode("latin1")
    finally:
        lib.frld_free(ptr)
    return text, int(n_rec.value)


def fm6_unitig_device(e, fmd_path, min_match, out_fp, sorted_arr=None,
                      batch=8192, verbose=True):
    """Device unitig: TPU bulk link records (pass 1) + native C++ stitch
    (pass 2).  Byte-identical to fm6_unitig(..., n_threads=1).

    `e` is the host index (for the stitch's check_left/redo paths);
    `fmd_path` names the same .fmd for the device index.  See the module
    docstring for the reformulation; the single-chip economics are in
    BENCH_NOTES.md (the HBM random-gather roofline bounds pass 1)."""
    import sys
    import time

    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search.extend import retrieve_strings
    from fermi_tpu.search.unitig_links import compute_links_device

    def log(m):
        if verbose:
            sys.stderr.write(f"[unitig_device] {m}\n")

    idx = FMDIndex.restore(fmd_path)
    n = int(idx.n_seqs)
    t0 = time.time()
    seqs, own_ks = [], np.zeros(n, np.int64)
    rb = 1 << 16
    for b0 in range(0, n, rb):
        ids = np.arange(b0, min(b0 + rb, n), dtype=np.int64)
        ss, ks = retrieve_strings(idx, ids, max_len=1 << 10)
        seqs.extend(ss)
        own_ks[b0:b0 + len(ids)] = ks
    t1 = time.time()
    log(f"retrieve {n} seqs: {t1 - t0:.1f}s")
    store = compute_links_device(idx, seqs, min_match, batch=batch,
                                 verbose=verbose)
    t2 = time.time()
    log(f"device links: {t2 - t1:.1f}s (redo {int(store.redo.sum())})")
    text, nrec = stitch_native(e, store, seqs, own_ks, min_match,
                               sorted_arr=sorted_arr)
    log(f"native stitch: {time.time() - t2:.1f}s (recoveries {nrec})")
    out_fp.write(text)
