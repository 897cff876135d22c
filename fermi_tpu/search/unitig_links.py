"""Device (TPU) bulk computation of unitig link records.

Pass 1 of the bulk-link unitig reformulation (algos/unitig_bulk.py):
for B stored sequences at a time, compute the overlap walk + containment
bi-interval (reference unitig.c:38-91) and the full fm6_get_nei round
loop (unitig.c:93-179) as two jitted phases:

  phase A -- "walk": [B] lanes, one bi-interval each, backward over the
    read; per round one batched extend6; records the overlap list into
    [B, Lmax] buffers; finishes with the two containment extensions.

  phase B -- "get_nei": [B, Jmax] interval lanes seeded from the
    overlap lists; per round one forward extend6 over all lanes + one
    backward sentinel test over the 5 candidate columns, then the
    category logic (full-match detection, segmented group kill,
    neighbor/used-bit recording, child compaction + sort, category
    renumbering) entirely as vector ops per row.

Category semantics (unitig.c:137-153): lanes are kept sorted by
(category, next-base, overlap-offset); a full sentinel match kills the
rest of its category; children regroup by (old category, base).  The
"first full lane of each group kills lanes at >= its index" rule is a
segmented forward cummin over the fixed-width row -- the whole
irregular-interval-set algorithm becomes dense lane arithmetic.

Overflow of any fixed buffer (Jmax lanes, NMAX neighbors, SBMAX
used-intervals, round budget) sets a per-row redo flag; the stitch
recomputes those rows exactly on host.  Differentially tested against
algos/unitig_bulk.compute_link_host in tests/test_unitig_bulk.py.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from fermi_tpu.algos.unitig_bulk import Link

NMAX = 16     # neighbor records per sequence
SBMAX = 24    # used-bit interval records per sequence
_I32MAX = np.int32(2 ** 31 - 1)


@partial(jax.jit, static_argnums=(3,))
def _walk_phase(index, R, lens, mm):
    """Overlap walk + containment (unitig.c:38-91) for [B, Lmax] reads.

    Returns per-row: ovlp buffers (kb, kf, sz idtype; off int32) in walk
    order (increasing depth, decreasing offset), ovn, ret, intv0."""
    B, Lmax = R.shape
    idt = index.idtype
    rows = jnp.arange(B)
    lastc = R[rows, lens - 1]
    kb, kf, sz = index.set_intv(lastc)
    kb = kb.astype(idt)
    kf = kf.astype(idt)
    sz = jnp.where(lens > mm, sz.astype(idt), 0)
    zb = jnp.zeros((B, Lmax + 1), idt)
    st = dict(kb=kb, kf=kf, sz=sz,
              ov_kb=zb, ov_kf=zb, ov_sz=zb,
              ov_off=jnp.zeros((B, Lmax + 1), jnp.int32),
              ovn=jnp.zeros(B, jnp.int32))

    def body(t, st):
        j = lens - 2 - t
        act = (j >= 0) & (st["sz"] > 0)
        c = R[rows, jnp.maximum(j, 0)].astype(jnp.int32)
        KB, KF, SZ = index.extend6(st["kb"], st["kf"],
                                   jnp.where(act, st["sz"], 0), True)
        csel = jnp.take_along_axis(SZ, c[:, None], axis=1)[:, 0]
        # record the pre-extension interval when depth >= mm, the
        # sentinel branch is live, and the walk does not die here
        rec = act & (csel > 0) & (t + 1 >= mm) & (SZ[:, 0] > 0)
        slot = jnp.where(rec, st["ovn"], Lmax)
        st["ov_kb"] = st["ov_kb"].at[rows, slot].set(st["kb"])
        st["ov_kf"] = st["ov_kf"].at[rows, slot].set(st["kf"])
        st["ov_sz"] = st["ov_sz"].at[rows, slot].set(st["sz"])
        st["ov_off"] = st["ov_off"].at[rows, slot].set(j + 1)
        st["ovn"] = st["ovn"] + rec.astype(jnp.int32)
        step = act & (csel > 0)
        st["kb"] = jnp.where(
            step, jnp.take_along_axis(KB, c[:, None], axis=1)[:, 0], st["kb"])
        st["kf"] = jnp.where(
            step, jnp.take_along_axis(KF, c[:, None], axis=1)[:, 0], st["kf"])
        st["sz"] = jnp.where(step, csel, jnp.where(act, 0, st["sz"]))
        return st

    st = jax.lax.fori_loop(0, Lmax - 1, body, st)
    # containment tail (unitig.c:82-90)
    KB, KF, SZ = index.extend6(st["kb"], st["kf"], st["sz"], True)
    ret = jnp.where(st["sz"] != SZ[:, 0], -1, 0)
    KB2, KF2, SZ2 = index.extend6(KB[:, 0], KF[:, 0], SZ[:, 0], False)
    ret = jnp.where(SZ[:, 0] != SZ2[:, 0], -1, ret)
    intv0 = (KB2[:, 0], KF2[:, 0], SZ2[:, 0])
    return (st["ov_kb"][:, :Lmax], st["ov_kf"][:, :Lmax],
            st["ov_sz"][:, :Lmax], st["ov_off"][:, :Lmax],
            st["ovn"], ret, intv0)


def _seg_cummin(v, b):
    """Per-row segmented forward cummin: reset at boundaries b."""
    def op(a, c):
        v1, b1 = a
        v2, b2 = c
        return jnp.where(b2, v2, jnp.minimum(v1, v2)), b1 | b2
    out, _ = jax.lax.associative_scan(op, (v, b), axis=1)
    return out


@partial(jax.jit, static_argnums=(7, 8))
def _getnei_phase(index, ov_kb, ov_kf, ov_sz, ov_off, ovn, lens,
                  jmax, maxr):
    """fm6_get_nei rounds (unitig.c:109-155) for B rows at once."""
    B, Lmax = ov_kb.shape
    idt = index.idtype
    rows = jnp.arange(B)
    lane = jnp.arange(jmax, dtype=jnp.int32)
    # seed lanes from the reversed overlap list (deepest last)
    src = ovn[:, None] - 1 - lane[None, :]
    valid = src >= 0
    srcc = jnp.maximum(src, 0)
    kb = jnp.where(valid, jnp.take_along_axis(ov_kb, srcc, axis=1), 0)
    kf = jnp.where(valid, jnp.take_along_axis(ov_kf, srcc, axis=1), 0)
    sz = jnp.where(valid, jnp.take_along_axis(ov_sz, srcc, axis=1), 0)
    off = jnp.where(valid, jnp.take_along_axis(ov_off, srcc, axis=1), 0)
    st = dict(
        kb=kb, kf=kf, sz=sz, off=off.astype(jnp.int32),
        cat=jnp.zeros((B, jmax), jnp.int32), alive=valid,
        nei_kb=jnp.zeros((B, NMAX + 1), idt),
        nei_kf=jnp.zeros((B, NMAX + 1), idt),
        nei_sz=jnp.zeros((B, NMAX + 1), idt),
        nei_ov=jnp.zeros((B, NMAX + 1), jnp.int32),
        nei_ext=jnp.zeros((B, NMAX + 1), jnp.int32),
        nein=jnp.zeros(B, jnp.int32),
        sb_kb=jnp.zeros((B, SBMAX + 1), idt),
        sb_kf=jnp.zeros((B, SBMAX + 1), idt),
        sb_sz=jnp.zeros((B, SBMAX + 1), idt),
        sbn=jnp.zeros(B, jnp.int32),
        appended=jnp.zeros(B, jnp.int32),
        forked=jnp.zeros(B, bool),
        redo=ovn > jmax,
        rounds=jnp.int32(0),
    )

    def cond(st):
        return jnp.any(st["alive"]) & (st["rounds"] < maxr)

    def body(st):
        alive = st["alive"]
        msz = jnp.where(alive, st["sz"], 0)
        KB, KF, SZ = index.extend6(
            st["kb"].reshape(-1), st["kf"].reshape(-1), msz.reshape(-1),
            False)
        KB = KB.reshape(B, jmax, 6)
        KF = KF.reshape(B, jmax, 6)
        SZ = SZ.reshape(B, jmax, 6)
        # backward sentinel test of candidate columns 0..4
        cs = jnp.arange(5)
        fkb = KB[:, :, :5].reshape(-1)
        fkf = KF[:, :, :5].reshape(-1)
        fsz = SZ[:, :, :5].reshape(-1)
        BKB, BKF, BSZ = index.extend6(fkb, fkf, fsz, True)
        BKB0 = BKB[:, 0].reshape(B, jmax, 5)
        BKF0 = BKF[:, 0].reshape(B, jmax, 5)
        BSZ0 = BSZ[:, 0].reshape(B, jmax, 5)

        ok0 = SZ[:, :, 0]
        sbkb, sbkf, sbsz = BKB0[:, :, 0], BKF0[:, :, 0], BSZ0[:, :, 0]
        started = st["appended"][:, None] > 0
        sent = alive & started & (ok0 > 0) & (sbsz > 0)
        full = sent & (ok0 == st["sz"]) & (st["sz"] == sbsz)
        # first full lane per category group kills lanes at >= its index
        bnd = jnp.concatenate(
            [jnp.ones((B, 1), bool),
             st["cat"][:, 1:] != st["cat"][:, :-1]], axis=1)
        ffc = jnp.where(full, lane[None, :], _I32MAX)
        ff = _seg_cummin(ffc, bnd)
        killed = alive & (lane[None, :] >= ff)
        process = alive & ~killed
        append = full & (lane[None, :] == ff)
        partial_sb = process & sent & ~full

        # neighbor records, in lane order (matches the j loop order)
        apos = st["nein"][:, None] + jnp.cumsum(append, axis=1) - append
        slot = jnp.where(append, jnp.minimum(apos, NMAX), NMAX)
        st["nei_kb"] = st["nei_kb"].at[rows[:, None], slot].set(sbkb)
        st["nei_kf"] = st["nei_kf"].at[rows[:, None], slot].set(sbkf)
        st["nei_sz"] = st["nei_sz"].at[rows[:, None], slot].set(sbsz)
        st["nei_ov"] = st["nei_ov"].at[rows[:, None], slot].set(
            lens[:, None] - st["off"])
        st["nei_ext"] = st["nei_ext"].at[rows[:, None], slot].set(
            st["appended"][:, None])
        nadd = jnp.sum(append, axis=1).astype(jnp.int32)
        st["redo"] = st["redo"] | (st["nein"] + nadd > NMAX)
        st["nein"] = st["nein"] + nadd

        # used-bit records (partial sentinel matches), lane order
        spos = st["sbn"][:, None] + jnp.cumsum(partial_sb, axis=1) - partial_sb
        slot = jnp.where(partial_sb, jnp.minimum(spos, SBMAX), SBMAX)
        st["sb_kb"] = st["sb_kb"].at[rows[:, None], slot].set(sbkb)
        st["sb_kf"] = st["sb_kf"].at[rows[:, None], slot].set(sbkf)
        st["sb_sz"] = st["sb_sz"].at[rows[:, None], slot].set(sbsz)
        sadd = jnp.sum(partial_sb, axis=1).astype(jnp.int32)
        st["redo"] = st["redo"] | (st["sbn"] + sadd > SBMAX)
        st["sbn"] = st["sbn"] + sadd

        # children: (j major, c minor), key = (cat, c, off)
        cmask = (process[:, :, None] & (SZ[:, :, 1:5] > 0)
                 & (BSZ0[:, :, 1:5] > 0))                    # [B, J, 4]
        ckey = (st["cat"][:, :, None] << 13
                | (cs[1:5][None, None, :]).astype(jnp.int32) << 10
                | st["off"][:, :, None]).astype(jnp.int32)
        ckey = jnp.where(cmask, ckey, _I32MAX).reshape(B, jmax * 4)
        ckb = KB[:, :, 1:5].reshape(B, jmax * 4)
        ckf = KF[:, :, 1:5].reshape(B, jmax * 4)
        csz = SZ[:, :, 1:5].reshape(B, jmax * 4)
        order = jnp.argsort(ckey, axis=1)[:, :jmax]
        skey = jnp.take_along_axis(ckey, order, axis=1)
        nvalid = skey != _I32MAX
        ncnt = jnp.sum(cmask.reshape(B, jmax * 4), axis=1)
        st["redo"] = st["redo"] | (ncnt > jmax)
        st["kb"] = jnp.take_along_axis(ckb, order, axis=1)
        st["kf"] = jnp.take_along_axis(ckf, order, axis=1)
        st["sz"] = jnp.take_along_axis(csz, order, axis=1)
        st["off"] = (skey & 0x3ff).astype(jnp.int32)
        # category renumber: group = runs of equal (cat, c) = key >> 10
        khi = skey >> 10
        nb = jnp.concatenate(
            [jnp.ones((B, 1), bool), khi[:, 1:] != khi[:, :-1]], axis=1)
        ncat = jax.lax.cummax(
            jnp.where(nb, lane[None, :], 0), axis=1)
        st["cat"] = jnp.where(nvalid, ncat, 0).astype(jnp.int32)
        st["forked"] = st["forked"] | jnp.any(nb[:, 1:] & nvalid[:, 1:],
                                              axis=1)
        st["appended"] = st["appended"] + jnp.any(nvalid, axis=1)
        st["alive"] = nvalid
        st["rounds"] = st["rounds"] + 1
        return st

    st = jax.lax.while_loop(cond, body, st)
    st["redo"] = st["redo"] | jnp.any(st["alive"], axis=1)
    return (st["nei_kb"][:, :NMAX], st["nei_kf"][:, :NMAX],
            st["nei_sz"][:, :NMAX], st["nei_ov"][:, :NMAX],
            st["nei_ext"][:, :NMAX], st["nein"],
            st["sb_kb"][:, :SBMAX], st["sb_kf"][:, :SBMAX],
            st["sb_sz"][:, :SBMAX], st["sbn"],
            st["forked"], st["redo"])


class LinkStore:
    """SoA link records for n stored sequences (device outputs, host
    arrays); indexable like the list compute_links_host returns."""

    def __init__(self, n):
        self.n = n
        self.valid = np.zeros(n, bool)
        self.ret = np.zeros(n, np.int8)
        self.intv0 = np.zeros((n, 3), np.int64)
        self.has_ovlp = np.zeros(n, bool)
        self.nei = [None] * n      # filled lazily from buffers
        self.nei_buf = None        # (kb, kf, sz, ov, ext) [n, NMAX]
        self.nein = np.zeros(n, np.int32)
        self.sb_buf = None         # (kb, kf, sz) [n, SBMAX]
        self.sbn = np.zeros(n, np.int32)
        self.forked = np.zeros(n, bool)
        self.redo = np.zeros(n, bool)
        self._overlay = {}

    def __getitem__(self, x):
        if x in self._overlay:
            return self._overlay[x]
        lk = Link()
        lk.ok = bool(self.valid[x])
        if not lk.ok:
            return lk
        lk.redo = bool(self.redo[x])
        lk.ret = int(self.ret[x])
        lk.intv0 = tuple(int(v) for v in self.intv0[x])
        lk.has_ovlp = bool(self.has_ovlp[x])
        lk.forked = bool(self.forked[x])
        nkb, nkf, nsz, nov, nex = self.nei_buf
        m = int(self.nein[x])
        lk.nei = [(int(nkb[x, i]), int(nkf[x, i]), int(nsz[x, i]),
                   int(nov[x, i]), int(nex[x, i])) for i in range(m)]
        skb, skf, ssz = self.sb_buf
        m = int(self.sbn[x])
        lk.sbits = [(int(skb[x, i]), int(skf[x, i]), int(ssz[x, i]))
                    for i in range(m)]
        return lk

    def __setitem__(self, x, lk):
        self._overlay[x] = lk

    def __len__(self):
        return self.n


def compute_links_device(index, seqs, min_match, batch=2048, jmax=None,
                         verbose=False):
    """Bulk device link computation for all of `seqs` (list of nt6
    arrays).  Returns a LinkStore; rows whose buffers overflowed are
    flagged .redo for exact host recomputation by the stitch."""
    n = len(seqs)
    store = LinkStore(n)
    lmax_all = max((len(s) for s in seqs), default=0)
    if jmax is None:
        jmax = 1 << max(3, int(np.ceil(np.log2(
            max(lmax_all - min_match + 2, 8)))))
        jmax = min(jmax, 128)
    neis = [None] * 5
    sbs = [None] * 3
    nei_parts = [[] for _ in range(5)]
    sb_parts = [[] for _ in range(3)]
    order = np.argsort([len(s) for s in seqs], kind="stable")
    # process in length buckets to keep Lmax tight per batch
    for b0 in range(0, n, batch):
        idxs = order[b0:b0 + batch]
        B = len(idxs)
        lens = np.array([len(seqs[i]) for i in idxs], np.int32)
        lmax = max(int(lens.max()), min_match + 2)
        R = np.zeros((B, lmax), np.uint8)
        for r, i in enumerate(idxs):
            R[r, :lens[r]] = seqs[i]
        # pad batch to full size for jit shape stability
        if B < batch:
            pad = batch - B
            R = np.vstack([R, np.zeros((pad, lmax), np.uint8)])
            lens = np.concatenate([lens, np.full(pad, 1, np.int32)])
        Rd = jnp.asarray(R)
        ld = jnp.asarray(lens)
        ovkb, ovkf, ovsz, ovoff, ovn, ret, intv0 = _walk_phase(
            index, Rd, ld, min_match)
        outs = _getnei_phase(index, ovkb, ovkf, ovsz, ovoff, ovn, ld,
                             jmax, lmax + 2)
        (nkb, nkf, nsz, nov, nex, nein,
         skb, skf, ssz, sbn, forked, redo) = [np.asarray(o) for o in outs]
        ovn_h = np.asarray(ovn)
        ret_h = np.asarray(ret)
        i0 = np.asarray(intv0[0])
        i1 = np.asarray(intv0[1])
        i2 = np.asarray(intv0[2])
        valid = lens > min_match
        store.valid[idxs] = valid[:B]
        store.ret[idxs] = ret_h[:B]
        store.intv0[idxs, 0] = i0[:B]
        store.intv0[idxs, 1] = i1[:B]
        store.intv0[idxs, 2] = i2[:B]
        store.has_ovlp[idxs] = ovn_h[:B] > 0
        store.nein[idxs] = nein[:B]
        store.sbn[idxs] = sbn[:B]
        store.forked[idxs] = forked[:B]
        store.redo[idxs] = redo[:B]
        for li, a in zip(nei_parts, (nkb, nkf, nsz, nov, nex)):
            li.append((idxs, a[:B]))
        for li, a in zip(sb_parts, (skb, skf, ssz)):
            li.append((idxs, a[:B]))
        if verbose:
            import sys
            sys.stderr.write(
                f"[unitig_links] {min(b0+batch, n)}/{n} "
                f"(redo {int(store.redo.sum())})\n")
    # assemble full buffers
    def _assemble(parts, dtype):
        out = np.zeros((n, parts[0][1].shape[1]), dtype)
        for idxs, a in parts:
            out[idxs] = a
        return out
    if n:
        store.nei_buf = tuple(
            _assemble(p, np.int64 if i < 3 else np.int32)
            for i, p in enumerate(nei_parts))
        store.sb_buf = tuple(_assemble(p, np.int64) for p in sb_parts)
    return store
