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


@partial(jax.jit, static_argnums=(7, 8, 9))
def _getnei_phase(index, ov_kb, ov_kf, ov_sz, ov_off, ovn, lens,
                  jmax, maxr, ncand):
    """fm6_get_nei rounds (unitig.c:109-155) for B rows at once.

    `ncand` is the number of packed candidate slots per lane for the
    backward sentinel test (the reference tests all four bases plus the
    sentinel; on genomic data almost every lane has a single live base,
    so 2 slots + overflow-redo cuts the gather volume ~2x).  Rows that
    exceed any static budget (jmax lanes, ncand candidates, NMAX/SBMAX
    records, maxr rounds) are redo-flagged and rerun by the wrapper's
    ladder with wider budgets."""
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
        # dead lanes gather at position 0 (one cached row) instead of
        # their stale positions: masked gathers are the dominant round
        # cost otherwise (BENCH_NOTES round-5 ablation)
        mkb = jnp.where(alive, st["kb"], 0)
        mkf = jnp.where(alive, st["kf"], 0)
        KB, KF, SZ = index.extend6(
            mkb.reshape(-1), mkf.reshape(-1), msz.reshape(-1),
            False)
        KB = KB.reshape(B, jmax, 6)
        KF = KF.reshape(B, jmax, 6)
        SZ = SZ.reshape(B, jmax, 6)
        # pack the first `ncand` live candidate bases (ascending c) of
        # each lane; redo rows where a processed lane has more
        cn = SZ[:, :, 1:5] > 0                               # [B, J, 4]
        cbase = jnp.broadcast_to(
            jnp.arange(1, 5, dtype=jnp.int32)[None, None, :], cn.shape)
        dead8 = (~cn).astype(jnp.int8)
        _, sKB, sKF, sSZ, scc = jax.lax.sort(
            (dead8, KB[:, :, 1:5], KF[:, :, 1:5], SZ[:, :, 1:5], cbase),
            dimension=2, num_keys=1, is_stable=True)
        cval = sSZ[:, :, :ncand] > 0
        cKB = sKB[:, :, :ncand]
        cKF = sKF[:, :, :ncand]
        cSZ = jnp.where(cval, sSZ[:, :, :ncand], 0)
        cidx = scc[:, :, :ncand] - 1
        # backward sentinel test: sentinel column + packed candidates.
        # Route unused slots to position 0: the sentinel slot matters
        # only for live lanes past round 0 with a live sentinel branch,
        # candidate slots only where a live base exists
        ok0_live = (alive & (st["appended"][:, None] > 0)
                    & (SZ[:, :, 0] > 0))
        bkb = jnp.concatenate(
            [jnp.where(ok0_live, KB[:, :, 0], 0)[:, :, None],
             jnp.where(cval, cKB, 0)], axis=2)
        bkf = jnp.concatenate(
            [jnp.where(ok0_live, KF[:, :, 0], 0)[:, :, None],
             jnp.where(cval, cKF, 0)], axis=2)
        bsz = jnp.concatenate(
            [jnp.where(ok0_live, SZ[:, :, 0], 0)[:, :, None], cSZ], axis=2)
        BKB, BKF, BSZ = index.extend6(
            bkb.reshape(-1), bkf.reshape(-1), bsz.reshape(-1), True)
        BKB0 = BKB[:, 0].reshape(B, jmax, 1 + ncand)
        BKF0 = BKF[:, 0].reshape(B, jmax, 1 + ncand)
        BSZ0 = BSZ[:, 0].reshape(B, jmax, 1 + ncand)

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
        st["redo"] = st["redo"] | jnp.any(
            process & (jnp.sum(cn, axis=2) > ncand), axis=1)

        # neighbor / used-bit records: at most a couple of events per
        # round per row, landed with dense one-hot writes (TPU scatter
        # is serial; a [B, J, NMAX] masked reduce is pure VPU work)
        def land(bufs, vals, mask, cnt, width):
            pos = cnt[:, None] + jnp.cumsum(mask, axis=1) - mask
            oh = (mask[:, :, None]
                  & (pos[:, :, None]
                     == jnp.arange(width, dtype=jnp.int32)[None, None, :]))
            hit = jnp.any(oh, axis=1)
            out = []
            for buf, v in zip(bufs, vals):
                w = jnp.sum(jnp.where(oh, v[:, :, None], 0), axis=1,
                            dtype=buf.dtype)
                out.append(jnp.where(hit, w, buf[:, :width]))
            add = jnp.sum(mask, axis=1).astype(jnp.int32)
            return out, cnt + add, add

        (nkb, nkf, nsz, nov, nex), nein, nadd = land(
            (st["nei_kb"], st["nei_kf"], st["nei_sz"], st["nei_ov"],
             st["nei_ext"]),
            (sbkb, sbkf, sbsz,
             jnp.broadcast_to(lens[:, None], sbkb.shape) - st["off"],
             jnp.broadcast_to(st["appended"][:, None], sbkb.shape)),
            append, st["nein"], NMAX)
        st["redo"] = st["redo"] | (nein > NMAX)
        pad = st["nei_kb"][:, NMAX:]
        st["nei_kb"] = jnp.concatenate([nkb, pad], axis=1)
        st["nei_kf"] = jnp.concatenate([nkf, pad], axis=1)
        st["nei_sz"] = jnp.concatenate([nsz, pad], axis=1)
        padi = st["nei_ov"][:, NMAX:]
        st["nei_ov"] = jnp.concatenate([nov, padi], axis=1)
        st["nei_ext"] = jnp.concatenate([nex, padi], axis=1)
        st["nein"] = nein

        (skb_, skf_, ssz_), sbn, sadd = land(
            (st["sb_kb"], st["sb_kf"], st["sb_sz"]),
            (sbkb, sbkf, sbsz), partial_sb, st["sbn"], SBMAX)
        st["redo"] = st["redo"] | (sbn > SBMAX)
        pad = st["sb_kb"][:, SBMAX:]
        st["sb_kb"] = jnp.concatenate([skb_, pad], axis=1)
        st["sb_kf"] = jnp.concatenate([skf_, pad], axis=1)
        st["sb_sz"] = jnp.concatenate([ssz_, pad], axis=1)
        st["sbn"] = sbn

        # children: (j major, c minor -- packing preserves ascending c),
        # key = (cat, c, off)
        cmask = process[:, :, None] & cval & (BSZ0[:, :, 1:] > 0)
        cc = (cidx + 1).astype(jnp.int32)
        ckey = (st["cat"][:, :, None] << 13 | cc << 10
                | st["off"][:, :, None]).astype(jnp.int32)
        W = jmax * ncand
        ckey = jnp.where(cmask, ckey, _I32MAX).reshape(B, W)
        skey, skb2, skf2, ssz2 = jax.lax.sort(
            (ckey, cKB.reshape(B, W), cKF.reshape(B, W),
             cSZ.reshape(B, W)), dimension=1, num_keys=1)
        skey = skey[:, :jmax]
        nvalid = skey != _I32MAX
        ncnt = jnp.sum(cmask.reshape(B, W), axis=1)
        st["redo"] = st["redo"] | (ncnt > jmax)
        st["kb"] = skb2[:, :jmax]
        st["kf"] = skf2[:, :jmax]
        st["sz"] = ssz2[:, :jmax]
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

    def __init__(self, n, idt=np.int64):
        self.n = n
        self.valid = np.zeros(n, bool)
        self.ret = np.zeros(n, np.int8)
        self.intv0 = np.zeros((n, 3), np.int64)
        self.has_ovlp = np.zeros(n, bool)
        self.nei_buf = tuple(
            np.zeros((n, NMAX), idt if i < 3 else np.int32)
            for i in range(5))     # (kb, kf, sz, ov, ext)
        self.nein = np.zeros(n, np.int32)
        self.sb_buf = tuple(np.zeros((n, SBMAX), idt) for _ in range(3))
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


def _pack_rows(seqs, idxs, lens, lmax, batch):
    """[B, lmax] uint8 matrix of the selected reads, padded to `batch`
    rows, without a per-read Python loop."""
    B = len(idxs)
    R = np.zeros((batch, lmax), np.uint8)
    if B:
        flat = np.concatenate([seqs[i] for i in idxs])
        rows = np.repeat(np.arange(B), lens[:B])
        offs = np.concatenate([[0], np.cumsum(lens[:B])[:-1]])
        cols = np.arange(len(flat)) - np.repeat(offs, lens[:B])
        R[rows, cols] = flat
    return R


def compute_links_device(index, seqs, min_match, batch=2048, verbose=False,
                         jmax_primary=32, ncand_primary=2, maxr_primary=22):
    """Bulk device link computation for all of `seqs` (list of nt6
    arrays).  Returns a LinkStore; rows whose buffers overflowed even
    in the wide ladder pass stay .redo for exact host recomputation by
    the stitch.

    Cascade: dedup identical sequences -> walk phase -> primary get_nei
    (tight budgets: jmax_primary lanes, ncand_primary candidate slots,
    maxr_primary rounds -- sized for the common case so the while_loop
    is not held hostage by straggler rows) -> ladder rerun of
    overflowed rows with full budgets."""
    import sys

    n = len(seqs)
    idt_np = np.int32 if index.idtype == jnp.int32 else np.int64
    store = LinkStore(n, idt_np)
    if n == 0:
        return store
    # dedup: identical sequences share identical records
    first = {}
    rep = np.arange(n)
    for i, s in enumerate(seqs):
        j = first.setdefault(s.tobytes(), i)
        rep[i] = j
    reps = np.flatnonzero(rep == np.arange(n))
    lens_r = np.array([len(seqs[i]) for i in reps], np.int32)
    order = reps[np.argsort(lens_r, kind="stable")]
    lmax_g = int(lens_r.max())
    if lmax_g >= 1024:
        raise ValueError("unitig link kernel requires read length < 1024")

    def harvest(idxs, lens, ovn, ret, intv0, outs):
        (nkb, nkf, nsz, nov, nex, nein,
         skb, skf, ssz, sbn, forked, redo) = [np.asarray(o) for o in outs]
        B = len(idxs)
        store.valid[idxs] = lens[:B] > min_match
        store.ret[idxs] = np.asarray(ret)[:B]
        for d in range(3):
            store.intv0[idxs, d] = np.asarray(intv0[d])[:B]
        store.has_ovlp[idxs] = np.asarray(ovn)[:B] > 0
        store.nein[idxs] = nein[:B]
        store.sbn[idxs] = sbn[:B]
        store.forked[idxs] = forked[:B]
        store.redo[idxs] = redo[:B]
        for buf, a in zip(store.nei_buf, (nkb, nkf, nsz, nov, nex)):
            buf[idxs] = a[:B]
        for buf, a in zip(store.sb_buf, (skb, skf, ssz)):
            buf[idxs] = a[:B]
        return redo[:B]

    ladder = []   # (idxs, ov rows on host, ovn, lens)
    done = 0
    for b0 in range(0, len(order), batch):
        idxs = order[b0:b0 + batch]
        B = len(idxs)
        lens = np.full(batch, 1, np.int32)
        lens[:B] = [len(seqs[i]) for i in idxs]
        lmax = -(-max(int(lens[:B].max()), min_match + 2) // 32) * 32
        R = _pack_rows(seqs, idxs, lens, lmax, batch)
        Rd, ld = jnp.asarray(R), jnp.asarray(lens)
        ovkb, ovkf, ovsz, ovoff, ovn, ret, intv0 = _walk_phase(
            index, Rd, ld, min_match)
        outs = _getnei_phase(index, ovkb, ovkf, ovsz, ovoff, ovn, ld,
                             jmax_primary, maxr_primary, ncand_primary)
        redo = harvest(idxs, lens, ovn, ret, intv0, outs)
        if redo.any():
            w = np.flatnonzero(redo)
            ladder.append((idxs[w],
                           [np.asarray(a)[w] for a in
                            (ovkb, ovkf, ovsz, ovoff)],
                           np.asarray(ovn)[w], lens[w],
                           np.asarray(ret)[w],
                           [np.asarray(v)[w] for v in intv0]))
        done += B
        if verbose and (b0 // batch) % 32 == 0:
            sys.stderr.write(f"[unitig_links] {done}/{len(order)} uniq "
                             f"(+ladder {sum(len(t[0]) for t in ladder)})\n")

    # ladder: rerun overflowed rows with full budgets
    if ladder:
        l_idx = np.concatenate([t[0] for t in ladder])
        lW = max(t[1][0].shape[1] for t in ladder)
        lb = 512
        jmax_l = 128
        if verbose:
            sys.stderr.write(f"[unitig_links] ladder: {len(l_idx)} rows\n")
        ovs = [np.zeros((len(l_idx), lW), a.dtype)
               for a in ladder[0][1]]
        ovn_l = np.concatenate([t[2] for t in ladder])
        lens_l = np.concatenate([t[3] for t in ladder])
        ret_l = np.concatenate([t[4] for t in ladder])
        intv_l = [np.concatenate([t[5][d] for t in ladder])
                  for d in range(3)]
        p = 0
        for t in ladder:
            m, w = len(t[0]), t[1][0].shape[1]
            for d in range(4):
                ovs[d][p:p + m, :w] = t[1][d]
            p += m
        for b0 in range(0, len(l_idx), lb):
            sl = slice(b0, min(b0 + lb, len(l_idx)))
            B = sl.stop - sl.start
            pad = lb - B
            args = [jnp.asarray(np.vstack([a[sl], np.zeros((pad, lW),
                                                           a.dtype)]))
                    for a in ovs]
            ovn_b = jnp.asarray(np.concatenate(
                [ovn_l[sl], np.zeros(pad, ovn_l.dtype)]))
            lens_b = jnp.asarray(np.concatenate(
                [lens_l[sl], np.ones(pad, np.int32)]))
            outs = _getnei_phase(index, *args, ovn_b, lens_b,
                                 jmax_l, lmax_g + 2, 4)
            harvest(l_idx[sl], np.asarray(lens_b), ovn_b,
                    np.concatenate([ret_l[sl], np.zeros(pad, np.int8)]),
                    [np.concatenate([intv_l[d][sl], np.zeros(pad,
                     intv_l[d].dtype)]) for d in range(3)], outs)

    # duplicates copy their representative's record
    dups = np.flatnonzero(rep != np.arange(n))
    if len(dups):
        r = rep[dups]
        for f in ("valid", "ret", "has_ovlp", "nein", "sbn",
                  "forked", "redo"):
            getattr(store, f)[dups] = getattr(store, f)[r]
        store.intv0[dups] = store.intv0[r]
        for buf in store.nei_buf:
            buf[dups] = buf[r]
        for buf in store.sb_buf:
            buf[dups] = buf[r]
    return store


def save_store(store: LinkStore, path: str):
    """Persist a LinkStore (checkpoint for long runs)."""
    np.savez_compressed(
        path, valid=store.valid, ret=store.ret, intv0=store.intv0,
        has_ovlp=store.has_ovlp, nein=store.nein, sbn=store.sbn,
        forked=store.forked, redo=store.redo,
        nb0=store.nei_buf[0], nb1=store.nei_buf[1], nb2=store.nei_buf[2],
        nb3=store.nei_buf[3], nb4=store.nei_buf[4],
        sb0=store.sb_buf[0], sb1=store.sb_buf[1], sb2=store.sb_buf[2])


def load_store(path: str) -> LinkStore:
    z = np.load(path)
    st = LinkStore(len(z["valid"]), z["nb0"].dtype)
    st.valid = z["valid"]
    st.ret = z["ret"]
    st.intv0 = z["intv0"]
    st.has_ovlp = z["has_ovlp"]
    st.nein = z["nein"]
    st.sbn = z["sbn"]
    st.forked = z["forked"]
    st.redo = z["redo"]
    st.nei_buf = tuple(z[f"nb{i}"] for i in range(5))
    st.sb_buf = tuple(z[f"sb{i}"] for i in range(3))
    return st
