"""Batched supermaximal-exact-match (SMEM) search.

Reimplements the bidirectional SMEM algorithm of reference smem.c:13-80
(fm6_smem1_core) and its whole-read driver fm6_smem (smem.c:397-411) as one
fixed-shape JAX program: one read per vmap lane; the variable-length interval
lists become masked fixed-width buffers; every fm6_extend of the backward
sweep is batched across the interval set and across all reads; the per-read
restart loop over start positions runs inside the kernel, so a batch of reads
costs one device call and one transfer. Buffer overflow is detected per read
and those reads are re-run with guaranteed-size buffers, keeping results
exact for any input.

Output fields per match mirror fm6_write_smem (smem.c:412-419): [start, end)
on the read, interval size, left-closed flag, and forward-strand start (for
the 'T'/'O' full-length flag).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from fermi_tpu.index.fmd import FMDIndex


def _comp6(c):
    return jnp.where((c >= 1) & (c <= 4), 5 - c, c)


@partial(jax.jit,
         static_argnames=("self_match", "max_len", "maxi", "maxm",
                          "max_segments", "phases"))
def _smem_batch(index: FMDIndex, q, l, self_match: bool, max_len: int,
                maxi: int, maxm: int, x0=None, max_segments: int = 0,
                phases: tuple | None = None):
    """SMEMs of every read in the batch.

    q: uint8 [B, max_len]; l: int32 [B].
    Default (max_segments=0): all restart segments accumulated per read (one
    device call per batch — the short-read fast path). With max_segments=S,
    at most S fm6_smem1 passes from start x0 per lane, returning the
    accumulated matches and the next start; the host drives the outer
    restart loop — bounds the match buffer for long queries whose total
    SMEM count is unbounded while amortizing dispatch over S segments.
    Returns (mem fields [B, maxm], mem_n [B], ret [B], ovf [B]).

    phases: tuple of (max_steps, width) for the backward sweep — each phase
    runs at most max_steps (0 = unbounded, for the last) with the interval
    buffer narrowed to width. None = one unbounded phase at width maxi.
    """
    idt = index.idtype
    n_seqs = index.mcnt[1]
    if phases is None:
        phases = ((0, maxi),)
    if x0 is None:
        x0 = jnp.zeros(q.shape[0], jnp.int32)

    def one_read(q, l, x0):
        # global (whole-read) accumulators
        gkb = jnp.zeros(maxm, idt)
        gkf = jnp.zeros(maxm, idt)
        gsz = jnp.zeros(maxm, idt)
        gend = jnp.zeros(maxm, jnp.int32)
        gstart = jnp.zeros(maxm, jnp.int32)
        gclosed = jnp.zeros(maxm, bool)
        gmn = jnp.int32(0)
        govf = jnp.bool_(False)

        def push_intv(bufs, n, ovf, vals):
            bkb, bkf, bsz, bnfo = bufs
            at = jnp.minimum(n, maxi - 1)
            kb, kf, sz, nfo = vals
            bkb = bkb.at[at].set(kb.astype(idt))
            bkf = bkf.at[at].set(kf.astype(idt))
            bsz = bsz.at[at].set(sz.astype(idt))
            bnfo = bnfo.at[at].set(nfo.astype(jnp.int32))
            return (bkb, bkf, bsz, bnfo), n + 1, ovf | (n >= maxi)

        def segment(x, glob):
            """One fm6_smem1_core pass from start position x; appends matches
            to the global buffers; returns (ret=next x, glob)."""
            (gkb, gkf, gsz, gend, gstart, gclosed, gmn, govf) = glob
            c0 = q[x]
            kb, kf, sz = index.set_intv(c0)
            bkb = jnp.zeros(maxi, idt)
            bkf = jnp.zeros(maxi, idt)
            bsz = jnp.zeros(maxi, idt)
            bnfo = jnp.zeros(maxi, jnp.int32)
            n = jnp.int32(0)
            ovf = jnp.bool_(False)

            # ---- forward sweep ----------------------------------------
            def fwd_cond(st):
                i, alive, *_ = st
                return alive & (i < l)

            def fwd_body(st):
                i, alive, kb, kf, sz, bufs, n, ovf, broke_at = st
                c = _comp6(q[i]).astype(jnp.int32)
                KB, KF, SZ = index.extend6(kb, kf, sz, is_back=False)
                okc_sz = SZ[c]
                ok0_sz = SZ[0]
                size_changed = okc_sz != sz
                push_ik = size_changed & (sz != ok0_sz)
                bufs2, n2, ovf2 = push_intv(bufs, n, ovf, (kb, kf, sz, i))
                bufs, n, ovf = jax.tree_util.tree_map(
                    partial(jnp.where, push_ik), (bufs2, n2, ovf2),
                    (bufs, n, ovf))
                push_s = size_changed & (not self_match) & (ok0_sz != 0)
                bufs2, n2, ovf2 = push_intv(bufs, n, ovf,
                                            (KB[0], KF[0], ok0_sz, i))
                bufs, n, ovf = jax.tree_util.tree_map(
                    partial(jnp.where, push_s), (bufs2, n2, ovf2),
                    (bufs, n, ovf))
                dead = (okc_sz < 2) if self_match else (okc_sz == 0)
                kb = jnp.where(dead, kb, KB[c])
                kf = jnp.where(dead, kf, KF[c])
                sz = jnp.where(dead, sz, okc_sz)
                broke_at = jnp.where(dead & alive, i, broke_at)
                return (i + 1, alive & ~dead, kb, kf, sz, bufs, n, ovf,
                        broke_at)

            st = (x + 1, jnp.bool_(True), kb, kf, sz,
                  (bkb, bkf, bsz, bnfo), n, ovf, jnp.int32(-1))
            i, alive, kb, kf, sz, bufs, n, ovf, broke_at = jax.lax.while_loop(
                fwd_cond, fwd_body, st)

            # reached the end: push the last interval (+ sentinel variant).
            # Masked, not lax.cond: a vmapped cond closing over the index
            # would lower to a per-lane select broadcasting the whole table.
            bufs2, n2, ovf2 = push_intv(bufs, n, ovf, (kb, kf, sz, l))
            bufs, n, ovf = jax.tree_util.tree_map(
                partial(jnp.where, alive), (bufs2, n2, ovf2), (bufs, n, ovf))
            if not self_match:
                KB, KF, SZ = index.extend6(kb, kf, sz, is_back=False)
                bufs2, n2, ovf2 = push_intv(bufs, n, ovf,
                                            (KB[0], KF[0], SZ[0], l))
                bufs, n, ovf = jax.tree_util.tree_map(
                    partial(jnp.where, alive & (SZ[0] != 0)),
                    (bufs2, n2, ovf2), (bufs, n, ovf))
            bkb, bkf, bsz, bnfo = bufs
            ridx = jnp.where(jnp.arange(maxi) < n,
                             jnp.maximum(n - 1 - jnp.arange(maxi), 0),
                             jnp.arange(maxi))
            bkb, bkf, bsz, bnfo = (bkb[ridx], bkf[ridx], bsz[ridx],
                                   bnfo[ridx])
            ret = jnp.where(alive, l,
                            jnp.where(n > 0, jnp.maximum(broke_at, x + 1),
                                      x + 1))
            ret = jnp.where(n > 0, bnfo[0], ret)

            # ---- backward sweep (phased widths) ------------------------
            # The live interval set starts at the forward-list size (~20-30
            # on short reads), decays ~2/step for ~10 steps, then plateaus
            # near 2.5 for the long tail (measured on 100bp reads vs a 3x
            # index; BENCH_NOTES.md). Every slot extended costs two rank-row
            # gathers whether live or dead, so the sweep narrows its static
            # buffer width in phases; a lane whose live count exceeds the
            # next phase's width is flagged and redone at a wider tier.
            mkb = jnp.zeros(maxm, idt)
            mkf = jnp.zeros(maxm, idt)
            msz = jnp.zeros(maxm, idt)
            mend = jnp.zeros(maxm, jnp.int32)
            mstart = jnp.zeros(maxm, jnp.int32)
            mclosed = jnp.zeros(maxm, bool)
            mn = jnp.int32(0)

            def make_bwd(width, bound):
                def bwd_cond(st):
                    steps, i, pn = st[0], st[1], st[2]
                    ok = (i >= -1) & (pn > 0)
                    if bound:
                        ok = ok & (steps < bound)
                    return ok

                def bwd_body(st):
                    (steps, i, pn, pkb, pkf, psz, pnfo,
                     mkb, mkf, msz, mend, mstart, mclosed, mn, last_mstart,
                     ovf) = st
                    c = jnp.where(i < 0, 0,
                                  q[jnp.maximum(i, 0)]).astype(jnp.int32)
                    KB, KF, SZ = index.extend6(pkb, pkf, psz, is_back=True)
                    okc_kb = KB[:, c]
                    okc_kf = KF[:, c]
                    okc_sz = SZ[:, c]
                    ok0_sz = SZ[:, 0]
                    fl = (ok0_sz != 0) & (pkf < n_seqs)
                    if self_match:
                        cont = okc_sz > 1
                    else:
                        cont = okc_sz != 0
                    keep = (~cont) | fl | (i == -1)

                    # The reference walks the list sequentially (smem.c:44-66)
                    # carrying four scalars; here the whole pass is vector ops
                    # over the width axis — the sequential recurrences
                    # collapse exactly:
                    #  * current-set dedup "size != last KEPT size" equals
                    #    unique-consecutive over candidates, because an entry
                    #    is only skipped when its size == the last kept size,
                    #    so the previous candidate's size always equals it;
                    #  * mem emission admits every full-length hit plus at
                    #    most the first other keeper, and only when the
                    #    step-entry state allowed one.
                    j = jnp.arange(width, dtype=jnp.int32)
                    valid = j < pn
                    cand = cont & valid
                    pidx = jnp.maximum(
                        jax.lax.cummax(jnp.where(cand, j, -1)), -1)
                    pidx_prev = jnp.concatenate(
                        [jnp.full((1,), -1, jnp.int32), pidx[:-1]])
                    prev_s = okc_sz[jnp.maximum(pidx_prev, 0)]
                    do_curr = cand & ((pkf < n_seqs) | (pidx_prev < 0)
                                      | (okc_sz != prev_s))
                    dci = do_curr.astype(jnp.int32)
                    cn_before = jnp.cumsum(dci) - dci  # exclusive
                    cn = cn_before[-1] + dci[-1]

                    do_keep = keep & valid & ((cn_before == 0) | fl)
                    base_ok = (mn == 0) | (i + 1 < last_mstart)
                    abi = do_keep.astype(jnp.int32)
                    ab_before = jnp.cumsum(abi) - abi
                    do_mem = do_keep & (fl | (base_ok & (ab_before == 0)))
                    dmi = do_mem.astype(jnp.int32)
                    at = mn + jnp.cumsum(dmi) - dmi
                    ovf = ovf | jnp.any(do_mem & (at >= maxm))
                    mt = jnp.where(do_mem, jnp.minimum(at, maxm - 1), maxm)
                    mkb = mkb.at[mt].set(pkb, mode="drop")
                    mkf = mkf.at[mt].set(pkf, mode="drop")
                    msz = msz.at[mt].set(psz, mode="drop")
                    mend = mend.at[mt].set(pnfo, mode="drop")
                    mstart = mstart.at[mt].set(
                        jnp.full(width, i + 1, jnp.int32), mode="drop")
                    mclosed = mclosed.at[mt].set(ok0_sz != 0, mode="drop")
                    n_mem = at[-1] + dmi[-1] - mn
                    last_mstart = jnp.where(n_mem > 0, i + 1, last_mstart)
                    mn = jnp.minimum(mn + n_mem, maxm)

                    ovf = ovf | jnp.any(do_curr & (cn_before >= width))
                    ct = jnp.where(do_curr,
                                   jnp.minimum(cn_before, width - 1), width)
                    ckb = jnp.zeros(width, idt).at[ct].set(okc_kb,
                                                           mode="drop")
                    ckf = jnp.zeros(width, idt).at[ct].set(okc_kf,
                                                           mode="drop")
                    csz = jnp.zeros(width, idt).at[ct].set(okc_sz,
                                                           mode="drop")
                    cnfo = jnp.zeros(width, jnp.int32).at[ct].set(pnfo,
                                                                  mode="drop")
                    return (steps + 1, i - 1, cn, ckb, ckf, csz, cnfo,
                            mkb, mkf, msz, mend, mstart, mclosed, mn,
                            last_mstart, ovf)

                return bwd_cond, bwd_body

            def fit(a, w):
                if w <= a.shape[0]:
                    return a[:w]
                return jnp.concatenate(
                    [a, jnp.zeros(w - a.shape[0], a.dtype)])

            pkb, pkf, psz, pnfo = bkb, bkf, bsz, bnfo
            pn = n
            i = x - 1
            last_mstart = jnp.int32(0)
            for bound, w in phases:
                pkb, pkf, psz, pnfo = (fit(pkb, w), fit(pkf, w),
                                       fit(psz, w), fit(pnfo, w))
                ovf = ovf | (pn > w)
                pn = jnp.minimum(pn, w)
                bwd_cond, bwd_body = make_bwd(w, bound)
                st = (jnp.int32(0), i, pn, pkb, pkf, psz, pnfo,
                      mkb, mkf, msz, mend, mstart, mclosed, mn, last_mstart,
                      ovf)
                (_, i, pn, pkb, pkf, psz, pnfo, mkb, mkf, msz, mend, mstart,
                 mclosed, mn, last_mstart, ovf) = jax.lax.while_loop(
                    bwd_cond, bwd_body, st)

            # append this segment's matches (reversed: sorted by start) to
            # the global buffers — one masked scatter, not a fori_loop (the
            # sequential 64-iteration append was pure loop overhead)
            u = jnp.arange(maxm, dtype=jnp.int32)
            src = jnp.minimum(jnp.maximum(mn - 1 - u, 0), maxm - 1)
            tgt = jnp.where(u < mn, jnp.minimum(gmn + u, maxm - 1), maxm)
            gkb = gkb.at[tgt].set(mkb[src], mode="drop")
            gkf = gkf.at[tgt].set(mkf[src], mode="drop")
            gsz = gsz.at[tgt].set(msz[src], mode="drop")
            gend = gend.at[tgt].set(mend[src], mode="drop")
            gstart = gstart.at[tgt].set(mstart[src], mode="drop")
            gclosed = gclosed.at[tgt].set(mclosed[src], mode="drop")
            govf = govf | ovf | (gmn + mn > maxm)
            gmn = jnp.minimum(gmn + mn, maxm)
            return ret, (gkb, gkf, gsz, gend, gstart, gclosed, gmn, govf)

        glob = (gkb, gkf, gsz, gend, gstart, gclosed, gmn, govf)
        # restart loop over start positions (fm6_smem do-while), optionally
        # bounded to max_segments passes per call (host continues the loop)
        def seg_cond(st):
            nseg, x, glob = st
            ok = x < l
            if max_segments:
                ok = ok & (nseg < max_segments)
            return ok

        def seg_body(st):
            nseg, x, glob = st
            ret, glob = segment(x, glob)
            ret = jnp.maximum(ret, x + 1)  # guarantee progress
            return nseg + 1, ret, glob

        _, ret, glob = jax.lax.while_loop(
            seg_cond, seg_body, (jnp.int32(0), x0.astype(jnp.int32), glob))
        gkb, gkf, gsz, gend, gstart, gclosed, gmn, govf = glob
        return gkb, gkf, gsz, gend, gstart, gclosed, gmn, ret, govf

    return jax.vmap(one_read)(q, l, x0)


LONG_QUERY_LEN = 512   # above this, drive segments from the host
SEGMENTS_PER_CALL = 16  # restart segments per device call in the long path


def _default_phases(maxi):
    """Backward-sweep width ladder (decay measured in BENCH_NOTES.md):
    full width for 4 steps, 3/4 width for 6 more, then 3/8 width for the
    long plateau tail. Lanes that outgrow a narrower phase are flagged and
    redone at the next uniform-width tier (~1-2% of reads)."""
    if maxi < 16:
        return None
    return ((4, maxi), (6, (3 * maxi) // 4), (0, (3 * maxi) // 8))


def smem_all(index: FMDIndex, seqs: list[np.ndarray], self_match=False,
             maxi: int = 32, maxm: int = 64, batch: int | None = None):
    """All SMEMs for a list of nt6 reads.

    Returns per read a list of (start, end, size, left_closed, kf) tuples, in
    the same order the reference fm6_smem emits them. Short reads run fully
    in-kernel (one call per batch); long queries (contigs) run one segment
    per call with host restarts, since their total match count is unbounded.

    maxi=32 default: measured on 100 bp reads against a 3x-coverage index,
    per-segment interval lists run 17-32 entries (every read overflowed the
    old maxi=16 first tier into a full-batch 64-wide redo — a 2.5x row-traffic
    tax); at 32 the redo rate is ~0.2%.
    """
    B = len(seqs)
    if B == 0:
        return []
    batch = batch or B
    max_len = max(len(s) for s in seqs)
    if max_len > LONG_QUERY_LEN:
        return smem_all_native(index, seqs, self_match)
    results = [None] * B
    for lo in range(0, B, batch):
        chunk = seqs[lo: lo + batch]
        m = len(chunk)
        q = np.zeros((batch, max_len), np.uint8)
        lens = np.zeros(batch, np.int32)
        for i, s in enumerate(chunk):
            q[i, : len(s)] = s
            lens[i] = len(s)
        out = _smem_batch(index, jnp.asarray(q), jnp.asarray(lens),
                          self_match, max_len, maxi, maxm,
                          phases=_default_phases(maxi))
        mkb, mkf, msz, mend, mstart, mclosed, mn, _, ovf = map(np.asarray, out)
        for b in range(m):
            if ovf[b]:
                continue
            k = int(mn[b])
            results[lo + b] = [
                (int(mstart[b, u]), int(mend[b, u]), int(msz[b, u]),
                 bool(mclosed[b, u]), int(mkf[b, u])) for u in range(k)]
        redo = np.flatnonzero(ovf[:m])
        # tiered redo: try a 4x-wider kernel before the guaranteed-size one
        # (the 2L-wide variant is rarely needed and very expensive to compile).
        # Redo batches are padded to the full batch size so each tier compiles
        # exactly one shape.
        for wi, wm in ((2 * maxi, 4 * maxm), (2 * max_len + 4, 4 * max_len + 8)):
            if not redo.size:
                break
            qr = np.zeros_like(q)
            lr = np.zeros_like(lens)
            qr[: len(redo)] = q[redo]
            lr[: len(redo)] = lens[redo]
            big = _smem_batch(index, jnp.asarray(qr),
                              jnp.asarray(lr), self_match, max_len,
                              wi, wm)
            bkb, bkf, bsz, bend, bstart, bclosed, bmn, _, bovf = map(
                np.asarray, big)
            still = []
            for t, b in enumerate(redo.tolist()):
                if bovf[t]:
                    still.append(b)
                    continue
                k = int(bmn[t])
                results[lo + b] = [
                    (int(bstart[t, u]), int(bend[t, u]), int(bsz[t, u]),
                     bool(bclosed[t, u]), int(bkf[t, u])) for u in range(k)]
            redo = np.array(still, dtype=np.int64)
        assert not redo.size, "SMEM overflow at guaranteed buffer size"
    return results


def _smem_all_segmented(index, seqs, self_match, maxi, maxm, batch):
    """Host-driven restart loop: one fm6_smem1 segment per device call."""
    B = len(seqs)
    max_len = max(len(s) for s in seqs)
    results = [[] for _ in range(B)]
    for lo in range(0, B, batch):
        chunk = seqs[lo: lo + batch]
        m = len(chunk)
        q = np.zeros((batch, max_len), np.uint8)
        lens = np.zeros(batch, np.int32)
        for i, s in enumerate(chunk):
            q[i, : len(s)] = s
            lens[i] = len(s)
        qd = jnp.asarray(q)
        ld = jnp.asarray(lens)
        x = np.zeros(batch, np.int32)
        active = lens > 0
        while active.any():
            out = _smem_batch(index, qd, ld, self_match, max_len, maxi, maxm,
                              x0=jnp.asarray(x), max_segments=SEGMENTS_PER_CALL)
            mkb, mkf, msz, mend, mstart, mclosed, mn, ret, ovf = map(
                np.asarray, out)
            ret = ret.astype(np.int32).copy()
            redo = ovf & active
            if redo.any():
                # tiered redo: first retry ONE segment with the same buffer
                # shapes (matches per single segment almost always fit, and
                # the compile is shared-size); only truly pathological lanes
                # fall through to the guaranteed-size kernel
                sel = np.flatnonzero(redo)
                for tier_maxi, tier_maxm, tier_seg in (
                        (maxi, maxm, 1),
                        (2 * max_len + 4, 4 * max_len + 8, 1)):
                    if not sel.size:
                        break
                    qr = np.zeros_like(q)
                    lr = np.zeros_like(lens)
                    xr = np.zeros_like(x)
                    qr[: len(sel)] = q[sel]
                    lr[: len(sel)] = lens[sel]
                    xr[: len(sel)] = x[sel]
                    big = _smem_batch(index, jnp.asarray(qr), jnp.asarray(lr),
                                      self_match, max_len, tier_maxi,
                                      tier_maxm, x0=jnp.asarray(xr),
                                      max_segments=tier_seg)
                    bkb, bkf, bsz, bend, bstart, bclosed, bmn, bret, bovf =                         map(np.asarray, big)
                    still = []
                    for t, b in enumerate(sel):
                        if bovf[t]:
                            still.append(b)
                            continue
                        k = int(bmn[t])
                        results[lo + b].extend(
                            (int(bstart[t, u]), int(bend[t, u]),
                             int(bsz[t, u]), bool(bclosed[t, u]),
                             int(bkf[t, u])) for u in range(k))
                        ret[b] = bret[t]
                    sel = np.array(still, dtype=np.int64)
                assert not sel.size, "SMEM overflow at guaranteed buffer size"
            for b in np.flatnonzero(active & ~redo):
                k = int(mn[b])
                results[lo + b].extend(
                    (int(mstart[b, u]), int(mend[b, u]), int(msz[b, u]),
                     bool(mclosed[b, u]), int(mkf[b, u])) for u in range(k))
            x = np.where(active, ret, x)
            active = active & (x < lens)
    return results


def format_smem(index: FMDIndex, match) -> str:
    """fm6_write_smem text line: start, end, size (u32-clamped), flags."""
    start, end, size, closed, kf = match
    size = min(size, 0xFFFFFFFF)
    n_seqs = int(index.mcnt[1])
    return f"{start}\t{end}\t{size}\t{'OT'[int(closed)]}{'OT'[int(kf < n_seqs)]}"


def smem_all_native(index: FMDIndex, seqs, self_match=False):
    """Exact SMEMs via the native sequential engine (native/smem.cpp) —
    the long-query path, where per-segment interval sets reach hundreds and
    fixed-width device buffers would mostly carry padding."""
    import ctypes
    from fermi_tpu import native

    lib = native.get_lib()
    blocks = np.asarray(index.bwt_blocks)
    occ = getattr(index, "occ8", None)
    if occ is None:
        occ6 = np.asarray(index.occ).astype(np.int64, copy=False)
        occ = np.zeros((occ6.shape[0], 8), np.int64)
        occ[:, : occ6.shape[1]] = occ6
    occ = np.ascontiguousarray(occ)
    blocks = np.ascontiguousarray(blocks)
    cnt = np.zeros(8, np.int64)
    cnt_src = np.asarray(index.cnt).astype(np.int64)
    cnt[: len(cnt_src)] = cnt_src
    n_seqs = int(np.asarray(index.mcnt[1]))
    offsets = np.zeros(len(seqs) + 1, np.int64)
    for i, q in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(q)
    qbuf = np.ascontiguousarray(
        np.concatenate([np.asarray(q, np.uint8) for q in seqs])
        if seqs else np.zeros(0, np.uint8))
    counts = np.zeros(len(seqs), np.int64)
    total = ctypes.c_int64()
    ptr = lib.fsmem_all(
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        blocks.shape[0],
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_seqs,
        qbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seqs), int(self_match),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(total))
    try:
        flat = np.ctypeslib.as_array(ptr, shape=(total.value + 1, 5))[
            : total.value].copy()
    finally:
        lib.frld_free(ctypes.cast(ptr, ctypes.c_void_p))
    results = []
    at = 0
    for i in range(len(seqs)):
        k = int(counts[i])
        results.append([
            (int(flat[u, 0]), int(flat[u, 1]), int(flat[u, 2]),
             bool(flat[u, 3]), int(flat[u, 4])) for u in range(at, at + k)])
        at += k
    return results
