"""Batched supermaximal-exact-match (SMEM) search.

Reimplements the bidirectional SMEM algorithm of reference smem.c:13-80
(fm6_smem1_core) and its whole-read driver fm6_smem (smem.c:397-411) as one
fixed-shape JAX program: one read per lane, and — the round-2 redesign — ONE
device while-loop driving a per-lane *state machine* (mode ∈ {forward sweep,
backward sweep}, with segment restarts handled inline).  Every loop iteration
advances every lane by exactly one bidirectional-extension step, so the
sequential iteration count of a batch is the *maximum total step count over
reads* (~3·len for a short read) instead of the sum of per-phase maxima over
four nested loops (~10x more), which measurement showed was the throughput
wall (31-108 µs per sequential iteration on the v5e regardless of body work;
BENCH_NOTES.md).

The variable-length interval lists become masked fixed-width buffers; buffer
overflow is detected per read and those reads are re-run with
guaranteed-size buffers, keeping results exact for any input.

Output fields per match mirror fm6_write_smem (smem.c:412-419): [start, end)
on the read, interval size, left-closed flag, and forward-strand start (for
the 'T'/'O' full-length flag).

Body-cost rules (measured on the v5e, scripts/body_profile.py): dynamic
minor-axis gathers (take_along_axis) cost ~9 ns/element and scatters
~0.3 ms each, while jnp.where selects, static flips and log-step shifts are
effectively free.  The loop body therefore avoids ALL per-iteration dynamic
gathers: the interval list keeps an alive-mask instead of compacting, the
backward walk runs right-to-left via static flips instead of reversing the
list, symbol selection is a 6-way where-select, dedup state forward-fills in
log2(W) shift steps, and match emission packs (seg, end, start, closed)
into one int32 so the whole emission is 3 scatters; the reference's
per-segment output reversal happens on host from the emitted segment ids.
"""

import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from fermi_tpu.index.fmd import FMDIndex


def _comp6(c):
    return jnp.where((c >= 1) & (c <= 4), 5 - c, c)


# Opposite-strand starts follow the complement-ordering chain
# o0=base, o4=o0+s0, o3=o4+s4, o2=o3+s3, o1=o2+s2, o5=o1+s1 (rld.h fm6_set
# intervals); _MC[c, d] = 1 iff osz_d is part of o_c's partial sum.
_MC = np.zeros((6, 6), np.int32)
for _c, _ds in ((4, (0,)), (3, (0, 4)), (2, (0, 4, 3)),
                (1, (0, 4, 3, 2)), (5, (0, 4, 3, 2, 1))):
    _MC[_c, list(_ds)] = 1
_MC = jnp.asarray(_MC)


def _dead_spread(n, n_total, idt, salt=1):
    """Gather positions for DEAD interval slots.

    All-dead-slots-at-0 funnels every dead lane's rank gather into block 0:
    measured 49-51 ns/row vs 31.6 for bank-spread indices at [49152, 24]
    (HBM bank conflicts), a 1.6x tax on the gather-bound pass-B body where
    ~80% of slots are dead.  A loop-invariant pseudo-random spread keeps
    dead gathers off each other's banks.  Positions stay in [0, n_total)
    (mod in uint32 — for >4 Gsym indexes the spread covers the first 4 G,
    which is all the bank-spreading needs)."""
    v = (jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(salt * 40503)) \
        * jnp.uint32(2654435761)
    nm = jnp.maximum(n_total.astype(jnp.uint32), jnp.uint32(1))
    return (v % nm).astype(idt)


def _excl_cumsum(m, axis=-1):
    s = jnp.cumsum(m.astype(jnp.int32), axis=axis)
    return s - m.astype(jnp.int32), s


def _smem_batch_impl(index, q, l, self_match: bool, max_len: int,
                     maxi: int, maxm: int, x0=None, max_segments: int = 0,
                     debug_iters: bool = False, lanes: int = 0,
                     unroll: int = 1, emax: int = 8, compact: int = 0):
    """SMEMs of every read in the batch, one state-machine while loop.

    q: uint8 [B, max_len]; l: int32 [B].
    Default (max_segments=0): all restart segments accumulated per read (one
    device call per batch — the short-read fast path). With max_segments=S,
    at most S fm6_smem1 passes from start x0 per lane, returning the
    accumulated matches and the next start; the host drives the outer
    restart loop.
    Returns (mem fields [B, maxm], mem_n [B], ret [B], ovf [B]).

    lanes>0 selects POOL mode: q/l hold a whole read pool [NP, max_len] and
    only `lanes` device lanes run; a lane that finishes a read pulls the
    next unassigned read from the pool inside the while loop.  The loop's
    sequential iteration count then tracks the MEAN per-read step count
    (total work / lanes) instead of the max over a fixed batch — the
    straggler lanes that dominate fixed batches disappear.  Outputs are
    per-read [NP, maxm] / [NP].  (max_segments/x0 are unsupported here.)
    """
    idt = index.idtype
    W, M = maxi, maxm
    pool = lanes > 0
    NP = q.shape[0]
    B = lanes if pool else NP
    n_seqs = index.mcnt[1].astype(idt)
    cnt6 = index.cnt[:6].astype(idt)
    if pool:
        assert x0 is None and max_segments == 0
        x0 = jnp.zeros(B, jnp.int32)
    elif x0 is None:
        x0 = jnp.zeros(B, jnp.int32)
    x0 = x0.astype(jnp.int32)
    l = l.astype(jnp.int32)
    jW = jnp.arange(W, dtype=jnp.int32)
    jB = jnp.arange(B, dtype=jnp.int32)
    qflat = q.reshape(-1)
    rid0 = jnp.minimum(jB, NP - 1)
    ll0 = l[rid0]                       # per-lane read length

    def qat(pos, rid):
        """q[rid[b], pos[b]] with clamping (callers mask out-of-range)."""
        safe = jnp.clip(pos, 0, max_len - 1)
        return qflat[rid * max_len + safe]

    def set_intv(c):
        ci = c.astype(jnp.int32)
        comp = jnp.where((ci >= 1) & (ci <= 4), 5 - ci, ci)
        kb = index.cnt[ci]
        sz = index.cnt[ci + 1] - index.cnt[ci]
        kf = index.cnt[comp]
        return kb.astype(idt), kf.astype(idt), sz.astype(idt)

    # ---- initial per-lane state -----------------------------------------
    done0 = (x0 >= ll0) | (jB >= NP)
    c0 = qat(x0, rid0)
    kb0, kf0, sz0 = set_intv(c0)
    deadA = _dead_spread(B * W, index.mcnt[0], idt, salt=1).reshape(B, W)
    deadB = _dead_spread(B * W, index.mcnt[0], idt, salt=2).reshape(B, W)
    Z_W = jnp.zeros((B, W), idt)
    Z_Wi = jnp.zeros((B, W), jnp.int32)
    NO = NP if pool else B              # output rows (per read)

    state = dict(
        done=done0,
        rid=rid0, ll=ll0, nxt=jnp.int32(B),
        out_info=jnp.zeros(NO, jnp.int32),
        bwd=jnp.zeros(B, bool),          # mode: False=fwd, True=bwd
        nseg=jnp.zeros(B, jnp.int32),
        x=x0, i=x0 + 1,
        kb=kb0, kf=kf0, sz=sz0,
        Lkb=Z_W, Lkf=Z_W, Lsz=Z_W, Lnfo=Z_Wi,
        Lal=jnp.zeros((B, W), bool),
        n=jnp.zeros(B, jnp.int32),
        seg_base=jnp.zeros(B, jnp.int32),
        last_ms=jnp.zeros(B, jnp.int32),
        xret=x0,
        ovf=jnp.zeros(B, bool),
        # three flat 1-D match buffers: a [NO*M, 3] carry tiles as (8,128)
        # with 3 of 128 lanes used, so every scatter's read-modify-write of
        # the destination moved 42x the logical bytes (trace: fusion.150)
        gkf=jnp.zeros(NO * M, idt),
        gsz=jnp.zeros(NO * M, idt),
        gmt=jnp.zeros(NO * M, jnp.int32),
        gmn=jnp.zeros(B, jnp.int32),
        it=jnp.int32(0),
    )
    if not pool:
        del state["nxt"], state["out_info"]

    import os as _os
    _ablate = _os.environ.get("FERMI_SMEM_ABLATE", "")

    if _ablate:
        def cond(st):
            return st["it"] < 200
    else:
        def cond(st):
            return ~jnp.all(st["done"])

    def sel6(X, c):
        """X[b, w, c[b]] without a gather: 6-way where-select."""
        out = jnp.zeros_like(X[:, :, 0])
        for s in range(6):
            out = jnp.where((c == s)[:, None], X[:, :, s], out)
        return out

    def shr(a, k, fill):
        """Shift right by k along the slot axis (static, no gather)."""
        pad = jnp.full((B, k), fill, a.dtype)
        return jnp.concatenate([pad, a[:, :-k]], axis=1)

    def flipW(a):
        return jnp.flip(a, axis=1)

    def body(st):
        done, bwd = st["done"], st["bwd"]
        i, x, n = st["i"], st["x"], st["n"]
        kb, kf, sz = st["kb"], st["kf"], st["sz"]
        Lkb, Lkf, Lsz, Lnfo = st["Lkb"], st["Lkf"], st["Lsz"], st["Lnfo"]
        Lal = st["Lal"]
        gmn, seg_base, ovf = st["gmn"], st["seg_base"], st["ovf"]

        rid, ll = st["rid"], st["ll"]
        fw = ~done & ~bwd
        bw = ~done & bwd
        at_end = i >= ll

        # ---- one shared bidirectional extension for every lane ----------
        # fwd lanes use slot 0 only (their current scalar interval); bwd
        # lanes extend their whole interval list.  is_back varies per lane:
        # primary strand and output mapping are selected per lane, the two
        # rank6 gathers are shared (exact.c:72-88 semantics both ways).
        slot0 = jW[None, :] == 0
        Ekb = jnp.where(bwd[:, None], Lkb, jnp.where(slot0, kb[:, None], 0))
        Ekf = jnp.where(bwd[:, None], Lkf, jnp.where(slot0, kf[:, None], 0))
        Esz = jnp.where(bwd[:, None], Lsz, jnp.where(slot0, sz[:, None], 0))
        # fwd lanes keep slot 0 live even at i==l: the end-of-read pushes
        # need the $-column of the final interval's extension (the
        # reference's fresh post-loop fm6_extend)
        live = jnp.where(done[:, None], False,
                         jnp.where(bwd[:, None], Lal, slot0))
        # extension symbol: fwd = complement of next char; bwd = prev char
        # ($=0 at i==-1, smem.c:44)
        c_f = _comp6(qat(jnp.minimum(i, ll - 1), rid).astype(jnp.int32))
        c_b = jnp.where(i < 0, 0, qat(i, rid).astype(jnp.int32))
        c = jnp.where(bwd, c_b, c_f)

        primary = jnp.where(bwd[:, None], Ekb, Ekf)
        primary = jnp.where(live, primary, deadA)
        hi = jnp.where(live, primary + Esz, deadB)
        # one fused rank battery for both interval ends
        if _ablate == "norank":
            tkl = jnp.zeros((B, 2 * W, 6), idt)
        elif _ablate == "nogather":
            tkl = index.rank6(jnp.zeros((B, 2 * W), idt))
        else:
            tkl = index.rank6(jnp.concatenate([primary, hi], axis=1))
        tk, tl = tkl[:, :W], tkl[:, W:]        # [B, W, 6] each
        osz = tl - tk
        other_base = jnp.where(bwd[:, None], Ekf, Ekb)

        # Only the class-c (and class-0) columns are consumed downstream, so
        # never materialize the full 6-column KB/KF stacks: select class c
        # directly, and collapse the opposite-strand complement-ordering
        # chain (o0..o5 partial sums) into one masked row-sum with a
        # constant prefix matrix MC[c, d] = "osz_d contributes to o_c".
        tk_c = sel6(tk, c)
        okc_sz = sel6(osz, c)
        ok0_sz = osz[..., 0]
        cnt6_c = jnp.zeros_like(c, dtype=idt)
        for s in range(6):
            cnt6_c = jnp.where(c == s, cnt6[s], cnt6_c)
        primary_c = cnt6_c[:, None] + tk_c
        mc_c = jnp.zeros((B, 6), idt)
        for s in range(6):
            mc_c = jnp.where((c == s)[:, None], _MC[s].astype(idt), mc_c)
        other_c = other_base + jnp.sum(osz * mc_c[:, None, :], axis=-1,
                                       dtype=idt)
        okc_kb = jnp.where(bwd[:, None], primary_c, other_c)   # [B, W]
        okc_kf = jnp.where(bwd[:, None], other_c, primary_c)

        # ================= forward-sweep branch ==========================
        # (f_* values are consumed only under fw masks, where bwd is False:
        # KB collapses to the `other` chain and KF to the primary column)
        f_okc_sz = okc_sz[:, 0]
        f_ok0_sz = ok0_sz[:, 0]
        f_kb0 = other_base[:, 0]
        f_kf0 = cnt6[0] + tk[:, 0, 0]
        f_kbc, f_kfc = okc_kb[:, 0], okc_kf[:, 0]

        stepm = fw & ~at_end
        size_changed = f_okc_sz != sz
        push1 = stepm & size_changed & (sz != f_ok0_sz)
        push2 = stepm & size_changed & (not self_match) & (f_ok0_sz != 0)
        if self_match:
            dead = stepm & (f_okc_sz < 2)
        else:
            dead = stepm & (f_okc_sz == 0)
        # end-of-read pushes (reference post-loop: last interval + its
        # $-extension variant), only for lanes arriving alive at i==l
        pushF1 = fw & at_end
        pushF2 = fw & at_end & (not self_match) & (f_ok0_sz != 0)

        def lpush(Lkb, Lkf, Lsz, Lnfo, Lal, n, ovf, m, vkb, vkf, vsz, vnfo):
            at = jnp.minimum(n, W - 1)
            sel = m[:, None] & (jW[None, :] == at[:, None])
            Lkb = jnp.where(sel, vkb[:, None].astype(idt), Lkb)
            Lkf = jnp.where(sel, vkf[:, None].astype(idt), Lkf)
            Lsz = jnp.where(sel, vsz[:, None].astype(idt), Lsz)
            Lnfo = jnp.where(sel, vnfo[:, None], Lnfo)
            Lal = Lal | sel
            ovf = ovf | (m & (n >= W))
            return Lkb, Lkf, Lsz, Lnfo, Lal, n + m.astype(jnp.int32), ovf

        Lkb, Lkf, Lsz, Lnfo, Lal, n2, ovf = lpush(
            Lkb, Lkf, Lsz, Lnfo, Lal, n, ovf, push1, kb, kf, sz, i)
        Lkb, Lkf, Lsz, Lnfo, Lal, n2, ovf = lpush(
            Lkb, Lkf, Lsz, Lnfo, Lal, n2, ovf, push2, f_kb0, f_kf0,
            f_ok0_sz, i)
        Lkb, Lkf, Lsz, Lnfo, Lal, n2, ovf = lpush(
            Lkb, Lkf, Lsz, Lnfo, Lal, n2, ovf, pushF1, kb, kf, sz, ll)
        Lkb, Lkf, Lsz, Lnfo, Lal, n2, ovf = lpush(
            Lkb, Lkf, Lsz, Lnfo, Lal, n2, ovf, pushF2, f_kb0, f_kf0,
            f_ok0_sz, ll)

        adv = stepm & ~dead
        kb = jnp.where(adv, f_kbc, kb)
        kf = jnp.where(adv, f_kfc, kf)
        sz = jnp.where(adv, f_okc_sz, sz)

        # fwd -> bwd transition: the collected list stays in push order
        # (end-ascending); the backward sweep walks it right-to-left via
        # static flips, so no reversal gather is needed.  Compute the
        # next-segment start (smem.c: the last recorded shrink point) and
        # enter backward mode at i = x-1.
        trans = fw & (dead | at_end)
        last_nfo = jnp.take_along_axis(
            Lnfo, jnp.clip(n2 - 1, 0, W - 1)[:, None], 1)[:, 0]
        ret_seg = jnp.where(n2 > 0, last_nfo, x + 1)

        n = jnp.where(fw, n2, n)
        bwd = bwd | trans
        i_f = jnp.where(trans, x - 1, i + 1)
        i = jnp.where(fw, i_f, i)
        xret_f = jnp.where(trans, ret_seg, st["xret"])
        seg_base = jnp.where(trans, gmn, seg_base)
        last_ms = jnp.where(trans, 0, st["last_ms"])

        # ================= backward-sweep branch =========================
        # The reference walks the interval list sequentially (smem.c:44-66)
        # carrying four scalars; here the whole pass is vector ops over the
        # width axis — the sequential recurrences collapse exactly:
        #  * current-set dedup "size != last KEPT size" equals
        #    unique-consecutive over candidates;
        #  * mem emission admits every full-length hit plus at most the
        #    first other keeper, and only when the step-entry state allowed.
        # The walk order is push-order-DESCENDING: all directional scans run
        # in flip space (static jnp.flip, no gathers).
        valid = Lal & bw[:, None]
        fl = (ok0_sz != 0) & (Ekf < n_seqs)
        if self_match:
            contv = okc_sz > 1
        else:
            contv = okc_sz != 0
        keep = (~contv) | fl | (i == -1)[:, None]
        cand = contv & valid

        candF = flipW(cand)
        szF = flipW(okc_sz)
        # previous candidate's size in walk order: log-step inclusive
        # forward-fill of (cand, sz), then shift for the exclusive view
        hasF = candF
        valF = jnp.where(candF, szF, 0)
        k = 1
        while k < W:
            hasF_s = shr(hasF, k, False)
            valF_s = shr(valF, k, 0)
            valF = jnp.where(hasF, valF, valF_s)
            hasF = hasF | hasF_s
            k *= 2
        prevF_has = shr(hasF, 1, False)
        prevF_s = shr(valF, 1, 0)
        do_currF = candF & (flipW(Ekf < n_seqs) | ~prevF_has
                            | (szF != prevF_s))
        do_curr = flipW(do_currF)
        cnn = jnp.sum(do_curr, axis=1, dtype=jnp.int32)

        cnF_before, _ = _excl_cumsum(do_currF, axis=1)
        do_keepF = flipW(keep & valid) & ((cnF_before == 0) | flipW(fl))
        seg_mn = gmn - seg_base
        base_ok = (seg_mn == 0) | ((i + 1) < last_ms)
        abF_before, _ = _excl_cumsum(do_keepF, axis=1)
        do_memF = do_keepF & (flipW(fl)
                              | (base_ok[:, None] & (abF_before == 0)))
        dmF_before, dmF_inc = _excl_cumsum(do_memF, axis=1)
        do_mem = flipW(do_memF)
        at = gmn[:, None] + flipW(dmF_before)
        ovf = ovf | jnp.any(do_mem & (at >= M), axis=1)
        meta = ((st["nseg"][:, None] << 21) | (Lnfo << 11)
                | ((i + 1)[:, None] << 1)
                | (ok0_sz != 0).astype(jnp.int32))
        # Compact this step's emissions to E ordinals per lane BEFORE the
        # global scatter: TPU scatter lowers to sort + apply whose cost is
        # per scattered ELEMENT (trace: the [B*W] scatter chain was 44% of
        # the compute line), and a lane emits far fewer than W matches per
        # step.  ord == flipW(dmF_before); >E emissions in one step flag
        # ovf and ride the redo ladder like any buffer overflow.
        E = min(emax, W)
        ordn = flipW(dmF_before)
        ovf = ovf | jnp.any(do_mem & (ordn >= E), axis=1)
        onehot = (do_mem & (ordn < E))[:, :, None] & \
            (ordn[:, :, None] == jnp.arange(E, dtype=jnp.int32))  # [B,W,E]
        def pick(v):
            # keep the operand dtype: jnp.sum would promote int32 -> int64
            # under x64, making the scatter below a FutureWarning/error
            return jnp.sum(jnp.where(onehot, v[:, :, None], 0), axis=1,
                           dtype=v.dtype)
        e_kf = pick(Ekf)                       # [B, E]
        e_sz = pick(Esz)
        e_meta = pick(meta.astype(jnp.int32))
        e_has = jnp.any(onehot, axis=1)        # [B, E]
        row = rid if pool else jB
        e_at = gmn[:, None] + jnp.arange(E, dtype=jnp.int32)
        tgt = jnp.where(e_has & (e_at < M),
                        (row * M)[:, None] + jnp.minimum(e_at, M - 1),
                        NO * M).reshape(-1)
        if _ablate == "noscat":
            gkf, gsz, gmt = st["gkf"], st["gsz"], st["gmt"]
        else:
            gkf = st["gkf"].at[tgt].set(e_kf.reshape(-1), mode="drop")
            gsz = st["gsz"].at[tgt].set(e_sz.reshape(-1), mode="drop")
            gmt = st["gmt"].at[tgt].set(e_meta.reshape(-1), mode="drop")
        n_mem = dmF_inc[:, -1]
        last_ms = jnp.where(bw & (n_mem > 0), i + 1, last_ms)
        gmn = jnp.where(bw, jnp.minimum(gmn + n_mem, M), gmn)

        # surviving (deduped, continuing) entries keep their slots with the
        # extended intervals; everything else just goes dead in the mask
        upd = bw[:, None] & do_curr
        Lkb = jnp.where(upd, okc_kb, Lkb)
        Lkf = jnp.where(upd, okc_kf, Lkf)
        Lsz = jnp.where(upd, okc_sz, Lsz)
        Lal = jnp.where(bw[:, None], do_curr, Lal)
        n = jnp.where(bw, cnn, n)
        i_b = i - 1
        i = jnp.where(bw, i_b, i)

        # bwd termination: segment complete — either restart (next segment,
        # inline) or finish the lane
        term = bw & ((i_b < -1) | (cnn == 0))
        nseg = st["nseg"] + term.astype(jnp.int32)
        x_new = jnp.maximum(xret_f, x + 1)       # guarantee progress
        xret = jnp.where(term, x_new, xret_f)
        fin = (x_new >= ll)
        if max_segments:
            fin = fin | (nseg >= max_segments)
        restart = term & ~fin
        finl = term & fin
        gmn2 = gmn
        if pool:
            # write the finished read's outputs, then pull the next read
            rtgt = jnp.where(finl, rid, NO)
            if _ablate == "noscat":
                st_out_info = st["out_info"]
            else:
                st_out_info = st["out_info"].at[rtgt].set(
                    gmn | (ovf.astype(jnp.int32) << 30), mode="drop")
            rank, inc = _excl_cumsum(finl)
            rid_new = st["nxt"] + rank
            have = rid_new < NP
            take = finl & have
            done = done | (finl & ~have)
            nxt = st["nxt"] + inc[-1]
            rid = jnp.where(take, jnp.minimum(rid_new, NP - 1), rid)
            ll = jnp.where(take, l[jnp.minimum(rid_new, NP - 1)], ll)
            # a fresh read re-enters like a segment restart from x=0
            restart = restart | take
            x_new = jnp.where(take, 0, x_new)
            nseg = jnp.where(take, 0, nseg)
            gmn = jnp.where(take, 0, gmn)
            gmn2 = gmn
            seg_base = jnp.where(take, 0, seg_base)
            ovf = ovf & ~take
            xret = jnp.where(take, 0, xret)
        else:
            done = done | finl
        # inline segment restart (fm6_smem do-while, smem.c:400-408)
        xr = jnp.where(restart, x_new, x)
        cr = qat(xr, rid)
        rkb, rkf, rsz = set_intv(cr)
        kb = jnp.where(restart, rkb, kb)
        kf = jnp.where(restart, rkf, kf)
        sz = jnp.where(restart, rsz, sz)
        x = xr
        i = jnp.where(restart, x_new + 1, i)
        n = jnp.where(restart, 0, n)
        Lal = jnp.where(restart[:, None], False, Lal)
        last_ms = jnp.where(restart, 0, last_ms)
        bwd = bwd & ~restart

        nst = dict(done=done, bwd=bwd, nseg=nseg, x=x, i=i,
                    kb=kb, kf=kf, sz=sz,
                    Lkb=Lkb, Lkf=Lkf, Lsz=Lsz, Lnfo=Lnfo, Lal=Lal, n=n,
                    seg_base=seg_base, last_ms=last_ms, xret=xret, ovf=ovf,
                    gkf=gkf, gsz=gsz, gmt=gmt,
                    gmn=gmn2, it=st["it"] + 1,
                    rid=rid, ll=ll)
        if pool:
            nst.update(nxt=nxt, out_info=st_out_info)
        return nst

    def body_n(st):
        # Unrolled steps amortize the while-iteration DMA overhead (XLA
        # re-stages the loop-invariant rank table into scoped VMEM and
        # round-trips every carried array per iteration — measured ~2/3 of
        # the body wall at B=2048; scripts/smem_trace.py).  The body is
        # idempotent for done lanes, so extra steps never change results.
        for _ in range(max(1, unroll)):
            st = body(st)
        return st

    st = jax.lax.while_loop(cond, body_n, state)
    if pool and compact:
        # device-side output compaction: the per-read [NO, M] buffers are
        # mostly padding (mean ~12 matches vs M=64), and d2h over the axon
        # tunnel runs ~10 MB/s — transfer only the valid rows, in read
        # order (positions preserved, so host decode is unchanged).
        info = st["out_info"]
        mn = jnp.minimum(info & ((1 << 30) - 1), M)
        valid = (jnp.arange(M, dtype=jnp.int32)[None, :]
                 < mn[:, None]).reshape(-1)
        pos = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
        tot = pos[-1] + valid[-1].astype(jnp.int32)
        tgt = jnp.where(valid & (pos < compact), pos, compact)
        cvals = jnp.stack([
            jnp.zeros(compact, idt).at[tgt].set(st["gkf"], mode="drop"),
            jnp.zeros(compact, idt).at[tgt].set(st["gsz"], mode="drop"),
            jnp.zeros(compact, idt).at[tgt].set(
                st["gmt"].astype(idt), mode="drop")], axis=-1)
        out = (cvals, info, st["xret"], tot)
        if debug_iters:
            return out + (st["it"],)
        return out
    g3 = jnp.stack([st["gkf"], st["gsz"], st["gmt"].astype(idt)],
                   axis=-1).reshape(NO, M, 3)
    if pool:
        info = st["out_info"]
        out = (g3, info & ((1 << 30) - 1), st["xret"], info >> 30)
    else:
        out = (g3, st["gmn"], st["xret"], st["ovf"])
    if debug_iters:
        return out + (st["it"],)
    return out


# jitted entry for the single-device path; dist.sharded reuses the impl
# directly inside shard_map (the index argument there is a per-device view
# whose rank6 psum-combines over the tp axis).
_smem_batch = partial(jax.jit,
                      static_argnames=("self_match", "max_len", "maxi",
                                       "maxm", "max_segments", "lanes",
                                       "unroll", "emax", "compact"))(
    _smem_batch_impl)


def _smem_fwd_impl(index, q, l, self_match: bool, max_len: int,
                   maxi: int, segs: int, lanes: int, unroll: int = 1):
    """Phase-split pass A: forward sweeps only, one [B, 2]-row rank battery
    per iteration (the unified kernel extends the whole W-wide interval
    list every step even in forward mode — 32x more rank rows than the
    reference's one fm6_extend per forward step, smem.c:22-24).

    Walks every read's segments in order (the restart position depends on
    the forward sweep alone: smem.c:46 ret = curr->a[0].info), dumping each
    segment's shrink-point list to per-segment HBM rows for pass B.

    Returns (OLkb, OLkf, OLsz, OLnfo: [NP*segs+1, maxi]; On, Ox:
    [NP*segs+1]; Onseg, Oovf: [NP]).
    """
    idt = index.idtype
    W, S = maxi, segs
    NP = q.shape[0]
    B = lanes
    cnt6 = index.cnt[:6].astype(idt)
    jW = jnp.arange(W, dtype=jnp.int32)
    jB = jnp.arange(B, dtype=jnp.int32)
    qflat = q.reshape(-1)
    l = l.astype(jnp.int32)
    rid0 = jnp.minimum(jB, NP - 1)
    ll0 = l[rid0]
    deadA = _dead_spread(B, index.mcnt[0], idt, salt=5)
    deadB = _dead_spread(B, index.mcnt[0], idt, salt=6)
    KD = max(32, B // 16)  # compacted-dump staging slots per iteration

    def qat(pos, rid):
        safe = jnp.clip(pos, 0, max_len - 1)
        return qflat[rid * max_len + safe]

    def set_intv(c):
        ci = c.astype(jnp.int32)
        comp = jnp.where((ci >= 1) & (ci <= 4), 5 - ci, ci)
        return (index.cnt[ci].astype(idt),
                index.cnt[comp].astype(idt),
                (index.cnt[ci + 1] - index.cnt[ci]).astype(idt))

    c0 = qat(jnp.zeros(B, jnp.int32), rid0)
    kb0, kf0, sz0 = set_intv(c0)
    NR = NP * S
    state = dict(
        done=jB >= NP,
        rid=rid0, ll=ll0, nxt=jnp.int32(B),
        x=jnp.zeros(B, jnp.int32), i=jnp.ones(B, jnp.int32),
        seg=jnp.zeros(B, jnp.int32),
        kb=kb0, kf=kf0, sz=sz0,
        Lkb=jnp.zeros((B, W), idt), Lkf=jnp.zeros((B, W), idt),
        Lsz=jnp.zeros((B, W), idt), Lnfo=jnp.zeros((B, W), jnp.int32),
        n=jnp.zeros(B, jnp.int32),
        rovf=jnp.zeros(B, bool),
        OLkb=jnp.zeros((NR + 1, W), idt),
        OLkf=jnp.zeros((NR + 1, W), idt),
        OLsz=jnp.zeros((NR + 1, W), idt),
        OLnfo=jnp.zeros((NR + 1, W), jnp.int32),
        On=jnp.zeros(NR + 1, jnp.int32),
        Ox=jnp.zeros(NR + 1, jnp.int32),
        Onseg=jnp.zeros(NP, jnp.int32),
        Oovf=jnp.zeros(NP, bool),
    )

    def cond(st):
        return ~jnp.all(st["done"])

    def body(st):
        done = st["done"]
        rid, ll, x, i, seg = st["rid"], st["ll"], st["x"], st["i"], st["seg"]
        kb, kf, sz, n = st["kb"], st["kf"], st["sz"], st["n"]
        Lkb, Lkf, Lsz, Lnfo = st["Lkb"], st["Lkf"], st["Lsz"], st["Lnfo"]
        rovf = st["rovf"]
        fw = ~done
        at_end = i >= ll
        c = _comp6(qat(jnp.minimum(i, ll - 1), rid).astype(jnp.int32))
        kfm = jnp.where(done, deadA, kf)
        r = index.rank6(jnp.stack([kfm, jnp.where(done, deadB, kfm + sz)],
                                  axis=0))                 # [2, B, 6]
        tk, tl = r[0], r[1]
        osz = tl - tk
        cnt6_c = jnp.zeros_like(c, dtype=idt)
        okc_sz = jnp.zeros_like(osz[:, 0])
        tk_c = jnp.zeros_like(tk[:, 0])
        mc_c = jnp.zeros((B, 6), idt)
        for s in range(6):
            m = c == s
            cnt6_c = jnp.where(m, cnt6[s], cnt6_c)
            okc_sz = jnp.where(m, osz[:, s], okc_sz)
            tk_c = jnp.where(m, tk[:, s], tk_c)
            mc_c = jnp.where(m[:, None], _MC[s].astype(idt), mc_c)
        f_kfc = cnt6_c + tk_c
        f_kbc = kb + jnp.sum(osz * mc_c, axis=-1, dtype=idt)
        f_ok0_sz = osz[:, 0]
        f_kb0 = kb
        f_kf0 = cnt6[0] + tk[:, 0]

        stepm = fw & ~at_end
        size_changed = okc_sz != sz
        push1 = stepm & size_changed & (sz != f_ok0_sz)
        push2 = stepm & size_changed & (not self_match) & (f_ok0_sz != 0)
        if self_match:
            dead = stepm & (okc_sz < 2)
        else:
            dead = stepm & (okc_sz == 0)
        pushF1 = fw & at_end
        pushF2 = fw & at_end & (not self_match) & (f_ok0_sz != 0)

        # OL dumps go through a KD-slot compacted staging block (a [B, W]
        # scatter operand per list costs ~100 us/iter at B=2048 while only
        # ~B/segment_length lanes transition per iteration).  A burst
        # beyond KD STALLS the overflowing lanes: every update below is
        # gated so a stalled lane repeats this exact step next iteration
        # (the body is deterministic in the carried state, so pushes and
        # rank queries recompute identically).
        trans = fw & (dead | at_end)
        dump = trans & (seg < S)
        posd, _ = _excl_cumsum(dump)
        stall = dump & (posd >= KD)
        ok = ~stall
        push1, push2 = push1 & ok, push2 & ok
        pushF1, pushF2 = pushF1 & ok, pushF2 & ok
        transd = trans & ok

        def lpush(Lkb, Lkf, Lsz, Lnfo, n, rovf, m, vkb, vkf, vsz, vnfo):
            at = jnp.minimum(n, W - 1)
            sel = m[:, None] & (jW[None, :] == at[:, None])
            Lkb = jnp.where(sel, vkb[:, None].astype(idt), Lkb)
            Lkf = jnp.where(sel, vkf[:, None].astype(idt), Lkf)
            Lsz = jnp.where(sel, vsz[:, None].astype(idt), Lsz)
            Lnfo = jnp.where(sel, vnfo[:, None], Lnfo)
            rovf = rovf | (m & (n >= W))
            return Lkb, Lkf, Lsz, Lnfo, n + m.astype(jnp.int32), rovf

        Lkb, Lkf, Lsz, Lnfo, n2, rovf = lpush(
            Lkb, Lkf, Lsz, Lnfo, n, rovf, push1, kb, kf, sz, i)
        Lkb, Lkf, Lsz, Lnfo, n2, rovf = lpush(
            Lkb, Lkf, Lsz, Lnfo, n2, rovf, push2, f_kb0, f_kf0, f_ok0_sz, i)
        Lkb, Lkf, Lsz, Lnfo, n2, rovf = lpush(
            Lkb, Lkf, Lsz, Lnfo, n2, rovf, pushF1, kb, kf, sz, ll)
        Lkb, Lkf, Lsz, Lnfo, n2, rovf = lpush(
            Lkb, Lkf, Lsz, Lnfo, n2, rovf, pushF2, f_kb0, f_kf0, f_ok0_sz,
            ll)

        adv = stepm & ~dead
        kb = jnp.where(adv, f_kbc, kb)
        kf = jnp.where(adv, f_kfc, kf)
        sz = jnp.where(adv, okc_sz, sz)

        last_nfo = jnp.take_along_axis(
            Lnfo, jnp.clip(n2 - 1, 0, W - 1)[:, None], 1)[:, 0]
        ret_seg = jnp.where(n2 > 0, last_nfo, x + 1)

        # compacted dump of the finished segments' lists (dumping lanes
        # gathered into KD slots); columns >= n2 still hold the lane's
        # PREVIOUS segment (lpush only writes the pushed slot), and pass B
        # derives liveness from sz != 0 — mask the size column so stale
        # entries read as dead
        srow = rid * S + jnp.minimum(seg, S - 1)
        invd = jnp.full(KD, B, jnp.int32).at[
            jnp.where(dump & ok, posd, KD)].set(jB, mode="drop")
        invc = jnp.minimum(invd, B - 1)
        tgt_c = jnp.where(invd < B, srow[invc], NR)
        n2c = n2[invc]
        OLkb = st["OLkb"].at[tgt_c].set(Lkb[invc], mode="drop")
        OLkf = st["OLkf"].at[tgt_c].set(Lkf[invc], mode="drop")
        OLsz = st["OLsz"].at[tgt_c].set(
            jnp.where(jW[None, :] < n2c[:, None], Lsz[invc], 0),
            mode="drop")
        OLnfo = st["OLnfo"].at[tgt_c].set(Lnfo[invc], mode="drop")
        On = st["On"].at[tgt_c].set(n2c, mode="drop")
        Ox = st["Ox"].at[tgt_c].set(x[invc], mode="drop")
        rovf = rovf | (transd & (seg >= S))
        seg = seg + transd.astype(jnp.int32)

        # restart / read end / pool refill
        x_new = jnp.maximum(ret_seg, x + 1)
        fin = transd & (x_new >= ll)
        rtgt = jnp.where(fin, rid, NP)
        Onseg = st["Onseg"].at[rtgt].set(jnp.minimum(seg, S), mode="drop")
        Oovf = st["Oovf"].at[rtgt].set(rovf, mode="drop")
        rank, inc = _excl_cumsum(fin)
        rid_new = st["nxt"] + rank
        have = rid_new < NP
        take = fin & have
        done = done | (fin & ~have)
        nxt = st["nxt"] + inc[-1]
        rid = jnp.where(take, jnp.minimum(rid_new, NP - 1), rid)
        ll = jnp.where(take, l[jnp.minimum(rid_new, NP - 1)], ll)
        restart = (transd & ~fin) | take
        x_new = jnp.where(take, 0, x_new)
        seg = jnp.where(take, 0, seg)
        rovf = rovf & ~take
        xr = jnp.where(restart, x_new, x)
        cr = qat(xr, rid)
        rkb, rkf, rsz = set_intv(cr)
        kb = jnp.where(restart, rkb, kb)
        kf = jnp.where(restart, rkf, kf)
        sz = jnp.where(restart, rsz, sz)
        n = jnp.where(restart, 0, n2)
        x = xr
        i = jnp.where(stall, i, jnp.where(restart, xr + 1, i + 1))

        return dict(done=done, rid=rid, ll=ll, nxt=nxt, x=x, i=i, seg=seg,
                    kb=kb, kf=kf, sz=sz, Lkb=Lkb, Lkf=Lkf, Lsz=Lsz,
                    Lnfo=Lnfo, n=n, rovf=rovf,
                    OLkb=OLkb, OLkf=OLkf, OLsz=OLsz, OLnfo=OLnfo,
                    On=On, Ox=Ox, Onseg=Onseg, Oovf=Oovf)

    def body_n(st):
        # body gathers only [2, B] rank rows, so the per-iteration fixed
        # cost (table staging + carry round-trips) dominates; the body is
        # idempotent for done lanes, so unrolling amortizes it k-fold.
        for _ in range(max(1, unroll)):
            st = body(st)
        return st

    st = jax.lax.while_loop(cond, body_n, state)
    # On/Ox ride a ~3.4 MB/s d2h tunnel for the driver's width triage:
    # uint16 halves the transfer (On <= W <= 256, Ox < max_len <= 512)
    return (st["OLkb"], st["OLkf"], st["OLsz"], st["OLnfo"],
            st["On"].astype(jnp.uint16), st["Ox"].astype(jnp.uint16),
            st["Onseg"], st["Oovf"])


def _smem_bwd_impl(index, q, OLkb, OLkf, OLsz, OLnfo, On, Ox,
                   self_match: bool, max_len: int, maxi: int, segs: int,
                   maxm: int, lanes: int, compact: int, unroll: int = 1,
                   tail: int = 1, dbg: bool = False, rows=None,
                   n_rows=None, park: int = 0):
    """Phase-split pass B: backward sweeps only, pooled over SEGMENT rows
    (each row independent: the reference's contained-match suppression is
    within-segment, smem.c:50-66).  Emissions land in per-row buffers;
    the host concatenates a read's rows in order.

    Two-stage pool cascade (tail=1): the per-iteration cost is dominated by
    the [B, 2W]-row rank gather, while a row's LIVE interval count decays
    fast — so the wide pool PARKS a row the moment its live count fits Wt
    (8 or 16): the surviving intervals are compacted into [NR, Wt] buffers
    together with the packed walk state, the lane refills, and a second
    narrow pool (the same body at width Wt) drains the parked rows at
    2W/2Wt times lower gather volume.  This replaced the scalar (one-
    interval) tail loop of rounds 2-3.

    `rows` (optional): explicit row worklist (int32, LPT-sorted by the
    caller, padded with NR) with `n_rows` the real count — the width-tiered
    driver runs one narrow call over the shallow rows and one wide call
    over the rest; row ids stay global so q/emission indexing is unchanged.

    Returns (cvals [compact, 3], out_info [NP*segs], total)."""
    idt = index.idtype
    W, S, M = maxi, segs, maxm
    NR = OLkb.shape[0] - 1          # NP * S
    NP = NR // S
    B = lanes
    n_seqs = index.mcnt[1].astype(idt)
    n_total = index.mcnt[0]
    cnt6 = index.cnt[:6].astype(idt)
    qflat = q.reshape(-1)
    # cascade widths: rows park to the next-narrower pool the moment
    # their live count fits it (park forces the final width; 0 = auto).
    # Wide tiers get a mid pool so the long decay tail never pays the
    # full-width rank gather.
    Wt = min(abs(park), W) if park else 8
    Wm = 16
    # measured (202 Msym + 2 Gsym, tunneled v5e): the mid pool LOSES ~10%
    # — its extra while/argsort/refill fixed costs outweigh the [B,2W] ->
    # [B,32] gather cut on the decay tail.  Kept for wider-W workloads;
    # enable with park=-16 style negative widths if ever needed.
    use_mid = bool(tail) and W > 2 * Wm and park < 0

    def qat(pos, rid):
        safe = jnp.clip(pos, 0, max_len - 1)
        return qflat[rid * max_len + safe]

    def shr(a, k, fill):
        pad = jnp.full((a.shape[0], k), fill, a.dtype)
        return jnp.concatenate([pad, a[:, :-k]], axis=1)

    def flipW(a):
        return jnp.flip(a, axis=1)

    def sel6(X, c):
        out = jnp.zeros_like(X[:, :, 0])
        for s in range(6):
            out = jnp.where((c == s)[:, None], X[:, :, s], out)
        return out

    # resumable walk state, packed per row: gmn(11b, clamped) | last(10b)
    # | i+1(10b) | ovf(1b).  max_len <= LONG_QUERY_LEN keeps last and i+1
    # in 10 bits; matches per segment are bounded by ~2 max_len < 2047.
    def pack_meta(gmn, last, i, ovf):
        return (jnp.minimum(gmn, 2047) | (last << 11) | ((i + 1) << 21)
                | (ovf.astype(jnp.int32) << 31))

    def unpack_meta(m):
        return (m & 2047, (m >> 11) & 1023, ((m >> 21) & 1023) - 1,
                ((m >> 31) & 1).astype(bool))

    shared0 = dict(
        gkf=jnp.zeros(NR * M, idt),
        gsz=jnp.zeros(NR * M, idt),
        gmt=jnp.zeros(NR * M, jnp.int32),
        out_info=jnp.zeros(NR, jnp.int32),
    )
    def _park_bufs(wp):
        return dict(
            Pkb=jnp.zeros((NR + 1, wp), idt),
            Pkf=jnp.zeros((NR + 1, wp), idt),
            Psz=jnp.zeros((NR + 1, wp), idt),
            Pnfo=jnp.zeros((NR + 1, wp), jnp.int32),
            Pmeta=jnp.zeros(NR + 1, jnp.int32),
        )

    def run_pool(Wp, SLkb, SLkf, SLsz, SLnfo, Smeta, rord_p, n_real_p,
                 shared, park_st, park, unroll_p, salt, Wpark=0):
        """One refill pool at list width Wp.  Rows come from the SL*/Smeta
        source buffers (SLsz != 0 marks live entries; Smeta packs the
        resumable walk state).  park=True compacts decayed rows into the
        park_st buffers instead of walking them to termination."""
        jWp = jnp.arange(Wp, dtype=jnp.int32)
        jBp = jnp.arange(B, dtype=jnp.int32)
        jWk = jnp.arange(max(Wpark, 1), dtype=jnp.int32)
        NSEL = rord_p.shape[0]
        deadA = _dead_spread(B * Wp, n_total, idt, salt).reshape(B, Wp)
        deadB = _dead_spread(B * Wp, n_total, idt, salt + 1).reshape(B, Wp)
        row0 = rord_p[jnp.minimum(jBp, NSEL - 1)]
        m0 = Smeta[row0]
        g0, l0, i0, o0 = unpack_meta(m0)
        state = dict(
            done=jBp >= n_real_p,
            row=row0, nxt=jnp.int32(B),
            i=i0,
            Lkb=SLkb[row0], Lkf=SLkf[row0], Lsz=SLsz[row0],
            Lnfo=SLnfo[row0],
            Lal=SLsz[row0] != 0,
            gmn=g0, last_ms=l0, ovf=o0,
        )
        state.update(shared)
        state.update(park_st)
        if dbg:
            state["it"] = jnp.int32(0)

        def cond(st):
            return ~jnp.all(st["done"])

        def body(st):
            done, row, i = st["done"], st["row"], st["i"]
            Lkb, Lkf, Lsz, Lnfo = st["Lkb"], st["Lkf"], st["Lsz"], st["Lnfo"]
            Lal, gmn, last_ms, ovf = (st["Lal"], st["gmn"], st["last_ms"],
                                      st["ovf"])
            bw = ~done
            rid = row // S
            seg = row - rid * S
            c = jnp.where(i < 0, 0, qat(i, rid).astype(jnp.int32))

            live = jnp.where(done[:, None], False, Lal)
            primary = jnp.where(live, Lkb, deadA)
            hi = jnp.where(live, primary + Lsz, deadB)
            tkl = index.rank6(jnp.concatenate([primary, hi], axis=1))
            tk, tl = tkl[:, :Wp], tkl[:, Wp:]
            osz = tl - tk
            okc_sz = sel6(osz, c)
            ok0_sz = osz[..., 0]
            cnt6_c = jnp.zeros_like(c, dtype=idt)
            for s in range(6):
                cnt6_c = jnp.where(c == s, cnt6[s], cnt6_c)
            primary_c = cnt6_c[:, None] + sel6(tk, c)
            mc_c = jnp.zeros((B, 6), idt)
            for s in range(6):
                mc_c = jnp.where((c == s)[:, None], _MC[s].astype(idt), mc_c)
            other_c = Lkf + jnp.sum(osz * mc_c[:, None, :], axis=-1,
                                    dtype=idt)
            okc_kb, okc_kf = primary_c, other_c

            valid = Lal & bw[:, None]
            fl = (ok0_sz != 0) & (Lkf < n_seqs)
            if self_match:
                contv = okc_sz > 1
            else:
                contv = okc_sz != 0
            keep = (~contv) | fl | (i == -1)[:, None]
            cand = contv & valid

            candF = flipW(cand)
            szF = flipW(okc_sz)
            hasF = candF
            valF = jnp.where(candF, szF, 0)
            k = 1
            while k < Wp:
                hasF_s = shr(hasF, k, False)
                valF_s = shr(valF, k, 0)
                valF = jnp.where(hasF, valF, valF_s)
                hasF = hasF | hasF_s
                k *= 2
            prevF_has = shr(hasF, 1, False)
            prevF_s = shr(valF, 1, 0)
            do_currF = candF & (flipW(Lkf < n_seqs) | ~prevF_has
                                | (szF != prevF_s))
            do_curr = flipW(do_currF)
            cnn = jnp.sum(do_curr, axis=1, dtype=jnp.int32)

            cnF_before, _ = _excl_cumsum(do_currF, axis=1)
            do_keepF = flipW(keep & valid) & ((cnF_before == 0) | flipW(fl))
            base_ok = (gmn == 0) | ((i + 1) < last_ms)
            abF_before, _ = _excl_cumsum(do_keepF, axis=1)
            do_memF = do_keepF & (flipW(fl)
                                  | (base_ok[:, None] & (abF_before == 0)))
            dmF_before, dmF_inc = _excl_cumsum(do_memF, axis=1)
            do_mem = flipW(do_memF)
            at = gmn[:, None] + flipW(dmF_before)
            ovf = ovf | jnp.any(do_mem & (at >= M), axis=1)
            meta = ((seg[:, None] << 21) | (Lnfo << 11)
                    | ((i + 1)[:, None] << 1)
                    | (ok0_sz != 0).astype(jnp.int32))
            E = min(8, Wp)
            ordn = flipW(dmF_before)
            ovf = ovf | jnp.any(do_mem & (ordn >= E), axis=1)
            onehot = (do_mem & (ordn < E))[:, :, None] & \
                (ordn[:, :, None] == jnp.arange(E, dtype=jnp.int32))

            def pick(v):
                # keep the operand dtype: jnp.sum would promote int32 ->
                # int64 under x64, making the scatter a FutureWarning/error
                return jnp.sum(jnp.where(onehot, v[:, :, None], 0), axis=1,
                               dtype=v.dtype)
            e_kf = pick(Lkf)
            e_sz = pick(Lsz)
            e_meta = pick(meta.astype(jnp.int32))
            e_has = jnp.any(onehot, axis=1)
            e_at = gmn[:, None] + jnp.arange(E, dtype=jnp.int32)
            tgt = jnp.where(e_has & (e_at < M),
                            (row * M)[:, None] + jnp.minimum(e_at, M - 1),
                            NR * M).reshape(-1)
            gkf = st["gkf"].at[tgt].set(e_kf.reshape(-1), mode="drop")
            gsz = st["gsz"].at[tgt].set(e_sz.reshape(-1), mode="drop")
            gmt = st["gmt"].at[tgt].set(e_meta.reshape(-1), mode="drop")
            n_mem = dmF_inc[:, -1]
            last_ms = jnp.where(bw & (n_mem > 0), i + 1, last_ms)
            gmn = jnp.where(bw, jnp.minimum(gmn + n_mem, M), gmn)

            upd = bw[:, None] & do_curr
            Lkb = jnp.where(upd, okc_kb, Lkb)
            Lkf = jnp.where(upd, okc_kf, Lkf)
            Lsz = jnp.where(upd, okc_sz, Lsz)
            Lal = jnp.where(bw[:, None], do_curr, Lal)
            i = jnp.where(bw, i - 1, i)

            term = bw & ((i < -1) | (cnn == 0))
            freed = term
            nst_extra = {}
            if park:
                # live width fits the narrow pool: compact the surviving
                # (post-update) entries to the first Wt slots, stash the
                # packed walk state, free the lane
                pkm = bw & ~term & (cnn <= Wpark)
                posn, _ = _excl_cumsum(do_curr, axis=1)
                oh = (do_curr & pkm[:, None] & (posn < Wpark))[:, :, None] \
                    & (posn[:, :, None] == jWk)
                def pickw(v):
                    return jnp.sum(jnp.where(oh, v[:, :, None], 0), axis=1,
                                   dtype=v.dtype)
                ptgt = jnp.where(pkm, row, NR)
                nst_extra = dict(
                    Pkb=st["Pkb"].at[ptgt].set(pickw(Lkb), mode="drop"),
                    Pkf=st["Pkf"].at[ptgt].set(pickw(Lkf), mode="drop"),
                    Psz=st["Psz"].at[ptgt].set(pickw(Lsz), mode="drop"),
                    Pnfo=st["Pnfo"].at[ptgt].set(pickw(Lnfo), mode="drop"),
                    Pmeta=st["Pmeta"].at[ptgt].set(
                        pack_meta(gmn, last_ms, i, ovf), mode="drop"))
                freed = term | pkm
            # write the finished row's info, pull the next source row
            rtgt = jnp.where(term, row, NR)
            out_info = st["out_info"].at[rtgt].set(
                gmn | (ovf.astype(jnp.int32) << 30), mode="drop")
            rank, inc = _excl_cumsum(freed)
            row_new = st["nxt"] + rank
            have = row_new < n_real_p
            take = freed & have
            done = done | (freed & ~have)
            nxt = st["nxt"] + inc[-1]
            rn = rord_p[jnp.minimum(row_new, NSEL - 1)]
            row = jnp.where(take, rn, row)
            tk_ = take[:, None]
            Lkb = jnp.where(tk_, SLkb[rn], Lkb)
            Lkf = jnp.where(tk_, SLkf[rn], Lkf)
            Lsz = jnp.where(tk_, SLsz[rn], Lsz)
            Lnfo = jnp.where(tk_, SLnfo[rn], Lnfo)
            Lal = jnp.where(tk_, SLsz[rn] != 0, Lal)
            mg, ml, mi, mo = unpack_meta(Smeta[rn])
            i = jnp.where(take, mi, i)
            gmn = jnp.where(take, mg, gmn)
            last_ms = jnp.where(take, ml, last_ms)
            ovf = jnp.where(take, mo, ovf)

            nst = dict(done=done, row=row, nxt=nxt, i=i,
                       Lkb=Lkb, Lkf=Lkf, Lsz=Lsz, Lnfo=Lnfo, Lal=Lal,
                       gmn=gmn, last_ms=last_ms, ovf=ovf,
                       gkf=gkf, gsz=gsz, gmt=gmt, out_info=out_info)
            for k2 in park_st:
                if k2 not in nst_extra:
                    nst_extra[k2] = st[k2]
            nst.update(nst_extra)
            if dbg:
                nst["it"] = st["it"] + 1
            return nst

        def body_n(st):
            # the body is idempotent for done lanes and refill happens
            # inside it, so extra unrolled steps never change results —
            # they only amortize the per-iteration staging/carry overhead
            for _ in range(max(1, unroll_p)):
                st = body(st)
            return st

        st = jax.lax.while_loop(cond, body_n, state)
        new_shared = {k2: st[k2] for k2 in shared}
        new_park = {k2: st[k2] for k2 in park_st}
        return new_shared, new_park, st.get("it", jnp.int32(0))

    # LPT scheduling: pools drain in refill rounds, and each round costs the
    # LONGEST walk in it (straggler-bound; measured 260 round-iters vs ~93
    # ideal at 2048 lanes).  Serving rows longest-first packs the short
    # walks into the stragglers' shadow.
    Oxi = Ox.astype(jnp.int32)
    if rows is None:
        rord = jnp.argsort(-Oxi[:NR]).astype(jnp.int32)
        n_real = jnp.int32(NR)
    else:
        rord = rows.astype(jnp.int32)
        n_real = n_rows.astype(jnp.int32)
    fresh_meta = jnp.concatenate([Oxi[:NR] << 21, jnp.zeros(1, jnp.int32)])

    def _pend(parked):
        # LPT worklist over the parked rows, by remaining walk length
        has_p = parked["Psz"][:, 0] != 0
        pi = (parked["Pmeta"] >> 21) & 1023
        pend = jnp.argsort(
            jnp.where(has_p, -pi, jnp.int32(2 ** 31 - 1))).astype(jnp.int32)
        return pend, jnp.sum(has_p.astype(jnp.int32))

    wpark0 = (Wm if use_mid else Wt) if tail else 0
    shared, parked, it0 = run_pool(
        W, OLkb, OLkf, OLsz, OLnfo, fresh_meta, rord, n_real,
        shared0, _park_bufs(wpark0) if tail else {}, bool(tail), unroll,
        salt=11, Wpark=wpark0)

    npend = jnp.int32(0)
    it1 = jnp.int32(0)
    if tail:
        if use_mid:
            pend, npend = _pend(parked)
            shared, parked, itm = run_pool(
                Wm, parked["Pkb"], parked["Pkf"], parked["Psz"],
                parked["Pnfo"], parked["Pmeta"], pend, npend, shared,
                _park_bufs(Wt), True, 4, salt=13, Wpark=Wt)
            it1 = it1 + itm
        pend, npend2 = _pend(parked)
        npend = jnp.maximum(npend, npend2)
        shared, _, itn = run_pool(
            Wt, parked["Pkb"], parked["Pkf"], parked["Psz"], parked["Pnfo"],
            parked["Pmeta"], pend, npend2, shared, {}, False, 4, salt=15)
        it1 = it1 + itn

    info = shared["out_info"]
    mn = jnp.minimum(info & ((1 << 30) - 1), M)
    valid = (jnp.arange(M, dtype=jnp.int32)[None, :]
             < mn[:, None]).reshape(-1)
    pos = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
    tot = pos[-1] + valid[-1].astype(jnp.int32)
    tgt = jnp.where(valid & (pos < compact), pos, compact)
    cvals = jnp.stack([
        jnp.zeros(compact, idt).at[tgt].set(shared["gkf"], mode="drop"),
        jnp.zeros(compact, idt).at[tgt].set(shared["gsz"], mode="drop"),
        jnp.zeros(compact, idt).at[tgt].set(
            shared["gmt"].astype(idt), mode="drop")], axis=-1)
    # the returned per-row info is count|ovf packed into uint8 (counts are
    # bounded by M<=64 in the split driver) — the info transfer rides a
    # ~3.4 MB/s tunnel d2h on the dev setup, so width matters
    info8 = (jnp.minimum(info & ((1 << 30) - 1), 127)
             | ((info >> 30) << 7)).astype(jnp.uint8)
    if dbg:
        return cvals, info8, tot, (it0, it1, npend)
    return cvals, info8, tot


_smem_fwd = partial(jax.jit,
                    static_argnames=("self_match", "max_len", "maxi",
                                     "segs", "lanes", "unroll"))(
    _smem_fwd_impl)
_smem_bwd = partial(jax.jit,
                    static_argnames=("self_match", "max_len", "maxi",
                                     "segs", "maxm", "lanes", "compact",
                                     "unroll", "tail", "dbg", "park"))(
    _smem_bwd_impl)


LONG_QUERY_LEN = 512   # above this, use the native sequential engine
SEGMENTS_PER_CALL = 16  # restart segments per device call in the long path
POOL_MAX = int(os.environ.get("FERMI_TPU_SMEM_POOL", "8192"))
                        # reads per pool-mode device call (larger pools
                        # measured slower: 8192 -> 2381 r/s vs 32768 -> 712
                        # on the same index/queries; output-compaction
                        # scatter cost grows with NO*M, and pass A's
                        # per-iteration OL dump scatter copies the whole
                        # [NP*S+1, W] buffers — traced 60% of pass A)


def smem_all(index: FMDIndex, seqs: list[np.ndarray], self_match=False,
             maxi: int | None = None, maxm: int = 64,
             batch: int | None = None, runner=None):
    """All SMEMs for a list of nt6 reads.

    Returns per read a list of (start, end, size, left_closed, kf) tuples, in
    the same order the reference fm6_smem emits them. Short reads run fully
    in-kernel with lane refill over a read pool (see _smem_batch_impl pool
    mode); long queries (contigs) go to the native sequential engine, since
    their interval sets reach hundreds of entries.  A custom `runner` (the
    distributed layer) uses the fixed-batch path.

    The per-segment interval-list width (maxi) is COVERAGE-ADAPTIVE when
    not given: interval counts scale with index coverage (17-32 entries at
    3x for 100 bp reads, several-fold more at 25x), so the pool drivers
    record the observed overflow fraction and double the learned width
    (sticky on the index object) whenever >5% of a call rides the redo
    ladder — the first call on a dense index pays redos once, subsequent
    calls run at the learned width instead of redoing most of the pool.
    """
    B = len(seqs)
    if B == 0:
        return []
    batch = batch or B
    max_len = max(len(s) for s in seqs)
    if max_len > LONG_QUERY_LEN or not isinstance(index, FMDIndex):
        return smem_all_native(index, seqs, self_match)
    if maxi is None:
        maxi = getattr(index, "_smem_maxi", None)
        if maxi is None and runner is None and B > 4096:
            # cold-start probe: learn the coverage-adaptive width on a
            # small slice first — a dense (25x) index otherwise rides the
            # redo ladder for the WHOLE first call (wide-kernel compiles
            # measured 100 s+ over the dev tunnel)
            head = smem_all(index, seqs[:1024], self_match, None, maxm,
                            batch, runner)
            if getattr(index, "_smem_maxi", None) is None:
                # probe saw <5% overflow: 32 is the right width — pin it
                # so the recursion doesn't re-probe every 1024 reads
                try:
                    index._smem_maxi = 32
                except Exception:
                    pass
            return head + smem_all(index, seqs[1024:], self_match, None,
                                   maxm, batch, runner)
        maxi = maxi or 32
    if runner is None:
        if os.environ.get("FERMI_TPU_SMEM_SPLIT", "1") == "1":
            lanes_a = int(os.environ.get("FERMI_TPU_SMEM_FWD_LANES",
                                         "2048"))
            return _smem_all_pool_split(index, seqs, self_match, maxi,
                                        maxm, min(batch, lanes_a), max_len)
        return _smem_all_pool(index, seqs, self_match, maxi, maxm,
                              min(batch, 2048), max_len)
    results = [None] * B
    for lo in range(0, B, batch):
        chunk = seqs[lo: lo + batch]
        m = len(chunk)
        q = np.zeros((batch, max_len), np.uint8)
        lens = np.zeros(batch, np.int32)
        for i, s in enumerate(chunk):
            q[i, : len(s)] = s
            lens[i] = len(s)
        out = runner(q, lens, maxi, maxm, 8)
        g3, mn, _, ovf = map(np.asarray, out)
        dec = _decode_batch(g3, mn)
        for b in range(m):
            if not ovf[b]:
                results[lo + b] = dec[b]
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
            big = runner(qr, lr, wi, wm, wi)
            bg3, bmn, _, bovf = map(np.asarray, big)
            dec = _decode_batch(bg3, bmn)
            still = []
            for t, b in enumerate(redo.tolist()):
                if bovf[t]:
                    still.append(b)
                    continue
                results[lo + b] = dec[t]
            redo = np.array(still, dtype=np.int64)
        assert not redo.size, "SMEM overflow at guaranteed buffer size"
    return results


def _learn_maxi(index, n_redo, n_total, maxi):
    """Coverage adaptation: when >5% of a call overflows the per-segment
    interval list, widen the width future smem_all calls start from
    (sticky on the index object, capped at 256); a majority-overflow call
    (dense 25x-style index) jumps 4x instead of 2x."""
    if n_total and n_redo > 0.05 * n_total:
        factor = 4 if n_redo > 0.5 * n_total else 2
        try:
            index._smem_maxi = min(256, factor * max(
                maxi, getattr(index, "_smem_maxi", 0)))
        except Exception:
            pass


def _redo_ladder(index, seqs, redo, results, self_match, max_len, maxi,
                 maxm):
    """Re-run overflowed reads through the unified kernel with wider
    buffers: 2x, 8x, then the guaranteed size.  EVERY tier is chunked:
    wide-buffer kernels over a whole 16k-read redo set (a dense 25x index
    overflows nearly everything on the first, unadapted call) exhausted
    HBM at a 2 Gsym index, and a single huge guaranteed-tier compile once
    crashed the axon worker."""
    tiers = ((2 * maxi, 4 * maxm, 4096),
             (8 * maxi, 16 * maxm, 1024),
             (2 * max_len + 4, 4 * max_len + 8, 512))
    for wi, wm, chunk in tiers:
        if not redo:
            break
        still = []
        for c0 in range(0, len(redo), chunk):
            part = redo[c0: c0 + chunk]
            R = 1
            while R < len(part):
                R *= 2
            q = np.zeros((R, max_len), np.uint8)
            lens = np.zeros(R, np.int32)
            for t, si in enumerate(part):
                s = seqs[si]
                q[t, : len(s)] = s
                lens[t] = len(s)
            big = _smem_batch(index, jnp.asarray(q), jnp.asarray(lens),
                              self_match, max_len, wi, wm, emax=wi)
            bg3, bmn, _, bovf = map(np.asarray, big)
            dec = _decode_batch(bg3, bmn)
            for t, si in enumerate(part):
                if bovf[t]:
                    still.append(si)
                else:
                    results[si] = dec[t]
        redo = still
    assert not redo, "SMEM overflow at guaranteed buffer size"


def _smem_all_pool_split(index, seqs, self_match, maxi, maxm, lanes,
                         max_len, segs=8):
    """Phase-split pool driver: pass A (narrow forward) then pass B (wide
    backward over segment rows), outputs decoded per segment row and
    concatenated per read.  Reads that overflow the per-segment list (W),
    the per-read segment budget (S), or the per-row match buffer ride the
    unified redo ladder."""
    Bn = len(seqs)
    results = [None] * Bn
    ids_all = [i for i, s in enumerate(seqs) if len(s)]
    for i, s in enumerate(seqs):
        if len(s) == 0:
            results[i] = []
    if not ids_all:
        return results
    NPc = 1
    while NPc < min(len(ids_all), POOL_MAX):
        NPc *= 2
    NPc = max(NPc, 16)
    lanes = min(lanes, NPc)
    S = segs
    Ms = maxm  # per-segment match budget
    redo = []
    CAP = NPc * 16
    # dispatch every pool's pass A up front (jax dispatch is async and the
    # device queue serializes) so the host-side width triage of pool k
    # overlaps pool k+1's forward kernel
    # pass-B shape swept on the 2 Gsym 25x index (tunnel, settled runs):
    # lanes 128..512 tie at ~5.5-5.6k reads/s, 1024/2048/4096 fall off
    # (4.7k/4.0k/3.2k) — per-iteration vector cost grows faster than the
    # refill-round savings; unroll 4 ~= 2 > 8.
    lanes_b = int(os.environ.get("FERMI_TPU_SMEM_BWD_LANES", "512"))
    unroll_a = int(os.environ.get("FERMI_TPU_SMEM_FWD_UNROLL", "1"))
    unroll_b = int(os.environ.get("FERMI_TPU_SMEM_BWD_UNROLL", "4"))
    tail_b = int(os.environ.get("FERMI_TPU_SMEM_TAIL", "1"))
    park_b = int(os.environ.get("FERMI_TPU_SMEM_PARK", "0"))
    dbg_b = bool(os.environ.get("FERMI_TPU_SMEM_BWD_STATS"))
    prof = bool(os.environ.get("FERMI_TPU_SMEM_PROF"))
    tprof = {}

    def _tp(key, t0):
        if prof:
            import time as _t
            tprof[key] = tprof.get(key, 0.0) + (_t.perf_counter() - t0)

    def _now():
        import time as _t
        return _t.perf_counter()
    tier_b = os.environ.get("FERMI_TPU_SMEM_BWD_TIER", "1") == "1"
    pendA = []
    t0_ = _now()
    for lo in range(0, len(ids_all), NPc):
        ids = ids_all[lo: lo + NPc]
        q = np.zeros((NPc, max_len), np.uint8)
        lens = np.ones(NPc, np.int32)
        for t, si in enumerate(ids):
            s = seqs[si]
            q[t, : len(s)] = s
            lens[t] = len(s)
        qd, ld = jnp.asarray(q), jnp.asarray(lens)
        fa = _smem_fwd(index, qd, ld, self_match, max_len, maxi, S, lanes,
                       unroll_a)
        pendA.append((ids, qd, fa))
    _tp("A_dispatch", t0_)

    def run_bwd(qd, fa, wq, rows=None, n_rows=None):
        OLkb, OLkf, OLsz, OLnfo, On, Ox = fa[:6]
        if wq < maxi:  # slice the lists to the tier width (On <= wq)
            OLkb, OLkf = OLkb[:, :wq], OLkf[:, :wq]
            OLsz, OLnfo = OLsz[:, :wq], OLnfo[:, :wq]
        out = _smem_bwd(index, qd, OLkb, OLkf, OLsz, OLnfo, On, Ox,
                        self_match, max_len, wq, S, Ms, lanes_b, CAP,
                        unroll_b, tail_b, dbg_b, rows, n_rows, park_b)
        if dbg_b and len(out) > 3:
            its = [int(np.asarray(v)) for v in out[3]]
            print(f"[smem_bwd w={wq}] iters={its}", file=sys.stderr)
        return out[:3]

    def qwidth(w):
        for cand in (8, 16, 32, 48, 64, 96, 128, 192, 256):
            if w <= cand <= maxi:
                return cand
        return maxi

    pendB = []
    for ids, qd, fa in pendA:
        t0_ = _now()
        On_h = np.asarray(fa[4])[:-1].astype(np.int32)
        Ox_h = np.asarray(fa[5])[:-1].astype(np.int32)
        nseg = np.asarray(fa[6])
        _tp("A_sync+triage_d2h", t0_)
        t0_ = _now()
        NRp = NPc * S
        real = np.zeros(NRp, bool)
        for t in range(len(ids)):
            real[t * S: t * S + nseg[t]] = True
        rr = np.flatnonzero(real)
        wmax = int(On_h[rr].max()) if rr.size else 1
        wq = qwidth(wmax)
        calls = []
        narrow_mask = None
        if tier_b and rr.size:
            # width-tiered pass B: rank volume scales with the list width,
            # so shallow rows (the majority at high coverage) run a narrow
            # kernel and only the deep rows pay for the wide one
            wn = qwidth(max(1, wq // 2))
            nar = On_h[rr] <= wn
            if wn < wq and 0.25 < nar.mean() < 1.0:
                narrow_mask = np.zeros(NRp, bool)
                narrow_mask[rr[nar]] = True
                for rows_sel, w_sel in ((rr[nar], wn), (rr[~nar], wq)):
                    order = rows_sel[np.argsort(-Ox_h[rows_sel])]
                    NSEL = 1 << max(4, int(np.ceil(np.log2(len(order)))))
                    rows_p = np.full(NSEL, NRp, np.int32)
                    rows_p[: len(order)] = order
                    calls.append(run_bwd(qd, fa, w_sel, jnp.asarray(rows_p),
                                         jnp.int32(len(order))))
        if not calls:
            calls.append(run_bwd(qd, fa, wq))
        pendB.append((ids, calls, narrow_mask, nseg, np.asarray(fa[7])))
        _tp("B_triage+dispatch", t0_)

    # pipelined drain: for each pool, sync its totals, start its result
    # transfers async, then decode the PREVIOUS pool while this pool's
    # transfers (and later pools' device work) proceed — the decode CPU
    # tail was ~0.7 s strictly serial before this
    def _start_copies(entry):
        ids, calls, narrow_mask, nseg, a_ovf = entry
        t0_ = _now()
        for ci, (cvals_d, info_d, tot_d) in enumerate(calls):
            tot = int(np.asarray(tot_d))
            if tot > CAP:
                calls[ci] = (None, None, tot)
                continue
            tpad = 16384
            while tpad < min(tot, CAP):
                tpad *= 2
            tpad = min(tpad, CAP)
            cv_d = cvals_d[:tpad]
            try:
                cv_d.copy_to_host_async()
                info_d.copy_to_host_async()
            except Exception:
                pass
            calls[ci] = (cv_d, info_d, tot)
        _tp("B_tot_sync+slice", t0_)

    def _finish_pool(entry):
        ids, calls, narrow_mask, nseg, a_ovf = entry
        decs, infos, overcap = [], [], False
        for cvals_d, info_d, tot in calls:
            if tot > CAP:
                overcap = True
                break
            t0_ = _now()
            info = np.asarray(info_d)
            mn = np.minimum(info.astype(np.int32) & 127, Ms)
            cv = np.asarray(cvals_d)
            _tp("B_result_d2h", t0_)
            t0_ = _now()
            decs.append(_decode_compact(cv, mn))
            infos.append(info)
            _tp("decode", t0_)
        if overcap:
            # extremely dense pool: redo everything through the ladder
            redo.extend(ids)
            return
        if len(decs) == 1:
            dec, info = decs[0], infos[0]
        else:
            dec = [a if narrow_mask[r] else b
                   for r, (a, b) in enumerate(zip(decs[0], decs[1]))]
            info = np.where(narrow_mask, infos[0], infos[1])
        b_ovf = (info >> 7).astype(bool).reshape(NPc, S).any(axis=1)
        for t, si in enumerate(ids):
            if a_ovf[t] or b_ovf[t]:
                redo.append(si)
            else:
                out = []
                for s_i in range(int(nseg[t])):
                    out.extend(dec[t * S + s_i])
                results[si] = out

    prev = None
    for entry in pendB:
        _start_copies(entry)
        if prev is not None:
            _finish_pool(prev)
        prev = entry
    if prev is not None:
        _finish_pool(prev)
    _learn_maxi(index, len(redo), len(seqs), maxi)
    t0_ = _now()
    _redo_ladder(index, seqs, redo, results, self_match, max_len, maxi,
                 maxm)
    _tp("redo_ladder", t0_)
    if prof:
        print("[smem prof] " + " ".join(
            f"{k}={v:.2f}s" for k, v in tprof.items()), file=sys.stderr)
    return results


def _smem_all_pool(index, seqs, self_match, maxi, maxm, lanes, max_len):
    """Pool-mode driver: one device call per POOL_MAX reads, lane refill
    inside the kernel; the rare buffer-overflow reads re-run through the
    fixed-batch redo ladder."""
    Bn = len(seqs)
    results = [None] * Bn
    ids_all = []
    for i, s in enumerate(seqs):
        if len(s) == 0:
            results[i] = []     # reference emits nothing for empty queries
        else:
            ids_all.append(i)
    if not ids_all:
        return results
    # pad the pool to a power of two (few compiled shapes); pads are
    # length-1 reads that burn ~3 iterations each across all lanes
    NPc = 1
    while NPc < min(len(ids_all), POOL_MAX):
        NPc *= 2
    NPc = max(NPc, 16)
    lanes = min(lanes, NPc)
    redo = []
    CAP = NPc * 16          # compacted-output budget (mean ~12 matches/read)
    for lo in range(0, len(ids_all), NPc):
        ids = ids_all[lo: lo + NPc]
        q = np.zeros((NPc, max_len), np.uint8)
        lens = np.ones(NPc, np.int32)
        for t, si in enumerate(ids):
            s = seqs[si]
            q[t, : len(s)] = s
            lens[t] = len(s)
        qd, ld = jnp.asarray(q), jnp.asarray(lens)
        # body unroll amortizes the per-iteration table re-staging + carry
        # round-trips and helps the fixed-batch mode (+15-18% at B=2048);
        # in pool mode it delays lane refill and measured net-negative
        # (776 vs 1002 r/s on the same chip state), so default off here
        unroll = int(os.environ.get("FERMI_TPU_SMEM_UNROLL", "1"))
        out = _smem_batch(index, qd, ld, self_match, max_len, maxi, maxm,
                          lanes=lanes, compact=CAP, unroll=unroll)
        # transfer order matters on a slow link: the scalar total first,
        # then only the valid prefix of the match buffer (device-side
        # slice), never the xret vector (unused in pool mode)
        tot = int(np.asarray(out[3]))
        if tot > CAP:
            # rare: pool denser than the budget — uncompacted fallback
            out = _smem_batch(index, qd, ld, self_match, max_len, maxi,
                              maxm, lanes=lanes)
            g3, mn, _, ovf = map(np.asarray, out)
            dec = _decode_batch(g3, mn)
        else:
            # pad the device slice to a 64k multiple: each distinct slice
            # shape is a (remote) compile on this backend
            tpad = min(CAP, ((max(tot, 1) + 65535) // 65536) * 65536)
            cvals = np.asarray(out[0][:tpad])
            info = np.asarray(out[1])
            mn = np.minimum(info & ((1 << 30) - 1), maxm)
            ovf = info >> 30
            dec = _decode_compact(cvals, mn)
        for t, si in enumerate(ids):
            if ovf[t]:
                redo.append(si)
            else:
                results[si] = dec[t]
    _learn_maxi(index, len(redo), len(seqs), maxi)
    _redo_ladder(index, seqs, redo, results, self_match, max_len, maxi,
                 maxm)
    return results


def _decode_compact(cvals, mn):
    """Decode the device-compacted output: cvals [CAP, 3] holds the valid
    (kf, sz, meta) rows of every read back to back in read order; mn gives
    per-read counts.  Same emission-order lexsort as _decode_batch, with the
    flat position standing in for the per-read column."""
    NPn = mn.shape[0]
    tot = int(mn.sum())
    rows = np.repeat(np.arange(NPn), mn)
    meta = cvals[:tot, 2].astype(np.int64)
    order = np.lexsort((-np.arange(tot), meta >> 21, rows))
    m2 = meta[order]
    tup = list(zip(((m2 >> 1) & 1023).tolist(),
                   ((m2 >> 11) & 1023).tolist(),
                   cvals[:tot, 1][order].tolist(),
                   (m2 & 1).astype(bool).tolist(),
                   cvals[:tot, 0][order].tolist()))
    off = np.concatenate([[0], np.cumsum(mn)])
    # rows are mostly empty: share ONE empty list (callers only read) and
    # slice just the nonzero rows — 65k python slices were ~65 ms/call
    empty = []
    res = [empty] * NPn
    for r in np.flatnonzero(mn):
        res[r] = tup[off[r]: off[r + 1]]
    return res


def _decode_batch(g3, mn):
    """Unpack the kernel's per-read match buffers into the reference's
    emission order, for a whole batch at once (one lexsort; the per-read
    python walk cost ~55 us/read and capped pool throughput).

    meta packs (seg << 21 | end << 11 | start << 1 | closed); matches were
    appended start-DESCENDING within each segment (the backward walk), and
    fm6_smem emits them start-ascending — the lexsort reverses each
    segment's slice (replacing the old in-kernel take_along_axis reversal,
    which cost ~7 ms per loop iteration at B=2048)."""
    mkf, msz, mmeta = g3[..., 0], g3[..., 1], g3[..., 2].astype(np.int64)
    NP, M = mmeta.shape
    mn = np.minimum(np.asarray(mn), M)
    cols = np.arange(M)
    rows, cc = np.nonzero(cols[None, :] < mn[:, None])
    meta = mmeta[rows, cc]
    order = np.lexsort((-cc, meta >> 21, rows))
    m2 = meta[order]
    tup = list(zip(((m2 >> 1) & 1023).tolist(),
                   ((m2 >> 11) & 1023).tolist(),
                   msz[rows, cc][order].tolist(),
                   (m2 & 1).astype(bool).tolist(),
                   mkf[rows, cc][order].tolist()))
    off = np.concatenate([[0], np.cumsum(mn)])
    empty = []
    res = [empty] * NP
    for r in np.flatnonzero(mn):
        res[r] = tup[off[r]: off[r + 1]]
    return res


def format_smem(index: FMDIndex, match) -> str:
    """fm6_write_smem text line: start, end, size (u32-clamped), flags."""
    start, end, size, closed, kf = match
    size = min(size, 0xFFFFFFFF)
    n_seqs = int(index.mcnt[1])
    return f"{start}\t{end}\t{size}\t{'OT'[int(closed)]}{'OT'[int(kf < n_seqs)]}"


def _native_index_arrays(index):
    """Host-contiguous (blocks, occ8, cnt, n_seqs) views of an index, cached
    on the index object: remap calls smem_all once per contig batch, and
    re-extracting a device-resident FMDIndex meant a full BWT d2h transfer
    per batch (~seconds each over the tunneled dev chip)."""
    cached = getattr(index, "_native_arrays", None)
    if cached is not None:
        return cached
    blocks_src = getattr(index, "bwt_blocks", None)
    if blocks_src is None:
        blocks_src = index.blocks
    blocks = np.ascontiguousarray(np.asarray(blocks_src))
    occ = getattr(index, "occ8", None)
    if occ is None:
        occ6 = np.asarray(index.occ).astype(np.int64, copy=False)
        occ = np.zeros((occ6.shape[0], 8), np.int64)
        occ[:, : occ6.shape[1]] = occ6
    occ = np.ascontiguousarray(occ)
    cnt = np.zeros(8, np.int64)
    cnt_src = np.asarray(index.cnt).astype(np.int64)
    cnt[: len(cnt_src)] = cnt_src
    n_seqs = int(np.asarray(index.mcnt[1]))
    cached = (blocks, occ, cnt, n_seqs)
    try:
        index._native_arrays = cached
    except Exception:
        pass
    return cached


def smem_all_native_raw(index, seqs, self_match=False):
    """smem_all_native without the per-match tuple conversion: returns
    (flat int64 [total, 5] rows of (start, end, size, closed, kf) in
    per-read emission order, counts int64 [n_reads]).  The raw form feeds
    the native paircov engine (remap) with zero Python marshaling."""
    import ctypes
    from fermi_tpu import native

    lib = native.get_lib()
    offsets = np.zeros(len(seqs) + 1, np.int64)
    for i, q in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(q)
    qbuf = np.ascontiguousarray(
        np.concatenate([np.asarray(q, np.uint8) for q in seqs])
        if seqs else np.zeros(0, np.uint8))
    counts = np.zeros(len(seqs), np.int64)
    total = ctypes.c_int64()
    from fermi_tpu.index.blkidx import BlkIndex
    if isinstance(index, BlkIndex):  # out-of-core `-M` path
        ptr = lib.fsmem_all_blk(
            index.path.encode(),
            qbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(seqs), int(self_match),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.byref(total))
    else:
        blocks, occ, cnt, n_seqs = _native_index_arrays(index)
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
    if total.value < 0:
        raise OSError(f"fsmem_all_blk failed on {index.path}")
    try:
        flat = np.ctypeslib.as_array(ptr, shape=(total.value + 1, 5))[
            : total.value].copy()
    finally:
        lib.frld_free(ctypes.cast(ptr, ctypes.c_void_p))
    return flat, counts


def smem_all_native(index, seqs, self_match=False):
    """Exact SMEMs via the native sequential engine (native/smem.cpp) —
    the long-query path, where per-segment interval sets reach hundreds and
    fixed-width device buffers would mostly carry padding.  Accepts either
    FMDIndex or HostIndex (both speak the blocked layout)."""
    flat, counts = smem_all_native_raw(index, seqs, self_match)
    results = []
    at = 0
    for i in range(len(seqs)):
        k = int(counts[i])
        results.append([
            (int(flat[u, 0]), int(flat[u, 1]), int(flat[u, 2]),
             bool(flat[u, 3]), int(flat[u, 4])) for u in range(at, at + k)])
        at += k
    return results
