"""fermi-compatible command-line interface.

Subcommand surface mirrors reference main.c:74-98; output formats match the
reference so pipelines (and parity tests) can swap binaries.
"""

import argparse
import os
import sys

import numpy as np


def _add_build(sub):
    p = sub.add_parser("build", help="generate FMD-index from FASTA/FASTQ")
    p.add_argument("-b", dest="sbits", type=int, default=3,
                   help="small block marker per 2^(INT+3) bytes")
    p.add_argument("-f", dest="force", action="store_true",
                   help="overwrite output")
    p.add_argument("-o", dest="out", default="-", help="output file")
    p.add_argument("-i", dest="append_to", default=None,
                   help="append to the existing index FILE")
    p.add_argument("-s", dest="block_size", type=int, default=250000000)
    p.add_argument("-l", dest="max_len", type=int, default=0,
                   help="trim reads to INT bp (0: no trim)")
    p.add_argument("-O", dest="no_trim_pal", action="store_true",
                   help="do not 1bp-trim reads equal to own revcomp")
    p.add_argument("fastx")
    p.set_defaults(func=cmd_build)


def cmd_build(args):
    import os
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.construct import suffix
    from fermi_tpu import rld

    if args.out != "-" and not args.force and os.path.exists(args.out):
        sys.stderr.write(f"[E::build] File `{args.out}' exists. Use -f to overwrite.\n")
        return 1
    seqs = []
    for rec in fastx.read_fastx(args.fastx):
        s = dna.encode(rec.seq)
        if args.max_len and len(s) > args.max_len:
            s = s[: args.max_len]
        seqs.append(s)
    text = suffix.build_text(seqs, trim_palindrome=not args.no_trim_pal)
    if args.append_to:
        # reference `build -i` (fm_append, merge.c:139-209): streaming
        # block append — the existing index is never expanded in RAM
        # (rank walks via its mmapped .fmd.blk cache, one stream-decode
        # pass into the encoder); result byte-equal to a full fm_merge
        from fermi_tpu.algos.merge import fm_append_streaming

        fm_append_streaming(args.append_to, text, args.out,
                            sbits=args.sbits)
        return 0
    runs = rld.Runs.from_bwt(suffix.multistring_bwt(text))
    rld.write_fmd(runs, args.out, sbits=args.sbits)
    return 0


def _add_unpack(sub):
    p = sub.add_parser("unpack", help="retrieve DNA sequences from an index")
    p.add_argument("-i", dest="ids", type=int, action="append", default=[])
    p.add_argument("-M", dest="mmap", action="store_true",
                   help="query the compressed index via mmap (bounded RSS)")
    p.add_argument("fmd")
    p.set_defaults(func=cmd_unpack)


def cmd_unpack(args):
    from fermi_tpu.core import dna

    if args.mmap:
        # compressed-domain walks off the mmapped .fmd (rld.c:327-346)
        from fermi_tpu.index.mmapfmd import MmapIndex

        m = MmapIndex(args.fmd)
        n = m.n_seqs
        ids = [i for i in args.ids if i < n] if args.ids else range(n)
        ids = np.fromiter(ids, dtype=np.int64)
        for lo in range(0, len(ids), 4096):
            seqs, ranks = m.retrieve(ids[lo: lo + 4096], return_ranks=True)
            for s, k in zip(seqs, ranks):
                sys.stdout.write(f"{dna.decode(s)}\t{int(k)}\n")
        return 0
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search import extend as se

    idx = FMDIndex.restore(args.fmd)
    n = int(np.asarray(idx.n_seqs))
    ids = [i for i in args.ids if i < n] if args.ids else range(n)
    ids = np.fromiter(ids, dtype=np.int64)
    for lo in range(0, len(ids), 4096):
        chunk = ids[lo: lo + 4096]
        seqs, ranks = se.retrieve_strings(idx, chunk, max_len=1 << 16)
        for s, k in zip(seqs, ranks):
            sys.stdout.write(f"{dna.decode(s)}\t{int(k)}\n")
    return 0


def _add_exact(sub):
    p = sub.add_parser("exact", help="find exact (supermaximal) matches")
    p.add_argument("-M", dest="mmap", action="store_true")
    p.add_argument("-s", dest="self_match", action="store_true")
    p.add_argument("fmd")
    p.add_argument("fastx")
    p.set_defaults(func=cmd_exact)


def cmd_exact(args):
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search import smem as sm

    if args.mmap:  # out-of-core: SMEMs off the mmapped record cache
        from fermi_tpu.index.blkidx import ensure_blk

        idx = ensure_blk(args.fmd)
    else:
        idx = FMDIndex.restore(args.fmd)
    recs = list(fastx.read_fastx(args.fastx))
    seqs = [dna.encode(r.seq) for r in recs]
    batch = 4096
    out = sys.stdout
    for lo in range(0, len(recs), batch):
        chunk = seqs[lo: lo + batch]
        matches = sm.smem_all(idx, chunk, self_match=args.self_match)
        for rec, s, mems in zip(recs[lo: lo + batch], chunk, matches):
            out.write(f"SQ\t{rec.name}\t{len(s)}\t{len(mems)}\n")
            for m in mems:
                out.write("EM\t" + sm.format_smem(idx, m) + "\n")
            out.write("//\n")
    return 0


def _add_chkbwt(sub):
    p = sub.add_parser("chkbwt", help="validate the FMD-index")
    p.add_argument("-M", dest="mmap", action="store_true")
    p.add_argument("-r", dest="check_rank", action="store_true")
    p.add_argument("-p", dest="plain", action="store_true")
    p.add_argument("fmd")
    p.set_defaults(func=cmd_chkbwt)


def cmd_chkbwt(args):
    import jax.numpy as jnp
    from fermi_tpu import rld
    from fermi_tpu.core import dna
    from fermi_tpu.index.fmd import FMDIndex

    if args.mmap:
        return _chkbwt_mmap(args)
    runs = rld.read_fmd(args.fmd)
    mc = ", ".join(str(int(x)) for x in runs.mcnt)
    sys.stderr.write(f"[M::chkbwt] marginal counts: ({mc})\n")
    bwt = runs.expand()
    idx = FMDIndex.from_bwt(bwt)
    if args.check_rank:
        n = bwt.size
        expect = np.zeros((n, 6), np.int64)
        for c in range(6):
            expect[:, c] = np.cumsum(bwt == c)
        step = 1 << 20
        for lo in range(0, n, step):
            ks = np.arange(lo, min(lo + step, n), dtype=np.int64)
            got = np.asarray(idx.rank6(jnp.asarray(ks + 1)))
            if not np.array_equal(got, expect[lo: lo + step]):
                bad = np.argwhere(got != expect[lo: lo + step])[0]
                sys.stderr.write(
                    f"[E::chkbwt] rank({bad[1]},{lo+bad[0]}) mismatch\n")
                return 1
        if not np.array_equal(expect[-1], np.asarray(runs.mcnt[1:7], dtype=np.int64)):
            sys.stderr.write("[E::chkbwt] marginal count mismatch\n")
            return 1
        sys.stderr.write("[M::chkbwt] rank check passed\n")
    if args.plain:
        sys.stdout.write(dna.decode(bwt))
        sys.stdout.write("\n")
    return 0


def _chkbwt_mmap(args):
    """chkbwt with bounded RSS: validate the blocked record cache against
    itself (occ rows vs running counts) and against compressed-domain rank
    queries on the mmapped .fmd — without ever expanding the BWT in RAM."""
    from fermi_tpu.core import dna
    from fermi_tpu.index.blkidx import ensure_blk
    from fermi_tpu.index.mmapfmd import MmapIndex

    m = MmapIndex(args.fmd)
    mc = ", ".join(str(int(x)) for x in m.mcnt)
    sys.stderr.write(f"[M::chkbwt] marginal counts: ({mc})\n")
    blk = ensure_blk(args.fmd)
    rstride = 256 if blk.wide else 192
    odt = np.uint64 if blk.wide else np.uint32
    raw = np.memmap(blk.path, np.uint8, "r", offset=4096)
    raw = raw.reshape(blk.n_rows, rstride)
    run_cnt = np.zeros(6, np.int64)
    chunk = 1 << 16
    rng = np.random.default_rng(0)
    for lo in range(0, blk.n_rows, chunk):
        rows = np.asarray(raw[lo: lo + chunk])
        occ = rows[:, 128:128 + (48 if blk.wide else 24)].copy()
        occ = occ.view(odt).reshape(-1, 6).astype(np.int64)
        if args.check_rank:
            # every block's stored occ must equal the running decode counts
            hist = np.zeros((len(rows), 6), np.int64)
            for c in range(6):
                hist[:, c] = (rows[:, :128] == c).sum(axis=1)
            expect = run_cnt + np.vstack(
                [np.zeros(6, np.int64), np.cumsum(hist[:-1], axis=0)])
            if not np.array_equal(occ, expect):
                bad = int(np.argwhere((occ != expect).any(axis=1))[0][0])
                sys.stderr.write(
                    f"[E::chkbwt] occ row {lo + bad} mismatch\n")
                return 1
            run_cnt = expect[-1] + hist[-1]
            # tie the cache to the compressed index: spot-check rank6
            pos = int(rng.integers(lo, min(lo + chunk, blk.n_rows))) << 7
            pos = min(pos, blk.total)
            got = m.rank6(np.array([pos]))[0]
            want = occ[min((pos >> 7) - lo, len(occ) - 1)]
            if (pos & 127) == 0 and pos < blk.total and \
                    not np.array_equal(got, want):
                sys.stderr.write(f"[E::chkbwt] fmd/blk rank({pos})\n")
                return 1
        if args.plain:
            flat = rows[:, :128].reshape(-1)
            end = min(blk.total - (lo << 7), flat.size)
            sys.stdout.write(dna.decode(flat[:end]))
    if args.check_rank:
        if not np.array_equal(run_cnt, m.mcnt[1:7].astype(np.int64)):
            sys.stderr.write("[E::chkbwt] marginal count mismatch\n")
            return 1
        sys.stderr.write("[M::chkbwt] rank check passed\n")
    if args.plain:
        sys.stdout.write("\n")
    return 0


def _add_correct(sub):
    p = sub.add_parser("correct", help="error-correct reads against an index")
    p.add_argument("-M", dest="mmap", action="store_true")
    p.add_argument("-K", dest="keep_bad", action="store_true")
    p.add_argument("-t", dest="n_threads", type=int, default=1)
    p.add_argument("-k", dest="w", type=int, default=-1)
    p.add_argument("-v", dest="verbose", type=int, default=4)
    p.add_argument("-O", dest="min_occ", type=int, default=3)
    p.add_argument("-p", dest="is_paired", action="store_true")
    p.add_argument("-C", dest="max_corr", type=float, default=0.3)
    p.add_argument("-l", dest="trim_l", type=int, default=0)
    p.add_argument("-s", dest="step", type=int, default=5)
    p.add_argument("fmd")
    p.add_argument("fastx")
    p.set_defaults(func=cmd_correct)


def _load_host_or_device(path):
    """Index loader mirroring the pipeline's platform dispatch: commands
    whose engines run on the host (cpu / tunneled-axon platforms) get a
    HostIndex and never pay the device upload; a directly-attached TPU
    gets the device FMDIndex."""
    from fermi_tpu.algos.correct import wants_device_collect

    if wants_device_collect():
        from fermi_tpu.index.fmd import FMDIndex

        return FMDIndex.restore(path)
    from fermi_tpu import rld
    from fermi_tpu.algos.hostindex import HostIndex

    return HostIndex.from_runs(rld.read_fmd(path))


def cmd_correct(args):
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.algos import correct as ec

    if args.mmap:  # collect phase off the mmapped record cache
        from fermi_tpu.index.blkidx import ensure_blk

        idx = ensure_blk(args.fmd)
    else:
        idx = _load_host_or_device(args.fmd)
    ec.ec_correct(idx, args.fastx, sys.stdout, w=args.w,
                  min_occ=args.min_occ, keep_bad=args.keep_bad,
                  is_paired=args.is_paired, max_corr=args.max_corr,
                  trim_l=args.trim_l, step=args.step,
                  n_threads=args.n_threads)
    return 0


def _add_seqsort(sub):
    for name in ("seqsort", "seqrank"):
        p = sub.add_parser(name, help="compute the rank of sequences")
        p.add_argument("-M", dest="mmap", action="store_true")
        p.add_argument("-t", dest="n_threads", type=int, default=1)
        p.add_argument("fmd")
        p.set_defaults(func=cmd_seqsort)


def cmd_seqsort(args):
    if args.mmap:  # walks off the mmapped record cache
        from fermi_tpu.index.blkidx import ensure_blk
        from fermi_tpu.algos.seqsort import seqsort_native

        arr = seqsort_native(ensure_blk(args.fmd),
                             n_threads=max(args.n_threads, 1))
        sys.stdout.buffer.write(arr.tobytes())
        return 0
    from fermi_tpu.algos.correct import wants_device_collect

    if wants_device_collect():
        from fermi_tpu.index.fmd import FMDIndex
        from fermi_tpu.algos.seqsort import seqsort

        arr = seqsort(FMDIndex.restore(args.fmd))
    else:
        from fermi_tpu.algos.seqsort import seqsort_native

        arr = seqsort_native(_load_host_or_device(args.fmd),
                             n_threads=max(args.n_threads, 1))
    sys.stdout.buffer.write(arr.tobytes())
    return 0


def _add_unitig(sub):
    p = sub.add_parser("unitig", help="construct unitigs")
    p.add_argument("-M", dest="mmap", action="store_true")
    p.add_argument("-l", dest="min_match", type=int, default=30)
    p.add_argument("-t", dest="n_threads", type=int, default=1)
    p.add_argument("-r", dest="rank_file", default=None)
    p.add_argument("fmd")
    p.set_defaults(func=cmd_unitig)


def cmd_unitig(args):
    from fermi_tpu import rld
    from fermi_tpu.algos.hostindex import HostIndex
    from fermi_tpu.algos.unitig import fm6_unitig

    if args.mmap:  # the whole walk off the mmapped record cache
        from fermi_tpu.index.blkidx import ensure_blk

        e = ensure_blk(args.fmd)
    else:
        e = HostIndex.from_runs(rld.read_fmd(args.fmd))
    sorted_arr = None
    if args.rank_file:
        sorted_arr = np.fromfile(args.rank_file, np.uint64, e.n_seqs)
    if os.environ.get("FERMI_TPU_DEVICE_UNITIG", "0") == "1" \
            and not args.mmap:
        from fermi_tpu.algos.unitig_bulk import fm6_unitig_device

        fm6_unitig_device(e, args.fmd, args.min_match, sys.stdout,
                          sorted_arr)
        return 0
    fm6_unitig(e, args.min_match, sys.stdout, sorted_arr,
               n_threads=args.n_threads)
    return 0


def _add_clean(sub):
    p = sub.add_parser("clean", help="clean the assembly graph")
    p.add_argument("-F", dest="no_amend", action="store_true")
    p.add_argument("-C", dest="clean", action="store_true")
    p.add_argument("-A", dest="aggressive", action="store_true")
    p.add_argument("-O", dest="read_ori", action="store_true")
    p.add_argument("-S", dest="no_simpl", action="store_true")
    p.add_argument("-d", dest="min_dratio0", type=float, default=0.7)
    p.add_argument("-N", dest="max_arc", type=int, default=512)
    p.add_argument("-l", dest="min_elen", type=int, default=300)
    p.add_argument("-e", dest="min_ensr", type=int, default=4)
    p.add_argument("-i", dest="min_insr", type=int, default=3)
    p.add_argument("-o", dest="min_ovlp", type=int, default=60)
    p.add_argument("-n", dest="n_iter", type=int, default=3)
    p.add_argument("-R", dest="min_dratio1", type=float, default=0.8)
    p.add_argument("-w", dest="max_bcov", type=float, default=10.0)
    p.add_argument("-r", dest="max_bfrac", type=float, default=0.15)
    p.add_argument("mag")
    p.set_defaults(func=cmd_clean)


def cmd_clean(args):
    from fermi_tpu.algos import mag as M

    opt = dict(M.DEFAULT_OPT)
    opt.update(flag_no_amend=args.no_amend, flag_clean=args.clean,
               flag_aggressive=args.aggressive, flag_read_ori=args.read_ori,
               flag_no_simpl=args.no_simpl, min_dratio0=args.min_dratio0,
               max_arc=args.max_arc, min_elen=args.min_elen,
               min_ensr=args.min_ensr, min_insr=args.min_insr,
               min_ovlp=args.min_ovlp, n_iter=args.n_iter,
               min_dratio1=args.min_dratio1, max_bcov=args.max_bcov,
               max_bfrac=args.max_bfrac)
    g = M.mag_read(args.mag, opt)
    M.g_clean(g, opt)
    M.mag_print(g, sys.stdout)
    return 0


def _add_merge(sub):
    p = sub.add_parser("merge", help="merge multiple FMD-indexes")
    p.add_argument("-f", dest="force", action="store_true")
    p.add_argument("-t", dest="n_threads", type=int, default=1)
    p.add_argument("-o", dest="out", default="-")
    p.add_argument("fmds", nargs="+")
    p.set_defaults(func=cmd_merge)


def cmd_merge(args):
    import os
    from fermi_tpu import rld
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.algos.merge import fm_merge

    if args.out != "-" and not args.force and os.path.exists(args.out):
        sys.stderr.write(f"[E::merge] File `{args.out}' exists. Use -f.\n")
        return 1
    runs0 = rld.read_fmd(args.fmds[0])
    bwt0 = runs0.expand()
    for fn in args.fmds[1:]:
        runs1 = rld.read_fmd(fn)
        bwt1 = runs1.expand()
        e0 = FMDIndex.from_bwt(bwt0)
        e1 = FMDIndex.from_bwt(bwt1)
        bwt0 = fm_merge(e0, bwt0, e1, bwt1)
        sys.stderr.write(f"[M::merge] merged `{fn}'\n")
    rld.write_fmd(rld.Runs.from_bwt(bwt0), args.out)
    return 0


def _add_sub(sub):
    p = sub.add_parser("sub", help="extract sub-index with a bit array")
    p.add_argument("-c", dest="is_comp", action="store_true")
    p.add_argument("-t", dest="n_threads", type=int, default=1)
    p.add_argument("fmd")
    p.add_argument("bits")
    p.set_defaults(func=cmd_sub)


def cmd_sub(args):
    from fermi_tpu import rld
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.algos.sub import fm_sub, unpack_bitfile

    runs = rld.read_fmd(args.fmd)
    bwt = runs.expand()
    e = FMDIndex.from_bwt(bwt)
    bits = unpack_bitfile(args.bits)
    if len(bits) != int(runs.n_seqs):
        sys.stderr.write("[E::sub] unmatched index and the bit array\n")
        return 1
    out = fm_sub(e, bwt, bits, args.is_comp)
    rld.write_fmd(rld.Runs.from_bwt(out), "-")
    return 0


def _add_contrast(sub):
    p = sub.add_parser("contrast", help="compare two FMD-indexes")
    p.add_argument("-k", dest="kmer", type=int, default=55)
    p.add_argument("-o", dest="min_occ", type=int, default=3)
    p.add_argument("-t", dest="n_threads", type=int, default=1)
    p.add_argument("args", nargs=6,
                   metavar="idx1.fmd idx1.rank 1-2.sub idx2.fmd idx2.rank 2-1.sub")
    p.set_defaults(func=cmd_contrast)


def cmd_contrast(args):
    from fermi_tpu import rld
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.algos.contrast import fm6_contrast, sub_conv
    from fermi_tpu.algos.sub import pack_bitfile

    f0, r0, o0, f1, r1, o1 = args.args
    e0 = FMDIndex.restore(f0)
    e1 = FMDIndex.restore(f1)
    sub0, sub1 = fm6_contrast(e0, e1, args.kmer, args.min_occ)
    for fmd, rank_fn, out_fn, s in ((f0, r0, o0, sub0), (f1, r1, o1, sub1)):
        rank = np.fromfile(rank_fn, np.uint64, len(s))
        sel = sub_conv(s, rank)
        sys.stderr.write(
            f"[M::contrast] {int(sel.sum())} reads selected from {fmd}\n")
        with open(out_fn, "wb") as fp:
            pack_bitfile(fp, sel)
    return 0


def _add_bitand(sub):
    p = sub.add_parser("bitand", help="intersect bit arrays")
    p.add_argument("bits", nargs="+")
    p.set_defaults(func=cmd_bitand)


def cmd_bitand(args):
    from fermi_tpu.algos.sub import unpack_bitfile, pack_bitfile

    acc = unpack_bitfile(args.bits[0])
    sys.stderr.write(f"[M::bitand] loaded `{args.bits[0]}' containing "
                     f"{int(acc.sum())} bits\n")
    for fn in args.bits[1:]:
        b = unpack_bitfile(fn)
        sys.stderr.write(f"[M::bitand] loaded `{fn}' containing "
                         f"{int(b.sum())} bits\n")
        if len(b) != len(acc):
            sys.stderr.write("[E::bitand] unequal array length\n")
            return 1
        acc &= b
    sys.stderr.write(f"[M::bitand] the output contains {int(acc.sum())} bits\n")
    pack_bitfile(sys.stdout.buffer, acc)
    return 0


def _add_recode(sub):
    p = sub.add_parser("recode", help="recode FM-index")
    p.add_argument("fmd")
    p.set_defaults(func=cmd_recode)


def cmd_recode(args):
    from fermi_tpu import rld

    rld.write_fmd(rld.read_fmd(args.fmd), "-")
    return 0


def _add_remap(sub):
    p = sub.add_parser("remap", help="compute coverage and PE coverage")
    p.add_argument("-M", dest="mmap", action="store_true")
    p.add_argument("-l", dest="skip", type=int, default=50)
    p.add_argument("-c", dest="min_pcv", type=int, default=0)
    p.add_argument("-D", dest="max_dist", type=int, default=1000)
    p.add_argument("-r", dest="rank_file", default=None)
    p.add_argument("-t", dest="n_threads", type=int, default=1)
    p.add_argument("fmd")
    p.add_argument("contigs")
    p.set_defaults(func=cmd_remap)


def cmd_remap(args):
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.algos.remap import remap

    if args.mmap:  # contig SMEMs off the mmapped record cache
        from fermi_tpu.index.blkidx import ensure_blk

        idx = ensure_blk(args.fmd)
    else:
        idx = _load_host_or_device(args.fmd)
    sorted_arr = None
    if args.rank_file:
        sorted_arr = np.fromfile(args.rank_file, np.uint64)
    remap(idx, args.contigs, sys.stdout, sorted_arr, args.skip, args.min_pcv,
          args.max_dist)
    return 0


def _add_scaf(sub):
    p = sub.add_parser("scaf", help="generate scaftigs")
    p.add_argument("-t", dest="n_threads", type=int, default=1)
    p.add_argument("-m", dest="min_supp", type=int, default=5)
    p.add_argument("-P", dest="pr_links", action="store_true")
    p.add_argument("-a", dest="a_thres", type=float, default=20.0)
    p.add_argument("-p", dest="p_thres", type=float, default=1e-20)
    p.add_argument("fmd")
    p.add_argument("mag")
    p.add_argument("avg", type=float)
    p.add_argument("std", type=float)
    p.set_defaults(func=cmd_scaf)


def cmd_scaf(args):
    from fermi_tpu import rld
    from fermi_tpu.algos.hostindex import HostIndex
    from fermi_tpu.algos.scaf import scaf_core

    runs = rld.read_fmd(args.fmd)
    e = HostIndex.from_runs(runs)
    scaf_core(e, args.mag, args.avg, args.std, min_supp=args.min_supp,
              a_thres=args.a_thres, p_thres=args.p_thres,
              pr_links=args.pr_links, out_fp=sys.stdout)
    return 0


def _add_sequtils(sub):
    p = sub.add_parser("splitfa", help="split a FASTA/Q file")
    p.add_argument("fastx")
    p.add_argument("prefix")
    p.add_argument("n_files", nargs="?", type=int, default=8)
    p.set_defaults(func=lambda a: _sequtil("splitfa", a))

    p = sub.add_parser("fltuniq", help="filter reads containing unique mers")
    p.add_argument("-k", dest="k", type=int, default=0)
    p.add_argument("fastx")
    p.set_defaults(func=lambda a: _sequtil("fltuniq", a))

    p = sub.add_parser("trimseq", help="trim a FASTA/Q file")
    p.add_argument("-q", dest="min_q", type=int, default=3)
    p.add_argument("-l", dest="min_l", type=int, default=20)
    p.add_argument("-N", dest="keep_ambi", action="store_true")
    p.add_argument("fastx")
    p.set_defaults(func=lambda a: _sequtil("trimseq", a))

    p = sub.add_parser("pe2cofq", help="convert split pefq to collated fastq")
    p.add_argument("fq1")
    p.add_argument("fq2")
    p.set_defaults(func=lambda a: _sequtil("pe2cofq", a))

    p = sub.add_parser("cg2cofq", help="convert cgfq to collated fastq")
    p.add_argument("fastx")
    p.set_defaults(func=lambda a: _sequtil("cg2cofq", a))

    p = sub.add_parser("cnt2qual", help="scale count-style qualities")
    p.add_argument("fastx")
    p.add_argument("q", nargs="?", type=int, default=17)
    p.set_defaults(func=lambda a: _sequtil("cnt2qual", a))


def _sequtil(which, args):
    from fermi_tpu.cli import sequtils as su

    if which == "splitfa":
        su.splitfa(args.fastx, args.prefix, args.n_files)
    elif which == "fltuniq":
        su.fltuniq(args.fastx, sys.stdout, k=args.k)
    elif which == "trimseq":
        su.trimseq(args.fastx, sys.stdout, min_l=args.min_l, min_q=args.min_q,
                   drop_ambi=not args.keep_ambi)
    elif which == "pe2cofq":
        su.pe2cofq(args.fq1, args.fq2, sys.stdout)
    elif which == "cg2cofq":
        su.cg2cofq(args.fastx, sys.stdout)
    elif which == "cnt2qual":
        su.cnt2qual(args.fastx, sys.stdout, q=args.q)
    return 0


def _add_example(sub):
    p = sub.add_parser("example", help="light-weight assembly via the API")
    p.add_argument("-e", dest="do_ec", action="store_true")
    p.add_argument("-U", dest="skip_unitig", action="store_true")
    p.add_argument("-c", dest="do_clean", action="store_true")
    p.add_argument("-k", dest="ec_k", type=int, default=-1)
    p.add_argument("-l", dest="unitig_k", type=int, default=-1)
    p.add_argument("fastx")
    p.set_defaults(func=cmd_example)


def cmd_example(args):
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.algos import mag as M
    from fermi_tpu.algos.scaf import fm6_api_unitig

    recs = list(fastx.read_fastx(args.fastx))
    seqs = [r.seq for r in recs]
    quals = [r.qual if r.qual else chr(33 + 20) * len(r.seq) for r in recs]
    if args.do_ec:
        from fermi_tpu.construct import suffix
        from fermi_tpu.index.fmd import FMDIndex
        from fermi_tpu.algos import correct as ec

        w = args.ec_k if args.ec_k > 0 else 19
        text = suffix.build_text([dna.encode(s) for s in seqs],
                                 trim_palindrome=False)
        idx = FMDIndex.from_bwt(suffix.multistring_bwt(text))
        cls, key, val, _ = ec.collect_solid_kmers(idx, w, 3)
        table = ec.SolidTable(w, cls, key, val)
        opt = dict(w=w, min_occ=3, keep_bad=1, is_paired=0, max_corr=0.3,
                   trim_l=0, step=5)
        out_s, out_q, _, _ = ec.fix_reads(
            table, opt, [s.encode() for s in seqs],
            [q.encode() for q in quals], n_threads=4)
        seqs = [s.decode("latin1") for s in out_s]
        quals = [q.decode("latin1") for q in out_q]
    if args.skip_unitig:
        pos = 0
        for s, q in zip(seqs, quals):
            pos += len(s) + 1
            sys.stdout.write(f"@{pos - 1}\n{s.upper()}\n+\n{q}\n")
        return 0
    lens = np.array([len(s) for s in seqs])
    if args.unitig_k > 0:
        mm = args.unitig_k
    else:
        kth = int(len(lens) * 0.25)
        mm = int(np.partition(lens, kth)[kth] * 0.33 + 0.499)
        sys.stderr.write(f"[M::example] choose k-mer size as {mm}\n")
    blob = b"\x00".join(dna.encode(s).tobytes() for s in seqs) + b"\x00"
    g = fm6_api_unitig(mm, blob)
    if args.do_clean:
        opt = dict(M.DEFAULT_OPT)
        opt["flag_clean"] = True
        opt["flag_aggressive"] = True
        M.g_clean(g, opt)
    M.mag_print(g, sys.stdout)
    return 0


def _add_run(sub):
    p = sub.add_parser("run", help="full assembly pipeline (run-fermi.pl)")
    p.add_argument("-P", dest="paired", action="store_true",
                   help="input is collated/interleaved paired FASTQ")
    p.add_argument("-C", dest="skip_ec", action="store_true")
    p.add_argument("-t", dest="n_threads", type=int, default=2)
    p.add_argument("-p", dest="prefix", default="fmdef")
    p.add_argument("-l", dest="trim_l", type=int, default=0)
    p.add_argument("-k", dest="unitig_k", type=int, default=50)
    p.add_argument("fastx", nargs="+")
    p.set_defaults(func=cmd_run)


def cmd_run(args):
    from fermi_tpu.pipeline.driver import Pipeline

    pl = Pipeline(args.prefix, n_threads=args.n_threads,
                  unitig_k=args.unitig_k, paired=args.paired,
                  trim_l=args.trim_l, skip_ec=args.skip_ec)
    pl.run(args.fastx)
    return 0


def _add_ropebwt(sub):
    p = sub.add_parser("ropebwt", help="alternative FM-index construction")
    p.add_argument("-a", dest="algo", default="bpr",
                   choices=["bpr", "bcr", "sais"])
    p.add_argument("-b", dest="binary", action="store_true",
                   help="binary RLE6 output")
    p.add_argument("-N", dest="cut_n", action="store_true")
    p.add_argument("-O", dest="no_trim_pal", action="store_true")
    p.add_argument("-F", dest="no_fwd", action="store_true")
    p.add_argument("-R", dest="no_rev", action="store_true")
    p.add_argument("-t", dest="threaded", action="store_true")
    p.add_argument("-o", dest="out", default="-")
    p.add_argument("-f", dest="tmpfn", default=None)
    p.add_argument("-v", dest="verbose", type=int, default=1)
    p.add_argument("-r", dest="max_runs", type=int, default=512)
    p.add_argument("-n", dest="max_nodes", type=int, default=64)
    p.add_argument("fastx")
    p.set_defaults(func=cmd_ropebwt)


def cmd_ropebwt(args):
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.construct import suffix
    from fermi_tpu import rld

    frags = []
    for rec in fastx.read_fastx(args.fastx):
        s = dna.encode(rec.seq)
        if args.cut_n:
            parts = [p[p != 5] for p in np.split(s, np.flatnonzero(s == 5))]
            parts = [p for p in parts if len(p)]
        else:
            # reference BCR randomizes ambiguous bases; we keep N (deterministic)
            parts = [s]
        for part in parts:
            if not args.no_trim_pal and not args.no_rev and not args.no_fwd \
               and dna.is_revcomp_palindrome(part):
                part = part[:-1]
            if not args.no_fwd:
                frags.append(part)
            if not args.no_rev:
                frags.append(dna.revcomp(part))
    # three interchangeable engines (reference keeps 4 builders that must
    # agree, fermi.1:581-628): rope insertion, column-wise BCR, SA
    if args.algo == "bpr":
        from fermi_tpu.construct.bprope import bpr_bwt
        bwt = bpr_bwt(frags)
    elif args.algo == "bcr":
        from fermi_tpu.construct.bcr import bcr_bwt
        bwt = bcr_bwt(frags)
    else:
        text_parts = []
        for f in frags:
            text_parts.append(f)
            text_parts.append(np.zeros(1, np.uint8))
        text = (np.concatenate(text_parts) if text_parts
                else np.zeros(0, np.uint8))
        bwt = suffix.multistring_bwt(text)
    runs = rld.Runs.from_bwt(bwt)
    if args.binary:
        out = sys.stdout.buffer if args.out == "-" else open(args.out, "wb")
        out.write(b"RLE\x06")
        out_bytes = bytearray()
        for ln, sy in zip(runs.lengths.tolist(), runs.symbols.tolist()):
            while ln > 31:
                out_bytes.append(31 << 3 | sy)
                ln -= 31
            out_bytes.append(ln << 3 | sy)
        out.write(bytes(out_bytes))
        if args.out != "-":
            out.close()
    else:
        txt = dna.decode(runs.expand())
        fp = sys.stdout if args.out == "-" else open(args.out, "w")
        fp.write(txt + "\n")
        if args.out != "-":
            fp.close()
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="fermi-tpu",
        description="TPU-native FMD-index assembler (fermi-compatible CLI)")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for add in (_add_build, _add_unpack, _add_exact, _add_chkbwt, _add_correct,
                _add_seqsort, _add_unitig, _add_clean, _add_merge, _add_sub,
                _add_contrast, _add_bitand, _add_recode, _add_remap,
                _add_scaf, _add_sequtils, _add_example, _add_run,
                _add_ropebwt):
        add(sub)
    args = ap.parse_args(argv)
    ret = args.func(args)
    _telemetry_endline(argv)
    return ret


def _telemetry_endline(argv):
    """End-of-run telemetry line, mirroring reference main.c:130-136:
    `[M::main] Version / CMD / Real time / CPU / RSS` at fm_verbose>=3
    (the default verbosity is 4, matching utils.c:8)."""
    import resource
    import time

    try:
        ru = resource.getrusage(resource.RUSAGE_SELF)
        cpu = ru.ru_utime + ru.ru_stime
        rss_gb = ru.ru_maxrss / 1024.0 / 1024.0  # Linux: KB -> GB
        real = time.monotonic() - _T0
        cmdline = " ".join(argv if argv is not None else sys.argv[1:])
        sys.stderr.write("[M::main] Version: fermi-tpu\n")
        sys.stderr.write(f"[M::main] CMD: fermi-tpu {cmdline}\n")
        sys.stderr.write(
            f"[M::main] Real time: {real:.3f} sec; CPU: {cpu:.3f} sec; "
            f"RSS: {rss_gb:.3f} GB\n")
    except Exception:  # telemetry must never break the command
        pass


_T0 = __import__("time").monotonic()


if __name__ == "__main__":
    sys.exit(main())
