"""Sequence utility commands (reference seq.c:58-373, cmd.c:13-45):
splitfa, fltuniq, trimseq, pe2cofq, cg2cofq, cnt2qual.

Host-side stream tools; fltuniq's k-mer presence table is vectorized numpy
(2-bit flag semantics of the reference = "seen once" / "seen twice+" planes).
"""

import gzip
import math
import os
import sys

import numpy as np

from fermi_tpu.core import dna, fastx


def write_seq(rec) -> str:
    tag = "@" if rec.qual else ">"
    comment = f" {rec.comment}" if rec.comment else ""
    s = f"{tag}{rec.name}{comment}\n{rec.seq}\n"
    if rec.qual:
        s += f"+\n{rec.qual}\n"
    return s


def splitfa(in_path, prefix, n_files=8):
    outs = [gzip.open(f"{prefix}.{i:04d}.fq.gz", "wt", compresslevel=1)
            for i in range(n_files)]
    n_seqs = 0
    for rec in fastx.read_fastx(in_path):
        outs[(n_seqs >> 1) % n_files].write(write_seq(rec))
        n_seqs += 1
    for f in outs:
        f.close()


def _kmer_codes(seq: str, k: int):
    """All k-mer 2-bit codes over ACGT-only windows; None marks breaks."""
    code = dna.NT6_TABLE[np.frombuffer(seq.encode(), np.uint8)].astype(np.int64) - 1
    valid = (code >= 0) & (code < 4)
    n = len(code)
    if n < k:
        return np.zeros(0, np.int64), valid
    # rolling pack: z_i = sum code[i-k+1..i] << ... computed with stride trick
    codes = np.zeros(n - k + 1, np.int64)
    ok = np.ones(n - k + 1, bool)
    z = 0
    # vectorized Horner over k shifted views
    for j in range(k):
        codes = (codes << 2) | np.where(valid[j: j + n - k + 1],
                                        code[j: j + n - k + 1], 0)
        ok &= valid[j: j + n - k + 1]
    return codes[ok], valid


def fltuniq(in_path, out_fp, k=0, verbose=True):
    if k == 0:
        size = os.path.getsize(in_path)
        k = int(math.log(size) / math.log(4) + 1.499)
        k = min(max(k, 15), 18)
        sys.stderr.write(f"[M::fltuniq] set the k-mer size as {k}\n")
    nwords = (1 << (2 * k)) >> 6
    seen1 = np.zeros(nwords, np.uint64)
    seen2 = np.zeros(nwords, np.uint64)
    if verbose:
        sys.stderr.write("[M::fltuniq] building the hash table...\n")
    for rec in fastx.read_fastx(in_path):
        codes, _ = _kmer_codes(rec.seq, k)
        if not len(codes):
            continue
        uniq, counts = np.unique(codes, return_counts=True)
        w = (uniq >> 6).astype(np.int64)
        b = np.uint64(1) << (uniq & 63).astype(np.uint64)
        already = (seen1[w] & b) != 0
        dup = already | (counts > 1)
        np.bitwise_or.at(seen2, w[dup], b[dup])
        np.bitwise_or.at(seen1, w, b)
    if verbose:
        sys.stderr.write("[M::fltuniq] filtering the reads...\n")
    out = []
    prev_name = None
    for rec in fastx.read_fastx(in_path):
        is_paired = prev_name is not None and prev_name == rec.name
        if is_paired:
            if not out:
                prev_name = rec.name
                continue
        else:
            if out:
                out_fp.write("".join(out))
            out = []
        keep = _read_all_dup(rec.seq, k, seen2)
        if keep:
            out.append(write_seq(rec))
        elif is_paired:
            out = []
        prev_name = rec.name
    if out:
        out_fp.write("".join(out))


def _read_all_dup(seq, k, seen2):
    """Reference filter loop (seq.c:183-191): drop on any non-ACGT base or
    any k-mer window (over the rolling, break-resetting scan) not seen twice."""
    code = dna.NT6_TABLE[np.frombuffer(seq.encode(), np.uint8)].astype(np.int64) - 1
    if ((code < 0) | (code >= 4)).any():
        return False
    n = len(code)
    if n < k:
        return True  # no window ever reaches length k; loop runs off the end
    z = 0
    codes = np.zeros(n - k + 1, np.int64)
    for j in range(k):
        codes = (codes << 2) | code[j: j + n - k + 1]
    w = (codes >> 6).astype(np.int64)
    b = np.uint64(1) << (codes & 63).astype(np.uint64)
    return bool(((seen2[w] & b) != 0).all())


def trimseq(in_path, out_fp, min_l=20, min_q=3, drop_ambi=True):
    out = []
    prev_name = None
    for rec in fastx.read_fastx(in_path):
        is_paired = False
        if prev_name is not None and len(rec.name) == len(prev_name) \
           and len(prev_name):
            if rec.name[:-1] == prev_name[:-1]:
                c1, c2 = prev_name[-1], rec.name[-1]
                if c1 == c2:
                    is_paired = True
                elif len(prev_name) >= 2 and prev_name[-2] == "/" \
                        and c1.isdigit() and c2.isdigit():
                    is_paired = True
        if is_paired:
            if not out:
                prev_name = rec.name
                continue
        else:
            if out:
                out_fp.write("".join(out))
            out = []
        left, right = 0, len(rec.seq)
        drop = False
        if min_q > 0 and rec.qual:
            q = np.frombuffer(rec.qual.encode(), np.uint8).astype(np.int32) - 33
            s = mx = 0
            max_i = right
            for i in range(right - 1, left - 1, -1):
                s += min_q - q[i]
                if s < 0:
                    break
                if mx < s:
                    mx, max_i = s, i
            right = max_i
            s = mx = 0
            max_i = -1
            for i in range(0, right):
                s += min_q - q[i]
                if s < 0:
                    break
                if mx < s:
                    mx, max_i = s, i
            left = max_i + 1
            if right - left < min_l:
                drop = True
        if not drop and drop_ambi:
            sub = dna.encode(rec.seq[left:right])
            if (sub >= 5).any():
                drop = True
        if not drop:
            r2 = fastx.SeqRecord(rec.name, rec.seq[left:right],
                                 rec.qual[left:right] if rec.qual else None,
                                 rec.comment)
            out.append(write_seq(r2))
        elif is_paired:
            out = []
        prev_name = rec.name
    if out:
        out_fp.write("".join(out))


def pe2cofq(in1, in2, out_fp):
    it1 = fastx.read_fastx(in1)
    it2 = fastx.read_fastx(in2)
    for r1 in it1:
        try:
            r2 = next(it2)
        except StopIteration:
            break
        name = r1.name
        if len(name) > 2 and name[-2] == "/" and name[-1].isdigit():
            name = name[:-2]
        r1 = fastx.SeqRecord(name, r1.seq, r1.qual, r1.comment)
        r2 = fastx.SeqRecord(name, r2.seq, r2.qual, r2.comment)
        out_fp.write(write_seq(r1))
        out_fp.write(write_seq(r2))


def cg2cofq(in_path, out_fp):
    for rec in fastx.read_fastx(in_path):
        i = 0
        while i < len(rec.seq) and rec.seq[i].isalpha():
            i += 1
        tag = "@" if rec.qual else ">"
        out_fp.write(f"{tag}{rec.name}\n{rec.seq[:i]}\n")
        if rec.qual:
            out_fp.write(f"+\n{rec.qual[:i]}\n")
        j = i
        while j < len(rec.seq) and not rec.seq[j].isalpha():
            j += 1
        if j != len(rec.seq):
            out_fp.write(f"{tag}{rec.name}\n{rec.seq[j:]}\n")
            if rec.qual:
                out_fp.write(f"+\n{rec.qual[j:]}\n")


def cnt2qual(in_path, out_fp, q=17):
    for rec in fastx.read_fastx(in_path):
        qual = rec.qual
        if qual:
            arr = np.frombuffer(qual.encode(), np.uint8).astype(np.int32)
            arr = np.minimum(q * (arr - 33) + 33, 126)
            qual = arr.astype(np.uint8).tobytes().decode("latin1")
        out_fp.write(f"@{rec.name}")
        if rec.comment:
            out_fp.write(f"\t{rec.comment}\n")
        else:
            out_fp.write("\n")
        out_fp.write(rec.seq + "\n")
        if qual:
            out_fp.write(f"+\n{qual}\n")
