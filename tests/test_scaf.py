"""Scaffolder parity vs reference `fermi scaf` (end of the PE pipeline)."""

import io
import re
import subprocess
import sys

import numpy as np
import pytest

from fermi_tpu import rld
from fermi_tpu.algos.hostindex import HostIndex
from fermi_tpu.algos.scaf import scaf_core

from util import build_my_fmd, revcomp_str


def build_pipeline(tmp_path, ref_fermi, seed=71, n_contig_gaps=2):
    """Two-contig genome with a coverage gap; PE reads bridge the gap."""
    rng = np.random.default_rng(seed)
    glen = 9000
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, glen))
    rl, insert = 70, 260
    reads = []
    # uniform PE coverage, but single-end coverage hole at the middle so the
    # unitigs break while the inserts still span it
    hole = (4400, 4600)
    for _ in range(1400):
        ins = int(rng.normal(insert, 25))
        ins = max(rl + 10, min(ins, 500))
        pos = int(rng.integers(0, glen - ins))
        l_ok = not (hole[0] < pos + rl and pos < hole[1])
        r0 = pos + ins - rl
        r_ok = not (hole[0] < r0 + rl and r0 < hole[1])
        if not (l_ok and r_ok):
            continue
        reads.append(genome[pos:pos + rl])
        reads.append(revcomp_str(genome[r0:r0 + rl]))
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    rank = subprocess.run([ref_fermi, "seqsort", fmd], check=True,
                          capture_output=True).stdout
    rank_f = str(tmp_path / "i.rank")
    open(rank_f, "wb").write(rank)
    mag = subprocess.run([ref_fermi, "unitig", "-l", "40", "-r", rank_f, fmd],
                         check=True, capture_output=True).stdout
    p2 = subprocess.run([ref_fermi, "clean", "-CAOFo", "48", "-"],
                        input=mag, check=True, capture_output=True).stdout
    res = subprocess.run([ref_fermi, "remap", "-r", rank_f, fmd, "-"],
                         input=p2, check=True, capture_output=True)
    p3 = str(tmp_path / "p3.mag")
    open(p3, "wb").write(res.stdout)
    m = re.search(r"avg = ([\d.]+) std = ([\d.]+)", res.stderr.decode())
    return fmd, p3, float(m.group(1)), float(m.group(2))


def test_scaf_parity(tmp_path, ref_fermi):
    # degenerate path: fully merged contigs, no arcs -> the reference's
    # nan-avg_ovlp casting excludes everything; outputs must still match
    fmd, p3, avg, std = build_pipeline(tmp_path, ref_fermi)
    ref = subprocess.run([ref_fermi, "scaf", fmd, p3, str(avg), str(std)],
                         check=True, capture_output=True).stdout.decode()
    runs = rld.read_fmd(fmd)
    e = HostIndex(runs.expand())
    buf = io.StringIO()
    scaf_core(e, p3, avg, std, out_fp=buf, verbose=False)
    assert buf.getvalue() == ref


def build_pipeline_repeats(tmp_path, ref_fermi, seed=73):
    """Genome with an unresolvable repeat (arcs survive cleaning) plus a
    PE-bridged coverage hole, so scaf's link/patch machinery engages."""
    rng = np.random.default_rng(seed)
    rl, insert = 70, 240
    rep = "".join("ACGT"[c] for c in rng.integers(0, 4, 160))
    segs = ["".join("ACGT"[c] for c in rng.integers(0, 4, n))
            for n in (2500, 1800, 2200)]
    genome = segs[0] + rep + segs[1] + rep + segs[2]
    glen = len(genome)
    hole = (3950, 4100)
    reads = []
    for _ in range(1600):
        ins = int(rng.normal(insert, 22))
        ins = max(rl + 10, min(ins, 450))
        pos = int(rng.integers(0, glen - ins))
        r0 = pos + ins - rl
        if (hole[0] < pos + rl and pos < hole[1]) or \
           (hole[0] < r0 + rl and r0 < hole[1]):
            continue
        reads.append(genome[pos:pos + rl])
        reads.append(revcomp_str(genome[r0:r0 + rl]))
    fmd = str(tmp_path / "i.fmd")
    build_my_fmd(reads, fmd)
    rank = subprocess.run([ref_fermi, "seqsort", fmd], check=True,
                          capture_output=True).stdout
    rank_f = str(tmp_path / "i.rank")
    open(rank_f, "wb").write(rank)
    mag = subprocess.run([ref_fermi, "unitig", "-l", "40", "-r", rank_f, fmd],
                         check=True, capture_output=True).stdout
    p2 = subprocess.run([ref_fermi, "clean", "-CAOFo", "48", "-"],
                        input=mag, check=True, capture_output=True).stdout
    res = subprocess.run([ref_fermi, "remap", "-r", rank_f, fmd, "-"],
                         input=p2, check=True, capture_output=True)
    p3 = str(tmp_path / "p3.mag")
    open(p3, "wb").write(res.stdout)
    m = re.search(r"avg = ([\d.]+) std = ([\d.]+)", res.stderr.decode())
    return fmd, p3, float(m.group(1)), float(m.group(2))


def test_scaf_parity_functional(tmp_path, ref_fermi):
    fmd, p3, avg, std = build_pipeline_repeats(tmp_path, ref_fermi)
    res = subprocess.run([ref_fermi, "scaf", fmd, p3, str(avg), str(std)],
                         check=True, capture_output=True)
    ref = res.stdout.decode()
    runs = rld.read_fmd(fmd)
    e = HostIndex(runs.expand())
    buf = io.StringIO()
    err = io.StringIO()
    old = sys.stderr
    sys.stderr = err
    try:
        scaf_core(e, p3, avg, std, out_fp=buf, verbose=False)
    finally:
        sys.stderr = old
    assert buf.getvalue() == ref
    # the link machinery must actually engage in this scenario
    n_joined = sum(1 for line in ref.splitlines()
                   if line.startswith(">") and int(line.split("\t")[1]) > 1)
    multi = any(int(line.split("\t")[1]) >= 1 for line in ref.splitlines()
                if line.startswith(">"))
    assert multi


def test_betai_against_numeric_integral():
    """kf_betai (reference scaf.c:293-335, the t-test's incomplete beta)
    against direct numeric integration of the regularized beta."""
    import math
    from fermi_tpu.algos.scaf import kf_betai

    def betai_num(a, b, x, steps=200_000):
        t = (np.arange(steps) + 0.5) / steps * x
        f = (a - 1) * np.log(t) + (b - 1) * np.log1p(-t)
        lb = (math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b))
        return float(np.exp(f - lb).sum() * (x / steps))

    for a, b, x in [(2.0, 3.0, 0.5), (10.0, 2.0, 0.9),
                    (7.5, 7.5, 0.1), (1.0, 1.0, 0.42), (25.0, 3.0, 0.97)]:
        assert abs(kf_betai(a, b, x) - betai_num(a, b, x)) < 1e-4, (a, b, x)
    # singular-endpoint case has a closed form: I_x(1/2,1/2) = 2/pi asin(sqrt x)
    assert abs(kf_betai(0.5, 0.5, 0.3)
               - 2 / math.pi * math.asin(math.sqrt(0.3))) < 1e-9
    assert kf_betai(2.0, 2.0, 0.0) == 0.0
    assert kf_betai(2.0, 2.0, 1.0) == 1.0


def test_correct_mean_properties():
    """correct_mean (scaf.c:371-379) computes mu + sigma / E[X-x | X>x]
    (reciprocal mean excess of the standard normal at x=(l-mu)/sigma), NOT
    the truncated-normal mean.  Check it against a numeric evaluation of
    that quantity plus its two asymptotes."""
    import math
    from fermi_tpu.algos.scaf import correct_mean

    mu, sigma = 300.0, 30.0

    def num(l, steps=400_000):
        x = (l - mu) / sigma
        t = np.linspace(x, x + 14, steps)
        phi = np.exp(-0.5 * t * t)
        mean_excess = float(((t - x) * phi).sum() / phi.sum())
        return mu + sigma / mean_excess

    vals = []
    for l in (100.0, 250.0, 300.0, 350.0, 420.0):
        got = correct_mean(l, mu, sigma)
        want = num(l)
        assert abs(got - want) < 0.5, (l, got, want)
        vals.append(got)
    # monotone in l; l << mu: ~ mu + sigma^2/(mu-l); l >> mu: -> l
    assert all(a < b for a, b in zip(vals, vals[1:]))
    assert abs(vals[0] - (mu + sigma ** 2 / (mu - 100.0))) < 0.2
    assert abs(correct_mean(600.0, mu, sigma) - 600.0) < 10.0


def _linked_pair_pipeline(tmp_path, ref_fermi, distort=1.0, name="br"):
    """Genome with a repeat (so arcs/maxo survive and the A-stat is sane)
    and a read-START dead zone at one junction: the overlap chain breaks
    there with the two contig ends physically overlapping by ~20 bp and
    mate pairs still spanning — the exact precondition of patch_gap's
    negative-gap machinery (scaf.c:497-519).  `distort` scales the
    avg/std handed to scaf to drive the t-test (scaf.c:371-406,490-495)."""
    rng = np.random.default_rng(1)
    rl, insert = 70, 240
    rep = "".join("ACGT"[c] for c in rng.integers(0, 4, 160))
    segs = ["".join("ACGT"[c] for c in rng.integers(0, 4, n))
            for n in (2200, 1400, 2000, 1500)]
    genome = segs[0] + rep + segs[1] + segs[2] + rep + segs[3]
    jn = len(segs[0]) + 160 + len(segs[1])
    dead = (jn - 38, jn + 10)
    glen = len(genome)
    reads = []
    for _ in range(4000):
        ins = int(np.clip(rng.normal(insert, 22), rl + 10, 450))
        pos = int(rng.integers(0, glen - ins))
        r0 = pos + ins - rl
        if dead[0] < pos < dead[1] or dead[0] < r0 < dead[1]:
            continue
        reads.append(genome[pos:pos + rl])
        reads.append(revcomp_str(genome[r0:r0 + rl]))
    fmd = str(tmp_path / f"{name}.fmd")
    build_my_fmd(reads, fmd)
    rank = subprocess.run([ref_fermi, "seqsort", fmd], check=True,
                          capture_output=True).stdout
    rank_f = str(tmp_path / f"{name}.rank")
    open(rank_f, "wb").write(rank)
    mag = subprocess.run([ref_fermi, "unitig", "-l", "40", "-r", rank_f, fmd],
                         check=True, capture_output=True).stdout
    p2 = subprocess.run([ref_fermi, "clean", "-CAOFo", "48", "-"],
                        input=mag, check=True, capture_output=True).stdout
    res = subprocess.run([ref_fermi, "remap", "-r", rank_f, fmd, "-"],
                         input=p2, check=True, capture_output=True)
    p3 = str(tmp_path / f"{name}.p3.mag")
    open(p3, "wb").write(res.stdout)
    m = re.search(r"avg = ([\d.]+) std = ([\d.]+)", res.stderr.decode())
    return fmd, p3, float(m.group(1)) * distort, float(m.group(2)) * distort


def _run_scaf_both(ref_fermi, fmd, p3, avg, std):
    """(parity, ref_sw_lines, my_sw_lines, neg_gap_ts, tiny_ts)."""
    from fermi_tpu.algos import scaf as S

    res = subprocess.run([ref_fermi, "scaf", fmd, p3, str(avg), str(std)],
                         check=True, capture_output=True)
    ref_sw = [l for l in res.stderr.decode().splitlines()
              if l.startswith("SW\t")]
    negs, tiny = [], []
    orig = S.compute_t

    def spy(h, v, idd, l, *a, **k):
        t = orig(h, v, idd, l, *a, **k)
        if l < 0:
            negs.append(t)
        if t < 1e-5:
            tiny.append(t)
        return t

    S.compute_t = spy
    e = HostIndex(rld.read_fmd(fmd).expand())
    buf, err = io.StringIO(), io.StringIO()
    old = sys.stderr
    sys.stderr = err
    try:
        S.scaf_core(e, p3, avg, std, out_fp=buf, verbose=False)
    finally:
        sys.stderr = old
        S.compute_t = orig
    my_sw = [l for l in err.getvalue().splitlines() if l.startswith("SW\t")]
    return buf.getvalue() == res.stdout.decode(), ref_sw, my_sw, negs, tiny


def test_scaf_negative_gap_sw_join(tmp_path, ref_fermi):
    """SW fallback SUCCESS (scaf.c:497-516): overlapping contig ends are
    joined with a negative gap after the mini-assembly fails."""
    fmd, p3, avg, std = _linked_pair_pipeline(tmp_path, ref_fermi)
    parity, _, _, negs, _ = _run_scaf_both(ref_fermi, fmd, p3, avg, std)
    assert parity
    assert negs, "negative-gap SW join did not engage"
    assert all(t > 1e-5 for t in negs)  # accepted joins


def test_scaf_t_test_rejection(tmp_path, ref_fermi):
    """t-test rejection (scaf.c:371-406 + 490-495): inflated avg/std make
    every patch's t vanish, so no links are committed — and the output
    still byte-matches the reference under the same distortion."""
    fmd, p3, avg, std = _linked_pair_pipeline(tmp_path, ref_fermi,
                                              distort=2.5, name="tt")
    parity, _, _, _, tiny = _run_scaf_both(ref_fermi, fmd, p3, avg, std)
    assert parity
    assert tiny, "t-test rejection did not engage"


def test_scaf_sw_failure_diagnostic(tmp_path, ref_fermi):
    """SW fallback FAILURE (scaf.c:518): when neither the mini-assembly
    nor the end-overlap alignment survives, both sides emit the same
    SW diagnostic lines and the same (unjoined) scaftigs."""
    fmd, p3, avg, std = _linked_pair_pipeline(tmp_path, ref_fermi,
                                              distort=0.4, name="swf")
    parity, ref_sw, my_sw, _, _ = _run_scaf_both(ref_fermi, fmd, p3, avg, std)
    assert parity
    assert ref_sw, "SW failure path did not engage in the reference"
    assert my_sw == ref_sw
