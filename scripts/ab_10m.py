"""10M north-star re-roll with the interleaved A/B variance protocol
(round-4 verdict item 4/9): N rolls per side, alternating my/ref, all
rolls + medians recorded into BENCH_10M.json.

Usage: python scripts/ab_10m.py [n_pairs] [n_rolls]
"""

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench
import scale_bench


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_rolls = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    wd = os.path.join(bench.CACHE, f"scale_{n_pairs}")
    os.makedirs(wd, exist_ok=True)
    fq = os.path.join(wd, "reads.fq")
    if not os.path.exists(fq):
        t0 = time.time()
        scale_bench.make_pe(fq, n_pairs)
        scale_bench.log(f"dataset written in {time.time()-t0:.1f}s")
    bench.ensure_ref()
    t_my, t_ref = [], []
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_10M_r5.json")
    for r in range(n_rolls):
        for f in glob.glob(os.path.join(wd, "my.*")):
            os.remove(f)
        t_my.append(round(scale_bench.run_mine(
            fq, os.path.join(wd, "my")), 1))
        _dump(out, n_pairs, t_my, t_ref)
        t_ref.append(round(scale_bench.run_ref(
            fq, os.path.join(wd, "ref")), 1))
        _dump(out, n_pairs, t_my, t_ref)
        scale_bench.log(f"roll {r+1}/{n_rolls}: mine {t_my[-1]}s "
                        f"ref {t_ref[-1]}s = {t_ref[-1]/t_my[-1]:.2f}x")


def _dump(out, n_pairs, t_my, t_ref):
    doc = {
        "dataset": f"synthetic PE, {n_pairs} pairs "
                   f"(scripts/scale_bench.py {n_pairs})",
        "date": "2026-08-20 (round 5)",
        "protocol": "interleaved A/B (my,ref,my,ref,...), fresh my.* "
                    "artifacts per roll, medians reported",
        "mine_s": t_my,
        "ref_s": t_ref,
    }
    if t_my and t_ref:
        doc["median_mine_s"] = statistics.median(t_my)
        doc["median_ref_s"] = statistics.median(t_ref)
        doc["vs_baseline"] = round(
            doc["median_ref_s"] / doc["median_mine_s"], 3)
        doc["reads_per_s"] = round(2 * n_pairs / doc["median_mine_s"], 1)
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
