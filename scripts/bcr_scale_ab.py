"""A/B the native BCR builder at cache-hostile scale.

Usage: python scripts/bcr_scale_ab.py [n_frags] [n_threads]
Generates random 100bp ACGT fragments and times bcr_runs_from_frags with
the phase profiler on.  At n_frags >= 4M the 2-bit transpose row exceeds
L2 and the per-insert lookups become the wall (BENCH_NOTES 10M run).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FERMI_BCR_PROF", "1")

import numpy as np

from fermi_tpu.construct.bcr import bcr_runs_from_frags


def main():
    n_frags = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(42)
    L = 100
    F = rng.integers(1, 5, size=n_frags * L, dtype=np.uint8)
    offs = np.arange(n_frags + 1, dtype=np.int64) * L
    nsym = 2 * n_frags * (L + 1)
    print(f"{n_frags} frags -> {nsym/1e6:.0f} Msym", flush=True)
    t0 = time.time()
    runs = bcr_runs_from_frags(F, offs, trim_palindrome=True,
                               n_threads=n_threads)
    dt = time.time() - t0
    print(f"build {dt:.1f}s = {nsym/1e6/dt:.2f} Msym/s "
          f"({len(runs.lengths)} runs)", flush=True)


if __name__ == "__main__":
    main()
