"""Benchmark the device BCR builder at scale vs the host SA path.

Usage: python scripts/bcr_bench.py [n_reads]   (default 60000, 100bp reads;
both strands are built, so symbols ~= 2 * n_reads * 101)
Checks byte parity vs construct.suffix.multistring_bwt and reports Mb/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    import jax
    from fermi_tpu.construct import suffix
    from fermi_tpu.construct.bcr_jax import bcr_bwt_device
    from fermi_tpu.core import dna

    print(f"backend: {jax.default_backend()}", flush=True)
    idx_reads, _ = bench.make_dataset()
    seqs = [r.astype(np.uint8) + 1 for r in idx_reads[:n_reads]]
    both = []
    for s in seqs:
        both.append(s)
        both.append(dna.revcomp(s))
    N = sum(len(s) + 1 for s in both)
    print(f"{len(both)} strands, {N/1e6:.1f}M symbols", flush=True)

    t0 = time.time()
    ref = suffix.multistring_bwt(suffix.build_text(
        seqs, both_strands=True, trim_palindrome=False))
    t_host = time.time() - t0
    print(f"host SA path: {t_host:.2f}s = {N/1e6/t_host:.2f} Mb/s", flush=True)

    t0 = time.time()
    got = bcr_bwt_device(both)
    t_c = time.time() - t0
    print(f"device BCR warmup(+compile): {t_c:.2f}s", flush=True)
    t0 = time.time()
    got = bcr_bwt_device(both)
    t_dev = time.time() - t0
    print(f"device BCR: {t_dev:.2f}s = {N/1e6/t_dev:.2f} Mb/s", flush=True)
    assert np.array_equal(ref, got), "BWT mismatch"
    print("byte parity OK", flush=True)


if __name__ == "__main__":
    main()
