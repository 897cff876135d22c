"""Benchmark BWT construction: host SA vs device wsort vs blocked device.

Usage: python scripts/build_bench.py [n_reads] [block_MB_symbols]
(default 60000 100bp reads -> 12.1M symbols with both strands; block
default 40M symbols = single block at that scale).
Checks byte parity across all paths and reports Mbases/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    blk = (int(sys.argv[2]) << 20) if len(sys.argv) > 2 else (40 << 20)
    import jax
    from fermi_tpu.construct import suffix
    from fermi_tpu.construct.wsort import wsort_bwt
    from fermi_tpu.construct.blocked import device_build_text

    print(f"backend: {jax.default_backend()} block={blk/1e6:.0f}M", flush=True)
    rng = np.random.default_rng(bench.SEED)
    glen = max(n_reads * 100 // 3, 1000)   # ~3x coverage like the bench set
    genome = rng.integers(0, 4, glen).astype(np.int8)
    pos = rng.integers(0, glen - 100, n_reads)
    seqs = [genome[p:p + 100].astype(np.uint8) + 1 for p in pos]
    text = suffix.build_text(seqs)
    N = text.size
    print(f"{len(seqs)} reads, {N / 1e6:.1f}M symbols", flush=True)

    t0 = time.time()
    ref = suffix.multistring_bwt(text)
    t_host = time.time() - t0
    print(f"host SA: {t_host:.2f}s = {N/1e6/t_host:.2f} Mb/s", flush=True)

    if N <= blk:
        wsort_bwt(text)  # compile
        t0 = time.time()
        got = wsort_bwt(text)
        t_w = time.time() - t0
        print(f"wsort 1-shot: {t_w:.2f}s = {N/1e6/t_w:.2f} Mb/s", flush=True)
        assert np.array_equal(ref, got)

    def prog(m):
        print(f"  [blocked] {m}", flush=True)

    t0 = time.time()
    got = device_build_text(text, block_symbols=blk, progress=prog)
    t_b = time.time() - t0
    print(f"blocked (cold): {t_b:.2f}s = {N/1e6/t_b:.2f} Mb/s", flush=True)
    t0 = time.time()
    got = device_build_text(text, block_symbols=blk)
    t_b = time.time() - t0
    print(f"blocked (warm): {t_b:.2f}s = {N/1e6/t_b:.2f} Mb/s", flush=True)
    assert np.array_equal(ref, got), "blocked mismatch"
    print("byte parity OK", flush=True)


if __name__ == "__main__":
    main()
