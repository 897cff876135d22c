"""At-scale out-of-core demo: stream-encode a multi-hundred-megasymbol .fmd
(never in RAM), then serve batched compressed-domain rank queries from the
mmap with bounded RSS.

Usage: python scripts/oocore_demo.py [n_Msymbols]   (default 700)
Prints: file size, peak RSS during encode+query, rank throughput.
"""

import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return 0.0


def main():
    nM = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    target = nM * 1_000_000
    path = "/tmp/fermi_tpu_bench/oocore.fmd"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    from fermi_tpu import native
    from fermi_tpu.index.mmapfmd import MmapIndex

    lib = native.get_lib()
    if not (os.path.exists(path) and os.path.getsize(path) > target // 8):
        t0 = time.time()
        h = lib.frld_enc_open(6, 3)
        rng = np.random.default_rng(42)
        total = 0
        chunk = 1 << 22
        while total < target:
            # BWT-like statistics: geometric runs (mean 4), symbols 0..5 with
            # DNA-weighted probabilities and rare sentinels
            lens = rng.geometric(0.25, chunk).astype(np.int64)
            syms = rng.choice(
                6, chunk, p=[0.01, 0.25, 0.245, 0.245, 0.24, 0.01]
            ).astype(np.uint8)
            lib.frld_enc_put(
                h, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                syms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), chunk)
            total += int(lens.sum())
        rc = lib.frld_enc_finish(h, path.encode())
        assert rc == 0
        print(f"encoded {total/1e6:.0f}M symbols in {time.time()-t0:.1f}s, "
              f"RSS {rss_mb():.0f} MB", flush=True)
    sz = os.path.getsize(path)
    print(f"file: {sz/1e6:.1f} MB on disk", flush=True)

    r0 = rss_mb()
    m = MmapIndex(path)
    print(f"mmap-open: total={m.total/1e6:.0f}M symbols "
          f"(dense blocked-occ would be ~{m.total*1.625/1e9:.1f} GB)",
          flush=True)
    rng = np.random.default_rng(1)
    nq = 200_000
    ks = rng.integers(0, m.total, nq).astype(np.int64)
    t0 = time.time()
    out = m.rank6(ks)
    dt = time.time() - t0
    # spot-check 200 positions against a window decode oracle: rank
    # differences over [k, k+d) must equal symbol counts in that window
    ks2 = ks[:200]
    d = 64
    a = m.rank6(ks2)
    b = m.rank6(np.minimum(ks2 + d, m.total))
    assert ((b - a).sum(1) == np.minimum(ks2 + d, m.total) - ks2).all()
    assert np.array_equal(m.rank6(np.array([m.total]))[0],
                          np.asarray(m.mcnt[1:7]))
    print(f"rank6: {nq} queries in {dt:.2f}s = {nq/dt/1e3:.0f}k q/s "
          f"({m.t} threads); RSS grew {rss_mb()-r0:.0f} MB "
          f"(now {rss_mb():.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
