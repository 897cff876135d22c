"""Measure device SMEM throughput (reads/s) for the state-machine kernel.

Usage: python scripts/smem_bench.py [B ...]   (batch sizes; default 2048)
Set FERMI_TPU_PALLAS_RANK=0|1|auto to pick the rank path.
Reuses the bench.py cached dataset (12.1 M-symbol index, 20k query reads).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    bs = [int(a) for a in sys.argv[1:] if a.isdigit()] or [2048]
    nq = int(os.environ.get("SMEM_BENCH_READS", "0"))
    fmd, qfa = bench.ensure_files()
    import jax
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search import smem as sm

    print(f"backend: {jax.default_backend()} "
          f"rank_mode={os.environ.get('FERMI_TPU_PALLAS_RANK','auto')}",
          flush=True)
    idx = FMDIndex.restore(fmd)
    seqs = [dna.encode(r.seq) for r in fastx.read_fastx(qfa)]
    if nq:
        seqs = seqs[:nq]
    for B in bs:
        t0 = time.time()
        r0 = sm.smem_all(idx, seqs, batch=B)   # pool mode: lanes=B
        print(f"B={B}: warmup+compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        res = sm.smem_all(idx, seqs, batch=B)
        nm = sum(len(r) for r in res)
        dt = time.time() - t0
        print(f"B={B}: {len(seqs)} reads in {dt:.2f}s = "
              f"{len(seqs)/dt:.0f} reads/s ({nm} SMEMs)", flush=True)


if __name__ == "__main__":
    main()
