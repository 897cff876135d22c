"""Steady-state pool-SMEM throughput: repeat smem_all until timing settles.

The width-adaptation on call 1 changes compiled shapes for call 2, so the
first two calls both contain remote compiles; only call 3+ is honest.

Usage: python scripts/smem_steady.py [fmd_path] [n_reads] [n_calls]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    fmd = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/fermi_tpu_bench/scale_500000/my.ec.fmd"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    n_calls = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import bench
    from fermi_tpu import rld
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search import smem as sm

    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.time()
    idx = FMDIndex.from_runs(rld.read_fmd(fmd))
    idx.bwt_blocks.block_until_ready()
    print(f"index: {int(np.asarray(idx.mcnt[0]))/1e6:.0f} Msym "
          f"(idtype {idx.idtype}), load {time.time()-t0:.1f}s", flush=True)
    qfa = sys.argv[4] if len(sys.argv) > 4 else None
    if qfa is None:
        # MATCHED queries (reads of the indexed dataset) — querying a
        # scale index with the bench genome's reads measures the redo
        # ladder, not the kernel (round-4 notes)
        _, qfa = bench.ensure_files()
    seqs = [dna.encode(r.seq) for r in fastx.read_fastx(qfa)][:n_reads]

    for k in range(n_calls):
        t0 = time.time()
        out = sm.smem_all(idx, seqs)
        dt = time.time() - t0
        n_m = sum(len(r) for r in out)
        print(f"call {k}: {dt:.2f}s = {len(seqs)/dt:.0f} reads/s "
              f"({n_m} SMEMs, maxi={getattr(idx, '_smem_maxi', 32)})",
              flush=True)


if __name__ == "__main__":
    main()
