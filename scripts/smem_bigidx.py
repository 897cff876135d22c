"""Pool-SMEM throughput vs index size + body unroll + scoped-VMEM limit.

The round-2 trace (scripts/smem_trace.py) showed XLA re-staging the
loop-invariant rank table into scoped VMEM every while-iteration — possible
only because the 12 Msym bench index fits VMEM.  This measures the kernel
against the 202 Msym ec index (table >> VMEM, gathers go straight to HBM)
and sweeps the unroll ladder, optionally with --xla_tpu_scoped_vmem_limit_kib
to suppress staging on the small index.

Usage: python scripts/smem_bigidx.py [fmd_path] [n_reads] [unrolls...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    fmd = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/fermi_tpu_bench/scale_500000/my.ec.fmd"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    unrolls = [int(a) for a in sys.argv[3:] if a.isdigit()] or [1, 2, 4]

    import jax
    from fermi_tpu import rld
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search import smem as sm

    print(f"backend={jax.default_backend()} "
          f"XLA_FLAGS={os.environ.get('XLA_FLAGS', '')}", flush=True)
    t0 = time.time()
    idx = FMDIndex.from_runs(rld.read_fmd(fmd))
    idx.bwt_packed.block_until_ready()
    print(f"index: {int(np.asarray(idx.mcnt[0]))/1e6:.0f} Msym, "
          f"load {time.time()-t0:.1f}s", flush=True)
    qfa = None
    if len(sys.argv) > 4 and not sys.argv[4].isdigit():
        qfa = sys.argv[4]
    if qfa is None:
        # MATCHED queries (reads of the indexed dataset) — querying a
        # scale index with the bench genome's reads measures the redo
        # ladder, not the kernel (round-4 notes)
        _, qfa = bench.ensure_files()
    seqs = [dna.encode(r.seq) for r in fastx.read_fastx(qfa)][:n_reads]

    for unroll in unrolls:
        os.environ["FERMI_TPU_SMEM_UNROLL"] = str(unroll)
        sm._smem_batch.cache_clear() if hasattr(sm._smem_batch, "cache_clear") \
            else None
        t0 = time.time()
        out = sm.smem_all(idx, seqs)
        warm = time.time() - t0
        t0 = time.time()
        out = sm.smem_all(idx, seqs)
        dt = time.time() - t0
        n_m = sum(len(r) for r in out)
        print(f"unroll={unroll}: warm {warm:.1f}s, run {dt:.2f}s = "
              f"{len(seqs)/dt:.0f} reads/s ({n_m} SMEMs)", flush=True)


if __name__ == "__main__":
    main()
