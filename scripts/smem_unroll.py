"""Measure pool-SMEM throughput vs body unroll factor (and env XLA flags)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    B = int(os.environ.get("SMEM_DIAG_B", "2048"))
    fmd, qfa = bench.ensure_files()
    import jax
    import jax.numpy as jnp
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search import smem as sm

    print(f"backend={jax.default_backend()} B={B} "
          f"XLA_FLAGS={os.environ.get('XLA_FLAGS','')}", flush=True)
    idx = FMDIndex.restore(fmd)
    seqs = [dna.encode(r.seq) for r in fastx.read_fastx(qfa)]
    NP = 1
    while NP < len(seqs):
        NP *= 2
    max_len = max(len(s) for s in seqs)
    q = np.zeros((NP, max_len), np.uint8)
    lens = np.ones(NP, np.int32)
    for i, s in enumerate(seqs):
        q[i, : len(s)] = s
        lens[i] = len(s)
    qd, ld = jnp.asarray(q), jnp.asarray(lens)

    for unroll in (int(a) for a in (sys.argv[1:] or ["1", "2", "4", "8"])):
        def run():
            out = sm._smem_batch(idx, qd, ld, False, max_len, 32, 64,
                                 lanes=B, unroll=unroll)
            return [np.asarray(o) for o in out]

        t0 = time.time()
        run()
        tc = time.time() - t0
        t0 = time.time()
        out = run()
        dt = time.time() - t0
        nm = int(out[1].sum())
        print(f"unroll={unroll}: {len(seqs)/dt:6.0f} reads/s ({dt:.2f}s; "
              f"compile+1st {tc:.0f}s) mems={nm}", flush=True)


if __name__ == "__main__":
    main()
