"""Diagnose the state-machine SMEM kernel: iteration count + per-iter cost.

Runs ONE batch (default B=2048) with debug_iters=True, reports
  - sequential while-loop iterations executed,
  - wall time (post-warmup) and ms/iteration,
  - reads/s extrapolation.
Env: FERMI_TPU_PALLAS_RANK=0|1, SMEM_DIAG_B, FERMI_TPU_PLATFORM=cpu for host.
"""

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
    from functools import partial
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search import smem as sm

    print(f"backend={jax.default_backend()} B={B} "
          f"rank={os.environ.get('FERMI_TPU_PALLAS_RANK', 'auto')}",
          flush=True)
    idx = FMDIndex.restore(fmd)
    seqs = [dna.encode(r.seq) for r in fastx.read_fastx(qfa)][:B]
    max_len = max(len(s) for s in seqs)
    q = np.zeros((B, max_len), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        q[i, : len(s)] = s
        lens[i] = len(s)

    fn = partial(jax.jit, static_argnames=(
        "self_match", "max_len", "maxi", "maxm", "max_segments",
        "debug_iters"))(sm._smem_batch_impl)
    t0 = time.time()
    out = fn(idx, jnp.asarray(q), jnp.asarray(lens), False, max_len, 32, 64,
             debug_iters=True)
    out = [np.asarray(o) for o in out]
    print(f"warmup+compile {time.time()-t0:.1f}s  iters={int(out[-1])}",
          flush=True)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = fn(idx, jnp.asarray(q), jnp.asarray(lens), False, max_len,
                 32, 64, debug_iters=True)
        out = [np.asarray(o) for o in out]
    dt = (time.time() - t0) / reps
    it = int(out[-1])
    nm = int(out[1].sum())
    print(f"batch {dt*1e3:.0f} ms  iters={it}  {dt/it*1e6:.0f} us/iter  "
          f"{B/dt:.0f} reads/s  ({nm} SMEMs)", flush=True)


if __name__ == "__main__":
    main()
