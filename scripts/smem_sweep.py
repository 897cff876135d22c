"""Sweep the pool-mode SMEM kernel over (lanes, W) and rank modes.

For each config: reads/s over the 20k-read bench set, loop iterations, and
us/iteration. Separately times ONE extend battery of the same shape to show
the rank share of the body.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    fmd, qfa = bench.ensure_files()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search import smem as sm

    print(f"backend={jax.default_backend()} "
          f"rank={os.environ.get('FERMI_TPU_PALLAS_RANK', 'auto')}", flush=True)
    idx = FMDIndex.restore(fmd)
    seqs = [dna.encode(r.seq) for r in fastx.read_fastx(qfa)]
    max_len = max(len(s) for s in seqs)
    NP = 1
    while NP < len(seqs):
        NP *= 2
    q = np.zeros((NP, max_len), np.uint8)
    lens = np.ones(NP, np.int32)
    for i, s in enumerate(seqs):
        q[i, : len(s)] = s
        lens[i] = len(s)
    qd, ld = jnp.asarray(q), jnp.asarray(lens)

    fn = partial(jax.jit, static_argnames=(
        "self_match", "max_len", "maxi", "maxm", "max_segments",
        "debug_iters", "lanes"))(sm._smem_batch_impl)

    def run(lanes, W):
        out = fn(idx, qd, ld, False, max_len, W, 64, lanes=lanes,
                 debug_iters=True)
        return [np.asarray(o) for o in out]

    configs = [(2048, 32), (2048, 16), (2048, 8), (4096, 16), (8192, 16),
               (8192, 8), (4096, 32)]
    for lanes, W in configs:
        t0 = time.time()
        out = run(lanes, W)
        tc = time.time() - t0
        t0 = time.time()
        out = run(lanes, W)
        dt = time.time() - t0
        it = int(out[-1])
        novf = int(out[3].sum())
        nm = int(out[1].sum())
        print(f"lanes={lanes:5d} W={W:2d}: {len(seqs)/dt:6.0f} reads/s "
              f"({dt:5.2f}s, compile+1st {tc:5.1f}s) iters={it} "
              f"{dt/it*1e6:6.0f} us/iter ovf={novf} mems={nm}", flush=True)


if __name__ == "__main__":
    main()
