"""Ablate the pool-mode SMEM loop body at fixed 200 iterations.

Variants (FERMI_SMEM_ABLATE): full-200 (cond replaced by it<200 only),
noscat (skip the 5 output scatters), norank (rank battery -> zeros),
nogather (rank on constant index 0: SWAR/Pallas compute without the HBM
row gather).  Differences isolate scatter / rank-compute / gather shares.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    B = int(os.environ.get("SMEM_DIAG_B", "2048"))
    W = int(os.environ.get("SMEM_DIAG_W", "32"))
    fmd, qfa = bench.ensure_files()
    import importlib
    import jax
    import jax.numpy as jnp
    from functools import partial
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.index.fmd import FMDIndex

    print(f"backend={jax.default_backend()} B={B} W={W} "
          f"rank={os.environ.get('FERMI_TPU_PALLAS_RANK', 'auto')}",
          flush=True)
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

    for variant in ("full200", "noscat", "norank", "nogather"):
        os.environ["FERMI_SMEM_ABLATE"] = variant
        import fermi_tpu.search.smem as sm
        importlib.reload(sm)
        fn = partial(jax.jit, static_argnames=(
            "self_match", "max_len", "maxi", "maxm", "max_segments",
            "debug_iters", "lanes"))(sm._smem_batch_impl)

        def run():
            out = fn(idx, qd, ld, False, max_len, W, 64, lanes=B,
                     debug_iters=True)
            return [np.asarray(o) for o in out]

        t0 = time.time()
        run()
        tc = time.time() - t0
        t0 = time.time()
        out = run()
        dt = time.time() - t0
        it = int(out[-1])
        print(f"{variant:9s}: {dt*1e3:7.0f} ms / {it} iters = "
              f"{dt/it*1e6:6.0f} us/iter  (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
