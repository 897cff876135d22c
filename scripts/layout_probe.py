"""Measure TPU cost of minor-dim layouts in a fori loop: gathers producing
[N,16]/[N,8]/[N,128] rows, minor-axis gather from [8,NB], and elementwise
ops on [B,W] vs [W,B]."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax
    import jax.numpy as jnp
    from fermi_tpu.index.fmd import FMDIndex

    fmd, _ = bench.ensure_files()
    idx = FMDIndex.restore(fmd)
    NB = int(idx.bwt_packed.shape[0])
    N = 262144
    IT = 50
    rng = np.random.default_rng(0)
    kh = jnp.asarray(rng.integers(0, NB, N).astype(np.int32))
    packed = idx.bwt_packed                       # [NB,16] i32
    blocks = idx.bwt_blocks                       # [NB,128] u8
    occ = idx.occ                                 # [NB,8] i32
    occT = jnp.asarray(np.ascontiguousarray(np.asarray(idx.occ).T))  # [8,NB]

    def loop(f):
        @jax.jit
        def run(k):
            def b(_, c):
                k, acc = c
                v = f(k)
                acc = acc + v
                k = (k + acc + 1) % NB
                return k, acc
            return jax.lax.fori_loop(0, IT, b, (k, jnp.zeros_like(k)))
        return run

    cases = {
        "gather i32[NB,16] rows": lambda k: packed[k].sum(-1).astype(jnp.int32),
        "gather u8[NB,128] rows": lambda k: blocks[k].astype(jnp.int32).sum(-1),
        "gather i32[NB,8] occ  ": lambda k: occ[k].sum(-1).astype(jnp.int32),
        "gather i32[8,NB] occT minor": lambda k: occT[:, k].sum(0).astype(jnp.int32),
    }
    for name, f in cases.items():
        run = loop(f)
        out = run(kh)
        [np.asarray(o) for o in out]
        t0 = time.time()
        out = run(kh)
        [np.asarray(o) for o in out]
        dt = (time.time() - t0) / IT
        print(f"{name}: {dt*1e3:7.2f} ms/iter  {dt/N*1e9:6.1f} ns/row",
              flush=True)

    # elementwise orientation: [B,W] minor-32 vs [W,B] minor-4096
    B, W = 4096, 32
    a1 = jnp.asarray(rng.integers(0, 100, (B, W)).astype(np.int32))
    a2 = jnp.asarray(np.ascontiguousarray(np.asarray(a1).T))
    for name, a, ax in (("[B,32] minor-32 ops", a1, 1),
                        ("[32,B] minor-B ops ", a2, 0)):
        @jax.jit
        def run(x):
            def b(_, x):
                for _ in range(10):
                    x = jnp.where(x % 3 == 0, x + 1, x * 2) % 997
                s = jnp.cumsum(x, axis=ax)
                return (x + s) % 1013
            return jax.lax.fori_loop(0, IT, b, x)
        np.asarray(run(a))
        t0 = time.time()
        np.asarray(run(a))
        dt = (time.time() - t0) / IT
        print(f"{name}: {dt*1e6:7.0f} us/iter (10 where-chains + cumsum)",
              flush=True)


if __name__ == "__main__":
    main()
