"""Ablate the SMEM loop-body cost: time 200-iteration fori loops whose body
contains increasing subsets of the real kernel's work.

Variants (cumulative unless noted):
  rank      2x rank6 over [B, W] (SWAR path), result folded into carry
  gathers   + the per-iteration take_along_axis reorders (4x [B,W] + 6x [B,M])
  scat1     rank + ONE flat scatter [B*W] -> [B*M]           (not cumulative)
  scat10    rank + the full 10 flat scatters                 (not cumulative)
  sel       rank + ~30 jnp.where lane-selects on [B,W]/[B,M] (not cumulative)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    B = int(os.environ.get("SMEM_DIAG_B", "2048"))
    W, M, IT = 32, 64, 200
    fmd, _ = bench.ensure_files()
    import jax
    import jax.numpy as jnp
    from fermi_tpu.index.fmd import FMDIndex

    os.environ["FERMI_TPU_PALLAS_RANK"] = "0"
    print(f"backend={jax.default_backend()} B={B} W={W} M={M} IT={IT}",
          flush=True)
    idx = FMDIndex.restore(fmd)
    n = int(np.asarray(idx.mcnt[0]))
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, n - 200, (B, W)).astype(np.int32))
    jW = jnp.arange(W, dtype=jnp.int32)
    jM = jnp.arange(M, dtype=jnp.int32)
    rowW = (jnp.arange(B, dtype=jnp.int32) * W)[:, None]

    def mk(body):
        @jax.jit
        def run(k):
            def b(_, carry):
                return body(carry)
            return jax.lax.fori_loop(0, IT, b, (k, jnp.zeros((B, M), jnp.int32)))
        return run

    def v_rank(carry):
        k, g = carry
        r1 = idx.rank6(k)
        r2 = idx.rank6(k + 17)
        k = (k + r1[..., 1].astype(jnp.int32) + r2[..., 2].astype(jnp.int32)) % (n - 300)
        return k, g

    def v_gathers(carry):
        k, g = carry
        r1 = idx.rank6(k)
        r2 = idx.rank6(k + 17)
        k = (k + r1[..., 1].astype(jnp.int32) + r2[..., 2].astype(jnp.int32)) % (n - 300)
        ridx = (jW[None, :] + k[:, :1] % W) % W
        for _ in range(4):
            k = jnp.take_along_axis(k, ridx, 1)
        gidx = (jM[None, :] + k[:, :1] % M) % M
        for _ in range(6):
            g = jnp.take_along_axis(g, gidx, 1)
        return k, g

    def v_scat(nsc):
        def f(carry):
            k, g = carry
            r1 = idx.rank6(k)
            k = (k + r1[..., 1].astype(jnp.int32)) % (n - 300)
            tgt = jnp.where(k % 3 == 0, rowW // W * M + (k % M), B * M)
            tgt = tgt.reshape(-1)
            for _ in range(nsc):
                g = g.reshape(-1).at[tgt].set(
                    k.reshape(-1), mode="drop").reshape(B, M)
            return k, g
        return f

    def v_sel(carry):
        k, g = carry
        r1 = idx.rank6(k)
        k = (k + r1[..., 1].astype(jnp.int32)) % (n - 300)
        m = (k % 5 == 0)
        for _ in range(30):
            k = jnp.where(m, k + 1, k)
        return k, g

    for name, body in [("rank", v_rank), ("gathers", v_gathers),
                       ("scat1", v_scat(1)), ("scat10", v_scat(10)),
                       ("sel", v_sel)]:
        run = mk(body)
        t0 = time.time()
        out = run(k0)
        out = [np.asarray(o) for o in out]
        c = time.time() - t0
        t0 = time.time()
        out = run(k0)
        out = [np.asarray(o) for o in out]
        dt = time.time() - t0
        print(f"{name:8s} compile {c:6.1f}s   {dt*1e3:8.1f} ms "
              f"({dt/IT*1e6:7.0f} us/iter)", flush=True)


if __name__ == "__main__":
    main()
