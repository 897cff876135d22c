"""Decompose rank6 cost on the chip: gather vs unpack vs count, and
prototype a bit-plane+popcount rank row (occ 6xi32 + 3 bit-planes 4xi32)."""
import sys
import time

import numpy as np

from fermi_tpu import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from fermi_tpu.index.fmd import FMDIndex, BLOCK, BLOCK_BITS
from fermi_tpu import rld

NQ = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17


def timeit(f, *a):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    r = None
    for _ in range(5):
        r = f(*a)
    np.asarray(r)
    return (time.perf_counter() - t0) / 5


def main():
    print("backend:", jax.default_backend(), flush=True)
    idx = FMDIndex.restore("/tmp/fermi_tpu_bench/idx_1234_60000.fmd")
    n = int(np.asarray(idx.mcnt[0]))
    nb = idx.bwt_blocks.shape[0]
    rng = np.random.default_rng(0)
    kh = rng.integers(0, n, NQ).astype(np.int32)
    k = jnp.asarray(kh)
    blkh = (kh >> BLOCK_BITS)

    # gather-only at several row widths
    rows128u8 = idx.bwt_blocks
    rows24 = jnp.asarray(rng.integers(0, 2**30, (nb, 24)).astype(np.int32))
    rows32 = jnp.asarray(rng.integers(0, 2**30, (nb, 32)).astype(np.int32))
    rows8 = jnp.asarray(np.asarray(idx.occ))
    for name, arr in (("u8[128]", rows128u8), ("i32[24]", rows24),
                      ("i32[32]", rows32), ("i32[8]", rows8)):
        g = jax.jit(lambda a, b: a[b].astype(jnp.int32).sum())
        t = timeit(g, arr, jnp.asarray(blkh))
        print(f"gather {name:8s}: {t*1e3:7.2f} ms  {t/NQ*1e9:5.1f} ns/row",
              flush=True)

    r6 = jax.jit(lambda i, k: i.rank6(k).sum(0))
    tl = timeit(r6, idx, k)
    print(f"rank6 ([B,6,128] layout): {tl*1e3:7.2f} ms", flush=True)

    # bit-plane prototype: row = occ[6] ++ plane0[4] ++ plane1[4] ++ plane2[4]
    # ++ pad2 = 20 i32 (80 B)
    blocks = np.asarray(idx.bwt_blocks)  # [nb,128] u8
    bits = ((blocks[:, None, :] >> np.arange(3)[None, :, None]) & 1)  # nb,3,128
    w = bits.reshape(nb, 3, 4, 32)
    planes = (w.astype(np.uint32) << np.arange(32, dtype=np.uint32)).sum(
        axis=3, dtype=np.uint32)  # [nb,3,4]
    occ = np.asarray(idx.occ).astype(np.int32)
    prow = np.zeros((nb, 20), np.int32)
    prow[:, :6] = occ[:, :6]
    prow[:, 6:18] = planes.reshape(nb, 12).view(np.int32)
    prow_d = jnp.asarray(prow)

    SYMS = np.arange(6)
    CB = jnp.asarray(((SYMS[:, None] >> np.arange(3)[None, :]) & 1).astype(
        np.int32))  # [6,3]

    def rank6_bp(prow, k):
        k = k.astype(jnp.int32)
        blk = k >> BLOCK_BITS
        off = k & (BLOCK - 1)
        row = prow[blk]                      # [B,20] one gather
        base = row[..., :6]                  # [B,6]
        planes = row[..., 6:18].reshape(*row.shape[:-1], 3, 4)  # [B,3,4]
        # mask of first `off` bits across 4x32 words
        wid = jnp.arange(4, dtype=jnp.int32) * 32
        rem = jnp.clip(off[..., None] - wid, 0, 32)             # [B,4]
        full = rem == 32
        mask = jnp.where(full, jnp.int32(-1),
                         (jnp.int32(1) << rem) - 1)             # [B,4]
        # sel[b, c] = plane_b if bit b of c else ~plane_b
        pl = planes[..., None, :, :]                            # [B,1,3,4]
        cb = CB[:, :, None]                                     # [6,3,1]
        sel = jnp.where(cb == 1, pl, ~pl)                       # [B,6,3,4]
        conj = sel[..., 0, :] & sel[..., 1, :] & sel[..., 2, :]  # [B,6,4]
        conj = conj & mask[..., None, :]
        cnt = jax.lax.population_count(conj).sum(-1)            # [B,6]
        return base + cnt

    rb = jax.jit(lambda p, k: rank6_bp(p, k).sum(0))
    got = np.asarray(rb(prow_d, k))
    want = np.asarray(r6(idx, k))
    print("bitplane parity:", "OK" if np.array_equal(got, want)
          else "MISMATCH", flush=True)
    tb = timeit(rb, prow_d, k)
    print(f"rank6 bitplane: {tb*1e3:7.2f} ms  ({tl/tb:.2f}x vs legacy)",
          flush=True)


if __name__ == "__main__":
    main()
