"""Micro-benchmark: rank6 gather throughput, fused packed row vs two-array.

Usage: python scripts/rank_bench.py [n_queries] — runs on the default JAX
device (axon TPU unless FERMI_TPU_PLATFORM=cpu)."""
import sys
import time

import numpy as np

from fermi_tpu import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from fermi_tpu.index.fmd import FMDIndex
from fermi_tpu import rld

NQ = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17


def timeit(f, *a):
    f(*a)  # warm/compile
    t0 = time.perf_counter()
    r = None
    for _ in range(5):
        r = f(*a)
    np.asarray(r)  # axon: block_until_ready may not sync
    return (time.perf_counter() - t0) / 5


def main():
    print("backend:", jax.default_backend(), flush=True)
    idx = FMDIndex.restore("/tmp/fermi_tpu_bench/idx_1234_60000.fmd")
    n = int(np.asarray(idx.mcnt[0]))
    print("index on device, n =", n, flush=True)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, n, NQ).astype(np.int32))

    r6 = jax.jit(lambda i, k: i.rank6(k).sum(0))
    t0 = time.perf_counter()
    fused = np.asarray(r6(idx, k))
    print(f"packed compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    plain = np.asarray(r6(legacy, k))
    print(f"legacy compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    assert np.array_equal(fused, plain), "packed rank6 mismatch!"

    tp = timeit(r6, idx, k)
    tl = timeit(r6, legacy, k)
    print(f"n={n} queries={NQ}")
    print(f"packed : {tp*1e3:8.2f} ms  {NQ/tp/1e6:6.1f} Mrank/s  "
          f"{tp/NQ*1e9:6.1f} ns/query")
    print(f"legacy : {tl*1e3:8.2f} ms  {NQ/tl/1e6:6.1f} Mrank/s  "
          f"{tl/NQ*1e9:6.1f} ns/query")
    print(f"speedup: {tl/tp:.2f}x")


if __name__ == "__main__":
    main()
