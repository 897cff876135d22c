"""Round-5 verdict item 7: one real >= 2.2 Gsym build + device SMEM
query in the uint32 index domain (the [2^31, 2^32) tier that
_pick_idtype selects but round 4 only ever forced on small indexes).

Generates a 5.6M-pair PE dataset (~2.26 Gsym), builds the raw .fmd via
the production native frags+BCR path, restores it on device (asserts
the uint32 domain engaged), then:
  - chkbwt-style spot self-check: device rank6 vs a host scan on
    sampled positions (the reference's `fermi chkbwt` idea);
  - device SMEM over 20k reads, timed, vs the native engine on the
    same queries (match-count equality).
Appends results to BENCH_NOTES.md by hand (prints the numbers).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
import scale_bench


def log(m):
    sys.stderr.write(f"[uint32] {m}\n")
    sys.stderr.flush()


def main():
    n_pairs = 5_600_000
    wd = os.path.join(bench.CACHE, f"scale_{n_pairs}")
    os.makedirs(wd, exist_ok=True)
    fq = os.path.join(wd, "reads.fq")
    if not os.path.exists(fq):
        t0 = time.time()
        scale_bench.make_pe(fq, n_pairs)
        log(f"dataset: {time.time()-t0:.1f}s")
    fmd = os.path.join(wd, "raw.fmd")
    if not os.path.exists(fmd):
        from fermi_tpu.pipeline.driver import Pipeline

        t0 = time.time()
        pl = Pipeline(os.path.join(wd, "u32"), n_threads=4, paired=True)
        pl.stage_raw_fmd([fq])
        os.rename(pl._p("raw.fmd"), fmd)
        log(f"build: {time.time()-t0:.1f}s")
    import jax
    from fermi_tpu.index.fmd import FMDIndex

    t0 = time.time()
    idx = FMDIndex.restore(fmd)
    jax.block_until_ready(idx.bwt_packed)
    total = int(np.asarray(idx.mcnt[0]))
    log(f"index: {total/1e9:.3f} Gsym, idtype={idx.idtype}, "
        f"load {time.time()-t0:.1f}s")
    assert total >= (1 << 31), "index not in the uint32 domain"
    assert "uint32" in str(idx.idtype), f"unexpected idtype {idx.idtype}"

    # chkbwt-style spot check: rank6 at sampled positions vs one host
    # scan accumulating counts at the sorted sample points
    blocks = np.asarray(idx.bwt_blocks)
    rng = np.random.default_rng(0)
    ks = np.sort(rng.integers(0, total, 64).astype(np.int64))
    import jax.numpy as jnp

    dev = np.asarray(idx.rank6(jnp.asarray(ks)))
    flat = blocks.reshape(-1)
    want = np.zeros((len(ks), 6), np.int64)
    acc = np.zeros(6, np.int64)
    prev = 0
    for t, k in enumerate(ks):
        acc = acc + np.bincount(flat[prev:k], minlength=6)[:6]
        want[t] = acc
        prev = k
    okc = int((dev[:, :6] == want).all(axis=1).sum())
    log(f"chkbwt spot-check: {okc}/{len(ks)} positions exact")
    assert okc == len(ks)

    # device SMEM vs native on 20k 1%-error reads
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.search import smem as sm

    _, qfa = bench.ensure_files()
    seqs = [dna.encode(r.seq) for r in fastx.read_fastx(qfa)]
    t0 = time.time()
    res = sm.smem_all(idx, seqs)
    t1 = time.time()
    res = sm.smem_all(idx, seqs)
    t2 = time.time()
    nm = sum(len(r) for r in res)
    log(f"device SMEM: warm {t2-t1:.2f}s = {len(seqs)/(t2-t1):.0f} reads/s "
        f"({nm} SMEMs; cold {t1-t0:.1f}s)")
    t0 = time.time()
    nat = sm.smem_all_native(idx, seqs)
    t1 = time.time()
    nn = sum(len(r) for r in nat)
    log(f"native SMEM: {t1-t0:.2f}s = {len(seqs)/(t1-t0):.0f} reads/s "
        f"({nn} SMEMs)")
    assert res == nat, "device SMEM != native SMEM in uint32 domain"
    log("PARITY OK: device == native SMEM output in the uint32 domain")


if __name__ == "__main__":
    main()
