"""Persistent chip-experiment worker: load a big index ONCE (tunnel h2d is
minutes), then exec experiment snippets dropped into the job directory.

Usage: python scripts/chip_worker.py <fmd> <queries.fa> [jobdir]

Protocol: write <jobdir>/job_N.py (N increasing); the worker execs it with
globals {idx, seqs, np, jnp, jax, sm, extend, time, out(...)} and writes
stdout/err + exceptions to <jobdir>/out_N.txt (written atomically: .tmp then
rename).  A job file named STOP ends the worker.
"""

import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    fmd = sys.argv[1]
    qfa = sys.argv[2]
    jobdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/chipw"
    os.makedirs(jobdir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from fermi_tpu import rld
    from fermi_tpu.core import dna, fastx
    from fermi_tpu.index.fmd import FMDIndex
    from fermi_tpu.search import extend, smem as sm

    t0 = time.time()
    idx = FMDIndex.from_runs(rld.read_fmd(fmd))
    idx.bwt_blocks.block_until_ready()
    seqs = [dna.encode(r.seq) for r in fastx.read_fastx(qfa)]
    print(f"[worker] index {int(np.asarray(idx.mcnt[0]))/1e6:.0f} Msym "
          f"({idx.idtype}), {len(seqs)} queries, ready in "
          f"{time.time()-t0:.1f}s", flush=True)

    n = 0
    while True:
        if os.path.exists(os.path.join(jobdir, "STOP")):
            print("[worker] STOP", flush=True)
            return
        jp = os.path.join(jobdir, f"job_{n}.py")
        if not os.path.exists(jp):
            time.sleep(0.5)
            continue
        time.sleep(0.2)  # let the writer finish
        src = open(jp).read()
        buf = io.StringIO()
        t0 = time.time()
        g = dict(idx=idx, seqs=seqs, np=np, jnp=jnp, jax=jax, sm=sm,
                 extend=extend, time=time, print=lambda *a, **k:
                 print(*a, **dict(k, file=buf, flush=True)))
        try:
            exec(src, g)
        except Exception:
            traceback.print_exc(file=buf)
        buf.write(f"\n[job {n} done in {time.time()-t0:.1f}s]\n")
        tmp = os.path.join(jobdir, f"out_{n}.txt.tmp")
        with open(tmp, "w") as f:
            f.write(buf.getvalue())
        os.rename(tmp, os.path.join(jobdir, f"out_{n}.txt"))
        print(f"[worker] job {n} done", flush=True)
        n += 1


if __name__ == "__main__":
    main()
