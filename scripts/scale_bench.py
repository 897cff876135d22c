"""North-star scale benchmark: the full PAIRED pipeline (raw fmd -> correct
-> ec fmd -> rank -> unitig -> clean x2 -> remap -> scaf -> remap -c2) on a
multi-million-read synthetic PE library, ours vs the reference chain.

Usage: python scripts/scale_bench.py [n_pairs] [--ref] [--mine]
  n_pairs default 5_000_000 (= 10M reads, ~25x over a 40 Mbp genome).
  With no side flags, runs both and reports the ratio + contig stats.

Dataset and artifacts cache under /tmp/fermi_tpu_bench/scale_<n>/.
"""

import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

RL = 100
INSERT, INS_SD = 300, 30
ERR = 0.005
COVERAGE = 25


def log(m):
    sys.stderr.write(f"[scale] {m}\n")
    sys.stderr.flush()


def make_pe(path, n_pairs, seed=7):
    """Vectorized PE FASTQ generator (both mates in one interleaved file)."""
    rng = np.random.default_rng(seed)
    glen = max(int(n_pairs * 2 * RL / COVERAGE), 50_000)
    genome = rng.integers(0, 4, glen + INSERT + 4 * INS_SD, dtype=np.int8)
    log(f"genome {glen/1e6:.1f} Mbp, {n_pairs} pairs ({2*n_pairs} reads)")
    CH = 1 << 19
    comp = np.array([3, 2, 1, 0], np.int8)
    base = np.frombuffer(b"ACGT", np.uint8)
    qhi, qlo = 38 + 33, 15 + 33
    with open(path, "wb", buffering=1 << 22) as f:
        done = 0
        while done < n_pairs:
            m = min(CH, n_pairs - done)
            ins = np.clip(rng.normal(INSERT, INS_SD, m).astype(np.int64),
                          RL + 10, INSERT + 4 * INS_SD)
            pos = rng.integers(0, glen, m)
            # gather both mates [m, RL]
            r1 = genome[pos[:, None] + np.arange(RL)]
            r2pos = pos + ins - RL
            r2 = comp[genome[r2pos[:, None] + np.arange(RL)]][:, ::-1]
            reads = np.stack([r1, r2], axis=1).reshape(2 * m, RL)
            nerr = rng.binomial(RL, ERR, 2 * m)
            tot_err = int(nerr.sum())
            rows = np.repeat(np.arange(2 * m), nerr)
            cols = rng.integers(0, RL, tot_err)
            reads[rows, cols] = (reads[rows, cols]
                                 + rng.integers(1, 4, tot_err)) % 4
            quals = np.full((2 * m, RL), qhi, np.uint8)
            quals[rows, cols] = qlo
            # assemble FASTQ records vectorized: fixed-width records
            ids = np.arange(done, done + m)
            seq = base[reads]
            out = bytearray()
            hdrs = [f"@p{i}\n".encode() for i in ids for _ in (0, 1)]
            sep = b"\n+\n"
            sb = seq.tobytes()
            qb = quals.tobytes()
            for r in range(2 * m):
                out += hdrs[r]
                out += sb[r * RL:(r + 1) * RL]
                out += sep
                out += qb[r * RL:(r + 1) * RL]
                out += b"\n"
            f.write(out)
            done += m
            if done % (1 << 21) < CH:
                log(f"  {done}/{n_pairs} pairs written")
    return path


def run_mine(fq, prefix, k=50, threads=4):
    from fermi_tpu.pipeline.driver import Pipeline

    t0 = time.time()
    pl = Pipeline(prefix, n_threads=threads, unitig_k=k, paired=True)
    final = pl.run([fq])
    dt = time.time() - t0
    log(f"mine: {dt:.1f}s -> {final}")
    return dt


def run_ref(fq, prefix, k=50, threads=4):
    ref = bench.ensure_ref()
    min_clean_o = int(k * 1.2 + 0.499)

    def sh(cmd):
        t0 = time.time()
        res = subprocess.run(cmd, shell=True, capture_output=True)
        assert res.returncode == 0, (cmd, res.stderr[-500:])
        log(f"  ref: {cmd.split('|')[-1].strip()[:60]} ... "
            f"{time.time()-t0:.1f}s")

    t0 = time.time()
    sh(f"cat {fq} | {ref} ropebwt -a bcr -v3 -btNf {prefix}.tmp - "
       f"> {prefix}.raw.fmd 2> {prefix}.raw.log")
    sh(f"cat {fq} | {ref} correct -pt {threads} {prefix}.raw.fmd - "
       f"2> {prefix}.ec.fq.log > {prefix}.ec.fq")
    sh(f"{ref} fltuniq {prefix}.ec.fq 2> {prefix}.flt.log | "
       f"{ref} ropebwt -a bcr -v3 -btf {prefix}.tmp2 - "
       f"> {prefix}.ec.fmd 2> {prefix}.ec.log")
    sh(f"{ref} seqrank -t {threads} {prefix}.ec.fmd > {prefix}.ec.rank "
       f"2> /dev/null")
    sh(f"{ref} unitig -t {threads} -l {k} -r {prefix}.ec.rank "
       f"{prefix}.ec.fmd > {prefix}.p0.mag 2> /dev/null")
    sh(f"{ref} clean {prefix}.p0.mag > {prefix}.p1.mag 2> /dev/null")
    sh(f"{ref} clean -CAOFo {min_clean_o} {prefix}.p1.mag > {prefix}.p2.mag "
       f"2> /dev/null")
    sh(f"{ref} remap -t {threads} -r {prefix}.ec.rank {prefix}.ec.fmd "
       f"{prefix}.p2.mag > {prefix}.p3.mag 2> {prefix}.p3.log")
    txt = open(f"{prefix}.p3.log").read()
    m = re.search(r"avg = (\S+) std = (\S+) cap = (\S+)", txt)
    avg, std, cap = m.group(1), m.group(2), m.group(3)
    sh(f"{ref} scaf -t {threads} -P {prefix}.ec.fmd {prefix}.p3.mag "
       f"{avg} {std} > {prefix}.p4.fa 2> /dev/null")
    sh(f"{ref} remap -t {threads} -c2 -D {cap} -r {prefix}.ec.rank "
       f"{prefix}.ec.fmd {prefix}.p4.fa > {prefix}.p5.fq 2> /dev/null")
    dt = time.time() - t0
    log(f"reference: {dt:.1f}s")
    return dt


def main():
    args = [a for a in sys.argv[1:]]
    n_pairs = int(args[0]) if args and args[0].isdigit() else 5_000_000
    wd = os.path.join(bench.CACHE, f"scale_{n_pairs}")
    os.makedirs(wd, exist_ok=True)
    fq = os.path.join(wd, "reads.fq")
    if not os.path.exists(fq):
        t0 = time.time()
        make_pe(fq, n_pairs)
        log(f"dataset written in {time.time()-t0:.1f}s "
            f"({os.path.getsize(fq)/1e9:.2f} GB)")
    t_my = t_ref = None
    if "--ref" not in args or "--mine" in args:
        pass
    if "--ref" in args and "--mine" not in args:
        t_ref = run_ref(fq, os.path.join(wd, "ref"))
    elif "--mine" in args and "--ref" not in args:
        t_my = run_mine(fq, os.path.join(wd, "my"))
    else:
        t_my = run_mine(fq, os.path.join(wd, "my"))
        t_ref = run_ref(fq, os.path.join(wd, "ref"))
    if t_my and t_ref:
        log(f"RESULT: mine {t_my:.1f}s vs ref {t_ref:.1f}s = "
            f"{t_ref/t_my:.2f}x")
        import json
        print(json.dumps({
            "metric": "paired_pipeline_reads_per_s",
            "value": round(2 * n_pairs / t_my, 1), "unit": "reads/s",
            "vs_baseline": round(t_ref / t_my, 3)}))


if __name__ == "__main__":
    main()
