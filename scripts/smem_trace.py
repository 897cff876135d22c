"""Capture a device trace of the pool SMEM kernel and print the top ops.

Parses the xplane proto directly (tensorboard_plugin_profile) and aggregates
device-side op durations, so we see exactly where the 8-20 ms/iteration goes.
"""

import glob
import os
import sys
import time
from collections import defaultdict

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

    print(f"backend={jax.default_backend()} B={B}", flush=True)
    idx = FMDIndex.restore(fmd)
    seqs = [dna.encode(r.seq) for r in fastx.read_fastx(qfa)][:4096]
    NP = 4096
    max_len = max(len(s) for s in seqs)
    q = np.zeros((NP, max_len), np.uint8)
    lens = np.ones(NP, np.int32)
    for i, s in enumerate(seqs):
        q[i, : len(s)] = s
        lens[i] = len(s)
    qd, ld = jnp.asarray(q), jnp.asarray(lens)

    def run():
        out = sm._smem_batch(idx, qd, ld, False, max_len, 32, 64, lanes=B)
        return [np.asarray(o) for o in out]

    t0 = time.time()
    run()
    print(f"warmup {time.time()-t0:.1f}s", flush=True)
    tdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    t0 = time.time()
    run()
    dt = time.time() - t0
    jax.profiler.stop_trace()
    print(f"traced run {dt*1e3:.0f} ms", flush=True)

    pbs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("planes:", pbs, flush=True)
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    for pb in pbs:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(pb, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            dur = defaultdict(int)
            cnt = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur[name] += ev.duration_ps
                    cnt[name] += 1
            total = sum(dur.values())
            print(f"== plane {plane.name}: total {total/1e12*1e3:.0f} ms "
                  f"(sum over lines)")
            for name, d in sorted(dur.items(), key=lambda x: -x[1])[:40]:
                print(f"  {d/1e12*1e3:9.1f} ms  x{cnt[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
