"""Aggregate per-op device time from a JAX xplane trace directory.

Usage: python scripts/trace_parse.py [/tmp/jaxtrace] [top_n]
"""

import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    pbs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    for pb in pbs:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(pb, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
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
            print(f"== plane {plane.name}: {len(plane.lines)} lines, "
                  f"sum {total/1e12*1e3:.0f} ms")
            for name, d in sorted(dur.items(), key=lambda x: -x[1])[:topn]:
                print(f"  {d/1e12*1e3:9.1f} ms  x{cnt[name]:6d}  {name[:120]}")


if __name__ == "__main__":
    main()
