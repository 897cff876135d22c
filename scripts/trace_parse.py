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
            for line in plane.lines:
                dur = defaultdict(int)
                cnt = defaultdict(int)
                span_lo, span_hi = None, 0
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur[name] += ev.duration_ps
                    cnt[name] += 1
                    lo = ev.offset_ps
                    span_lo = lo if span_lo is None else min(span_lo, lo)
                    span_hi = max(span_hi, lo + ev.duration_ps)
                if not dur:
                    continue
                total = sum(dur.values())
                span = (span_hi - (span_lo or 0)) / 1e12 * 1e3
                print(f"-- plane {plane.name} line '{line.name}': "
                      f"busy {total/1e12*1e3:.0f} ms over {span:.0f} ms span")
                for name, d in sorted(dur.items(), key=lambda x: -x[1])[:topn]:
                    print(f"  {d/1e12*1e3:9.1f} ms  x{cnt[name]:6d}  "
                          f"{name[:110]}")


if __name__ == "__main__":
    main()
