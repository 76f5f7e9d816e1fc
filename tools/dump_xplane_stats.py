#!/usr/bin/env python
"""Debug helper: list every stat name present in an xplane trace, per
plane, with a sample value — used to find what per-op cost stats the
axon/TPU profiler actually emits (bench.py's roofline looks for
'flops'/'bytes accessed' and found neither)."""
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main(trace_dir):
    files = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    assert files, f"no xplane in {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(files)[-1], 'rb') as f:
        xspace.ParseFromString(f.read())
    for plane in xspace.planes:
        print(f"\n== plane '{plane.name}': {len(plane.lines)} lines")
        stat_meta = {sid: sm.name for sid, sm in plane.stat_metadata.items()}
        seen = {}
        n_ev = 0
        for line in plane.lines:
            for ev in line.events:
                n_ev += 1
                for st in ev.stats:
                    nm = stat_meta.get(st.metadata_id, f"#{st.metadata_id}")
                    if nm not in seen:
                        v = (st.uint64_value or st.int64_value
                             or st.double_value or st.str_value
                             or st.bytes_value)
                        seen[nm] = v
        print(f"   {n_ev} events; stat names:")
        for nm, v in sorted(seen.items()):
            print(f"   {nm!r}: sample={str(v)[:80]}")


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/trace_r5b')
