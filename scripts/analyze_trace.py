"""Aggregate per-op device time from an XPlane trace written by
scripts/profile_sweep.py — no TensorFlow dependency (hand-rolled protobuf
wire walker; field numbers verified against traces from jax 0.8-era
profiler: XSpace.planes=1, XPlane{name=2, lines=3, event_metadata=4},
XLine{name=2, events=4}, XEvent{metadata_id=1, duration_ps=3},
map entry{key=1, value=2}, XEventMetadata{name=2}).

Usage: python scripts/analyze_trace.py [tracedir]
"""

import glob
import sys
from collections import defaultdict


def read_varint(b, i):
    x, s = 0, 0
    while True:
        c = b[i]
        i += 1
        x |= (c & 0x7f) << s
        if not c & 0x80:
            return x, i
        s += 7


def fields(b):
    i = 0
    while i < len(b):
        tag, i = read_varint(b, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = read_varint(b, i)
        elif wt == 2:
            ln, i = read_varint(b, i)
            v = b[i:i + ln]
            i += ln
        elif wt == 5:
            v = b[i:i + 4]
            i += 4
        elif wt == 1:
            v = b[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mpskit_trace"
    f = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))[-1]
    buf = open(f, "rb").read()
    for fn, wt, plane in fields(buf):
        if fn != 1:
            continue
        name, lines, meta = None, [], {}
        for f2, w2, v2 in fields(plane):
            if f2 == 2 and w2 == 2:
                name = v2.decode(errors="replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:
                k = em = None
                for f3, _, v3 in fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        em = v3
                if em is not None:
                    for f4, w4, v4 in fields(em):
                        if f4 == 2 and w4 == 2:
                            meta[k] = v4.decode(errors="replace")
        if "TPU" not in (name or ""):
            continue
        agg = defaultdict(lambda: [0, 0])
        for ln in lines:
            lname, events = None, []
            for f3, w3, v3 in fields(ln):
                if f3 == 2 and w3 == 2:
                    lname = v3.decode(errors="replace")
                elif f3 == 4:
                    events.append(v3)
            for ev in events:
                mid = dur = 0
                for f4, _, v4 in fields(ev):
                    if f4 == 1:
                        mid = v4
                    elif f4 == 3:
                        dur = v4
                key = (lname, meta.get(mid, str(mid)))
                agg[key][0] += dur
                agg[key][1] += 1
        print(f"== {name}")
        for (lname, ename), (ps, n) in sorted(
                agg.items(), key=lambda kv: -kv[1][0])[:25]:
            print(f"  {ps / 1e9:8.2f} ms  n={n:6d}  [{lname}] {ename[:75]}")


if __name__ == "__main__":
    main()
