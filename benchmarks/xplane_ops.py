"""Minimal XSpace (.xplane.pb) parser: aggregate device-op durations.

The tensorboard profile plugin's native converter is version-broken in
this environment, so this decodes the protobuf wire format directly
(XSpace/XPlane/XLine/XEvent/XEventMetadata field numbers from
tensorflow/tsl/profiler/protobuf/xplane.proto).

Usage: python benchmarks/xplane_ops.py <file.xplane.pb> [top_n]
"""
import struct
import sys
from collections import defaultdict


def _varint(buf, i):
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack("<Q", buf[i : i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<I", buf[i : i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse(path):
    space = open(path, "rb").read()
    planes = []
    for fn, wt, v in _fields(space):
        if fn == 1 and wt == 2:
            planes.append(v)
    results = {}
    for plane in planes:
        name = ""
        meta = {}
        lines = []
        for fn, wt, v in _fields(plane):
            if fn == 2 and wt == 2:
                name = v.decode("utf-8", "ignore")
            elif fn == 3 and wt == 2:
                lines.append(v)
            elif fn == 4 and wt == 2:  # map<int64, XEventMetadata>
                mid, mname = None, ""
                for f2, w2, v2 in _fields(v):
                    if f2 == 1 and w2 == 0:
                        mid = v2
                    elif f2 == 2 and w2 == 2:  # XEventMetadata
                        for f3, w3, v3 in _fields(v2):
                            if f3 == 2 and w3 == 2:
                                mname = v3.decode("utf-8", "ignore")
                if mid is not None:
                    meta[mid] = mname
        durations = defaultdict(int)
        counts = defaultdict(int)
        for line in lines:
            for fn, wt, v in _fields(line):
                if fn == 4 and wt == 2:  # XEvent (XLine.events = field 4)
                    mid, dur = None, 0
                    for f2, w2, v2 in _fields(v):
                        if f2 == 1 and w2 == 0:
                            mid = v2
                        elif f2 == 3 and w2 == 0:
                            dur = v2
                    if mid is not None:
                        durations[meta.get(mid, str(mid))] += dur
                        counts[meta.get(mid, str(mid))] += 1
        results[name] = (durations, counts)
    return results


def main():
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    for plane, (durs, counts) in parse(path).items():
        if not durs:
            continue
        total = sum(durs.values())
        print(f"\n=== plane: {plane}  (total {total/1e9:.2f} ms across events)")
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {d/1e9:8.2f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
