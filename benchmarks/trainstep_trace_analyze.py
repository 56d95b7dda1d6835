"""Per-line, per-category attribution of a train-step xplane trace.

Post-processes the trace captured by benchmarks/train_step_profile.py.
The xplane device plane holds several XLines (the module line, the
XLA-op line, async-copy lines); summing across lines overcounts badly
(copy-start durations span their whole async window).  This tool
aggregates per line and classifies the op line's events into
categories readable in a ledger table:

  conv-fwd / conv-bwd-filter (fusions whose instruction text carries a
  conv-shaped output), layout copies (copy/slice/transpose/bitcast),
  GN statistics reductions, optimizer/param-shaped small fusions,
  dropout RNG, loss/reduce, other.

Classification is by the instruction text xplane embeds in the event
display name (shapes + op kind), since the remote-relay compiler never
writes client-side HLO dumps (--xla_dump_to is a no-op through the
relay — the compile happens server-side).

Usage: python benchmarks/trainstep_trace_analyze.py <file.xplane.pb>
"""
import re
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from xplane_ops import _fields  # noqa: E402


def parse_lines(path):
    """{plane_name: {line_name: [(event_name, dur_ps), ...]}}"""
    space = open(path, "rb").read()
    out = {}
    for fn, wt, v in _fields(space):
        if not (fn == 1 and wt == 2):
            continue
        pname, meta, lines = "", {}, []
        for f2, w2, v2 in _fields(v):
            if f2 == 2 and w2 == 2:
                pname = v2.decode("utf-8", "ignore")
            elif f2 == 3 and w2 == 2:
                lines.append(v2)
            elif f2 == 4 and w2 == 2:
                mid, mname = None, ""
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 0:
                        mid = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in _fields(v3):
                            if f4 == 2 and w4 == 2:
                                mname = v4.decode("utf-8", "ignore")
                if mid is not None:
                    meta[mid] = mname
        plane = {}
        for line in lines:
            lname, events = "", []
            for f2, w2, v2 in _fields(line):
                if f2 == 2 and w2 == 2:
                    lname = v2.decode("utf-8", "ignore")
                elif f2 == 4 and w2 == 2:
                    mid, dur = None, 0
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    if mid is not None:
                        events.append((meta.get(mid, str(mid)), dur))
            plane.setdefault(lname, []).extend(events)
        out[pname] = plane
    return out


CONV_OUT = re.compile(r"= (?:bf16|f32)\[(\d+(?:,\d+){3,5})\]")
KSHAPE = re.compile(r"\[(?:\d+,)?3,3,3,\d+,\d+(?:,\d+)?\]")


def classify(name):
    n = name
    if n.startswith(("%copy-start", "%copy-done", "%slice-start",
                     "%slice-done", "%copy", "%transpose", "%bitcast")):
        return "layout/async-copy"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    if n.startswith("%select_reduce_fusion") or (
            "reduce_fusion" in n and re.search(r"= \(f32\[\d+\]", n)):
        return "GN stats (f32 reduce)"
    if re.search(r"= \(?(?:f32|bf16)\[(?:16|32|64|128|256|512)\]", n):
        return "GN stats (f32 reduce)"
    if KSHAPE.search(n):
        return "conv weight/filter-grad"
    m = CONV_OUT.search(n)
    if m:
        dims = [int(d) for d in m.group(1).split(",")]
        if len(dims) >= 4 and max(dims) >= 56 and min(dims) >= 1:
            return "activation fusion (conv/GN/elementwise)"
    if "rng" in n or "threefry" in n or "iota" in n:
        return "rng/iota"
    return "other"


def main():
    path = sys.argv[1]
    for pname, lines in parse_lines(path).items():
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        print(f"=== plane: {pname}")
        for lname, events in sorted(lines.items()):
            tot = sum(d for _, d in events)
            print(f"\n-- line '{lname}': {tot/1e9:.2f} ms total, "
                  f"{len(events)} events")
            cats = defaultdict(int)
            for name, d in events:
                cats[classify(name)] += d
            for cat, d in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"   {d/1e9:8.2f} ms  {cat}")
            top = defaultdict(int)
            cnt = defaultdict(int)
            for name, d in events:
                top[name] += d
                cnt[name] += 1
            for name, d in sorted(top.items(), key=lambda kv: -kv[1])[:12]:
                print(f"     {d/1e9:7.2f} ms x{cnt[name]:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
