"""Aggregate a jax perfetto trace by python source attribution + HLO shape.

Usage: python tools/trace_attrib.py [tracedir] [--steps N] [--top N]
"""

import argparse
import glob
import gzip
import json
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tracedir", nargs="?", default="/tmp/vwfd_trace")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by", default="source", choices=["source", "op", "cat"])
    args = ap.parse_args()

    paths = sorted(glob.glob(args.tracedir + "/**/perfetto_trace.json.gz",
                             recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"] if isinstance(trace, dict) else trace

    agg = defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # ms, count, flops, bytes
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or not e.get("args"):
            continue
        a = e["args"]
        if "device_duration_ps" not in a:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):  # umbrella program event
            continue
        dur = float(a["device_duration_ps"]) / 1e9  # ps → ms
        total += dur
        if args.by == "source":
            key = a.get("source", "?")
        elif args.by == "cat":
            key = a.get("hlo_category", "?")
        else:
            ln = a.get("long_name", name)
            key = ln.split(" = ")[-1][:140]
        agg[key][0] += dur
        agg[key][1] += 1
        agg[key][2] += float(a.get("model_flops", 0) or 0)
        agg[key][3] += float(a.get("raw_bytes_accessed", 0) or 0)

    s = args.steps
    print(f"total device time: {total:.1f} ms ({total/s:.1f} ms/step)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
    for key, (ms, cnt, fl, by) in rows:
        fl, by = fl / s, by / s
        ai = fl / by if by else 0
        print(f"{ms/s:8.2f} ms  ×{cnt//s:<4d} {fl/1e9:8.1f}GF {by/1e6:8.0f}MB "
              f"AI={ai:5.1f}  {key[:100]}")


if __name__ == "__main__":
    main()
