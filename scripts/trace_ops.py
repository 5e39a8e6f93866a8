"""Aggregate device-op time from a jax.profiler xplane trace.

Reads the vm.xplane.pb written by `jax.profiler.trace` (works through the
axon tunnel -- the TPU device plane carries real op events), groups XLA op
durations by fusion/op name, and prints the top-N with % of device time:
the evidence docs/PERF.md uses to name each lane's bottleneck.

Usage: python scripts/trace_ops.py /tmp/jaxtrace/bprmf [--top 15]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def load_xspace(root: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pats = [os.path.join(root, "plugins/profile/*/*.xplane.pb"),
            os.path.join(root, "*.xplane.pb")]
    paths = sorted(sum((glob.glob(p) for p in pats), []))
    if not paths:
        raise SystemExit(f"no xplane.pb under {root}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    return xs


GROUP_RE = re.compile(r"\.\d+$")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--raw", action="store_true", help="no name grouping")
    a = ap.parse_args()

    xs = load_xspace(a.trace_dir)
    dev = next((p for p in xs.planes if "/device:TPU" in p.name), None)
    if dev is None:
        raise SystemExit("no TPU device plane in trace")
    md = dev.event_metadata
    busy = collections.Counter()
    count = collections.Counter()
    total = 0
    for line in dev.lines:
        if line.name in ("Steps",):  # step markers overlap op events
            continue
        for ev in line.events:
            name = md[ev.metadata_id].name
            if not a.raw:
                name = GROUP_RE.sub("", name)
            busy[name] += ev.duration_ps
            count[name] += 1
            total += ev.duration_ps
    print(f"device planes: {dev.name}; total op time {total/1e12*1000:.2f} ms")
    print(f"| op | ms | % | calls |")
    print(f"|---|---|---|---|")
    for name, ps in busy.most_common(a.top):
        print(f"| {name[:70]} | {ps/1e9:.3f} | {100*ps/total:.1f}% | {count[name]} |")


if __name__ == "__main__":
    main()
