#!/usr/bin/env python
"""Summarize a jax.profiler chrome trace: per-op device time, grouped.

Usage: python benchmarks/trace_summary.py benchmarks/logs/trace_r4e [top_k]

Groups XLA op events on the device lanes by a coarse family (kernel name
prefix up to the first '.'/digit run), prints total ms and counts, most
expensive first.  Host/python lanes are ignored.
"""
import gzip
import glob
import json
import re
import sys
from collections import defaultdict


def load(trace_dir):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        return json.load(f)


def family(name, args=None):
    # strip fusion numbering: "fusion.123" -> "fusion", keep pallas names
    name = re.sub(r"\.\d+$", "", name)
    if name == "closed_call" and args:
        # distinguish the pallas megakernel calls by their output signature
        ln = args.get("long_name", "")
        shapes = re.findall(r"(?:f32|s32|bf16|pred)\[[\d,]*\]", ln)
        sig = ",".join(shapes[:4])
        name = f"closed_call({sig})"
    return name


def main():
    trace_dir = sys.argv[1]
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    data = load(trace_dir)
    events = data["traceEvents"]

    # device lanes: pid whose process_name metadata mentions TPU/device
    proc = {}
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    dev_pids = {p for p, n in proc.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    if not dev_pids:
        dev_pids = set(proc)

    tot = defaultdict(float)
    cnt = defaultdict(int)
    lane_total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = tids.get((e["pid"], e.get("tid")), "")
        if "step" in lane.lower():
            continue  # step summary lanes double-count
        if e.get("name", "").startswith("jit_"):
            continue  # outer module event nests everything below it
        dur = e.get("dur", 0) / 1e3  # us -> ms
        f = family(e["name"], e.get("args"))
        tot[f] += dur
        cnt[f] += 1
        lane_total += dur
    print(f"total device op time: {lane_total:.3f} ms  "
          f"({sum(cnt.values())} events)")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top_k]:
        print(f"{ms:9.3f} ms  x{cnt[name]:<5d} {name}")


if __name__ == "__main__":
    main()
