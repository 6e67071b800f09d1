#!/usr/bin/env python
"""Join profiler per-op times with HLO metadata (op_name, shape, emitter).

Usage: python tools/correlate_trace.py [trace_dir] [hlo.txt]
No TPU needed — pure parsing.
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_trace_r2"
HLO = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_step_hlo.txt"
N_PROF = 3


def load_times():
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}
    per_op = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        per_op[name] += e.get("dur", 0) / 1e3 / N_PROF
    return per_op


def load_hlo_meta():
    meta = {}
    pat = re.compile(
        r"%([\w.\-]+) = \(?([^)]*?)\)? fusion|%([\w.\-]+) = (\S+) (\w[\w-]*)\(")
    opname_pat = re.compile(r'op_name="([^"]*)"')
    emitter_pat = re.compile(r'"emitter":"(\w+)"')
    shape_pat = re.compile(r"%[\w.\-]+ = (\(?[^ ]+\)?) ")
    with open(HLO) as f:
        for line in f:
            m = re.match(r"\s*%([\w.\-]+) = ", line)
            if not m:
                continue
            name = m.group(1)
            op = opname_pat.search(line)
            em = emitter_pat.search(line)
            sh = shape_pat.search(line)
            meta[name] = {
                "op_name": op.group(1) if op else "",
                "emitter": em.group(1) if em else "",
                "shape": (sh.group(1)[:60] if sh else ""),
            }
    return meta


def main():
    times = load_times()
    meta = load_hlo_meta()
    total = sum(times.values())
    print(f"total device: {total:.1f} ms/step, {len(times)} ops")
    rows = sorted(times.items(), key=lambda kv: -kv[1])
    print(f"{'ms':>8}  {'hlo':28} {'shape':40} {'emitter':45} op_name")
    shown = 0.0
    for name, ms in rows[:60]:
        info = meta.get(name, {})
        print(f"{ms:8.2f}  {name[:28]:28} {info.get('shape', ''):40} "
              f"{info.get('emitter', ''):45} {info.get('op_name', '')[:110]}")
        shown += ms
    print(f"(top 60 = {shown:.1f} ms)")

    # group by op_name prefix (model layer)
    by_layer = defaultdict(float)
    for name, ms in times.items():
        op = meta.get(name, {}).get("op_name", "")
        m = re.search(r"(jvp\(DynUNet\)|transpose\(jvp\(DynUNet\)\))/([\w/]+?)/", op)
        if m:
            direction = "bwd" if m.group(1).startswith("transpose") else "fwd"
            by_layer[f"{direction}:{m.group(2).split('/')[0]}"] += ms
        else:
            by_layer[f"other:{op.split('/')[1] if '/' in op else op}"[:50]] += ms
    print("\n== by layer ==")
    for key, ms in sorted(by_layer.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms:8.2f} ms  {key}")


if __name__ == "__main__":
    main()
