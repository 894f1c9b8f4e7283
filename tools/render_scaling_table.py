#!/usr/bin/env python3
"""Render BASELINE.md's scaling tables from the committed artifacts.

The r4 ADVICE defect was a hand-maintained headline table drifting from the
committed artifact it claims to render. This script makes the render
mechanical: run it at round close, paste its stdout verbatim.

Renders the threads ladder (data/scaling.json, local[k]) and, when
present, the multi-executor ladder (data/scaling_mx.json,
local-cluster[k,1,mem] — k real 1-core executor JVMs).
"""
import json
import os
import sys


def eff(d, lo, hi):
    key = f"efficiency_{lo}_to_{hi}"
    return d.get(key)


def render(path, label):
    d = json.load(open(path))
    lv = {int(l["level"]): l for l in d["levels"]}
    fp = d["levels"][0]["fp"] if d["levels"] else "?"
    print(f"| Levels ({label}, fp `{fp}`, min-merged) | sec_min | tiles/s | efficiency |")
    print("|---|---|---|---|")
    for k in sorted(lv):
        l = lv[k]
        cells = []
        if k == 4 and 1 in lv and eff(d, 1, 4) is not None:
            cells.append(f"1→4 = **{eff(d, 1, 4):.3f}**")
        if k == 8 and 2 in lv and eff(d, 2, 8) is not None:
            cells.append(f"2→8 = **{eff(d, 2, 8):.3f}**")
        name = f"local[{k}]" if "taskset-pinned JVM" in d.get("method", "") \
            else f"{k} executor JVMs × 1 core"
        print(f"| {name} | {l['sec_min']:.3f} | {l['per_sec']:,.0f} | {'; '.join(cells)} |")
    c = d.get("pure_cpu_calibration")
    if c:
        print()
        print(f"Pure-CPU calibration ceiling (same pinning, fp `{c['levels'][0]['fp']}`): "
              f"1→4 = {c['efficiency_1_to_4']:.3f}, 2→8 = {c['efficiency_2_to_8']:.3f}.")


paths = sys.argv[1:] or ["data/scaling.json", "data/scaling_mx.json"]
first = True
for p in paths:
    if not os.path.exists(p):
        continue
    if not first:
        print()
    label = "threads: local[k], 1 JVM" if "scaling.json" in os.path.basename(p) \
        else "executors: local-cluster, k JVMs"
    render(p, label)
    first = False
