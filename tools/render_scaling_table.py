#!/usr/bin/env python3
"""Render BASELINE.md's scaling table from the committed data/scaling.json.

The r4 ADVICE defect was a hand-maintained headline table drifting from the
committed artifact it claims to render. This script makes the render
mechanical: run it at round close, paste its stdout verbatim.
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "data/scaling.json"
d = json.load(open(path))

lv = {l["level"]: l for l in d["levels"]}
fp = d["levels"][0]["fp"] if d["levels"] else "?"

print(f"| Levels (pinned, pv9+java `{fp}`, min-merged) | sec_min | tiles/s | efficiency |")
print("|---|---|---|---|")
for k in sorted(lv):
    l = lv[k]
    eff = ""
    if k == 4 and 1 in lv:
        eff = f"1→4 = **{d['efficiency_1_to_4']:.3f}**"
    if k == 8 and 2 in lv:
        eff = f"2→8 = **{d['efficiency_2_to_8']:.3f}**"
    print(f"| local[{k}] | {l['sec_min']:.3f} | {l['per_sec']:,.0f} | {eff} |")

c = d.get("pure_cpu_calibration")
if c:
    print()
    print(f"Pure-CPU calibration ceiling (same pinning, fp `{c['levels'][0]['fp']}`): "
          f"1→4 = {c['efficiency_1_to_4']:.3f}, 2→8 = {c['efficiency_2_to_8']:.3f}.")
