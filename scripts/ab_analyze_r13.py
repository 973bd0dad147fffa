#!/usr/bin/env python3
"""Analyze the interleaved r12-vs-r13 A/B bench (abtest_r13/*.json).

Per arm, min over its sessions per query; compare over shared queries.
Per-session totals are printed so within-window drift is visible.
"""
import json, glob, statistics, sys, os

base = os.path.join(os.path.dirname(__file__), "..", "abtest_r13")

def load(path):
    with open(path) as f:
        return json.load(f)["queries"]

arms = {}
for arm in ("r12", "r13"):
    sessions = sorted(glob.glob(f"{base}/{arm}_s*.json"))
    maps = [load(p) for p in sessions]
    arms[arm] = maps
    for p, m in zip(sessions, maps):
        tot = sum(v for v in m.values() if v >= 0)
        print(f"{os.path.basename(p)}: {len(m)} queries, total {tot:.1f}s")

a_maps, b_maps = arms["r12"], arms["r13"]
if not a_maps or not b_maps:
    sys.exit("missing sessions")

def minmerge(maps):
    out = {}
    for m in maps:
        for k, v in m.items():
            if v < 0: continue
            out[k] = min(out.get(k, 1e9), v)
    return out

a, b = minmerge(a_maps), minmerge(b_maps)
shared = sorted(set(a) & set(b))
ta = sum(a[q] for q in shared)
tb = sum(b[q] for q in shared)
ratios = sorted((b[q] / a[q], q) for q in shared if a[q] > 0.02)
med = statistics.median(r for r, _ in ratios)
print(f"\nshared queries: {len(shared)}")
print(f"r12 min-merged total: {ta:.1f}s   r13: {tb:.1f}s   ratio {tb/ta:.3f}")
print(f"median per-query ratio (>20ms): {med:.3f}")
inside = sum(1 for r, _ in ratios if 0.9 <= r <= 1.1)
print(f"ratios in [0.9,1.1]: {inside}/{len(ratios)}")
print("slowest regressions:", [(q, round(r, 2)) for r, q in ratios[-8:]])
print("biggest speedups:", [(q, round(r, 2)) for r, q in ratios[:12]])
