#!/usr/bin/env python3
"""Analyze the interleaved A/B bench: r10 (c66a262) vs r11 (fe2e5f1).

Per arm, min over its sessions per query; compare over shared queries.
Also prints per-session totals so within-window drift is visible.
"""
import json, glob, statistics, sys

def load(path):
    with open(path) as f:
        return json.load(f)["queries"]

arms = {}
for arm in ("r10", "r11"):
    sessions = sorted(glob.glob(f"/tmp/ab_out/{arm}_s*/bench_out.json"))
    maps = [load(p) for p in sessions]
    arms[arm] = (sessions, maps)
    for p, m in zip(sessions, maps):
        tot = sum(v for v in m.values() if v >= 0)
        print(f"{p}: {len(m)} queries, total {tot:.1f}s")

r10_maps = arms["r10"][1]
r11_maps = arms["r11"][1]
if not r10_maps or not r11_maps:
    sys.exit("missing sessions")

def minmerge(maps):
    out = {}
    for m in maps:
        for k, v in m.items():
            if v < 0: continue
            out[k] = min(out.get(k, 1e9), v)
    return out

a = minmerge(r10_maps)
b = minmerge(r11_maps)
shared = sorted(set(a) & set(b))
ta = sum(a[q] for q in shared)
tb = sum(b[q] for q in shared)
ratios = sorted((b[q] / a[q], q) for q in shared if a[q] > 0.02)
med = statistics.median(r for r, _ in ratios)
print(f"\nshared queries: {len(shared)}")
print(f"r10 min-merged total: {ta:.1f}s   r11: {tb:.1f}s   ratio {tb/ta:.3f}")
print(f"median per-query ratio (>20ms): {med:.3f}")
inside = sum(1 for r, _ in ratios if 0.9 <= r <= 1.1)
print(f"ratios in [0.9,1.1]: {inside}/{len(ratios)}")
print("slowest regressions:", [(q, round(r, 2)) for r, q in ratios[-8:]])
print("biggest speedups:", [(q, round(r, 2)) for r, q in ratios[:5]])
