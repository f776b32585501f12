#!/usr/bin/env python3
"""Scale-sweep report: per-query wall-clock at sf0.1 (driver data) vs
sf1 (10x ScaleUp replication), scaling factor and log10 exponent.
Usage: scale_report.py bench_sf01.json bench_sf1.json"""
import json, sys, math

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
rows = []
for k in sorted(qa):
    if k not in qb or qa[k] <= 0 or qb[k] <= 0:
        continue
    ratio = qb[k] / qa[k]
    # exponent e such that T ~ N^e over the 10x step; sub-second
    # baselines carry fixed per-query overhead (job setup, streaming
    # machinery), which deflates e — flag those
    e = math.log10(ratio)
    rows.append((k, qa[k], qb[k], ratio, e))
rows.sort(key=lambda r: -r[4])
print(f"{'query':30s} {'sf0.1':>7s} {'sf1':>8s} {'x':>6s} {'exp':>5s}")
for k, t1, t10, r, e in rows:
    print(f"{k:30s} {t1:7.2f} {t10:8.2f} {r:6.2f} {e:5.2f}")
ta = sum(t for t in qa.values() if t > 0)
tb = sum(t for t in qb.values() if t > 0)
print(f"\ntotal {ta:.1f}s -> {tb:.1f}s  ({tb/ta:.2f}x for 10x data, "
      f"aggregate exponent {math.log10(tb/ta):.2f})")
sup = [k for k, *_ , e in rows if e > 1.15]
print("superlinear (exp>1.15):", sup or "none")
