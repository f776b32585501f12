#!/usr/bin/env python3
"""Three-point scale-sweep report: per-query wall-clock at sf0.1
(driver data), sf1 (10x ScaleUp replication), and sf10 (100x), with a
log10 exponent PER DECADE. Two decades separate noise from trend: a
query whose second-decade exponent exceeds its first is curving UP —
the quadratic tells on itself before production scale does.
Usage: scale_report3.py bench_sf01.json bench_sf1.json bench_sf10.json"""
import json, sys, math

a, b, c = (json.load(open(p)) for p in sys.argv[1:4])
qa, qb, qc = a["queries"], b["queries"], c["queries"]
rows = []
for k in sorted(qa):
    t1 = qa.get(k, -1)
    t10 = qb.get(k, -1)
    t100 = qc.get(k, -1)
    if t1 <= 0:
        continue
    e1 = math.log10(t10 / t1) if t10 > 0 else float("nan")
    e2 = math.log10(t100 / t10) if t10 > 0 and t100 > 0 else float("nan")
    rows.append((k, t1, t10, t100, e1, e2))
rows.sort(key=lambda r: -(r[5] if r[5] == r[5] else r[4]))
print(f"{'query':30s} {'sf0.1':>7s} {'sf1':>8s} {'sf10':>9s} "
      f"{'exp1':>5s} {'exp2':>5s}")
for k, t1, t10, t100, e1, e2 in rows:
    f = lambda x: f"{x:5.2f}" if x == x else "    -"
    t = lambda x: f"{x:9.2f}" if x > 0 else "     skip"
    print(f"{k:30s} {t1:7.2f} {t10:8.2f} {t(t100)} {f(e1)} {f(e2)}")
ta = sum(t for t in qa.values() if t > 0)
tb = sum(qb[k] for k in qa if qb.get(k, -1) > 0 and qa[k] > 0)
tc = sum(qc[k] for k in qa if qc.get(k, -1) > 0 and qa[k] > 0)
print(f"\ntotals (common queries) {ta:.1f}s -> {tb:.1f}s -> {tc:.1f}s; "
      f"aggregate exponents {math.log10(tb/ta):.2f}, {math.log10(tc/tb):.2f}")
sup = [k for k, *_, e1, e2 in rows if e2 == e2 and e2 > 1.15]
print("superlinear second decade (exp2>1.15):", sup or "none")
