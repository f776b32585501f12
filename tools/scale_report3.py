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
# NaN-free sort key (NaN keys make the ordering comparison-inconsistent)
rows.sort(key=lambda r: -(r[5] if r[5] == r[5] else
                          (r[4] if r[4] == r[4] else float("-inf"))))
print(f"{'query':30s} {'sf0.1':>7s} {'sf1':>8s} {'sf10':>9s} "
      f"{'exp1':>5s} {'exp2':>5s}")
for k, t1, t10, t100, e1, e2 in rows:
    f = lambda x: f"{x:5.2f}" if x == x else "    -"
    t = lambda x, w: f"{x:{w}.2f}" if x > 0 else " " * (w - 4) + "skip"
    print(f"{k:30s} {t1:7.2f} {t(t10, 8)} {t(t100, 9)} {f(e1)} {f(e2)}")
# totals over ONE shared key set — summing a different subset per SF
# deflates the aggregate exponent whenever a query is skipped at the
# larger scale (q21/q39 are skipped at sf10 by documented range)
common = [k for k in qa
          if qa[k] > 0 and qb.get(k, -1) > 0 and qc.get(k, -1) > 0]
ta = sum(qa[k] for k in common)
tb = sum(qb[k] for k in common)
tc = sum(qc[k] for k in common)
print(f"\ntotals ({len(common)} queries measured at all three points) "
      f"{ta:.1f}s -> {tb:.1f}s -> {tc:.1f}s; "
      f"aggregate exponents {math.log10(tb/ta):.2f}, {math.log10(tc/tb):.2f}")
sup = [k for k, *_, e1, e2 in rows if e2 == e2 and e2 > 1.15]
print("superlinear second decade (exp2>1.15):", sup or "none")
