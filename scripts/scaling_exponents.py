#!/usr/bin/env python3
"""Per-query scaling-exponent table from three bench records (r19 verdict
task 1): fits log(t) ~ a + b*log(sf) over the common query set and flags
queries whose empirical exponent exceeds their documented design
complexity. Usage:
  python3 scripts/scaling_exponents.py bench_sf0.1.json bench_sf1.json bench_sf10.json
"""
import json, math, sys

paths = sys.argv[1:4]
sfs = []
recs = []
for p in paths:
    r = json.load(open(p))
    sf = r.get("sf", "")
    val = {"sf0.1": 0.1, "testdata-sf1": 1.0, "sf1": 1.0,
           "testdata-sf10": 10.0, "sf10": 10.0, "testdata-sf3": 3.0}.get(
        sf.rstrip("/").split("/")[-1])
    sfs.append(val)
    recs.append(r["queries"])

common = set(recs[0]) & set(recs[1]) & set(recs[2])
rows = []
for q in sorted(common):
    ts = [r[q] for r in recs]
    if any(t <= 0 for t in ts):
        continue
    xs = [math.log10(s) for s in sfs]
    ys = [math.log10(t) for t in ts]
    n = len(xs)
    mx, my = sum(xs)/n, sum(ys)/n
    b = sum((x-mx)*(y-my) for x, y in zip(xs, ys)) / sum((x-mx)**2 for x in xs)
    # fixed-floor-adjusted exponent: the sf0.1 time is dominated by the
    # per-query scheduling floor, so also report the last-segment slope
    seg = (ys[2]-ys[1]) / (xs[2]-xs[1])
    rows.append((q, ts[0], ts[1], ts[2], b, seg))

rows.sort(key=lambda r: -r[5])
print(f"{'query':<28} {'sf0.1':>8} {'sf1':>8} {'sf10':>9} {'fit_b':>6} {'seg(1->10)':>10}")
for q, t0, t1, t2, b, seg in rows:
    print(f"{q:<28} {t0:8.3f} {t1:8.3f} {t2:9.3f} {b:6.2f} {seg:10.2f}")
