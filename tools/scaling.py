#!/usr/bin/env python3
"""Per-query scaling exponents between two bench detail files.

exponent = log(t_big / t_small) / log(scale). With scale=10:
  ~0    fixed cost (job floors, tiny dims)
  ~1    linear — the target for scans/aggregates/linear joins
  >1.3  super-linear — joins the weak list with a named fix

Noise guard: a 10x corpus run still bounces on GC/machine noise, so
queries faster than FLOOR_SEC at the small scale are reported but not
flagged (a 0.05s -> 0.4s move is 8x of nothing; the fixed JVM/job
overhead dominates both numbers).

Usage: scaling.py [small_detail] [big_detail] [scale]
"""
import json, math, sys

small_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_DETAIL.json"
big_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_SF1.json"
scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
FLOOR_SEC = 0.15   # below this at the small scale, overhead dominates
FLAG_EXP = 1.3

small = json.load(open(small_path))["queries"]
big = json.load(open(big_path))["queries"]

rows = []
for q, t_small in small.items():
    if q not in big or t_small <= 0 or big[q] <= 0:
        continue
    exp = math.log(big[q] / t_small) / math.log(scale)
    rows.append((exp, q, t_small, big[q]))

rows.sort(reverse=True)
flagged = []
print(f"{'exponent':>8}  {'small(s)':>8}  {'big(s)':>8}  query")
for exp, q, ts, tb in rows:
    mark = ""
    if exp > FLAG_EXP and ts >= FLOOR_SEC:
        mark = "  <<< SUPER-LINEAR"
        flagged.append(q)
    elif exp > FLAG_EXP:
        mark = "  (sub-floor small time; overhead-dominated)"
    print(f"{exp:8.2f}  {ts:8.3f}  {tb:8.3f}  {q}{mark}")

tot_s = sum(small[q] for _, q, _, _ in rows)
tot_b = sum(big[q] for _, q, _, _ in rows)
print(f"\ncommon queries: {len(rows)}  total {tot_s:.1f}s -> {tot_b:.1f}s "
      f"(aggregate exponent {math.log(tot_b / tot_s) / math.log(scale):.2f})")
print(f"flagged super-linear (small>={FLOOR_SEC}s, exp>{FLAG_EXP}): {flagged}")
