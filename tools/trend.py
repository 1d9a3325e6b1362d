#!/usr/bin/env python3
"""Compare the last two full bench runs recorded in bench_trend.csv.

Usage: python3 tools/trend.py [trend_csv]

Prints the median per-query ratio (the ambient-load indicator — a
uniform shift means the MACHINE changed, not the code) and flags
queries whose inflation stands out from that median, which is the
signal worth investigating. See .claude/skills/verify/SKILL.md: cross-
session drift of ~35-40% has been observed on an idle machine, so only
RELATIVE outliers are meaningful across runs.
"""
import csv, sys, statistics

path = sys.argv[1] if len(sys.argv) > 1 else "bench_trend.csv"
rows = list(csv.DictReader(open(path)))
runs = sorted(set(r["run_ts"] for r in rows))
if len(runs) < 2:
    sys.exit(f"need >= 2 runs in {path}, have {len(runs)}")
a, b = runs[-2], runs[-1]
A = {r["query"]: float(r["seconds"]) for r in rows if r["run_ts"] == a}
B = {r["query"]: float(r["seconds"]) for r in rows if r["run_ts"] == b}
common = [q for q in B if q in A and A[q] > 0.05 and B[q] > 0]
if not common:
    sys.exit("no common queries between the last two runs")
ratios = sorted(((B[q] / A[q], q) for q in common), reverse=True)
med = statistics.median(r for r, _ in ratios)
print(f"{a} -> {b}")
print(f"{len(common)} common queries; median ratio {med:.2f} "
      f"(uniform shift = ambient, not code)")
print("\nlargest inflations (ratio / query / before / after):")
for r, q in ratios[:10]:
    print(f"  {r:5.2f}  {q:40s} {A[q]:7.2f} -> {B[q]:7.2f}")
# a real regression stands out from the ambient median AND costs real time
reg = [(r, q) for r, q in ratios if r > 1.5 * med and B[q] - A[q] > 0.5]
print(f"\nqueries beyond 1.5x the median ratio and +0.5 s: {len(reg)}")
for r, q in reg:
    print(f"  {r:5.2f}  {q:40s} {A[q]:7.2f} -> {B[q]:7.2f}")
# a query recorded as -1 s in the latest run FAILED all its reps; one
# that was positive before is a pass -> fail regression — the worst kind,
# and the ratio filter above can't see it (B[q] > 0 drops it silently)
broke = sorted(q for q in B if B[q] < 0 and A.get(q, -1) > 0)
if broke:
    print(f"\nPASS -> FAIL regressions ({len(broke)}):")
    for q in broke:
        print(f"  FAILED {q:40s} (was {A[q]:.2f} s)")
still_broken = sorted(q for q in B if B[q] < 0 and q not in broke)
if still_broken:
    print(f"still failing (also failed last run or new): "
          f"{', '.join(still_broken)}")
new = sorted(q for q in B if q not in A)
gone = sorted(q for q in A if q not in B)
if new:
    print(f"\nnew queries: {', '.join(new)}")
if gone:
    print(f"removed queries: {', '.join(gone)}")
# nonzero exit on ANY failing query in the latest run (pass->fail,
# still-failing, or a brand-new query that never passed) so a scripted
# caller can't miss it
sys.exit(1 if (broke or still_broken) else 0)
