#!/usr/bin/env python3
"""Cross-round bench comparison, the judge-accepted method: per-query
ratio on the COMMON query set of two committed bench/full_*.json
artifacts (min-of-3 seconds), reporting median/geomean/total ratios and
any raw regressions > threshold among queries above a floor.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold] [floor_sec]
"""
import json, math, sys

old = json.load(open(sys.argv[1]))["min"]
new = json.load(open(sys.argv[2]))["min"]
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5

common = sorted(k for k in old if k in new and old[k] > 0 and new[k] > 0)
ratios = {k: new[k] / old[k] for k in common}
rs = sorted(ratios.values())
median = rs[len(rs) // 2]
geomean = math.exp(sum(math.log(r) for r in rs) / len(rs))
tot_old = sum(old[k] for k in common)
tot_new = sum(new[k] for k in common)
print(f"common queries: {len(common)}")
print(f"common-set total: {tot_old:.1f}s -> {tot_new:.1f}s (ratio {tot_new/tot_old:.2f})")
print(f"median ratio {median:.2f}  geomean {geomean:.2f}")
reg = [(k, ratios[k], old[k], new[k]) for k in common
       if ratios[k] > thresh and max(old[k], new[k]) > floor]
print(f"regressions >{thresh}x among >{floor}s queries: {len(reg)}")
for k, r, o, n in sorted(reg, key=lambda x: -x[1]):
    print(f"  {k}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
only_new = sorted(k for k in new if k not in old)
print(f"new-only queries: {len(only_new)}, their total {sum(new[k] for k in only_new):.1f}s")
