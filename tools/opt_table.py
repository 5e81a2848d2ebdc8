#!/usr/bin/env python3
"""Render the OPTIMIZATION_r16 headline checklist table from two bench
JSON lines (baseline + closing sweep): per query, both readings, the
delta, and a short status hook filled in by hand afterwards."""
import json
import sys

base = json.load(open(sys.argv[1]))
final = json.load(open(sys.argv[2]))
rows = []
for name, t0 in base["queries"].items():
    t1 = final["queries"].get(name)
    r0 = base.get("requalified", {}).get(name)
    b = min([x for x in (t0, r0) if x and x > 0] or [t0])
    rows.append((name, b, t1))
rows.sort(key=lambda r: -(r[1] or 0))
print("| query | r16 baseline best (s) | closing sweep (s) | Δ |")
print("|---|---|---|---|")
for name, b, t1 in rows:
    if t1 and t1 > 0 and b and b > 0:
        delta = f"{(1 - t1 / b) * 100:+.0f}%" if abs(1 - t1 / b) >= 0.05 else "~"
        print(f"| {name} | {b:.3f} | {t1:.3f} | {delta} |")
    else:
        print(f"| {name} | {b} | {t1} | |")
print()
print(f"total: {base['value']:.3f} (valid={base['bench_valid']}) -> "
      f"{final['value']:.3f} (valid={final['bench_valid']})")
