#!/usr/bin/env python3
"""Build the SCALING.md table from paired full-contract bench JSONs.

Usage: scaling_report.py sf001_a.json sf001_b.json sf01_a.json sf01_b.json

Per query: best-of-two at each SF, ratio = sf0.1 / sf0.01. Prints a
markdown table of the worst ratios plus summary stats; flags queries
whose time ratio exceeds the 10x data-growth ratio (the scale alarm)
and those above 3x (watchlist).
"""
import json
import sys


def best(paths):
    runs = [json.load(open(p))["queries"] for p in paths]
    keys = set(runs[0])
    for r in runs[1:]:
        keys &= set(r)
    return {k: min(r[k] for r in runs) for k in keys}


def main():
    a001, b001, a01, b01 = sys.argv[1:5]
    t001 = best([a001, b001])
    t01 = best([a01, b01])
    common = sorted(set(t001) & set(t01))
    rows = []
    for q in common:
        lo, hi = t001[q], t01[q]
        rows.append((q, lo, hi, hi / lo if lo > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    alarms = [r for r in rows if r[3] > 10.0]
    watch = [r for r in rows if 3.0 < r[3] <= 10.0]
    print(f"queries: {len(rows)}  median ratio: "
          f"{sorted(r[3] for r in rows)[len(rows)//2]:.2f}x  "
          f"worst: {rows[0][0]} {rows[0][3]:.2f}x")
    print(f"alarms (>10x data ratio): {len(alarms)}  watchlist (3-10x): {len(watch)}")
    print()
    print("| query | sf0.01 s | sf0.1 s | ratio |")
    print("|---|---|---|---|")
    for q, lo, hi, r in rows[:25]:
        print(f"| {q} | {lo:.2f} | {hi:.2f} | {r:.2f}x |")
    if alarms:
        print("\nALARMS:")
        for q, lo, hi, r in alarms:
            print(f"  {q}: {lo:.2f} -> {hi:.2f} ({r:.2f}x)")


if __name__ == "__main__":
    main()
