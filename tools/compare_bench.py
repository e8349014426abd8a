#!/usr/bin/env python3
"""Compare two Bench JSON artifacts per query: ratios, movers, totals.

Usage: compare_bench.py BEFORE.json AFTER.json [--min-sec 0.05] [--top 30]
"""
import argparse
import json


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = {k: (v[0] if isinstance(v, list) else v) for k, v in d["queries"].items()}
    return d, q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--min-sec", type=float, default=0.05)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    db, qb = load(args.before)
    da, qa = load(args.after)
    shared = sorted(set(qb) & set(qa))
    print(f"before total {db['value']:.1f}s ({len(qb)} rows)  "
          f"after total {da['value']:.1f}s ({len(qa)} rows)")
    print(f"shared-row sums: {sum(qb[k] for k in shared):.1f}s -> "
          f"{sum(qa[k] for k in shared):.1f}s")
    only_b = set(qb) - set(qa)
    only_a = set(qa) - set(qb)
    if only_b:
        print("only in before:", sorted(only_b))
    if only_a:
        print("only in after:", sorted(only_a))
    movers = [(qa[k] / qb[k], k) for k in shared if qb[k] >= args.min_sec]
    movers.sort()
    print(f"\nbiggest improvements (after/before, rows >= {args.min_sec}s before):")
    for r, k in movers[: args.top]:
        print(f"  {r:5.2f}x  {qb[k]:7.2f} -> {qa[k]:7.2f}  {k}")
    print("\nbiggest regressions:")
    for r, k in movers[-args.top:][::-1]:
        if r <= 1.0:
            break
        print(f"  {r:5.2f}x  {qb[k]:7.2f} -> {qa[k]:7.2f}  {k}")


if __name__ == "__main__":
    main()
