#!/usr/bin/env python3
"""Triage the sf1 sweep: per-query ratio vs (sf0.1 time x 10 linear
extrapolation). Ratio > 1 means super-linear scaling; the r4 verdict's
bar is no query > 10x its extrapolation. Usage:
  python3 dev/sf1_ratio.py [sf01_json] [sf1_json]
"""
import json
import sys


def load(path):
    rows = [json.loads(l) for l in open(path) if l.strip().startswith("{")]
    full = next(r for r in rows if "queries" in r)
    return full


def main():
    sf01 = load(sys.argv[1] if len(sys.argv) > 1 else "dev/bench_local_r5.json")
    sf1 = load(sys.argv[2] if len(sys.argv) > 2 else "dev/bench_sf1_r5.json")
    q01, q1 = sf01["queries"], sf1["queries"]
    print(f"sf0.1 total {sf01['value']:.1f}s | sf1 total {sf1['value']:.1f}s "
          f"| sf1 errors: {sf1.get('errors')}")
    triage = []
    for name in sorted(q1):
        if name not in q01:
            continue
        base, t = q01[name], q1[name]
        # sub-100ms sf0.1 times are all JVM/planning constant; floor the
        # base so fixed-cost queries don't read as fake super-linearity
        ratio = t / (max(base, 0.1) * 10)
        triage.append((ratio, name, base, t))
    triage.sort(reverse=True)
    print(f"{'query':34} {'sf0.1':>7} {'sf1':>8} {'x/linear':>9}")
    for ratio, name, base, t in triage[:20]:
        flag = " <-- SUPER-LINEAR" if ratio > 1.0 else ""
        print(f"{name:34} {base:6.2f}s {t:7.2f}s {ratio:8.2f}x{flag}")
    over = [x for x in triage if x[0] > 1.0]
    print(f"\n{len(over)}/{len(triage)} queries above linear extrapolation; "
          f"bar (>10x): {[n for r, n, *_ in triage if r > 10]}")


if __name__ == "__main__":
    main()
