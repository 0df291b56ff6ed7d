#!/usr/bin/env python3
"""Round-over-round per-query regression gate (VERDICT r10 #9).

Usage: python3 dev/compare_rounds.py <prev_bench.json> <cur_bench.json>
       [--threshold 1.5] [--floor 0.5]

Compares the per-query timing dicts of two graft.Bench snapshots and
flags queries whose time grew more than --threshold x. Sub-floor
absolute times (default 0.5 s) are ignored on BOTH sides: at that scale
the delta is JVM/host noise, not a plan change.

A flag here is a TRIAGE INPUT, not a verdict: this host's noise can hit
one query 10x while neighbors stay clean (dev/run.sh docs), so confirm
every flagged query with an isolated best-of-3 before believing it:

    dev/run.sh graft.tools.BenchOne <sfDir> <query...>

Exit code: 0 always (the gate reports; the round close-out adjudicates).
"""
import json
import sys


def load(path):
    # bench snapshots may hold several JSON lines (a detail line, then the
    # compact summary) — take the LAST line carrying a queries dict
    best = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and d.get("queries"):
                best = d
    if best is None:
        sys.exit(f"{path}: no per-query dict (pre-r10 snapshot?)")
    return best, best["queries"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): float(a.split("=")[1])
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    if len(args) != 2:
        sys.exit(__doc__)
    threshold = opts.get("threshold", 1.5)
    floor = opts.get("floor", 0.5)
    (pd, pq), (cd, cq) = load(args[0]), load(args[1])
    if pd.get("sf") != cd.get("sf"):
        print(f"WARNING: sf mismatch ({pd.get('sf')} vs {cd.get('sf')}) — "
              "ratios compare different data scales", file=sys.stderr)

    flagged, improved, added, removed = [], [], [], []
    for name in sorted(set(pq) | set(cq)):
        if name not in pq:
            added.append(name)
            continue
        if name not in cq:
            removed.append(name)
            continue
        p, c = pq[name], cq[name]
        if max(p, c) < floor:
            continue
        ratio = c / p if p > 0 else float("inf")
        if ratio > threshold:
            flagged.append((ratio, name, p, c))
        elif ratio < 1 / threshold:
            improved.append((ratio, name, p, c))

    tot_p = sum(v for k, v in pq.items() if k in cq)
    tot_c = sum(v for k, v in cq.items() if k in pq)
    print(f"total (shared queries): {tot_p:.1f}s -> {tot_c:.1f}s "
          f"({tot_c / tot_p:.2f}x), {len(pq)} -> {len(cq)} queries")
    if added:
        print(f"new queries: {', '.join(added)}")
    if removed:
        print(f"REMOVED queries: {', '.join(removed)}")
    if improved:
        print(f"\nimproved >{threshold}x:")
        for r, n, p, c in sorted(improved):
            print(f"  {n}: {p:.2f}s -> {c:.2f}s ({r:.2f}x)")
    if flagged:
        print(f"\nREGRESSED >{threshold}x (confirm each with BenchOne "
              "best-of-3 before believing it):")
        for r, n, p, c in sorted(flagged, reverse=True):
            print(f"  {n}: {p:.2f}s -> {c:.2f}s ({r:.2f}x)")
    else:
        print(f"\nno regressions >{threshold}x (floor {floor}s)")


if __name__ == "__main__":
    main()
