#!/usr/bin/env python3
"""Tabulate per-query decade ratios between two Bench artifacts
(e.g. BENCH_SF1.json -> BENCH_SF10.json): the markdown table
BENCH_NOTES carries for the 100x scale argument.

Usage: decade_ratios.py <lo.json> <hi.json> [topN=25]
Prints a markdown table of the topN largest hi/lo ratios (floored at
lo >= 0.05 s so sub-noise queries don't divide to nonsense), plus the
total ratio and the count of queries whose ratio exceeds the data
growth factor implied by the sf labels (superlinear suspects).
"""
import json, sys


def main():
    lo = json.load(open(sys.argv[1]))
    hi = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    lq, hq = lo["queries"], hi["queries"]
    common = sorted(set(lq) & set(hq))
    rows = []
    for q in common:
        a, b = lq[q], hq[q]
        rows.append((q, a, b, (b / a) if a >= 0.05 else None))
    ranked = sorted((r for r in rows if r[3] is not None),
                    key=lambda r: -r[3])
    print(f"| query | {lo.get('sf','lo')} s | {hi.get('sf','hi')} s | ratio |")
    print("|---|---|---|---|")
    for q, a, b, r in ranked[:top_n]:
        print(f"| {q} | {a:.2f} | {b:.2f} | {r:.2f}x |")
    total_lo = sum(lq[q] for q in common)
    total_hi = sum(hq[q] for q in common)
    print(f"\ncommon queries: {len(common)}  "
          f"total {total_lo:.1f} s -> {total_hi:.1f} s "
          f"({total_hi / total_lo:.2f}x)")
    only_lo = sorted(set(lq) - set(hq))
    only_hi = sorted(set(hq) - set(lq))
    if only_lo:
        print(f"only in lo: {only_lo}")
    if only_hi:
        print(f"only in hi: {only_hi}")
    supra = [(q, r) for q, a, b, r in ranked if r is not None and r > 10.0]
    print(f"ratio > 10x (superlinear suspects at a 10x decade): "
          f"{supra if supra else 'none'}")


if __name__ == "__main__":
    main()
