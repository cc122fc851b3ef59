#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (e.g. a scaled soak run vs the base
SF) and report per-query warm-time ratios against a scale budget.

Usage: python3 tools/soak_compare.py <base.json> <scaled.json> [maxRatio]
Exit 1 if any query's warm ratio exceeds maxRatio (default 10).
"""
import sys, json

def main():
    base = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    max_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    names = sorted(set(base["queries"]) & set(big["queries"]))
    missing = sorted(set(base["queries"]) ^ set(big["queries"]))
    if missing:
        print(f"WARN: {len(missing)} queries not in both runs: {missing}")
    rows = []
    for n in names:
        b, s = base["queries"][n], big["queries"][n]
        # sub-100ms base times are all JVM noise; floor the denominator
        rows.append((s / max(b, 0.1), b, s, n))
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'base_s':>8} {'scaled_s':>9}  query")
    for r, b, s, n in rows:
        flag = " <-- OVER BUDGET" if r > max_ratio else ""
        print(f"{r:7.2f} {b:8.3f} {s:9.3f}  {n}{flag}")
    over = [n for r, _, _, n in rows if r > max_ratio]
    tot_b = sum(base["queries"][n] for n in names)
    tot_s = sum(big["queries"][n] for n in names)
    print(f"\ntotals: base {tot_b:.1f}s scaled {tot_s:.1f}s "
          f"(x{tot_s / tot_b:.1f}); budget x{max_ratio:g} per query")
    if base.get("errors") or big.get("errors"):
        print(f"errors: base {base.get('errors')} scaled {big.get('errors')}")
        sys.exit(1)
    if over:
        print(f"FAIL: {len(over)} queries over budget: {over}")
        sys.exit(1)
    print("PASS: every query within the scale budget")

if __name__ == "__main__":
    main()
