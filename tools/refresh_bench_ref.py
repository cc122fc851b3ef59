#!/usr/bin/env python3
"""Regenerate bench_ref.json (the cross-round contention-retry
reference Bench reads at startup) from a bench_out.json detail file.

Run ONCE at the START of each round, against the PREVIOUS round's
shipped bench_out.json — the reference must hold prior-round medians,
so a within-round slowdown is visible against last round's reading,
not smoothed into this round's own numbers.

Usage: python3 tools/refresh_bench_ref.py [bench_out.json] [bench_ref.json]
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "bench_ref.json"
detail = json.load(open(src))
ref = {k: round(v, 3) for k, v in detail["queries"].items()}
json.dump(ref, open(dst, "w"), separators=(",", ":"))
print(f"{dst}: {len(ref)} reference medians from {src}"
      f" (total {detail['value']:.1f}s)")
