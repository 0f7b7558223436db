#!/usr/bin/env python3
"""Per-query bench ceiling gate (r5 verdict ask #2).

Round 5 shipped q_cc_incremental at 152.6 s in the builder's own
committed bench record (822.6 s in the driver re-run) without any flag
— 72% of the entire batch total hiding in one line of a 260-query
JSON. This gate makes that impossible: it fails if any query in a
bench record exceeds

    ceiling = max(ABS_CEILING_SEC, RATIO * suite median)

Defaults (sf0.1, local[32]): ABS_CEILING_SEC = 30, RATIO = 8. The
suite median is ~0.8 s, so the absolute ceiling dominates — a query
has to be ~37x the median before the gate trips, which no healthy
plan in the suite approaches, while the r5 regression (152 s / 822 s)
trips it instantly.

Usage: tools/bench_ceiling.py [bench_out.json] [--abs SEC] [--ratio R]
Exit 0 = clean, 1 = ceiling breach (breaching queries listed), 2 = bad input.
"""
import json
import statistics
import sys


def main() -> int:
    path = "bench_out.json"
    abs_ceiling = 30.0
    ratio = 8.0
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--abs":
            abs_ceiling = float(args.pop(0))
        elif a == "--ratio":
            ratio = float(args.pop(0))
        else:
            path = a
    try:
        with open(path) as f:
            record = json.load(f)
        queries = record["queries"]
    except (OSError, KeyError, json.JSONDecodeError) as e:
        print(f"[bench_ceiling] cannot read queries from {path}: {e}")
        return 2
    if not queries:
        print(f"[bench_ceiling] {path} has an empty queries block")
        return 2
    med = statistics.median(queries.values())
    ceiling = max(abs_ceiling, ratio * med)
    breaches = {q: s for q, s in queries.items() if s > ceiling}
    total = sum(queries.values())
    print(f"[bench_ceiling] {len(queries)} queries, median {med:.2f}s, "
          f"total {total:.1f}s, ceiling {ceiling:.1f}s "
          f"(max(abs={abs_ceiling}, {ratio}x median))")
    if breaches:
        for q, s in sorted(breaches.items(), key=lambda kv: -kv[1]):
            print(f"[bench_ceiling] BREACH {q} = {s:.1f}s "
                  f"({s / total * 100:.0f}% of suite total)")
        return 1
    print("[bench_ceiling] clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
