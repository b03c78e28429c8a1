#!/usr/bin/env python
"""Round-over-round bench comparison.

Reads two bench artifacts — each either a BENCH_full_r{N}.json (complete
per-query dict, written by bench.py since round 6) or a driver
BENCH_r{N}.json (whose `parsed.queries` omits the cheapest timings to fit
the stdout-tail contract) — and prints the per-query ratios, worst
regressions first. Totals only compare within one environment era
(BASELINE.md §drift), so the summary leads with the median per-query
ratio, which is robust to the machine-wide drift that broke the r3/r4
total comparison.

Usage:
    python tools/bench_compare.py BENCH_full_r06.json BENCH_full_r07.json
    python tools/bench_compare.py BENCH_r05.json BENCH_full_r06.json
"""

from __future__ import annotations

import json
import statistics
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d and isinstance(d["queries"], dict):
        q = d["queries"]
    elif isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        q = d["parsed"]["queries"]
    else:
        raise SystemExit(f"{path}: no queries dict found")
    return {k: float(v) for k, v in q.items() if float(v) >= 0}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    old, new = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    # sub-0.3s timings are scheduling noise; exclude them from ratios
    rated = [
        (new[k] / old[k], k) for k in common if old[k] >= 0.3 and new[k] >= 0.3
    ]
    rated.sort(reverse=True)
    med = statistics.median(r for r, _ in rated) if rated else float("nan")
    print(
        f"common={len(common)} rated={len(rated)} "
        f"median_ratio={med:.3f} "
        f"old_total={sum(old[k] for k in common):.1f}s "
        f"new_total={sum(new[k] for k in common):.1f}s"
    )
    print(f"{'query':<40} {'old':>7} {'new':>7} {'ratio':>6}")
    for r, k in rated:
        # The investigate rule (BASELINE.md §drift / VERDICT r8 ask #9):
        # >1.3x on a >1.5s query. Sub-1.5s entries drift freely with
        # battery ordering and JVM warmth; "investigate" means a warm
        # isolation re-time on unchanged code before calling it real.
        flag = "  <-- investigate" if r > 1.3 and new[k] > 1.5 else ""
        print(f"{k:<40} {old[k]:>7.2f} {new[k]:>7.2f} {r:>6.2f}{flag}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"only in new ({len(only_new)}): {', '.join(only_new)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
