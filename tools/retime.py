#!/usr/bin/env python
"""Warm isolation re-time: the repo's bench-outlier adjudication tool.

The discipline (BASELINE.md §drift, applied rounds 7-10): a battery
entry flagged by tools/bench_compare.py (>1.3x on >1.5 s) is re-timed in
ISOLATION — fresh JVM per query, one trivial warm-up action, then the
query twice (warm1 = first-touch incl. codegen + page cache, warm2 =
fully warm). If warm2 lands at or below the query's prior-era number,
the battery elevation is first-touch/ordering noise (a block-released
battery pays honest per-query first-touch; cross-query warmth is gone by
design) and is recorded, not "fixed". Only a warm2 ABOVE era par is a
real regression worth profiling.

Usage:
    python tools/retime.py [--sf-dir DIR] [--runs N] name [name ...]

Each query runs in its own subprocess so storage/codegen state cannot
leak between re-timed queries.
"""

from __future__ import annotations

import argparse
import subprocess
import sys

CHILD = r'''
import sys, time
sys.path.insert(0, "/root/repo")
from large_csv_etl_spark.session import get_spark
from large_csv_etl_spark.queries import all_queries

name, sf_dir, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name="retime")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()
q = all_queries()[name]
ts = []
for _ in range(runs):
    t0 = time.perf_counter()
    q(spark, sf_dir).collect()
    ts.append(time.perf_counter() - t0)
print("RETIME " + name + " " + " ".join(f"{t:.2f}" for t in ts))
'''


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2,
                    help="timed runs per query (default 2: warm1 + warm2)")
    args = ap.parse_args()

    rc = 0
    for n in args.names:
        r = subprocess.run(
            [sys.executable, "-c", CHILD, n, args.sf_dir, str(args.runs)],
            capture_output=True, text=True,
        )
        printed = False
        for line in r.stdout.splitlines():
            if line.startswith("RETIME"):
                print(line)
                printed = True
        if r.returncode != 0 or not printed:
            # distinct prefix so downstream `^RETIME ` row parsers never
            # misread a failure as a timing sample (ADVICE r10 #1);
            # newline-flattened so the failure stays ONE line
            tail = " | ".join(r.stderr.strip()[-300:].splitlines())
            print(f"RETIME-FAIL {n}: {tail}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
