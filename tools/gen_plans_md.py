"""Generate PLANS.md: executed-plan summaries for every graded query.

Runs each of the 50 grading-window queries at sf0.001 (collect() so AQE
finalizes its runtime join/partition choices), then prints the structured
``plans.plan_summary`` — shuffle count, join strategies, scan pruning and
pushdown — as one audit table. Streaming-twin queries execute their
micro-batch drain; their batch-side plan is what the summary reflects.

Usage: python tools/gen_plans_md.py > PLANS.md
       python tools/gen_plans_md.py name [name ...] > docs/PLANS_HEAVY.md

With no arguments, audits the 50 grading-window queries (the PLANS.md
contract pinned by tests/test_registry.py). With names, audits exactly
those — used for ad-hoc audits like the heaviest-battery-entry sweep.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from large_csv_etl_spark.plans import plan_summary  # noqa: E402
from large_csv_etl_spark.queries import all_queries  # noqa: E402
from large_csv_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    spark = get_spark(app_name="gen_plans_md")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1:
        names = sys.argv[1:]
        unknown = [n for n in names if n not in all_queries()]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 1
        print("# Ad-hoc plan audit (generated — do not edit)")
    else:
        names = list(all_queries())[:50]
        print("# Graded-query plan audit (generated — do not edit)")
    print()
    print(
        f"Executed-plan summaries for the {len(names)} "
        f"{'grading-window ' if len(sys.argv) == 1 else ''}"
        f"queries at sf0.001 (`python tools/gen_plans_md.py > PLANS.md`). "
        "Plans are AQE-final (captured after an action). Columns: shuffles "
        "= hash/range exchanges; 1-part = single-partition exchanges "
        "(global sorts/limits); BHJ/SMJ = broadcast vs sort-merge joins "
        "chosen at runtime; scans = `format[: #columns read]` with `F` "
        "when filters reached the scan."
    )
    print()
    print("| query | shuffles | 1-part | BHJ | SMJ | reused | scans |")
    print("|---|---|---|---|---|---|---|")
    for name in names:
        fn = all_queries()[name]
        try:
            df = fn(spark, SF_DIR)
            df.collect()
            s = plan_summary(df)
            scans = ", ".join(
                f"{sc['format']}:{len(sc['columns'])}"
                + ("F" if sc["pushed_filters"] else "")
                for sc in s["scans"]
            ) or "-"
            print(
                f"| `{name}` | {s['n_shuffles']} "
                f"| {s['n_single_partition_exchanges']} "
                f"| {s['n_broadcast_joins']} | {s['n_sortmerge_joins']} "
                f"| {s['n_reused_exchanges']} | {scans} |"
            )
        except Exception as exc:  # pragma: no cover
            print(f"| `{name}` | ERR | | | | | {type(exc).__name__} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
