"""Physical-plan introspection: structured summaries of the things that
matter at 100 TB — how many shuffles, which joins broadcast, whether
filters and column pruning reached the parquet scan.

The repo's scale contract ("filters push down", "dims broadcast", "one
shuffle per agg") is enforceable only if plans are inspectable; tests use
``plan_summary`` instead of grepping plan strings ad hoc.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _executed_plan(df: DataFrame) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints "Final Plan" followed by "Initial Plan";
    # only the final (runtime-chosen) plan counts.
    return plan.split("== Initial Plan ==")[0]


def plan_summary(df: DataFrame) -> dict:
    """Counts + per-scan detail from the executed physical plan.

    Returns::

        {
          "n_shuffles":      # Exchange hashpartitioning / rangepartitioning
          "n_single_partition_exchanges":
          "n_broadcast_joins": "n_sortmerge_joins": "n_reused_exchanges":
          "scans": [{"format", "columns", "pushed_filters"}, ...],
        }

    Run after an action (or on an AQE-finalized plan) for the joins the
    runtime actually chose.
    """
    plan = _executed_plan(df)
    scans = []
    for m in re.finditer(r"FileScan (\w+) \[([^\]]*)\]([^\n]*)", plan):
        fmt, cols, rest = m.group(1), m.group(2), m.group(3)
        # the plan printer truncates long lists with "..." and no closing
        # bracket — stop at whichever comes first
        pushed = re.search(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", rest)
        scans.append(
            {
                "format": fmt,
                "columns": [
                    c.split("#")[0] for c in cols.split(",") if c.strip()
                ],
                "pushed_filters": (
                    [f.strip() for f in pushed.group(1).split(",") if f.strip()]
                    if pushed
                    else []
                ),
            }
        )
    return {
        "n_shuffles": len(
            re.findall(r"Exchange (?:hash|range)partitioning", plan)
        ),
        "n_single_partition_exchanges": len(
            re.findall(r"Exchange SinglePartition", plan)
        ),
        "n_broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "n_sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "n_reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "scans": scans,
    }
