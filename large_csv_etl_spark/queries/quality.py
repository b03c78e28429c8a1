"""Declarative data-quality expectations (deequ-style, single pass).

A 100 TB ingest gate asserts constraints — completeness, uniqueness,
domain membership, bounds — before data reaches training. The engine form
here computes EVERY rule's metric in one wide aggregate over one scan
(each rule is a conditional count, so the whole suite is one map-side
combinable shuffle of a single row), then unpivots the results into a
(rule, observed, violations, passed) report. Compare: rule-at-a-time
checking re-scans the table per rule.

Reference analog: the reference's post-load validation SQL
(`/root/reference/src/core/db_manager.py:326-346` — negative-amount /
null-status counts) is the two-rule special case of this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

QUERIES = {}
ORACLES = {}


def _q(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_q(
    "dq_expectations_orders",
    """
    WITH m AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(o_orderkey) AS key_nonnull,
             COUNT(DISTINCT o_orderkey) AS key_distinct,
             CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS price_negative,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS status_bad,
             COUNT(o_orderdate) AS date_nonnull
      FROM orders
    )
    SELECT * FROM (
      SELECT 'key_not_null' AS rule, n_rows AS observed,
             n_rows - key_nonnull AS violations,
             n_rows - key_nonnull = 0 AS passed FROM m
      UNION ALL
      SELECT 'key_unique', key_nonnull, key_nonnull - key_distinct,
             key_nonnull - key_distinct = 0 FROM m
      UNION ALL
      SELECT 'price_non_negative', n_rows, price_negative,
             price_negative = 0 FROM m
      UNION ALL
      SELECT 'status_in_domain', n_rows, status_bad, status_bad = 0 FROM m
      UNION ALL
      SELECT 'date_not_null', n_rows, n_rows - date_nonnull,
             n_rows - date_nonnull = 0 FROM m
    )
    """,
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-rule expectation suite over ``orders`` — completeness (key,
    date), uniqueness (key), bounds (price >= 0), domain membership
    (status) — evaluated in ONE aggregate over ONE scan, reshaped with
    ``stack`` into a per-rule report. Every violation count is an exact
    BIGINT; ``passed`` is derived from it, so the report is
    oracle-graded end to end."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("key_nonnull"),
        F.countDistinct("o_orderkey").alias("key_distinct"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("price_negative"),
        F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
        .cast("bigint")
        .alias("status_bad"),
        F.count("o_orderdate").alias("date_nonnull"),
    )
    report = m.selectExpr(
        """stack(5,
             'key_not_null', n_rows, n_rows - key_nonnull,
             'key_unique', key_nonnull, key_nonnull - key_distinct,
             'price_non_negative', n_rows, price_negative,
             'status_in_domain', n_rows, status_bad,
             'date_not_null', n_rows, n_rows - date_nonnull
           ) AS (rule, observed, violations)"""
    )
    return report.select(
        "rule", "observed", "violations", (F.col("violations") == 0).alias("passed")
    )
