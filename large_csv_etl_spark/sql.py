"""SQL front door: run ad-hoc ANSI SQL over the engine's tables.

The reference has no SQL surface of its own (it forwards strings to
SQLite, /root/reference/src/core/db_manager.py:262-277); here the Spark
SQL parser/Catalyst IS the engine, so exposing it completes the query
lifecycle: named operators in ``queries/`` for the pipeline, this entry
point for exploration.

    python -m large_csv_etl_spark.sql "SELECT COUNT(*) FROM lineitem" \
        [--sf-dir /root/testdata/sf0.01] [--explain]
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession

from .io import register_temp_views


def run_sql(spark: SparkSession, sql: str, sf_dir: str) -> DataFrame:
    """Register the test tables as views and run one SQL statement."""
    register_temp_views(spark, sf_dir)
    return spark.sql(sql)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sql")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan too"
    )
    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark(app_name="sql")
    spark.sparkContext.setLogLevel("ERROR")
    df = run_sql(spark, args.sql, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
