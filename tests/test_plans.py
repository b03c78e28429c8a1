"""Plan-shape contracts: pushdown, pruning, and join strategy — asserted
structurally via plans.plan_summary, not by eyeballing explain output."""

from __future__ import annotations

from pyspark.sql import functions as F

from large_csv_etl_spark.io import load_table
from large_csv_etl_spark.plans import plan_summary
from large_csv_etl_spark.queries import all_queries


def test_q6_filter_pushdown_and_column_pruning(spark, sf_dir):
    df = all_queries()["q6_forecast_revenue"](spark, sf_dir)
    df.collect()
    s = plan_summary(df)
    (scan,) = s["scans"]
    # 4 columns read out of 11 (pruning), range filters reach the scan
    assert set(scan["columns"]) <= {
        "l_shipdate",
        "l_discount",
        "l_quantity",
        "l_extendedprice",
    }
    assert any("l_shipdate" in f for f in scan["pushed_filters"])
    assert any("l_discount" in f for f in scan["pushed_filters"])


def test_dim_join_broadcasts_not_sortmerge(spark, sf_dir):
    df = all_queries()["q3_shipping_priority"](spark, sf_dir)
    df.collect()
    s = plan_summary(df)
    assert s["n_broadcast_joins"] >= 2
    assert s["n_sortmerge_joins"] == 0


def test_single_agg_single_shuffle(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    df.collect()
    s = plan_summary(df)
    assert s["n_shuffles"] == 1
    (scan,) = s["scans"]
    assert scan["columns"] == ["l_returnflag"]
