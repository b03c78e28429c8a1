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


def test_pii_mask_is_pure_map_stage(spark, sf_dir):
    df = all_queries()["scalar_pii_mask"](spark, sf_dir)
    df.collect()
    s = plan_summary(df)
    # redaction must never shuffle and must prune to the two used columns
    assert s["n_shuffles"] == 0
    (scan,) = s["scans"]
    assert set(scan["columns"]) <= {"c_custkey", "c_name"}


def test_pack_sequences_single_window_shuffle(spark, sf_dir):
    df = all_queries()["sample_pack_sequences"](spark, sf_dir)
    df.collect()
    s = plan_summary(df)
    # one partitionBy(source) exchange feeds the window; no extra shuffles
    assert s["n_shuffles"] == 1


def test_iqr_fences_broadcast_not_sortmerge(spark, sf_dir):
    df = all_queries()["agg_iqr_outliers"](spark, sf_dir)
    df.collect()
    s = plan_summary(df)
    # the 3-row fence table must broadcast; a sort-merge join here would
    # shuffle the full fact table a second time
    assert s["n_broadcast_joins"] >= 1
    assert s["n_sortmerge_joins"] == 0


def test_dynamic_partition_pruning_fires_on_star_join(spark, tmp_path):
    """Star-schema join against a partitioned fact: the dim-side filter
    must turn into a runtime DynamicPruning subquery on the fact scan, so
    only the surviving partitions are read — at 100 TB this is the
    difference between scanning one partition and scanning the table."""
    from large_csv_etl_spark.io import load_table

    fact_path = str(tmp_path / "fact")
    load_table(spark, str(spark.conf.get("spark.graft.sfdir", "/root/testdata/sf0.001")), "lineitem") \
        .write.partitionBy("l_returnflag").parquet(fact_path)
    dim = spark.createDataFrame(
        [("A", "keep"), ("N", "drop"), ("R", "drop")], "flag string, tag string"
    )
    fact = spark.read.parquet(fact_path)
    j = (
        fact.join(dim.filter(F.col("tag") == "keep"), fact.l_returnflag == dim.flag)
        .groupBy("flag")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert j.collect()[0]["count"] > 0


def test_runtime_bloom_filter_injected_on_selective_dim_join(spark, sf_dir):
    """When the dim side carries a selective filter and the join must
    shuffle (no broadcast), Catalyst injects a runtime bloom filter that
    pre-filters the fact scan BEFORE the exchange — the 100 TB pattern
    that turns a full-fact shuffle into a shuffle of matching rows only.
    Pinned here so a conf regression can't silently drop it."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        assert spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ) == "true"
        # force the shuffle-join path and let the small fixture qualify
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, sf_dir, "lineitem")
        od = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
