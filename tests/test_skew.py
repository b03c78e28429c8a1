"""Salting utilities must be pure plan rewrites: identical results to the
unsalted aggregate/join on real (and deliberately skewed) data."""

from __future__ import annotations

from pyspark.sql import functions as F

from large_csv_etl_spark.io import load_table
from large_csv_etl_spark.skew import salted_aggregate, salted_join

from .conftest import SF_DIR


def test_salted_aggregate_equals_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.n_rows, round(r.sum_l_quantity, 6))
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("l_quantity").alias("sum_l_quantity"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.n_rows, round(r.sum_l_quantity, 6))
        for r in salted_aggregate(
            li, ["l_returnflag", "l_linestatus"], ["l_quantity"]
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_on_hot_key(spark):
    # one key carrying 90% of rows — the case salting exists for
    rows = [(("hot" if i % 10 else f"k{i}"), 1.0) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r.k: (r.n_rows, r.sum_v)
        for r in salted_aggregate(df, ["k"], ["v"], n_salts=8).collect()
    }
    assert got["hot"] == (4500, 4500.0)
    assert len(got) == 501


def test_salted_join_equals_plain(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    p = {r.o_custkey: r.n for r in plain.collect()}
    s = {r.o_custkey: r.n for r in salted.collect()}
    assert p == s


def test_salted_join_rejects_outer_types(spark, sf_dir):
    from large_csv_etl_spark.io import load_table

    import pytest as _pytest

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    for how in ("right", "full", "full_outer", "left_anti"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(li, orders, "l_orderkey", "o_orderkey", how=how)
