"""Histogram rank-localization exact quantiles: bit-identity with the
built-in percentile aggregate is the whole contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from large_csv_etl_spark.io import load_table
from large_csv_etl_spark.quantiles import exact_quantiles

from .conftest import SF_DIR_MID


def _builtin(df, col, pcts):
    ps = ", ".join(repr(p) for p in pcts)
    return list(df.agg(F.expr(f"percentile({col}, array({ps}))")).collect()[0][0])


def test_bit_identical_to_builtin_percentile(spark):
    li = load_table(spark, SF_DIR_MID, "lineitem").select("l_extendedprice")
    pcts = [p / 10 for p in range(1, 10)]
    assert exact_quantiles(li, "l_extendedprice", pcts) == _builtin(
        li, "l_extendedprice", pcts
    )
    od = load_table(spark, SF_DIR_MID, "orders").select("o_totalprice")
    qs = [0.25, 0.5, 0.75]
    assert exact_quantiles(od, "o_totalprice", qs) == _builtin(od, "o_totalprice", qs)


def test_edge_cases(spark):
    one = spark.createDataFrame([(42.0,)], "v double")
    assert exact_quantiles(one, "v", [0.1, 0.9]) == [42.0, 42.0]
    const = spark.range(100).selectExpr("7.5 as v")
    assert exact_quantiles(const, "v", [0.5]) == [7.5]
    empty = one.filter("v < 0")
    assert exact_quantiles(empty, "v", [0.5]) == [None]
    with_nulls = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (3.0,), (None,)], "v double"
    )
    assert exact_quantiles(with_nulls, "v", [0.5]) == _builtin(
        with_nulls.filter("v is not null"), "v", [0.5]
    )


def test_skew_fallback_matches(spark):
    # every row identical except one: the needed bucket is the whole
    # column, forcing the max_fetch fallback path
    df = spark.range(5000).selectExpr(
        "CASE WHEN id = 0 THEN 0.0 ELSE 100.0 END as v"
    )
    got = exact_quantiles(df, "v", [0.5], max_fetch=100)
    assert got == _builtin(df, "v", [0.5])


from hypothesis import given, settings, strategies as st  # noqa: E402

FINITE = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(FINITE, min_size=1, max_size=400),
    pcts=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=5,
    ),
)
def test_localized_quantiles_fuzz_bit_identity(spark, vals, pcts):
    """Random value sets and percentile lists: histogram rank localization
    must stay bit-identical to the built-in percentile aggregate —
    including duplicates, extreme spreads, and boundary percentiles."""
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = exact_quantiles(df, "v", pcts, n_buckets=64)
    assert got == _builtin(df, "v", pcts)


def test_nan_and_inf_fallback_matches_builtin(spark):
    """NaN sorts greatest in the built-in aggregate; infinities poison the
    histogram width — both delegate to the built-in and must agree."""
    nan_df = spark.createDataFrame(
        [(1.0,), (2.0,), (float("nan"),), (3.0,)], "v double"
    )
    assert exact_quantiles(nan_df, "v", [0.5]) == _builtin(nan_df, "v", [0.5])
    inf_df = spark.createDataFrame(
        [(1.0,), (float("inf"),), (2.0,), (float("-inf"),)], "v double"
    )
    assert exact_quantiles(inf_df, "v", [0.25, 0.75]) == _builtin(
        inf_df, "v", [0.25, 0.75]
    )
