"""Partition-count invariance: the determinism contract says every graded
query's values are independent of how Spark partitions the data (exact
DECIMAL accumulation, multiplicative thresholds, integer ranking). A plain
double sum would pass the DuckDB diff only by luck of one partitioning;
this test re-runs the float-surfacing queries under a different
``spark.sql.shuffle.partitions`` and requires bit-identical output."""

from __future__ import annotations

import math

import pytest

from large_csv_etl_spark.queries import all_queries

from .conftest import SF_DIR

# The queries whose outputs contain derived doubles (sums, averages,
# ratios, quantization scales) — the surface where accumulation order
# could leak. Integer/count-only queries are invariant by construction.
FLOAT_SURFACING = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q14_promo_revenue_ratio",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "agg_amount_stats",
    "histogram_extendedprice",
    "agg_variance_exact",
    "agg_corr_exact",
    "text_oov_rate",
    "embedding_quantize_int8",
    "sim_quantized_topk",
    "events_daily_gap_fill",
    # round-4 additions with derived doubles
    "embedding_dim_stats",
    "agg_ols_by_group",
    "supplier_nation_hhi",
    "events_bot_cadence",
    "events_type_diversity",
    "text_vocab_diversity",
    "customer_rfm_segments",
    "quantile_binning_decile",
    "agg_median_abs_deviation",
    "agg_weighted_median",
    "sim_filtered_topk",
]


def _canon(v):
    if isinstance(v, float):
        return repr(v)  # ulp differences must show
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _rows(df):
    return sorted(
        tuple(_canon(v) for v in row) for row in (tuple(r) for r in df.collect())
    )


@pytest.mark.parametrize("name", FLOAT_SURFACING)
def test_partition_count_invariance(spark, sf_dir, name):
    reg = all_queries()
    if name not in reg:
        pytest.skip(f"{name} not registered")
    fn = reg[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        a = _rows(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
