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
    # round-6 additions with derived doubles
    "text_ngram_novelty",
    "text_readability_ari",
    "text_token_concentration",
    "sample_mixture_solver",
    "dedup_source_contamination_matrix",
    "embedding_pca_top_component",
    "dataset_card_report",
    "events_watermark_late_audit",
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


def test_round_half_away_parity_with_duckdb_on_adversarial_ties(spark):
    """The fp_sum/snap contract rests on one claim: round() is
    half-away-from-zero in BOTH engines, ties included (helpers.py;
    SKILL.md gotcha). Pin it directly on adversarial values — exact .5
    ties (positive/negative, odd/even), the dyadic tie that bit
    embedding_dim_stats in round 5 (153/1024 * 1e9), and the classic
    just-below-a-tie double 0.49999999999999994 where a naive
    floor(x+0.5) implementation would drift up."""
    import duckdb

    from pyspark.sql import functions as F

    vals = [
        0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 3.5, -3.5,
        0.49999999999999994, -0.49999999999999994,
        153 / 1024 * 1e9,   # 149414062.5 — a TRUE decimal tie
        -153 / 1024 * 1e9,
        1.0000000000000002, 0.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        r.r for r in df.select(F.round(F.col("x"), 0).cast("bigint").alias("r"))
        .collect()
    ]
    got_duck = [
        r[0]
        for v in vals
        for r in duckdb.sql(
            f"SELECT CAST(round(CAST({v!r} AS DOUBLE)) AS BIGINT)"
        ).fetchall()
    ]
    assert got_spark == got_duck, list(zip(vals, got_spark, got_duck))
    # and the python-side emulation used by the PCA Gram worker
    import numpy as np

    def round_half_away(v):
        r = np.round(v)
        frac = np.abs(v) % 1.0
        ties = frac == 0.5
        if ties.any():
            r[ties] = np.sign(v[ties]) * np.ceil(np.abs(v[ties]))
        return r

    got_np = [int(x) for x in round_half_away(np.array(vals))]
    assert got_np == got_duck, list(zip(vals, got_np, got_duck))


def test_round_parity_bulk_seeded_doubles(spark):
    """Bulk extension of the adversarial-tie test: 10k seeded doubles
    across the magnitudes the fixed-point snaps use (1e-6..1e12 scales),
    plus every k+0.5 tie in [-500, 500], rounded by Spark and DuckDB in
    one pass each — any half-mode or binary-rounding divergence fails
    loudly. (One job, not per-example hypothesis — Spark startup per
    example would dominate.)"""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(29)
    vals = list(
        np.concatenate(
            [
                rng.uniform(-1e12, 1e12, 2000),
                rng.uniform(-1e6, 1e6, 2000),
                rng.uniform(-1, 1, 2000) * 1e9,
                rng.standard_normal(2000),
                rng.standard_normal(2000) * 1e-6,
                np.arange(-500, 500) + 0.5,  # exact decimal ties
            ]
        )
    )
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)], "i long, x double")
    got_spark = {
        r.i: r.r
        for r in df.select(
            "i", F.round(F.col("x"), 0).cast("decimal(38,0)").cast("string").alias("r")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, float(v)) for i, v in enumerate(vals)])
    got_duck = {
        i: r for i, r in con.execute(
            "SELECT i, CAST(CAST(round(x) AS HUGEINT) AS VARCHAR) FROM t"
        ).fetchall()
    }
    diffs = {i: (got_spark[i], got_duck[i]) for i in got_spark if got_spark[i] != got_duck[i]}
    assert not diffs, f"{len(diffs)} divergences, e.g. {list(diffs.items())[:5]}"
