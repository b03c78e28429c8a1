"""Error-bound tests for the sketch-based aggregates — the correctness
signal the DuckDB oracle can't provide (HLL++/quantile sketches are
engine-specific), pinned against the exact answers instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from large_csv_etl_spark.queries.approx import QUERIES as APPROX_QUERIES
from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES

from .conftest import SF_DIR


def test_approx_distinct_within_5pct(spark):
    row = APPROX_QUERIES["approx_distinct_counts"](spark, SF_DIR).first()
    for col in ("parts", "supps", "orders"):
        approx, exact = row[f"approx_{col}"], row[f"exact_{col}"]
        assert abs(approx - exact) <= 0.05 * exact, (
            f"{col}: approx {approx} vs exact {exact}"
        )


def test_approx_quantiles_bracket_exact(spark):
    approx = {
        r["o_orderpriority"]: r
        for r in APPROX_QUERIES["approx_quantiles"](spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in APPROX_QUERIES["quantiles_exact"](spark, SF_DIR).collect()
    }
    assert approx.keys() == exact.keys()
    # percentile_approx returns an actual element at a rank within the
    # sketch's rank-error of the target — so assert on the element's true
    # rank inside its group, not on its value (adjacent order totals can
    # be far apart in small groups).
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    for prio, a in approx.items():
        grp = orders.filter(F.col("o_orderpriority") == prio)
        n = grp.count()
        below = grp.filter(F.col("o_totalprice") <= a["approx_p50"]).count()
        rank = below / n
        assert 0.5 - 0.02 <= rank <= 0.5 + 0.02 + 1.0 / n, (
            f"{prio}: approx_p50 at rank {rank:.3f}"
        )
        assert exact[prio]["p25"] <= a["approx_p50"] <= exact[prio]["p75"], prio


@pytest.mark.parametrize(
    "sfd", [SF_DIR, "/root/testdata/sf0.1"], ids=["sf_tiny", "sf0.1"]
)
def test_events_dau_approx_within_5pct(spark, sfd):
    """events_dau_approx's published HLL++ bound (rsd 1% -> 5% test
    band) asserted against its exact graded twin
    events_daily_active_users — at the bench-scale sf0.1 fixture as
    well as sf-tiny (VERDICT r6 ask #9), since sketch error only
    becomes meaningful at real cardinalities."""
    approx = {
        r["day_start"]: r["dau_approx"]
        for r in EVENT_QUERIES["events_dau_approx"](spark, sfd).collect()
    }
    exact = {
        r["day_start"]: r["dau"]
        for r in EVENT_QUERIES["events_daily_active_users"](spark, sfd).collect()
    }
    assert approx.keys() == exact.keys()
    for day, est in approx.items():
        assert abs(est - exact[day]) <= max(0.05 * exact[day], 2), day


def test_frequent_tokens_superset_guarantee(spark, sf_dir):
    from pyspark.sql import functions as F

    from large_csv_etl_spark.io import load_table
    from large_csv_etl_spark.queries.approx import frequent_tokens_approx

    got = {r.token for r in frequent_tokens_approx(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    tokens = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    )
    total = tokens.count()
    exact = {
        r.token
        for r in tokens.groupBy("token")
        .count()
        .filter(F.col("count") > 0.05 * total)
        .collect()
    }
    # every truly frequent token must be reported (no false negatives)
    assert exact <= got
