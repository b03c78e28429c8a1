"""Semantic checks for the round-15 ROADMAP_r16 build wave (each entry
also carries a three-SF driver-mimic pass before its commit)."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from large_csv_etl_spark.queries.relational import QUERIES as REL_QUERIES


def _orders_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    df.coalesce(2).write.parquet(f"{d}/orders.parquet")


def _daily_orders(prices, year=1995, month=1):
    rows = []
    for i, p in enumerate(prices, 1):
        day = dt.datetime(year, month, 1) + dt.timedelta(days=i - 1)
        rows.append((i, i, "O", p, day, "3-MEDIUM"))
    return rows


def test_bartels_rank_vn_monotone_series(spark):
    """A strictly increasing 10-day series has rank diffs of exactly 1
    (r2 diffs of 2): RVN = 4(n-1) / (n(n^2-1)/3) = 12/(n(n+1))."""
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, _daily_orders([float(i) for i in range(1, 11)]), d)
        row = REL_QUERIES["agg_bartels_rank_vn"](spark, d).collect()[0]
    assert row["n_days"] == 10 and row["n_diffs"] == 9
    assert row["rvn_rank"] == pytest.approx(12.0 / 110.0)
    assert row["rvn_z"] == pytest.approx(
        (12.0 / 110.0 - 2.0) / (4.0 / 10.0) ** 0.5
    )


def test_bartels_rank_vn_constant_series_null(spark):
    """Constant series: zero rank variance -> NULL ratio and z."""
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, _daily_orders([5.0] * 6), d)
        row = REL_QUERIES["agg_bartels_rank_vn"](spark, d).collect()[0]
    assert row["n_days"] == 6
    assert row["rvn_rank"] is None and row["rvn_z"] is None


def test_wallis_moore_alternating_series(spark):
    """1,2,1,2,... over 10 days: 9 deltas, each its own phase -> 9
    total phases, 7 interior; n_eff = 10."""
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(
            spark, _daily_orders([1.0 if i % 2 == 0 else 2.0 for i in range(10)]), d
        )
        row = REL_QUERIES["agg_wallis_moore_phase"](spark, d).collect()[0]
    assert row["n_days"] == 10 and row["n_signs"] == 9
    assert row["n_phases_total"] == 9 and row["n_phases_interior"] == 7
    assert row["expected_phases"] == pytest.approx(13.0 / 3.0)
    assert row["phase_z"] == pytest.approx(
        (7.0 - 13.0 / 3.0) / ((16.0 * 10.0 - 29.0) / 90.0) ** 0.5
    )


def test_wallis_moore_flat_runs_dropped(spark):
    """Zero deltas are dropped before segmentation: 1,1,2,2,3 keeps
    two +1 deltas -> one phase, zero interior, n_eff = 3 -> NULL z."""
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, _daily_orders([1.0, 1.0, 2.0, 2.0, 3.0]), d)
        row = REL_QUERIES["agg_wallis_moore_phase"](spark, d).collect()[0]
    assert row["n_days"] == 5 and row["n_signs"] == 2
    assert row["n_phases_total"] == 1 and row["n_phases_interior"] == 0
    assert row["expected_phases"] is None and row["phase_z"] is None


def _lineitem_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    df.coalesce(2).write.parquet(f"{d}/lineitem.parquet")


def test_blomqvist_beta_perfect_concordance(spark):
    """qty = price rank over 5 rows: the (3,3) row sits on both
    medians and drops; the four quadrant rows split 2/2 into n11/n00
    -> beta = +1."""
    rows = [
        (i, 1, float(i), float(i) * 10.0, 0.0, None) for i in range(1, 6)
    ]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, rows, d)
        row = REL_QUERIES["agg_blomqvist_beta"](spark, d).collect()[0]
    assert row["n_total"] == 5 and row["n_dropped"] == 1
    assert (row["n11"], row["n00"], row["n10"], row["n01"]) == (2, 2, 0, 0)
    assert row["med_qty_cents"] == 300
    assert row["med_price_cents"] == 3000
    assert row["blomqvist_beta"] == pytest.approx(1.0)


def test_blomqvist_beta_perfect_discordance(spark):
    """qty ascending, price descending -> beta = -1."""
    rows = [
        (i, 1, float(i), float(6 - i) * 10.0, 0.0, None)
        for i in range(1, 6)
    ]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, rows, d)
        row = REL_QUERIES["agg_blomqvist_beta"](spark, d).collect()[0]
    assert row["n_dropped"] == 1
    assert (row["n11"], row["n00"], row["n10"], row["n01"]) == (0, 0, 2, 2)
    assert row["blomqvist_beta"] == pytest.approx(-1.0)


def test_winsorized_variance_clips_and_centers(spark):
    """20 one-dollar steps: TYPE-1 p5 rank 1 keeps the minimum, p95
    rank 19 clips the top value down to 1900 cents; ssd and the
    dollar-lattice sample variance match the Python replica."""
    prices = [float(i) for i in range(1, 21)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, _daily_orders(prices), d)
        row = REL_QUERIES["agg_winsorized_variance"](spark, d).collect()[0]
    wc = [min(max(c, 100), 1900) for c in (i * 100 for i in range(1, 21))]
    mu = sum(wc) // 20
    ssd = sum((c - mu) ** 2 for c in wc)
    dol = [c // 100 for c in wc]
    s1, s2, n = sum(dol), sum(x * x for x in dol), 20
    var = (s2 - s1 / n * s1) / (n - 1)
    assert row["n"] == 20
    assert row["lo_cents"] == 100 and row["hi_cents"] == 1900
    assert row["mu_cents"] == mu
    assert int(row["wins_ssd_cents2"]) == ssd
    assert row["wins_var_dollars2"] == pytest.approx(var)
