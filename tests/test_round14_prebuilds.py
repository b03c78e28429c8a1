"""Semantic checks for the round-14 wave-1 pre-builds (built in round 13
after the round-13 window shipped; each also carries a three-SF mimic
pass — ROADMAP_r14 wave 1)."""

from __future__ import annotations

import datetime as dt
import hashlib
import tempfile

import pytest

from large_csv_etl_spark.queries.dedup import QUERIES as DEDUP_QUERIES
from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES
from large_csv_etl_spark.queries.quality import QUERIES as DQ_QUERIES
from large_csv_etl_spark.queries.relational import QUERIES as REL_QUERIES
from large_csv_etl_spark.queries.sampling import QUERIES as SAMPLE_QUERIES
from large_csv_etl_spark.queries.similarity import QUERIES as SIM_QUERIES
from large_csv_etl_spark.queries.temporal import QUERIES as TEMP_QUERIES
from large_csv_etl_spark.queries.text import QUERIES as TEXT_QUERIES
from large_csv_etl_spark.queries.windows import QUERIES as WIN_QUERIES


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


def _events_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(2).write.parquet(f"{d}/events.parquet")


def _docs_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(2).write.parquet(f"{d}/documents.parquet")


def _doc(doc_id, text, source="s0"):
    return (doc_id, text, "en", source, len(text))


def test_runs_test_alternating(spark):
    """Dollars 10,30,20,30,10,30,10,20: median 20 drops three days, the
    surviving 10/30 alternation reads 4 runs over n1=n2=2, z =
    1/sqrt(2/3)."""
    rows = _daily_orders([10.0, 30.0, 20.0, 30.0, 10.0, 20.0, 30.0, 10.0])
    # days kept (y != 20): 10,30,30,10,30,10 -> above: 0,1,1,0,1,0
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_runs_test"](spark, d).collect()[0]
    assert out["n1"] == 3 and out["n2"] == 3
    assert out["runs"] == 5
    # mu = 2*9/6 + 1 = 4; var = 18*(18-6)/(36*5) = 1.2; z = 1/sqrt(1.2)
    assert out["runs_z"] == pytest.approx(1.0 / 1.2**0.5, rel=1e-12)


def test_quartile_skewness_symmetric_and_cuts(spark):
    """Values 1..5 cents: TYPE-1 cuts q1=1, med=3, q3=4 ->
    Bowley = (4 + 1 - 6)/3 = -1/3."""
    rows = _daily_orders([0.01, 0.02, 0.03, 0.04, 0.05])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_quartile_skewness"](spark, d).collect()
    r = next(x for x in out if x["stratum"] == "3-MEDIUM")
    assert (r["q1"], r["med"], r["q3"]) == (1, 3, 4)
    assert r["bowley_skew"] == pytest.approx(-1.0 / 3.0, abs=1e-12)


def test_chi2_independent_table(spark):
    """A perfectly balanced 2x2 table has expected = observed in every
    cell: chi2 = 0, df = 1."""
    rows = []
    key = 0
    for s in ("F", "O"):
        for p in ("1-A", "2-B"):
            for _ in range(5):
                key += 1
                rows.append((key, key, s, 10.0, dt.datetime(1995, 1, 1), p))
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_chi2_independence"](spark, d).collect()[0]
    assert out["df"] == 1
    assert out["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_fano_factor_constant_counts(spark):
    """Three orders every day for four days: zero variance, Fano = 0."""
    rows = []
    key = 0
    for day in range(1, 5):
        for _ in range(3):
            key += 1
            rows.append(
                (key, key, "O", 10.0, dt.datetime(1995, 1, day), "3-M")
            )
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_fano_factor_daily"](spark, d).collect()[0]
    assert out["n_days"] == 4
    assert out["mean_daily"] == pytest.approx(3.0)
    assert out["fano_factor"] == pytest.approx(0.0, abs=1e-12)


def test_chande_momentum_monotone(spark):
    """Strictly rising revenue: every move is an up-move, CMO = 100 on
    full frames."""
    rows = _daily_orders([float(i) for i in range(1, 17)])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = sorted(
            WIN_QUERIES["window_chande_momentum"](spark, d).collect(),
            key=lambda r: r["day"],
        )
    full = [r for r in out if r["cmo_14"] is not None]
    assert len(full) == 2  # deltas exist from day 2; frames full at 15, 16
    assert all(r["cmo_14"] == pytest.approx(100.0) for r in full)


def test_detrended_oscillator_constant(spark):
    """A constant series detrends to exactly zero once the displaced
    20-frame is full (day 31 of 31)."""
    rows = _daily_orders([5.0] * 31)
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = sorted(
            WIN_QUERIES["window_detrended_oscillator"](spark, d).collect(),
            key=lambda r: r["day"],
        )
    vals = [r["dpo_20"] for r in out if r["dpo_20"] is not None]
    assert len(vals) == 1  # only day 31's displaced frame is full
    assert vals[0] == pytest.approx(0.0, abs=1e-12)


def test_events_fano_hourly_regular(spark):
    """One event per hour for six hours: zero-variance hourly counts,
    Fano = 0 over the zero-fill-free spine."""
    rows = [
        (h, dt.datetime(2024, 1, 1, h, 0), 1, "view", 1.0, "{}")
        for h in range(6)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_fano_hourly_by_type"](
            spark, d
        ).collect()[0]
    assert out["n_hours"] == 6
    assert out["fano_factor"] == pytest.approx(0.0, abs=1e-12)


def test_events_fano_hourly_zero_fill(spark):
    """Events only in hours 0 and 5 of a 6-hour span: the spine's four
    empty hours are REAL zeros, so the variance is non-zero."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 5, 0), 1, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_fano_hourly_by_type"](
            spark, d
        ).collect()[0]
    assert out["n_hours"] == 6
    assert out["n_events"] == 2
    # counts (1,0,0,0,0,1): var = (6*2 - 4)/36 = 2/9; mean = 1/3 -> F = 2/3
    assert out["fano_factor"] == pytest.approx(2.0 / 3.0, rel=1e-12)


def test_dow_hour_concentration_single_cell(spark):
    """All events in one day-hour cell: Simpson concentration = 1."""
    rows = [
        (i, dt.datetime(2024, 1, 1, 9, i), 1, "click", 1.0, "{}")
        for i in range(4)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_dow_hour_concentration"](
            spark, d
        ).collect()[0]
    assert out["n_cells"] == 1
    assert out["simpson_concentration"] == pytest.approx(1.0, abs=1e-12)


def test_repeat_purchase_interval_buckets(spark):
    """Purchases on days 1, 2 and 4: gaps of 1 and 2 days."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 12, 0), 1, "purchase", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2, 12, 0), 1, "purchase", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 4, 12, 0), 1, "purchase", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 3, 12, 0), 1, "click", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["gap_days_capped"]: r["n_gaps"]
            for r in EVENT_QUERIES["events_repeat_purchase_interval"](
                spark, d
            ).collect()
        }
    assert out == {1: 1, 2: 1}


def test_zipf_rank_frequency_probe(spark):
    """Frequencies 8/4/2/1 at ranks 1/2/3/4: the geometric probe reads
    ranks 1, 2 and 4 with rank*freq 8, 8, 4."""
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    rows = [_doc(1, text)]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            r["rnk"]: r
            for r in TEXT_QUERIES["text_zipf_rank_frequency"](
                spark, d
            ).collect()
        }
    assert set(out) == {1, 2, 4}
    assert out[1]["token"] == "a" and out[1]["rank_x_freq"] == 8
    assert out[2]["token"] == "b" and out[2]["rank_x_freq"] == 8
    assert out[4]["token"] == "d" and out[4]["rank_x_freq"] == 4


def test_token_position_profile_thirds(spark):
    """Tokens 'aa bbbb cc' land one per third with mean lengths
    2 / 4 / 2."""
    rows = [_doc(1, "aa bbbb cc")]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            r["third"]: r
            for r in TEXT_QUERIES["text_token_position_profile"](
                spark, d
            ).collect()
        }
    assert out["first_third"]["mean_len"] == pytest.approx(2.0)
    assert out["middle_third"]["mean_len"] == pytest.approx(4.0)
    assert out["last_third"]["mean_len"] == pytest.approx(2.0)


def test_centroid_distance_matrix_345(spark):
    """Singleton label centroids at (0,0) and (3,4): distance 5."""
    rows = [(1, [0.0, 0.0], 0), (2, [3.0, 4.0], 1)]
    df = None
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
        out = SIM_QUERIES["sim_centroid_distance_matrix"](
            spark, d
        ).collect()
    assert len(out) == 1
    assert out[0]["dist"] == pytest.approx(5.0, rel=1e-9)


def test_crosssource_dup_matrix_counts(spark):
    """'same text' twice in sA and once in sB: 1 within-sA pair and
    2 cross-source pairs; the unique doc contributes nothing."""
    rows = [
        _doc(1, "same text here", "sA"),
        _doc(2, "same text here", "sA"),
        _doc(3, "same text here", "sB"),
        _doc(4, "completely different words", "sB"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            (r["source_a"], r["source_b"]): r["n_dup_pairs"]
            for r in DEDUP_QUERIES["dedup_crosssource_dup_matrix"](
                spark, d
            ).collect()
        }
    assert out == {("sA", "sA"): 1, ("sA", "sB"): 2}


def test_minmax_drift_flags_range_jump(spark):
    """Ranges 100, 100, 1000 cents: the only non-zero jump is month 3's
    +900, which carries the flag."""
    rows = [
        (1, 1, "O", 1.0, dt.datetime(1995, 1, 1), "3-M"),
        (2, 2, "O", 2.0, dt.datetime(1995, 1, 2), "3-M"),
        (3, 3, "O", 1.0, dt.datetime(1995, 2, 1), "3-M"),
        (4, 4, "O", 2.0, dt.datetime(1995, 2, 2), "3-M"),
        (5, 5, "O", 1.0, dt.datetime(1995, 3, 1), "3-M"),
        (6, 6, "O", 11.0, dt.datetime(1995, 3, 2), "3-M"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["month"].month: r
            for r in DQ_QUERIES["dq_minmax_drift_by_month"](
                spark, d
            ).collect()
        }
    assert out[3]["range_cents"] == 1000
    assert [out[m]["largest_jump_flag"] for m in (1, 2, 3)] == [0, 0, 1]


def test_business_day_share_known_calendar(spark):
    """1995-01-02/03 are weekdays, 1995-01-07 a Saturday: share 2/3 —
    the portable dow agrees with Python's weekday()."""
    days = [dt.datetime(1995, 1, 2), dt.datetime(1995, 1, 3),
            dt.datetime(1995, 1, 7)]
    assert [d.weekday() >= 5 for d in days] == [False, False, True]
    rows = [
        (i, i, "O", 1.0, day, "3-M") for i, day in enumerate(days, 1)
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = TEMP_QUERIES["temporal_business_day_share"](
            spark, d
        ).collect()[0]
    assert out["weekend_orders"] == 1
    assert out["business_day_share"] == pytest.approx(2.0 / 3.0, abs=1e-12)
