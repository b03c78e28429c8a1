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


import hashlib

from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES
from large_csv_etl_spark.queries.quality import QUERIES as DQ_QUERIES


def _ph60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[0:15], 16)


def test_all_null_row_census_replica(spark):
    """Counts match a Python replica of the hash injection over one
    200-key January month (mn = 1)."""
    rows = [
        (k, k, "O", 10.0, dt.datetime(1995, 1, 1 + (k % 28)), "3-MEDIUM")
        for k in range(1, 201)
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = DQ_QUERIES["dq_all_null_row_census"](spark, d).collect()
    assert len(out) == 1
    row = out[0]
    exp_all = exp_any = 0
    for k in range(1, 201):
        hr = _ph60(f"anr:{k}") % 1000
        ha = _ph60(f"ana:{k}") % 100
        hb = _ph60(f"anb:{k}") % 100
        na = hr < 1 or ha < 5
        nb = hr < 1 or hb < 3
        exp_all += na and nb
        exp_any += na or nb
    assert row["n_rows"] == 200
    assert row["n_all_null"] == exp_all
    assert row["n_any_null"] == exp_any
    assert row["worst_month_flag"] == 1
    assert row["all_null_rate"] == pytest.approx(
        round(1e9 * exp_all / 200) / 1e9
    )


def test_numeric_precision_census_buckets(spark):
    """One row per dp bucket on o_totalprice; integer quantity reports
    all-dp0 with finest share 1.0."""
    orows = [
        (1, 1, "O", 1.0, dt.datetime(1995, 1, 1), "3-MEDIUM"),
        (2, 2, "O", 2.5, dt.datetime(1995, 1, 2), "3-MEDIUM"),
        (3, 3, "O", 3.25, dt.datetime(1995, 1, 3), "3-MEDIUM"),
        (4, 4, "O", 4.125, dt.datetime(1995, 1, 4), "3-MEDIUM"),
    ]
    lrows = [(i, 1, float(i), 100.0, 0.05, None) for i in range(1, 4)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, orows, d)
        _lineitem_dir2(spark, lrows, d)
        out = DQ_QUERIES["dq_numeric_precision_census"](spark, d).collect()
    by_c = {r["column_name"]: r for r in out}
    tp = by_c["o_totalprice"]
    assert (tp["n_dp0"], tp["n_dp1"], tp["n_dp2"], tp["n_gt2dp"]) == (
        1, 1, 1, 1,
    )
    assert tp["finest_dp"] == 3 and tp["finest_dp_share"] == pytest.approx(0.25)
    q = by_c["l_quantity"]
    assert q["n_dp0"] == 3 and q["finest_dp"] == 0
    assert q["finest_dp_share"] == pytest.approx(1.0)
    disc = by_c["l_discount"]
    assert disc["n_dp2"] == 3 and disc["finest_dp"] == 2


def _lineitem_dir2(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    df.coalesce(2).write.parquet(f"{d}/lineitem.parquet")


def _events_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(2).write.parquet(f"{d}/events.parquet")


def test_audience_overlap_three_types(spark):
    """A{1,2,3} B{2,3,4} C{9}: jaccard(A,B) = 2/4, zero-overlap pairs
    surface with n_both = 0."""
    rows, eid = [], 0
    for t, users in (("A", [1, 2, 3]), ("B", [2, 3, 4]), ("C", [9])):
        for u in users:
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1, eid), u, t, 1.0, "{}"))
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_type_audience_overlap"](
            spark, d
        ).collect()
    by_p = {(r["type_a"], r["type_b"]): r for r in out}
    assert set(by_p) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = by_p[("A", "B")]
    assert (ab["n_users_a"], ab["n_users_b"], ab["n_both"]) == (3, 3, 2)
    assert ab["audience_jaccard"] == pytest.approx(0.5)
    ac = by_p[("A", "C")]
    assert ac["n_both"] == 0 and ac["audience_jaccard"] == pytest.approx(0.0)


from large_csv_etl_spark.queries.text import QUERIES as TEXT_QUERIES


def _docs_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(2).write.parquet(f"{d}/documents.parquet")


def _doc(doc_id, text, source="s0"):
    return (doc_id, text, "en", source, len(text))


def test_vocab_containment_subset_source(spark):
    """Source B's vocabulary is a strict subset of A's: b_in_a = 1.0
    while a_in_b = |B|/|A| and jaccard would dilute."""
    rows = [
        _doc(1, "alpha beta gamma delta epsilon zeta", "A"),
        _doc(2, "alpha beta gamma", "B"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = TEXT_QUERIES["text_vocab_containment_matrix"](
            spark, d
        ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert (r["n_a"], r["n_b"], r["n_inter"]) == (6, 3, 3)
    assert r["containment_a_in_b"] == pytest.approx(0.5)
    assert r["containment_b_in_a"] == pytest.approx(1.0)
    assert r["containment_max"] == pytest.approx(1.0)


def test_length_quality_corr_linear_and_degenerate(spark):
    """Two docs whose stopword share rises linearly with length give
    corr exactly +1; constant-share docs give NULL (zero variance);
    synthetic punctuation exercises the punct component."""
    rows = [
        _doc(1, "the cat", "L"),          # x=2, stop_fp=5000
        _doc(2, "the a the a", "L"),      # x=4, stop_fp=10000
        _doc(3, "cat dog", "C"),          # constant zero stop share
        _doc(4, "cat dog bird", "C"),
        _doc(5, "w. x.", "P"),            # x=2, punct share 2/5
        _doc(6, "w x y", "P"),            # x=3, punct share 0
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = TEXT_QUERIES["text_length_quality_correlation"](
            spark, d
        ).collect()
    by_s = {r["source"]: r for r in out}
    assert by_s["L"]["corr_stopword_share"] == pytest.approx(1.0)
    assert by_s["C"]["corr_stopword_share"] is None
    assert by_s["P"]["corr_punct_share"] is not None
    assert abs(by_s["P"]["corr_punct_share"]) == pytest.approx(1.0)


def test_gamma_and_somers_shared_counts(spark):
    """Hand-computed 4-row lattice: C=4, D=0, ties_q=1, ties_band=2,
    n0=6 -> gamma=1.0, d_band|q=4/5, d_q|band=4/4."""
    rows = [
        (1, 1, 1.0, 500.0, 0.0, None),
        (2, 1, 1.0, 500.0, 0.0, None),
        (3, 1, 2.0, 1500.0, 0.0, None),
        (4, 1, 3.0, 1500.0, 0.0, None),
    ]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, rows, d)
        g = REL_QUERIES["agg_goodman_kruskal_gamma"](spark, d).collect()[0]
        s = REL_QUERIES["agg_somers_d"](spark, d).collect()[0]
    assert (g["n"], g["conc"], g["disc"]) == (4, 4, 0)
    assert g["gamma"] == pytest.approx(1.0)
    assert (s["ties_q"], s["ties_band"]) == (1, 2)
    assert s["somers_d_band_given_q"] == pytest.approx(0.8)
    assert s["somers_d_q_given_band"] == pytest.approx(1.0)


from large_csv_etl_spark.queries.windows import QUERIES as WIN_QUERIES


def test_awesome_oscillator_ramp_and_warmup(spark):
    """Linear 40-day ramp: AO(40) = mean(36..40) - mean(7..40) = 14.5
    dollars; NULL before row 34; sma5 appears at row 5."""
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(
            spark, _daily_orders([float(i) for i in range(1, 41)]), d
        )
        out = WIN_QUERIES["window_awesome_oscillator"](spark, d).collect()
    seq = sorted(out, key=lambda r: r["day"])
    assert seq[3]["sma5_mid"] is None
    assert seq[4]["sma5_mid"] == pytest.approx(3.0)
    assert seq[32]["awesome_oscillator"] is None
    assert seq[39]["awesome_oscillator"] == pytest.approx(38.0 - 23.5)
    assert seq[9]["mid_cents"] == 1000


def test_ease_of_movement_two_days(spark):
    """Day 2: dm2=200, range=200, 2 orders -> EMV = 200*200/4 = 10000
    cents^2 = 1 usd^2; day 1 NULL; EMA equals the single present
    term."""
    rows = [
        (1, 1, "O", 1.0, dt.datetime(1995, 1, 1), "3-MEDIUM"),
        (2, 2, "O", 3.0, dt.datetime(1995, 1, 2), "3-MEDIUM"),
        (3, 3, "O", 1.0, dt.datetime(1995, 1, 2), "3-MEDIUM"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = WIN_QUERIES["window_ease_of_movement"](spark, d).collect()
    by_day = {r["day"].day: r for r in out}
    assert by_day[1]["emv_usd2"] is None and by_day[1]["emv_ema14"] is None
    assert by_day[2]["emv_usd2"] == 1
    assert by_day[2]["emv_ema14"] == pytest.approx(1.0)


def test_connors_rsi_hand_series(spark):
    """Prices 10,11,12,11,11: streaks 1,2,-1,0; day-4 components
    (rsi3=200/300, rsi2=25, pct=0) and day-5 (50, 25, 100/3) match
    hand computation."""
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(
            spark, _daily_orders([10.0, 11.0, 12.0, 11.0, 11.0]), d
        )
        out = WIN_QUERIES["window_connors_rsi"](spark, d).collect()
    assert len(out) == 2
    d4, d5 = sorted(out, key=lambda r: r["day"])
    assert d4["streak"] == -1 and d5["streak"] == 0
    assert d4["rsi3"] == pytest.approx(100.0 * 200 / 300)
    assert d4["streak_rsi2"] == pytest.approx(25.0)
    assert d4["roc_pct_rank"] == pytest.approx(0.0)
    assert d4["connors_rsi"] == pytest.approx(
        (100.0 * 200 / 300 + 25.0 + 0.0) / 3.0
    )
    assert d5["rsi3"] == pytest.approx(50.0)
    assert d5["streak_rsi2"] == pytest.approx(25.0)
    assert d5["roc_pct_rank"] == pytest.approx(100.0 / 3.0)
    assert d5["connors_rsi"] == pytest.approx(
        (50.0 + 25.0 + 100.0 / 3.0) / 3.0
    )
