"""Semantic checks for the round-12 operators (beyond the oracle diff the
mimic already runs): planted fixtures exercising each operator's defining
property, plus structural invariants on the driver fixture where planting
adds nothing."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from large_csv_etl_spark.queries.approx import QUERIES as APPROX_QUERIES
from large_csv_etl_spark.queries.dedup import QUERIES as DEDUP_QUERIES
from large_csv_etl_spark.queries.etl import QUERIES as ETL_QUERIES
from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES
from large_csv_etl_spark.queries.multimodal import QUERIES as MM_QUERIES
from large_csv_etl_spark.queries.quality import QUERIES as DQ_QUERIES
from large_csv_etl_spark.queries.relational import QUERIES as REL_QUERIES
from large_csv_etl_spark.queries.sampling import QUERIES as SAMPLE_QUERIES
from large_csv_etl_spark.queries.similarity import QUERIES as SIM_QUERIES
from large_csv_etl_spark.queries.streamq import QUERIES as STREAM_QUERIES
from large_csv_etl_spark.queries.temporal import QUERIES as TEMP_QUERIES
from large_csv_etl_spark.queries.text import QUERIES as TEXT_QUERIES
from large_csv_etl_spark.queries.windows import QUERIES as WIN_QUERIES

from .conftest import SF_DIR


def _orders_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    df.coalesce(2).write.parquet(f"{d}/orders.parquet")


def _order(key, status, price, day=1, cust=None, month=1, year=1995):
    return (
        key,
        cust if cust is not None else key,
        status,
        price,
        dt.datetime(year, month, day),
        "3-MEDIUM",
    )


def _customer_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows, "c_custkey long, c_acctbal double, c_mktsegment string"
    )
    df.coalesce(2).write.parquet(f"{d}/customer.parquet")


def _events_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(2).write.parquet(f"{d}/events.parquet")


def _event(eid, user, etype, minute, hour=0, day=1, value=1.0):
    return (
        eid,
        dt.datetime(2024, 1, day, hour, minute),
        user,
        etype,
        value,
        "{}",
    )


def _docs_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    df.coalesce(2).write.parquet(f"{d}/documents.parquet")


def _doc(doc_id, text, source="s0"):
    return (doc_id, text, "en", source, len(text))


# --- stats family ----------------------------------------------------------


def test_jonckheere_fully_ordered(spark):
    """F < P < O with complete separation: every cross-group pair is
    concordant with the hypothesized order, so jt_x2 = 2*(2*2 + 2*2 +
    2*2) = 24 and z > 0."""
    rows = [_order(1, "F", 1.0), _order(2, "F", 2.0)]
    rows += [_order(3, "P", 11.0), _order(4, "P", 12.0)]
    rows += [_order(5, "O", 21.0), _order(6, "O", 22.0)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_jonckheere_terpstra"](spark, d).collect()[0]
    assert out["jt_x2"] == 24
    assert out["z"] > 0


def test_friedman_consistent_ordering(spark):
    """Every block ranks F < O < P (averages 1 < 2 < 3): doubled ranks
    2/4/6 per block, R2 sums 10/20/30 over b=5 blocks, chi2 =
    (100+400+900)/(4*5) - 12*5 = 10 — the k=3 maximum."""
    rows = []
    key = 0
    for pri in range(5):
        for price, status in ((1.0, "F"), (2.0, "O"), (3.0, "P")):
            key += 1
            rows.append(
                (
                    key,
                    key,
                    status,
                    price,
                    dt.datetime(1995, 1, 1),
                    f"{pri + 1}-X",
                )
            )
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_friedman_test"](spark, d).collect()[0]
    assert out["b"] == 5
    assert (out["r2_f"], out["r2_o"], out["r2_p"]) == (10, 20, 30)
    assert abs(out["chi2_f"] - 10.0) < 1e-12


def _lineitem_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double, l_discount double"
    )
    df.coalesce(2).write.parquet(f"{d}/lineitem.parquet")


def test_kendall_tau_perfect_concordance(spark):
    """Quantity and price strictly co-monotone with bands far apart:
    zero discordant pairs, zero ties, tau_b = 1."""
    rows = [(float(i), 5000.0 * i, 0.0) for i in range(1, 7)]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, rows, d)
        out = REL_QUERIES["agg_kendall_tau"](spark, d).collect()[0]
    assert out["disc"] == 0
    assert out["conc"] == 15  # C(6,2)
    assert abs(out["tau_b"] - 1.0) < 1e-12


def test_brown_forsythe_equal_spreads(spark):
    """Groups with identical deviation profiles around their own medians:
    between-group deviation variance is 0, so F = 0."""
    rows = [_order(1, "F", 1.0), _order(2, "F", 3.0)]
    rows += [_order(3, "O", 11.0), _order(4, "O", 13.0)]
    rows += [_order(5, "P", 21.0), _order(6, "P", 23.0)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_brown_forsythe"](spark, d).collect()[0]
    assert (out["med_f"], out["med_o"], out["med_p"]) == (100, 1100, 2100)
    assert abs(out["f_stat"]) < 1e-12


def test_mcnemar_discordant_cells(spark):
    """Customers: 1 active both years, 2 only-1995, 1 only-1996, 1 never:
    chi2 = (2-1)^2/3."""
    orders = [
        _order(1, "O", 10.0, cust=1, year=1995),
        _order(2, "O", 10.0, cust=1, year=1996),
        _order(3, "O", 10.0, cust=2, year=1995),
        _order(4, "O", 10.0, cust=3, year=1995),
        _order(5, "O", 10.0, cust=4, year=1996),
    ]
    custs = [(k, 0.0, "BUILDING") for k in range(1, 6)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, orders, d)
        _customer_dir(spark, custs, d)
        out = REL_QUERIES["agg_mcnemar_paired"](spark, d).collect()[0]
    assert (out["n11"], out["n10"], out["n01"], out["n00"]) == (1, 2, 1, 1)
    assert abs(out["mcnemar_chi2"] - 1.0 / 3.0) < 1e-12


def test_theil_sen_linear_series(spark):
    """Perfectly linear daily revenue (+$1/day): every banded pairwise
    slope is exactly 100 cents/day -> slope_fp = 1_000_000."""
    rows = [
        _order(i, "O", 10.0 + i, day=i) for i in range(1, 28)
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_theil_sen_banded"](spark, d).collect()[0]
    assert out["median_slope_fp"] == 1000000
    assert abs(out["slope_cents_per_day"] - 100.0) < 1e-12


def test_gini_mean_difference_three_values(spark):
    """{$1, $2, $3}: sum of pairwise |diffs| = 100+200+100 = 400 cents,
    GMD = 2*400/(3*2) cents."""
    rows = [_order(i, "O", float(i)) for i in (1, 2, 3)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_gini_mean_difference"](spark, d).collect()[0]
    assert out["sum_absdiff"] == 400
    assert abs(out["gmd_cents"] - 400.0 / 3.0) < 1e-12


def test_median_ci_rank_arithmetic(spark):
    """n=9 per group: margin = 1.96*3/2 = 2.94 -> lo rank 1, hi rank 9,
    median rank 5 — the CI spans the full order-statistic range."""
    rows = [_order(i, "F", float(i)) for i in range(1, 10)]
    rows += [_order(i + 9, "O", float(i + 100)) for i in range(1, 10)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_two_sample_median_ci"](spark, d).collect()[0]
    assert out["med_f"] == 500
    assert out["lo_f"] == 100 and out["hi_f"] == 900
    assert out["med_o"] == 10500
    assert out["med_diff"] == 500 - 10500


# --- windows family --------------------------------------------------------


def test_cusum_running_min_identity(spark):
    """Counts [1,1,1,1,11] -> k = 15//5 = 3; P = -2,-4,-6,-8,0;
    S = P - min(0, running min P) = 0,0,0,0,8."""
    rows = []
    key = 0
    for day in range(1, 5):
        key += 1
        rows.append(_order(key, "O", 10.0, day=day))
    for _ in range(11):
        key += 1
        rows.append(_order(key, "O", 10.0, day=5))
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = WIN_QUERIES["agg_cusum_drift"](spark, d).orderBy("day").collect()
    assert [r["cusum"] for r in out] == [0, 0, 0, 0, 8]
    assert all(r["drift_flag"] == 0 for r in out)


def test_aroon_monotone_series(spark):
    """Strictly increasing daily revenue: the 20-day high is always
    today (aroon_up = 100) and the low is 19 positions back
    (aroon_down = 5)."""
    rows = [_order(i, "O", 10.0 + i, day=i) for i in range(1, 26)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = (
            WIN_QUERIES["window_aroon_indicator"](spark, d)
            .orderBy("day")
            .collect()
        )
    full = [r for r in out if r["aroon_up"] is not None]
    assert len(full) == 6  # days 20..25
    assert all(r["aroon_up"] == 100 for r in full)
    assert all(r["aroon_down"] == 5 for r in full)


def test_stochastic_monotone_series(spark):
    """Strictly increasing series: close == 14-day high -> %K = 100 on
    every full frame; %D = 100 once three %K values exist."""
    rows = [_order(i, "O", 10.0 + i, day=i) for i in range(1, 20)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = (
            WIN_QUERIES["window_stochastic_oscillator"](spark, d)
            .orderBy("day")
            .collect()
        )
    ks = [r["pct_k"] for r in out if r["pct_k"] is not None]
    assert ks and all(abs(k - 100.0) < 1e-9 for k in ks)
    ds = [r["pct_d"] for r in out if r["pct_d"] is not None]
    assert ds and all(abs(x - 100.0) < 1e-9 for x in ds)


def test_keltner_flat_series(spark):
    """Constant daily revenue: EMA = the constant, every true range is
    0, so upper == center == lower once ATR warms up."""
    rows = [_order(i, "O", 50.0, day=i) for i in range(1, 16)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = (
            WIN_QUERIES["window_keltner_channel"](spark, d)
            .orderBy("day")
            .collect()
        )
    last = out[-1]
    assert abs(last["center_cents"] - 5000.0) < 1e-9
    assert abs(last["upper_cents"] - 5000.0) < 1e-9
    assert abs(last["lower_cents"] - 5000.0) < 1e-9


def test_streak_runs_alternating(spark):
    """Alternating up/down moves maximize the run count: 4 runs of
    length 1, n1 = n2 = 2, z = (4 - 3)/sqrt(2/3)."""
    prices = [10.0, 20.0, 10.0, 20.0, 10.0]
    rows = [_order(i + 1, "O", p, day=i + 1) for i, p in enumerate(prices)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = WIN_QUERIES["window_streak_runs"](spark, d).collect()[0]
    assert out["n_runs"] == 4
    assert out["longest_up"] == 1 and out["longest_down"] == 1
    assert (out["n1"], out["n2"]) == (2, 2)
    import math

    expected = (4.0 - 3.0) / math.sqrt(
        2.0 * 2.0 * 2.0 * (8.0 - 4.0) / (16.0 * 3.0)
    )
    assert abs(out["runs_z"] - expected) < 1e-12


def test_underwater_episodes(spark):
    """Series 10,5,7,12,3 ($): two underwater episodes — days 2-3
    (depth $5) and day 5 (depth $9)."""
    prices = [10.0, 5.0, 7.0, 12.0, 3.0]
    rows = [_order(i + 1, "O", p, day=i + 1) for i, p in enumerate(prices)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = (
            WIN_QUERIES["window_underwater_duration"](spark, d)
            .orderBy("start_day")
            .collect()
        )
    assert len(out) == 2
    assert out[0]["duration_days"] == 2 and out[0]["depth_cents"] == 500
    assert out[1]["duration_days"] == 1 and out[1]["depth_cents"] == 900


def test_seasonal_decompose_pure_weekday_signal(spark):
    """Revenue a pure function of day-of-week over two full weeks:
    the weekday means absorb ALL variance -> seasonal_strength = 1."""
    rows = []
    for i in range(14):
        day = dt.datetime(1995, 1, 2) + dt.timedelta(days=i)  # Monday start
        dow = i % 7
        rows.append(
            (i + 1, i + 1, "O", 100.0 * (dow + 1), day, "3-MEDIUM")
        )
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = WIN_QUERIES["window_seasonal_decompose_daily"](
            spark, d
        ).collect()[0]
    assert out["n_all"] == 14
    assert abs(out["seasonal_strength"] - 1.0) < 1e-12
    assert abs(out["mean_dow0"] - 100.0) < 1e-12  # Monday


def test_percentile_rank_monotone(spark):
    """Strictly increasing series: every day is the max of its trailing
    frame -> pct_rank = 1.0 on every row."""
    rows = [_order(i, "O", 10.0 + i, day=i) for i in range(1, 12)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = WIN_QUERIES["window_price_percentile_rank"](spark, d).collect()
    assert all(abs(r["pct_rank"] - 1.0) < 1e-12 for r in out)
    assert {r["frame_n"] for r in out} == set(range(1, 12))


# --- events family ---------------------------------------------------------


def test_funnel_strict_order_depths(spark):
    """u1 completes in order (depth 4), u2 signup only (1), u3 clicks
    before viewing (stops at 1), u4 never signs up (0)."""
    rows = [
        _event(1, 1, "signup", 0),
        _event(2, 1, "view", 10),
        _event(3, 1, "click", 20),
        _event(4, 1, "purchase", 30),
        _event(5, 2, "signup", 0),
        _event(6, 3, "signup", 0),
        _event(7, 3, "click", 5),
        _event(8, 3, "view", 10),
        _event(9, 4, "view", 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["step_depth"]: r["n_users"]
            for r in EVENT_QUERIES["events_funnel_strict_order"](
                spark, d
            ).collect()
        }
    # u3's first view (min ts) precedes its click? view at minute 10,
    # click at 5: first-times click=5 < view=10 -> view > signup ok,
    # click(5) NOT > view(10) -> depth 2.
    assert out == {4: 1, 1: 1, 2: 1, 0: 1}


def test_transition_gini_deterministic_successor(spark):
    """A user alternating A->B->A->B: from 'click' the next type is
    always 'view' (gini 0); from 'view' always 'click' (gini 0)."""
    rows = []
    for i in range(6):
        rows.append(
            _event(i + 1, 1, "click" if i % 2 == 0 else "view", i)
        )
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["event_type"]: r
            for r in EVENT_QUERIES["events_type_transition_gini"](
                spark, d
            ).collect()
        }
    assert abs(out["click"]["next_gini"]) < 1e-12
    assert abs(out["view"]["next_gini"]) < 1e-12


def test_hourly_correlation_perfect(spark):
    """Click and view counts equal in every hour -> Pearson r = 1."""
    rows = []
    eid = 0
    for hour, n in ((0, 1), (1, 2), (2, 3)):
        for i in range(n):
            eid += 1
            rows.append(_event(eid, 1, "click", i, hour=hour))
            eid += 1
            rows.append(_event(eid, 2, "view", i + 30, hour=hour))
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_hourly_type_correlation"](
            spark, d
        ).collect()[0]
    assert out["n"] == 3
    assert abs(out["pearson_r"] - 1.0) < 1e-12


def test_cohort_triangle_two_cohorts(spark):
    """u1 first-active week 1 and active again week 2; u2 first-active
    week 2: cohort 1 has ages {0, 1}, cohort 2 has age {0}."""
    rows = [
        _event(1, 1, "view", 0, day=1),
        _event(2, 1, "view", 0, day=10),
        _event(3, 2, "view", 0, day=10),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_cohort_week_retention_triangle"](
            spark, d
        ).collect()
    cells = {
        (r["cohort_week_start"].isoformat(), r["week_age"]): (
            r["n_users"],
            r["cohort_size"],
            r["retention"],
        )
        for r in out
    }
    assert len(cells) == 3
    assert all(v[2] <= 1.0 for v in cells.values())
    ages0 = [v for (cw, age), v in cells.items() if age == 0]
    assert all(n == size for n, size, _ in ages0)


def test_peak_concentration_single_block(spark):
    """All of a day's events inside hours 0-3 -> peak block 0 with
    share 1.0."""
    rows = [_event(i, 1, "view", i, hour=i % 4) for i in range(1, 8)]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_peak_concentration"](spark, d).collect()
    assert len(out) == 1
    assert out[0]["peak_block"] == 0
    assert abs(out[0]["peak_share"] - 1.0) < 1e-12


def test_value_by_depth_two_sessions(spark):
    """Sessions [10, 20] and [30] (gap > 30 min splits): depth 1 mean
    = (10+30)/2, depth 2 mean = 20."""
    rows = [
        _event(1, 1, "view", 0, value=10.0),
        _event(2, 1, "view", 10, value=20.0),
        _event(3, 1, "view", 0, hour=5, value=30.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["depth"]: r
            for r in EVENT_QUERIES["events_value_by_depth"](
                spark, d
            ).collect()
        }
    assert out[1]["n_events"] == 2
    assert abs(out[1]["mean_value"] - 20.0) < 1e-12
    assert abs(out[2]["mean_value"] - 20.0) < 1e-12


# --- text family -----------------------------------------------------------


def test_vocab_coverage_curve_zipf_toy(spark):
    """Corpus 'a a a b b c': top-1 covers 3/6, top-2 covers 5/6, and
    k >= 4 covers everything."""
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, [_doc(1, "a a a b b c")], d)
        out = {
            r["k"]: r["coverage"]
            for r in TEXT_QUERIES["text_vocab_coverage_curve"](
                spark, d
            ).collect()
        }
    assert abs(out[1] - 0.5) < 1e-12
    assert abs(out[2] - 5.0 / 6.0) < 1e-12
    assert all(abs(out[k] - 1.0) < 1e-12 for k in (4, 8, 16, 32))


def test_mattr_tumbling_windows(spark):
    """150 identical tokens: window 0 has TTR 1/100, the 50-token tail
    has TTR 1/50 -> mean 0.015."""
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, [_doc(1, " ".join(["x"] * 150))], d)
        out = TEXT_QUERIES["text_mattr_windowed_ttr"](spark, d).collect()[0]
    assert out["n_windows"] == 2
    assert abs(out["mean_ttr"] - 0.015) < 1e-9


def test_stopword_gate_band_edges(spark):
    """3/4 stopwords (0.75 > 0.7) flags out of band; 1/10 (exactly the
    0.1 floor) stays in band — integer cross-multiplication, no float
    boundary fuzz."""
    docs = [
        _doc(1, "the the the word"),
        _doc(2, "the w1 w2 w3 w4 w5 w6 w7 w8 w9"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        out = {
            r["doc_id"]: r["in_band"]
            for r in TEXT_QUERIES["text_stopword_density_gate"](
                spark, d
            ).collect()
        }
    assert out == {1: 0, 2: 1}


def test_casing_profile_structural(spark):
    """Hash-synthesized casing surface on the driver fixture: shares are
    well-formed and at least one injected class is non-zero overall."""
    out = TEXT_QUERIES["text_casing_numeral_profile"](spark, SF_DIR).collect()
    assert out
    for r in out:
        for c in ("upper_share", "title_share", "numeral_share"):
            assert r[c] is None or 0.0 <= r[c] <= 1.0
    assert sum(r["upper_tokens"] + r["title_tokens"] for r in out) > 0


def test_duplicate_sentence_cross_doc(spark):
    """Two docs sharing their first 5-token sentence: one sentence hash
    with 2 occurrences spanning 2 docs."""
    shared = "t1 t2 t3 t4 t5"
    docs = [
        _doc(1, f"{shared} a1 a2 a3 a4 a5"),
        _doc(2, f"{shared} b1 b2 b3 b4 b5"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        out = {
            r["occurrences"]: r
            for r in TEXT_QUERIES["text_duplicate_sentence_census"](
                spark, d
            ).collect()
        }
    assert out[2]["n_sentences"] == 1
    assert out[2]["n_cross_doc_sentences"] == 1
    assert out[1]["n_sentences"] == 2  # the two distinct tails


def test_positional_bias_head_anchored(spark):
    """A trigram planted at the head of every doc, with distinct tails:
    head count = total, bias_z = sqrt(total)."""
    docs = [
        _doc(i, f"h h h f{i}a f{i}b f{i}c f{i}d f{i}e f{i}f")
        for i in range(1, 6)
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        rows = TEXT_QUERIES["text_ngram_positional_bias"](spark, d).collect()
    top = {r["trigram"]: r for r in rows}
    import math

    r = top["h h h"]
    assert r["tail_cnt"] == 0 and r["head_cnt"] == 5
    assert abs(r["bias_z"] - math.sqrt(5.0)) < 1e-12


# --- dedup / similarity ----------------------------------------------------


def test_bag_jaccard_sees_repetition(spark):
    """Doc 1 repeats doc 2's content twice over: trigram multiset
    intersection = min counts = 2, union = 6 + 2 - 2, so bag-Jaccard
    = 1/3 even though every one of doc 2's shingles appears in doc 1."""
    docs = [
        _doc(1, "p q r s p q r s"),  # pqr x2, qrs x2, rsp, spq -> n=6
        _doc(2, "p q r s"),  # pqr, qrs -> n=2
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        rows = DEDUP_QUERIES["dedup_bag_jaccard"](spark, d).collect()
    pair = [r for r in rows if {r["doc_a"], r["doc_b"]} == {1, 2}]
    assert pair and pair[0]["n_shared"] == 2
    assert abs(pair[0]["bag_jaccard"] - 1.0 / 3.0) < 1e-12


def test_sentence_containment_subset(spark):
    """Doc A's sentences all appear in doc B -> containment_a_in_b = 1."""
    s1 = "a1 a2 a3 a4 a5"
    s2 = "b1 b2 b3 b4 b5"
    docs = [_doc(1, s1), _doc(2, f"{s1} {s2}")]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        rows = DEDUP_QUERIES["dedup_sentence_containment"](spark, d).collect()
    pair = [r for r in rows if {r["doc_a"], r["doc_b"]} == {1, 2}][0]
    assert abs(pair["containment_a_in_b"] - 1.0) < 1e-12
    assert abs(pair["containment_b_in_a"] - 0.5) < 1e-12


def test_minhash_calibration_curve_bins(spark):
    """Structural on the driver fixture: bins in [0, 9], means in
    [0, 1], and every pair lands in exactly one bin."""
    rows = DEDUP_QUERIES["dedup_minhash_calibration_curve"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["exact_bin"] <= 9
        assert 0.0 <= r["mean_est_jaccard"] <= 1.0 + 1e-9
        assert 0.0 <= r["mean_exact_jaccard"] <= 1.0 + 1e-9


def _emb_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(2).write.parquet(f"{d}/embeddings.parquet")


def test_label_margin_separated_labels(spark):
    """Same-label vectors identical, cross-label orthogonal: every
    intra cosine is 1, every inter cosine is 0, margin = 1."""
    e0 = [1.0] + [0.0] * 63
    e1 = [0.0, 1.0] + [0.0] * 62
    rows = [
        (i, e0 if i % 2 == 0 else e1, i % 2) for i in range(60)
    ]
    with tempfile.TemporaryDirectory() as d:
        _emb_dir(spark, rows, d)
        out = SIM_QUERIES["sim_intra_inter_label_margin"](spark, d).collect()
    for r in out:
        if r["margin"] is not None:
            assert abs(r["margin"] - 1.0) < 1e-9


def test_covariance_screen_planted_pair(spark):
    """Dims 0 and 1 perfectly co-vary, everything else is constant:
    the top pair must be (0, 1) with positive covariance."""
    rows = []
    for i in range(40):
        v = [0.0] * 64
        v[0] = float(i) / 10.0
        v[1] = float(i) / 10.0
        v[2] = 0.5
        rows.append((i, v, 0))
    with tempfile.TemporaryDirectory() as d:
        _emb_dir(spark, rows, d)
        out = SIM_QUERIES["sim_dim_covariance_screen"](spark, d).collect()
    top = out[0] if out[0]["cov"] == max(r["cov"] for r in out) else None
    pairs = {(r["dim_i"], r["dim_j"]): r["cov"] for r in out}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] == max(pairs.values())
    assert pairs[(0, 1)] > 0


def test_rank_displacement_structural(spark):
    """Driver fixture: 50 candidates, exact ranks are 1..50, quantized
    ranks positive, displacement = |difference|."""
    rows = SIM_QUERIES["sim_rank_displacement"](spark, SF_DIR).collect()
    assert len(rows) == 50
    assert sorted(r["exact_rank"] for r in rows) == list(range(1, 51))
    for r in rows:
        assert r["quant_rank"] >= 1
        assert r["displacement"] == abs(r["exact_rank"] - r["quant_rank"])


# --- etl / quality / sampling ----------------------------------------------


def test_scd6_row_shapes(spark):
    """Key 7 changes (two rows), key 97 deletes (one row, NULL current),
    key 1 unchanged (one current row)."""
    custs = [(1, 10.0, "B"), (7, 20.0, "B"), (97, 30.0, "B")]
    with tempfile.TemporaryDirectory() as d:
        _customer_dir(spark, custs, d)
        rows = ETL_QUERIES["etl_scd6_hybrid"](spark, d).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["custkey"], []).append(r)
    assert len(by_key[1]) == 1 and by_key[1][0]["is_current"]
    assert by_key[1][0]["previous_acctbal"] is None
    assert len(by_key[7]) == 2
    cur7 = [r for r in by_key[7] if r["version"] == 2][0]
    assert cur7["row_acctbal"] == 120.0 and cur7["previous_acctbal"] == 20.0
    assert len(by_key[97]) == 1
    assert by_key[97][0]["current_acctbal"] is None
    assert by_key[97][0]["change_status"] == "deleted"


def test_currency_asof_bounds(spark):
    """Normalized totals stay inside the [0.9, 1.1) rate envelope and
    every month resolves at least one rate."""
    rows = ETL_QUERIES["etl_currency_normalize_asof"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        if r["sum_cents"] > 0:
            ratio = r["sum_normalized_cents"] / r["sum_cents"]
            assert 0.89 <= ratio <= 1.11
        assert r["n_rates_used"] >= 1


def test_bom_csv_header_clean(spark):
    out = ETL_QUERIES["etl_bom_encoding_csv"](spark, SF_DIR).collect()
    assert len(out) == 4
    first = [r for r in out if r["id"] == 1][0]
    assert first["name"] == "alpha" and first["amount_cents"] == 1050
    assert all("\r" not in r["name"] for r in out)


def test_multichar_delimiter_rows(spark):
    out = ETL_QUERIES["etl_multichar_delimiter"](spark, SF_DIR).collect()
    assert len(out) == 4
    names = {r["name"] for r in out}
    assert "beta and co" in names


def test_null_rate_trend_control_column(spark):
    """Column B's injected rate is a flat 5% of hash space: observed
    monthly rates stay near it; exactly the max jump rows are flagged."""
    rows = DQ_QUERIES["dq_null_rate_trend"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["null_rate_a"] <= 1.0
        assert 0.0 <= r["null_rate_b"] <= 0.5  # 5% mean, small-month variance at sf0.001
    assert sum(r["largest_jump_flag"] for r in rows) >= 1


def test_benford_second_digit_shares(spark):
    rows = DQ_QUERIES["dq_benford_second_digit"](spark, SF_DIR).collect()
    assert sorted(r["digit"] for r in rows) == list(range(10))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["ref_share"] for r in rows) - 1.0) < 1e-6
    # second-digit Benford is close to uniform but strictly decreasing
    ref = {r["digit"]: r["ref_share"] for r in rows}
    assert all(ref[d] > ref[d + 1] for d in range(9))


def test_psi_tvd_identical_halves(spark):
    """Identical price sets in both calendar halves -> every decile bin
    holds the same shares -> TVD = 0."""
    rows = []
    key = 0
    for year in (1995, 1999):
        for i in range(1, 21):
            key += 1
            rows.append(_order(key, "O", float(i), year=year))
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = DQ_QUERIES["dq_psi_tvd_stability"](spark, d).collect()
    assert out
    assert all(abs(r["tvd"]) < 1e-12 for r in out)
    assert all(r["n_first"] == r["n_second"] for r in out)


def test_quota_priority_fill_and_spill(spark):
    """45 MACHINERY customers against a quota of 40: 40 sampled,
    spillover 5; 10 BUILDING against 250: all 10 taken, fill 4%."""
    custs = [(i, 0.0, "MACHINERY") for i in range(1, 46)]
    custs += [(100 + i, 0.0, "BUILDING") for i in range(1, 11)]
    with tempfile.TemporaryDirectory() as d:
        _customer_dir(spark, custs, d)
        out = {
            r["segment"]: r
            for r in SAMPLE_QUERIES["sample_quota_priority"](
                spark, d
            ).collect()
        }
    m = out["MACHINERY"]
    assert (m["n_available"], m["n_sampled"], m["spillover"]) == (45, 40, 5)
    assert abs(m["fill_rate"] - 1.0) < 1e-12
    b = out["BUILDING"]
    assert (b["n_sampled"], b["spillover"]) == (10, 0)
    assert abs(b["fill_rate"] - 10.0 / 250.0) < 1e-12


# --- temporal / streaming / graph / multimodal ------------------------------


def test_overlap_duration_matrix_planted(spark):
    """F spans Jan 1-10, O spans Jan 5-20, P spans Feb: F/O overlap 6
    inclusive days, anything/P overlaps 0."""
    rows = [
        _order(1, "F", 1.0, day=1),
        _order(2, "F", 1.0, day=10),
        _order(3, "O", 1.0, day=5),
        _order(4, "O", 1.0, day=20),
        _order(5, "P", 1.0, day=1, month=2),
        _order(6, "P", 1.0, day=5, month=2),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            (r["status_a"], r["status_b"]): r
            for r in TEMP_QUERIES["temporal_overlap_duration_matrix"](
                spark, d
            ).collect()
        }
    assert out[("F", "O")]["overlap_days"] == 6
    assert out[("F", "P")]["overlap_days"] == 0
    assert out[("O", "P")]["overlap_days"] == 0
    assert out[("F", "O")]["span_a_days"] == 10


def test_update_mode_topk_matches_batch(spark):
    """The drained update-mode capture recovers exactly the batch top-10
    (count desc, user_id ties)."""
    rows = []
    eid = 0
    for user in range(1, 15):
        for _ in range(user):  # user u has u events
            eid += 1
            rows.append(_event(eid, user, "view", eid % 60, hour=eid % 24))
    with tempfile.TemporaryDirectory() as d:
        # the stream's pathGlobFilter expects the driver layout: a single
        # FILE named events.parquet, not a directory of part files
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, f"{d}/events.parquet")
        out = (
            STREAM_QUERIES["streaming_update_mode_topk"](spark, d)
            .orderBy("rnk")
            .collect()
        )
    assert [r["user_id"] for r in out] == list(range(14, 4, -1))
    assert [r["n_events"] for r in out] == list(range(14, 4, -1))


def test_bipartite_projection_weights(spark):
    """Two customers both buy parts {1, 2}; part 3 bought once: edge
    (1,2) has weight 2 and no weight-1 edge survives."""
    li = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3)]
    orders = [(1, 100), (2, 200)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            li, "l_orderkey long, l_partkey long"
        ).write.parquet(f"{d}/lineitem.parquet")
        spark.createDataFrame(
            orders, "o_orderkey long, o_custkey long"
        ).write.parquet(f"{d}/orders.parquet")
        out = TEXT_QUERIES["graph_bipartite_projection"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"], r["shared_customers"]) == (1, 2, 2)


def test_letterbox_geometry(spark):
    """Pads split floor-half and reconstruct the 224 square; the scaled
    content never exceeds the target box."""
    rows = MM_QUERIES["multimodal_letterbox_plan"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["out_w"] <= 224 and 1 <= r["out_h"] <= 224
        assert r["pad_left"] + r["pad_right"] == 224 - r["out_w"]
        assert r["pad_top"] + r["pad_bottom"] == 224 - r["out_h"]
        assert r["pad_left"] <= r["pad_right"] <= r["pad_left"] + 1
        assert 0.0 < r["content_share"] <= 1.0
        # aspect-fit: at least one axis nearly fills the box
        assert max(r["out_w"], r["out_h"]) >= 223


def test_reservoir_twin_plan_is_top_k(spark):
    """ADVICE r11 #2 regression pin: the sample side must compile to
    TakeOrderedAndProject (per-partition heaps), not a single-partition
    row_number sort over the full table."""
    df = APPROX_QUERIES["approx_reservoir_quantile_twin"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --- round-13 pre-builds (landed in round 12) -------------------------------


def test_cochran_q_identity_fixture(spark):
    """3 customers: always-active, 1995-only, never: C = (2,1,1),
    T = 4, R = (3,1,0), Q = 2*(3*6 - 16)/(12 - 10) = 2."""
    orders = [
        _order(1, "O", 10.0, cust=1, year=1995),
        _order(2, "O", 10.0, cust=1, year=1996),
        _order(3, "O", 10.0, cust=1, year=1997),
        _order(4, "O", 10.0, cust=2, year=1995),
    ]
    custs = [(1, 0.0, "B"), (2, 0.0, "B"), (3, 0.0, "B")]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, orders, d)
        _customer_dir(spark, custs, d)
        out = REL_QUERIES["agg_cochran_q"](spark, d).collect()[0]
    assert (out["c95"], out["c96"], out["c97"], out["t"], out["sr2"]) == (
        2, 1, 1, 4, 10,
    )
    assert abs(out["cochran_q"] - 2.0) < 1e-12


def test_page_trend_perfect_order(spark):
    """Every block ranks F < O < P: R2 = (10, 20, 30), l_x2 = 1*10 +
    2*20 + 3*30 = 140, z = (140 - 120)/(2*sqrt(10)) — the maximum for
    b = 5 blocks."""
    rows = []
    key = 0
    for pri in range(5):
        for price, status in ((1.0, "F"), (2.0, "O"), (3.0, "P")):
            key += 1
            rows.append(
                (key, key, status, price, dt.datetime(1995, 1, 1),
                 f"{pri + 1}-X")
            )
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_page_trend_test"](spark, d).collect()[0]
    import math

    assert out["l_x2"] == 140
    assert abs(out["page_z"] - 20.0 / (2.0 * math.sqrt(10.0))) < 1e-12


def test_cliffs_delta_full_separation(spark):
    """All F below all O: #(F>O) = 0, #(F<O) = n_f*n_o, delta = -1."""
    rows = [_order(i, "F", float(i)) for i in (1, 2, 3)]
    rows += [_order(i + 3, "O", float(i + 100)) for i in (1, 2, 3)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_cliffs_delta"](spark, d).collect()[0]
    assert (out["gt"], out["lt"], out["ties"]) == (0, 9, 0)
    assert abs(out["cliffs_delta"] + 1.0) < 1e-12


def test_sign_test_counts(spark):
    """Pairs: u1 up, u2 down, u3 tie, u4 not paired (1995 only):
    n_pairs=3, z = (1-1)/sqrt(2) = 0."""
    orders = [
        _order(1, "O", 10.0, cust=1, year=1995),
        _order(2, "O", 20.0, cust=1, year=1996),
        _order(3, "O", 20.0, cust=2, year=1995),
        _order(4, "O", 10.0, cust=2, year=1996),
        _order(5, "O", 15.0, cust=3, year=1995),
        _order(6, "O", 15.0, cust=3, year=1996),
        _order(7, "O", 15.0, cust=4, year=1995),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, orders, d)
        out = REL_QUERIES["agg_sign_test"](spark, d).collect()[0]
    assert (out["n_pairs"], out["n_plus"], out["n_minus"], out["n_zero"]) \
        == (3, 1, 1, 1)
    assert abs(out["sign_z"]) < 1e-12


def test_von_neumann_alternating_vs_trending(spark):
    """A perfectly alternating series maximizes successive differences:
    VN ratio lands above 2; a monotone ramp lands below 2."""
    alt = [100.0 if i % 2 == 0 else 200.0 for i in range(20)]
    ramp = [100.0 + 10.0 * i for i in range(20)]
    results = {}
    for name, series in (("alt", alt), ("ramp", ramp)):
        rows = [
            _order(i + 1, "O", p, day=i + 1) for i, p in enumerate(series)
        ]
        with tempfile.TemporaryDirectory() as d:
            _orders_dir(spark, rows, d)
            results[name] = WIN_QUERIES["agg_von_neumann_ratio"](
                spark, d
            ).collect()[0]["von_neumann_ratio"]
    assert results["alt"] > 2.0
    assert results["ramp"] < 2.0


def test_autocorr_weekly_cycle(spark):
    """A pure 7-day-period series: lag-7 autocorrelation is exactly 1,
    lag-1 is below it."""
    rows = [
        _order(i + 1, "O", 100.0 * ((i % 7) + 1), day=i + 1)
        for i in range(28)
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["lag"]: r["autocorr"]
            for r in WIN_QUERIES["agg_autocorr_lag_k"](spark, d).collect()
        }
    assert abs(out[7] - 1.0) < 1e-9
    assert out[1] < out[7]


def test_roc_momentum_linear(spark):
    """+$1/day linear series: momentum at lag 12 is exactly 1200 cents
    on every warm row."""
    rows = [_order(i, "O", 10.0 + i, day=i) for i in range(1, 20)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = WIN_QUERIES["window_roc_momentum"](spark, d).collect()
    warm = [r for r in out if r["momentum_cents"] is not None]
    assert warm and all(r["momentum_cents"] == 1200 for r in warm)
    assert all(r["roc_12"] > 0 for r in warm)


def test_new_vs_returning_split(spark):
    """u1 active day 1 and 2; u2 active day 2 only: day 1 = 1 new,
    day 2 = 1 new + 1 returning."""
    rows = [
        _event(1, 1, "view", 0, day=1),
        _event(2, 1, "view", 0, day=2),
        _event(3, 2, "view", 0, day=2),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["day"].isoformat(): r
            for r in EVENT_QUERIES["events_new_vs_returning"](
                spark, d
            ).collect()
        }
    assert out["2024-01-01"]["new_users"] == 1
    assert out["2024-01-01"]["returning_users"] == 0
    assert out["2024-01-02"]["new_users"] == 1
    assert out["2024-01-02"]["returning_users"] == 1


def test_word_length_profile_buckets(spark):
    """Tokens of lengths 1, 5 and 25 land in buckets 1, 5 and 20 (the
    20+ cap), with shares summing to 1 per source."""
    docs = [_doc(1, "a hello " + "x" * 25)]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        out = {
            r["len_bucket"]: r
            for r in TEXT_QUERIES["text_word_length_profile"](
                spark, d
            ).collect()
        }
    assert set(out) == {1, 5, 20}
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-12


def test_shingle_df_spectrum_mass(spark):
    """Three docs sharing one trigram: that shingle has df=3; unique
    shingles have df=1; posting mass = df * n_shingles per row."""
    shared = "c1 c2 c3"
    docs = [
        _doc(1, f"{shared} a1 a2"),
        _doc(2, f"{shared} b1 b2"),
        _doc(3, f"{shared} d1 d2"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        out = {
            r["doc_freq"]: r
            for r in DEDUP_QUERIES["dedup_shingle_df_spectrum"](
                spark, d
            ).collect()
        }
    assert out[3]["n_shingles"] == 1 and out[3]["n_postings"] == 3
    assert out[1]["n_shingles"] > 0
    assert all(r["within_cap"] == 1 for r in out.values())


def test_flat_day_rle_islands(spark):
    """Counts 2,2,5,5,5,9: flat days at positions 2 (2=2), 4 and 5
    (5=5): one run of 1 and one run of 2."""
    rows = []
    key = 0
    counts = [2, 2, 5, 5, 5, 9]
    for day, n in enumerate(counts, start=1):
        for _ in range(n):
            key += 1
            rows.append(_order(key, "O", 10.0, day=day))
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["run_len"]: r["n_runs"]
            for r in WIN_QUERIES["window_flat_day_rle"](spark, d).collect()
        }
    assert out == {1: 1, 2: 1}


def test_weekend_lift_planted(spark):
    """10 events/day on 2 weekend days vs 5/day on 5 weekdays: lift = 2
    exactly. 2024-01-06/07 are Sat/Sun; 08-12 are Mon-Fri."""
    rows = []
    eid = 0
    for day in (6, 7):
        for i in range(10):
            eid += 1
            rows.append(_event(eid, 1, "view", i, day=day))
    for day in range(8, 13):
        for i in range(5):
            eid += 1
            rows.append(_event(eid, 1, "view", i, day=day))
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_weekend_lift"](spark, d).collect()[0]
    assert (out["we_events"], out["wd_events"]) == (20, 25)
    assert (out["we_days"], out["wd_days"]) == (2, 5)
    assert abs(out["weekend_lift"] - 2.0) < 1e-12


def test_time_to_first_purchase_buckets(spark):
    """u1 converts in 30 min (bucket 0), u2 in 25 hours (bucket 25),
    u3 purchases BEFORE signing up (excluded), u4 never converts."""
    rows = [
        _event(1, 1, "signup", 0, hour=0),
        _event(2, 1, "purchase", 30, hour=0),
        _event(3, 2, "signup", 0, hour=0, day=1),
        _event(4, 2, "purchase", 0, hour=1, day=2),
        _event(5, 3, "purchase", 0, hour=0),
        _event(6, 3, "signup", 0, hour=1),
        _event(7, 4, "signup", 0, hour=0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["hour_bucket"]: r
            for r in EVENT_QUERIES["events_time_to_first_purchase"](
                spark, d
            ).collect()
        }
    assert set(out) == {0, 25}
    assert out[0]["n_users"] == 1 and out[25]["n_users"] == 1
    assert abs(out[0]["share"] - 0.5) < 1e-12
