"""Semantic checks for the round-15 wave-1 pre-builds (built in round 14
after the round-14 window shipped; each also carries a three-SF mimic
pass — ROADMAP_r15 wave 1)."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES
from large_csv_etl_spark.queries.multimodal import QUERIES as MM_QUERIES
from large_csv_etl_spark.queries.quality import QUERIES as DQ_QUERIES
from large_csv_etl_spark.queries.relational import QUERIES as REL_QUERIES
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


def test_cqv_five_point_stratum(spark):
    """Cents 100..500 on one stratum: TYPE-1 q1 = 100 (rank (5+1)//4 =
    1), q3 = 400 (rank min(5, 18//4) = 4) -> cqv = 300/500 = 0.6."""
    rows = _daily_orders([1.0, 2.0, 3.0, 4.0, 5.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_coefficient_quartile_variation"](
            spark, d
        ).collect()[0]
    assert (out["q1"], out["q3"]) == (100, 400)
    assert out["cqv"] == pytest.approx(0.6, abs=1e-15)


def test_tukey_trimean_five_points(spark):
    """Same 100..500 cents: med = 300 -> trimean = (100 + 600 + 400)/4
    = 275 cents = 2.75 dollars."""
    rows = _daily_orders([1.0, 2.0, 3.0, 4.0, 5.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_tukey_trimean"](spark, d).collect()[0]
    assert (out["q1"], out["med"], out["q3"]) == (100, 300, 400)
    assert out["trimean"] == pytest.approx(2.75, abs=1e-15)


def test_lag_sign_agreement_alternation(spark):
    """Daily totals 10,20,10,20,10,20: five alternating deltas. Lag 1:
    4 both-nonzero pairs, 0 agreements. Lag 7: no pairs (NULL share)."""
    rows = _daily_orders([10.0, 20.0, 10.0, 20.0, 10.0, 20.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["lag_k"]: r
            for r in REL_QUERIES["agg_lag_sign_agreement"](
                spark, d
            ).collect()
        }
    assert out[1]["n_pairs"] == 4 and out[1]["n_agree"] == 0
    assert out[1]["agree_share"] == 0.0
    assert out[7]["n_pairs"] == 0 and out[7]["agree_share"] is None


def test_elder_ray_constant_series_is_flat(spark):
    """One 100.00 order per day for 5 days: hi = lo = cls = EMA13 ->
    bull_power = bear_power = 0 exactly (integer num = cents * den)."""
    rows = _daily_orders([100.0] * 5)
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = WIN_QUERIES["window_elder_ray"](spark, d).collect()
    assert len(out) == 5
    for r in out:
        assert r["ema13"] == pytest.approx(100.0, abs=0.0)
        assert r["bull_power"] == 0.0 and r["bear_power"] == 0.0


def test_pivot_points_two_days(spark):
    """Day 1: orders 10 and 30 (hi 3000, lo 1000, cls 2000). Day 2:
    close 20.00. Pivot = 20, r1 = 30, s1 = 10, close inside the band;
    day 1 is the warmup row."""
    d1 = dt.datetime(1995, 1, 1)
    d2 = dt.datetime(1995, 1, 2)
    rows = [
        (1, 1, "O", 10.0, d1, "3-MEDIUM"),
        (2, 2, "O", 30.0, d1, "3-MEDIUM"),
        (3, 3, "O", 20.0, d2, "3-MEDIUM"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            str(r["day"]): r
            for r in WIN_QUERIES["window_pivot_points"](spark, d).collect()
        }
    assert out["1995-01-01"]["band_position"] == "warmup"
    assert out["1995-01-01"]["pivot"] is None
    r2 = out["1995-01-02"]
    assert r2["pivot"] == pytest.approx(20.0)
    assert r2["r1"] == pytest.approx(30.0)
    assert r2["s1"] == pytest.approx(10.0)
    assert r2["band_position"] == "inside"


def test_absence_streaks_gap_islands(spark):
    """User 1 active days 1,2,5 (absent runs 0 and 2 -> longest 2);
    user 2 active once (longest 0)."""
    t0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(days=1), 1, "view", 1.0, "{}"),
        (3, t0 + dt.timedelta(days=4), 1, "view", 1.0, "{}"),
        (4, t0, 2, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["absent_days_capped"]: r["n_users"]
            for r in EVENT_QUERIES["events_absence_streaks"](
                spark, d
            ).collect()
        }
    assert out == {0: 1, 2: 1}


def test_value_pareto_top_decile(spark):
    """Ten users with lifetime values 1..10: n_top = 1, top value 10,
    total 55 -> share 10/55."""
    t0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), i, "purchase", float(i), "{}")
        for i in range(1, 11)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_value_pareto_share"](
            spark, d
        ).collect()[0]
    assert out["n_users"] == 10 and out["n_top"] == 1
    assert out["top_value"] == pytest.approx(10.0)
    assert out["total_value"] == pytest.approx(55.0)
    assert out["pareto_share"] == pytest.approx(10.0 / 55.0)


def test_sentence_profile_median(spark):
    """A 12-token doc gets boundaries after tokens 5 and 10 -> sentence
    lengths 5,5,2: mean 4.0, TYPE-1 median 5 (rank (3+1)//2 = 2)."""
    text = " ".join(f"w{i}" for i in range(12))
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, [_doc(1, text)], d)
        out = TEXT_QUERIES["text_sentence_length_profile"](
            spark, d
        ).collect()[0]
    assert out["n_sentences"] == 3 and out["n_tokens"] == 12
    assert out["mean_sentence_tokens"] == pytest.approx(4.0)
    assert out["median_sentence_tokens"] == 5


def test_simpson_diversity_small_vocab(spark):
    """Tokens 'a a b': sum c^2 = 5, n = 3 -> 1 - 5/9 = 4/9."""
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, [_doc(1, "a a b")], d)
        out = TEXT_QUERIES["text_unigram_simpson_diversity"](
            spark, d
        ).collect()[0]
    assert out["n_tokens"] == 3 and out["n_types"] == 2
    assert out["sum_c2"] == 5
    assert out["simpson_diversity"] == pytest.approx(4.0 / 9.0)


def test_char_class_mix_counts(spark):
    """'ab1 \\n!' = 2 letters, 1 digit, 2 whitespace, 1 other of 6."""
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, [_doc(1, "ab1 \n!")], d)
        out = TEXT_QUERIES["text_char_class_mix"](spark, d).collect()[0]
    assert out["n_chars"] == 6
    assert out["n_letters"] == 2 and out["n_digits"] == 1
    assert out["n_ws"] == 2 and out["n_other"] == 1
    assert out["letter_share"] == pytest.approx(2.0 / 6.0)


def test_doclength_lorenz_linear(spark):
    """Ten docs of lengths 1..10: decile k holds doc k; cumulative char
    share at decile 1 is 1/55 and at decile 10 is 1."""
    rows = [_doc(i, "x" * i) for i in range(1, 11)]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            r["decile"]: r
            for r in TEXT_QUERIES["text_doclength_lorenz_deciles"](
                spark, d
            ).collect()
        }
    assert len(out) == 10
    assert out[1]["n_docs"] == 1 and out[1]["decile_chars"] == 1
    assert out[1]["cum_char_share"] == pytest.approx(1.0 / 55.0)
    assert out[10]["cum_char_share"] == pytest.approx(1.0)
    assert out[10]["cum_doc_share"] == pytest.approx(1.0)


def test_pk_gap_census_planted_gaps(spark):
    """Keys 1,2,5,9: two gap runs (len 2 and 3), keyspace 9, coverage
    4/9."""
    d1 = dt.datetime(1995, 1, 1)
    rows = [(k, k, "O", 10.0, d1, "3-MEDIUM") for k in (1, 2, 5, 9)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = DQ_QUERIES["dq_primary_key_gap_census"](spark, d).collect()[0]
    assert out["n_keys"] == 4 and out["keyspace"] == 9
    assert out["n_missing"] == 5
    assert out["n_gaps"] == 2 and out["largest_gap"] == 3
    assert out["coverage_share"] == pytest.approx(4.0 / 9.0)


def test_interarrival_profile_two_customers(spark):
    """Customer 1 orders on days 0, 10, 100 (gaps 10 and 90 -> buckets
    0 and 3); customer 2 orders once (no gap). Median gap = 10."""
    base = dt.datetime(1995, 1, 1)
    rows = [
        (1, 1, "O", 10.0, base, "3-MEDIUM"),
        (2, 1, "O", 10.0, base + dt.timedelta(days=10), "3-MEDIUM"),
        (3, 1, "O", 10.0, base + dt.timedelta(days=100), "3-MEDIUM"),
        (4, 2, "O", 10.0, base, "3-MEDIUM"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["gap_months_capped"]: r
            for r in TEMP_QUERIES["temporal_order_interarrival_profile"](
                spark, d
            ).collect()
        }
    assert set(out) == {0, 3}
    assert out[0]["n_gaps"] == 1 and out[3]["n_gaps"] == 1
    assert out[0]["median_gap_days"] == 10
    assert out[0]["n_gaps_total"] == 2


def test_resolution_ladder_known_byte_lengths(spark):
    """Byte length 10 -> stub dims 26x17, long side 104 -> rung 256,
    upscale needed; byte length 100 -> 116x30, long side 464 -> rung
    512, upscale needed."""
    rows = [_doc(1, "x" * 10), _doc(2, "y" * 100)]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            r["rung"]: r
            for r in MM_QUERIES["multimodal_resolution_ladder_census"](
                spark, d
            ).collect()
        }
    assert set(out) == {256, 512}
    assert out[256]["n_docs"] == 1 and out[256]["n_upscale"] == 1
    assert out[512]["n_docs"] == 1
    assert out[512]["upscale_share"] == pytest.approx(1.0)


# --- wave-2 pre-builds (built later in round 14) ---------------------------


def test_cochran_armitage_two_year_trend(spark):
    """1995: 2 orders, 0 high; 1996: 2 orders, 1 high (> $250k). N=4,
    R=1, S1=2, S2=2, TR=1 -> z = (1 - 0.5)/sqrt(0.1875) = 2/sqrt(3)."""
    rows = [
        (1, 1, "O", 10.0, dt.datetime(1995, 3, 1), "3-MEDIUM"),
        (2, 2, "O", 20.0, dt.datetime(1995, 6, 1), "3-MEDIUM"),
        (3, 3, "O", 300000.0, dt.datetime(1996, 3, 1), "3-MEDIUM"),
        (4, 4, "O", 30.0, dt.datetime(1996, 6, 1), "3-MEDIUM"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_cochran_armitage_trend"](
            spark, d
        ).collect()[0]
    assert out["n_total"] == 4 and out["n_high"] == 1 and out["tr"] == 1
    assert out["ca_z"] == pytest.approx(2.0 / 3.0**0.5, rel=1e-12)


def test_turning_points_strict_extrema(spark):
    """Dollars 10,30,20,40,30: all three interior days are strict
    extrema -> T=3, n=5, E=2, z = 1/sqrt(51/90). A flat shoulder
    (10,20,20,30) yields zero turning points."""
    rows = _daily_orders([10.0, 30.0, 20.0, 40.0, 30.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_turning_point_test"](spark, d).collect()[0]
    assert out["n_days"] == 5 and out["n_turning"] == 3
    assert out["expected_tp"] == pytest.approx(2.0)
    assert out["tp_z"] == pytest.approx(1.0 / (51.0 / 90.0) ** 0.5)

    rows = _daily_orders([10.0, 20.0, 20.0, 30.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_turning_point_test"](spark, d).collect()[0]
    assert out["n_days"] == 4 and out["n_turning"] == 0


def test_interevent_cv2_buckets(spark):
    """User 1: equal 10s gaps -> CV^2 = 0 (regular). User 2: gaps 1s
    and 99s -> CV^2 = 0.9604 (sub-Poisson bucket edge-exact)."""
    t0 = dt.datetime(2024, 1, 5, 12)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=10), 1, "view", 1.0, "{}"),
        (3, t0 + dt.timedelta(seconds=20), 1, "view", 1.0, "{}"),
        (4, t0, 2, "view", 1.0, "{}"),
        (5, t0 + dt.timedelta(seconds=1), 2, "view", 1.0, "{}"),
        (6, t0 + dt.timedelta(seconds=100), 2, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["cv2_bucket"]: r["n_users"]
            for r in EVENT_QUERIES["events_interevent_cv2"](
                spark, d
            ).collect()
        }
    assert out == {"regular_lt_0.5": 1, "sub_poisson_0.5_1": 1}


def test_peak_hour_stability_shift(spark):
    """Week A (Jan 1-3): type 'view' peaks at hour 2 (2 vs 1 events);
    week B (Jan 4+): peaks at hour 5 -> one change, first peak 2; a
    within-week tie resolves to the smaller hour."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 2), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2, 2), 2, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 3, 5), 3, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 4, 5), 4, "view", 1.0, "{}"),
        (5, dt.datetime(2024, 1, 5, 5), 5, "view", 1.0, "{}"),
        (6, dt.datetime(2024, 1, 4, 9), 6, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_peak_hour_stability"](
            spark, d
        ).collect()
    r = {x["event_type"]: x for x in out}["view"]
    assert r["n_weeks"] == 2 and r["n_changes"] == 1
    assert r["first_peak_hour"] == 2


def test_type_cooccurrence_lift(spark):
    """Session 1 carries view+purchase, session 2 view only: pair
    (purchase, view) n_both=1, lift = 1*2/(2*1) = 1.0."""
    t0 = dt.datetime(2024, 1, 5, 12)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=5), 1, "purchase", 9.0, "{}"),
        (3, t0, 2, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_type_cooccurrence_matrix"](
            spark, d
        ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("purchase", "view")
    assert r["n_both"] == 1 and r["n_sessions"] == 2
    assert r["n_a"] == 1 and r["n_b"] == 2
    assert r["lift"] == pytest.approx(1.0)


def test_topk_coverage_small_vocab(spark):
    """Tokens a a a b b c: top-1 covers 3/6, top-10 covers all."""
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, [_doc(1, "a a a b b c")], d)
        out = {
            r["k"]: r
            for r in TEXT_QUERIES["text_topk_coverage_curve"](
                spark, d
            ).collect()
        }
    assert set(out) == {1, 10, 100, 1000}
    assert out[1]["covered_tokens"] == 3
    assert out[1]["coverage_share"] == pytest.approx(0.5)
    assert out[10]["coverage_share"] == pytest.approx(1.0)
    assert out[1]["n_types"] == 3 and out[1]["total_tokens"] == 6


def test_dedup_aware_ess_weights(spark):
    """Two copies of 'x' plus one 'y': weights 1/2,1/2,1 -> ESS =
    (sum w)^2 / sum w^2 = 4/1.5 = 8/3; ratio 8/9."""
    from large_csv_etl_spark.queries.sampling import (
        QUERIES as SAMPLE_QUERIES,
    )

    rows = [_doc(1, "x"), _doc(2, "x"), _doc(3, "y")]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = SAMPLE_QUERIES["sample_dedup_aware_ess"](
            spark, d
        ).collect()[0]
    assert out["n_docs"] == 3 and out["n_clusters"] == 2
    assert out["n_dup_docs"] == 2
    assert out["sum_inv_size_fp"] == 1500000000
    assert out["ess"] == pytest.approx(8.0 / 3.0)
    assert out["ess_ratio"] == pytest.approx(8.0 / 9.0)


def test_payload_byte_simpson_concentration(spark):
    """Text 'aab': byte counts a=2, b=1 -> concentration 5/9."""
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, [_doc(1, "aab")], d)
        out = MM_QUERIES["multimodal_payload_byte_simpson"](
            spark, d
        ).collect()[0]
    assert out["n_bytes"] == 3 and out["n_distinct_bytes"] == 2
    assert out["sum_c2"] == 5
    assert out["simpson_concentration"] == pytest.approx(5.0 / 9.0)


# --- wave-2, third batch (built at round-14 close) -------------------------


def test_chaikin_flat_range_reads_zero(spark):
    """Two orders per day with a constant 20-dollar spread: EMA10 of
    the range is constant, so the 10-back rate of change is 0 from
    day 11 on (and NULL during warm-up)."""
    rows = []
    for i in range(1, 13):
        day = dt.datetime(1995, 1, i)
        rows.append((2 * i - 1, i, "O", 10.0, day, "3-MEDIUM"))
        rows.append((2 * i, i, "O", 30.0, day, "3-MEDIUM"))
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            str(r["day"]): r
            for r in WIN_QUERIES["window_chaikin_volatility"](
                spark, d
            ).collect()
        }
    assert out["1995-01-05"]["chaikin_volatility"] is None
    assert out["1995-01-11"]["chaikin_volatility"] == 0.0
    assert out["1995-01-12"]["chaikin_volatility"] == 0.0
    assert out["1995-01-12"]["ema10_range"] == pytest.approx(20.0)


def test_cci_top_of_range_reads_100(spark):
    """Single orders 10/20/30 dollars: on day 3 the typical price sits
    at the top of its 3-day frame -> CCI = +100 exactly (the
    integer closed form (tp3*n - sum3)*n*1000 / (15*S))."""
    rows = _daily_orders([10.0, 20.0, 30.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            str(r["day"]): r
            for r in WIN_QUERIES["window_cci"](spark, d).collect()
        }
    assert out["1995-01-03"]["cci20"] == pytest.approx(100.0)
    assert out["1995-01-01"]["cci20"] is None  # one-row frame, S = 0


def test_robust_frame_zscore_spike(spark):
    """Dollars 10,20,30,40,100: day-5 frame median 3000 cents, MAD
    1000 -> z = 7; a majority-constant frame yields NULL (MAD 0)."""
    rows = _daily_orders([10.0, 20.0, 30.0, 40.0, 100.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            str(r["day"]): r
            for r in WIN_QUERIES["window_robust_frame_zscore"](
                spark, d
            ).collect()
        }
    r5 = out["1995-01-05"]
    assert (r5["frame_med"], r5["frame_mad"]) == (3000, 1000)
    assert r5["robust_z"] == pytest.approx(7.0)

    rows = _daily_orders([10.0, 10.0, 10.0, 10.0, 20.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            str(r["day"]): r
            for r in WIN_QUERIES["window_robust_frame_zscore"](
                spark, d
            ).collect()
        }
    assert out["1995-01-05"]["frame_mad"] == 0
    assert out["1995-01-05"]["robust_z"] is None


def test_mad_outlier_census_single_spike(spark):
    """Dollars 1..5 plus one 100: median 300 cents, MAD 100 cents;
    only the 10000-cent spike clears every sigma-equivalent gate."""
    rows = _daily_orders([1.0, 2.0, 3.0, 4.0, 5.0, 100.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_mad_zscore_outlier_census"](
            spark, d
        ).collect()[0]
    assert out["n"] == 6
    assert out["med_cents"] == 300 and out["mad_cents"] == 100
    assert out["n_gt_3s"] == 1
    assert out["n_gt_5s"] == 1
    assert out["n_gt_10s"] == 1


def _nibble0_key(start):
    import hashlib

    k = start
    while hashlib.md5(str(k).encode()).hexdigest()[0] != "0":
        k += 1
    return k


def _not_nibble0_key(start):
    import hashlib

    k = start
    while hashlib.md5(str(k).encode()).hexdigest()[0] == "0":
        k += 1
    return k


def test_categorical_domain_drift_injections(spark):
    """Four months of status 'P' with the two injected incidents:
    1998-01 adds the versioned 'P2' (one added, none removed);
    2000-06 is quiet; 2000-07 renames P -> P_RENAMED (one added, one
    removed). Priority is the all-zeros control."""
    months = [
        dt.datetime(1997, 12, 5),
        dt.datetime(1998, 1, 5),
        dt.datetime(2000, 6, 5),
        dt.datetime(2000, 7, 5),
    ]
    rows = []
    kid = 1
    for i, m in enumerate(months):
        plain = _not_nibble0_key(1000 * (i + 1))
        rows.append((plain, kid, "P", 10.0, m, "X"))
        kid += 1
        if i >= 1:  # from 1998-01 on, also a nibble-0 key -> 'P2'
            zero = _nibble0_key(1000 * (i + 1))
            rows.append((zero, kid, "P", 10.0, m, "X"))
            kid += 1
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            (r["col_name"], str(r["month"])): r
            for r in DQ_QUERIES["dq_categorical_domain_drift"](
                spark, d
            ).collect()
        }
    s = lambda m: out[("status", m)]
    assert (s("1998-01-01")["n_added"], s("1998-01-01")["n_removed"]) == (1, 0)
    assert (s("2000-06-01")["n_added"], s("2000-06-01")["n_removed"]) == (0, 0)
    assert (s("2000-07-01")["n_added"], s("2000-07-01")["n_removed"]) == (1, 1)
    assert s("2000-07-01")["n_levels"] == 2
    for m in ("1998-01-01", "2000-06-01", "2000-07-01"):
        p = out[("priority", m)]
        assert (p["n_added"], p["n_removed"]) == (0, 0)


# --- wave-2 batch 4: three CSV fixtures, coppock, containment census, ------
# --- threshold pair curve ---------------------------------------------------

from large_csv_etl_spark.queries.dedup import QUERIES as DEDUP_QUERIES
from large_csv_etl_spark.queries.etl import QUERIES as ETL_QUERIES
from large_csv_etl_spark.queries.similarity import QUERIES as SIM_QUERIES


def test_embedded_newline_csv_preserves_field_bytes(spark):
    """The committed fixture plants a bare LF, a CRLF pair, a doubled
    quote, and an embedded comma inside quoted fields; every one must
    survive as field bytes (multiLine=true + escape='"')."""
    out = {
        r["id"]: r
        for r in ETL_QUERIES["etl_embedded_newline_csv"](spark, "").collect()
    }
    assert len(out) == 5
    assert out[1]["note"] == "line one\nline two"
    assert (out[1]["lf_count"], out[1]["cr_count"]) == (1, 0)
    assert out[2]["note"] == "crlf line\r\nsecond part"
    assert (out[2]["lf_count"], out[2]["cr_count"]) == (1, 1)
    assert out[2]["note_chars"] == 22
    assert out[3]["note"] == 'quote "inside" here'
    assert out[5]["lf_count"] == 2
    assert [out[i]["amount_cents"] for i in (1, 2, 3, 4, 5)] == [
        1050, 2005, 99, 10000, 725,
    ]


def test_duplicate_header_detect_summary(spark):
    """Three concatenated feeds -> 2 mid-file header rows among 7
    scanned rows; the cleaned totals exclude them."""
    row = ETL_QUERIES["etl_duplicate_header_detect"](spark, "").collect()
    assert len(row) == 1
    r = row[0]
    assert r["rows_scanned"] == 7
    assert r["header_rows_dropped"] == 2
    assert r["data_rows"] == 5
    assert r["n_distinct_ids"] == 5
    assert r["total_cents"] == 100 + 250 + 325 + 475 + 505


def test_locale_decimal_normalize_exact_cents(spark):
    """de-DE amounts (dot grouping, comma decimal, semicolon delim)
    normalize to exact cents, negative sign included; the grouping-
    separator census pins the dot stripping."""
    out = {
        r["id"]: r
        for r in ETL_QUERIES["etl_locale_decimal_normalize"](
            spark, ""
        ).collect()
    }
    assert [out[i]["amount_cents"] for i in (1, 2, 3, 4, 5)] == [
        123456, 99, 1234567801, -4210, 100000,
    ]
    assert [out[i]["n_grouping_seps"] for i in (1, 2, 3, 4, 5)] == [
        1, 0, 2, 0, 0,
    ]


def test_coppock_constant_and_jump(spark):
    """Constant 20-day head -> coppock 0.0 once the ROC14 warm-up ends
    (day 15), NULL before (the lag-NULL gate, not phantom zeros); a
    day-21 price doubling makes both ROCs exactly 1.0 from day 21, so
    day 30's fully-doubled WMA window reads exactly 2.0."""
    prices = [1.0] * 20 + [2.0] * 10
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, _daily_orders(prices), d)
        out = {
            r["day"].day: r
            for r in WIN_QUERIES["window_coppock_curve"](spark, d).collect()
        }
    assert len(out) == 30
    assert out[14]["coppock"] is None and out[14]["roc_14"] is None
    assert out[15]["roc_14"] == 0.0 and out[15]["coppock"] == 0.0
    assert out[20]["coppock"] == 0.0
    assert out[21]["roc_14"] == 1.0 and out[21]["roc_11"] == 1.0
    assert out[30]["coppock"] == 2.0


def test_coppock_empty_orders(spark):
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, [], d)
        assert WIN_QUERIES["window_coppock_curve"](spark, d).count() == 0


def test_containment_disagreement_subset_pair(spark):
    """A 5-token doc fully embedded in a 25-token doc lands in the
    (cont 10, jac 1) cell flagged missed_by_jaccard; an identical twin
    pair lands in (10, 10) unflagged; the unrelated doc pairs with
    nobody."""
    long_tail = " ".join(f"t{i}" for i in range(20))
    rows = [
        _doc(1, "a b c d e"),
        _doc(2, "a b c d e " + long_tail),
        _doc(3, "zz yy xx ww vv"),
        _doc(4, "p q r s t u"),
        _doc(5, "p q r s t u"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        got = {
            (r["cont_decile"], r["jac_decile"]): (
                r["n_pairs"],
                r["missed_by_jaccard"],
            )
            for r in DEDUP_QUERIES["dedup_containment_disagreement"](
                spark, d
            ).collect()
        }
    assert got == {(10, 1): (1, True), (10, 10): (1, False)}


def test_containment_disagreement_empty_docs(spark):
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, [], d)
        assert (
            DEDUP_QUERIES["dedup_containment_disagreement"](spark, d).count()
            == 0
        )


def _emb_rows_identical(n):
    return [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(1, n + 1)]


def _emb_dir15(spark, rows, d):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.parquet(f"{d}/embeddings.parquet")


def test_threshold_pair_curve_identical_vectors(spark):
    """All-identical vectors: every surviving partner pair scores
    cosine 1.0, so each threshold admits the whole panel and every
    share is exactly 1.0."""
    with tempfile.TemporaryDirectory() as d:
        _emb_dir15(spark, _emb_rows_identical(60), d)
        rows = SIM_QUERIES["sim_threshold_pair_curve"](spark, d).collect()
    assert sorted(r["threshold"] for r in rows) == [0.7, 0.8, 0.9]
    assert all(r["panel_n"] > 0 for r in rows)
    assert all(r["n_pairs"] == r["panel_n"] for r in rows)
    assert all(r["pair_share"] == 1.0 for r in rows)


def test_threshold_pair_curve_empty_embeddings(spark):
    """Empty table: the single aggregate still fans out to the three
    curve rows with zero counts and NULL shares (guarded division)."""
    with tempfile.TemporaryDirectory() as d:
        _emb_dir15(spark, [], d)
        rows = SIM_QUERIES["sim_threshold_pair_curve"](spark, d).collect()
    assert len(rows) == 3
    assert all(r["n_pairs"] == 0 and r["panel_n"] == 0 for r in rows)
    assert all(r["pair_share"] is None for r in rows)


# --- wave-3 batch: kNN confusion, IVF balance, anchor audit, Sen band, ------
# --- two-hop reach -----------------------------------------------------------


def _lineitem_dir15(spark, rows, d):
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(2).write.parquet(f"{d}/lineitem.parquet")


def test_knn_label_confusion_separable(spark):
    """Two orthogonal identical-vector clusters: every held-out query
    (ids 20/40/60) votes inside its own cluster, so the confusion
    matrix is purely diagonal with row_share 1.0."""
    rows = [
        (i, [1.0, 0.0, 0.0, 0.0] if i <= 30 else [0.0, 1.0, 0.0, 0.0],
         0 if i <= 30 else 1)
        for i in range(1, 61)
    ]
    with tempfile.TemporaryDirectory() as d:
        _emb_dir15(spark, rows, d)
        got = {
            (r["true_label"], r["pred_label"]): r
            for r in SIM_QUERIES["sim_knn_label_confusion"](
                spark, d
            ).collect()
        }
    assert set(got) == {(0, 0), (1, 1)}
    assert got[(0, 0)]["n_queries"] == 1
    assert got[(1, 1)]["n_queries"] == 2
    assert all(r["row_share"] == 1.0 and r["is_diagonal"] for r in got.values())


def test_knn_label_confusion_empty(spark):
    with tempfile.TemporaryDirectory() as d:
        _emb_dir15(spark, [], d)
        assert (
            SIM_QUERIES["sim_knn_label_confusion"](spark, d).count() == 0
        )


def test_ivf_list_balance_two_even_cells(spark):
    """Two identical-vector clusters of 100 each: perfectly balanced
    lists (imbalance 1.0), probe cost 100 at nprobe 1 and 200 (both
    cells) at nprobe 4, constant across the 2-query panel so p50 =
    p95."""
    rows = [
        (i, [1.0, 0.0, 0.0, 0.0] if i <= 100 else [0.0, 1.0, 0.0, 0.0],
         0 if i <= 100 else 1)
        for i in range(1, 201)
    ]
    with tempfile.TemporaryDirectory() as d:
        _emb_dir15(spark, rows, d)
        got = {
            r["nprobe"]: r
            for r in SIM_QUERIES["sim_ivf_list_balance_audit"](
                spark, d
            ).collect()
        }
    assert set(got) == {1, 4}
    for r in got.values():
        assert (r["n_queries"], r["n_cells"]) == (2, 2)
        assert (r["min_list"], r["max_list"]) == (100, 100)
        assert r["avg_list"] == 100.0 and r["imbalance_ratio"] == 1.0
    assert (got[1]["cost_p50"], got[1]["cost_p95"]) == (100, 100)
    assert (got[4]["cost_p50"], got[4]["cost_p95"]) == (200, 200)


def test_ivf_list_balance_empty(spark):
    with tempfile.TemporaryDirectory() as d:
        _emb_dir15(spark, [], d)
        assert (
            SIM_QUERIES["sim_ivf_list_balance_audit"](spark, d).count() == 0
        )


def test_anchor_prefilter_precision_recall(spark):
    """Three docs sharing first+last trigrams give 3 anchor pairs, all
    true near-dups (precision 1.0); a fourth true pair whose first
    trigram shifted by one token escapes the anchor (recall 0.75)."""
    rows = [
        _doc(1, "a b c d e"),
        _doc(2, "a b c d e"),
        _doc(3, "a b c x y c d e"),
        _doc(4, "p q r s t"),
        _doc(5, "z p q r s t"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        row = DEDUP_QUERIES["dedup_anchor_prefilter_audit"](
            spark, d
        ).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_truth"], r["n_anchor"], r["n_hit"]) == (4, 3, 3)
    assert r["precision"] == 1.0
    assert r["recall"] == 0.75


def test_anchor_prefilter_empty_docs(spark):
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, [], d)
        row = DEDUP_QUERIES["dedup_anchor_prefilter_audit"](
            spark, d
        ).collect()
    assert len(row) == 1
    assert (row[0]["n_truth"], row[0]["n_anchor"], row[0]["n_hit"]) == (
        0, 0, 0,
    )
    assert row[0]["precision"] is None and row[0]["recall"] is None


def test_sen_slope_band_linear_series(spark):
    """A perfectly linear 40-day series (+10 cents/day): every banded
    pairwise slope is exactly 100000 fp, so the median and BOTH band
    endpoints coincide at 10.0 cents/day; the rank arithmetic is
    pinned (n_pairs = sum_{lag=1..30}(40-lag) = 735)."""
    prices = [1.00 + 0.10 * i for i in range(40)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, _daily_orders(prices), d)
        row = REL_QUERIES["agg_sen_slope_confidence_band"](
            spark, d
        ).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_days"], r["n_pairs"]) == (40, 735)
    assert r["median_slope_fp"] == 100000
    assert r["ci_lo_fp"] == 100000 and r["ci_hi_fp"] == 100000
    assert r["slope_cents_per_day"] == 10.0
    assert r["ci_lo_cents_per_day"] == 10.0
    assert r["ci_hi_cents_per_day"] == 10.0


def test_sen_slope_band_empty_orders(spark):
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, [], d)
        row = REL_QUERIES["agg_sen_slope_confidence_band"](
            spark, d
        ).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_days"], r["n_pairs"], r["c_half"]) == (0, 0, 0)
    assert r["median_slope_fp"] is None
    assert r["ci_lo_fp"] is None and r["ci_hi_fp"] is None


def test_two_hop_reach_path_graph(spark):
    """Co-purchase path 1-2-3 (two orders): every node reaches the
    other two within two hops -> one histogram row (size 2, 3 nodes,
    share 1.0)."""
    rows = [(1, 1), (1, 2), (2, 2), (2, 3)]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir15(spark, rows, d)
        got = TEXT_QUERIES["graph_two_hop_reach"](spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["two_hop_size"], r["n_nodes"], r["node_share"]) == (
        2, 3, 1.0,
    )


def test_two_hop_reach_empty(spark):
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir15(spark, [], d)
        assert TEXT_QUERIES["graph_two_hop_reach"](spark, d).count() == 0


# --- wave-3 final: watermark delay sweep -------------------------------------

from large_csv_etl_spark.queries.streamq import QUERIES as STREAM_QUERIES


def _events_file15(rows, d):
    """Single-file layout: the streaming reader's footer probe globs
    for a FILE named events.parquet (the driver fixture layout)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(
                [r[3] for r in rows], pa.string()
            ),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")


def test_watermark_delay_sweep_linear_frontier(spark):
    """One event per hour at 00:00..09:00: the scoped region is
    hour < 09:00 - (delay+1) h, so the three legs must drain exactly
    7 / 6 / 4 finalized windows (one event each)."""
    rows = [
        (i, dt.datetime(2024, 1, 1, i, 30), 1, "click", 1.0, "{}")
        for i in range(10)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_file15(rows, d)
        got = {
            r["delay_hours"]: r
            for r in STREAM_QUERIES["streaming_watermark_delay_sweep"](
                spark, d
            ).collect()
        }
    assert set(got) == {1, 2, 4}
    assert (got[1]["n_windows"], got[1]["n_events"]) == (7, 7)
    assert (got[2]["n_windows"], got[2]["n_events"]) == (6, 6)
    assert (got[4]["n_windows"], got[4]["n_events"]) == (4, 4)
    assert all(r["n_event_types"] == 1 for r in got.values())


def test_watermark_delay_sweep_empty_events(spark):
    """Empty source: every leg still reports its zero-count row (the
    LEFT-JOIN spine), with NULL event sums."""
    with tempfile.TemporaryDirectory() as d:
        _events_file15([], d)
        got = {
            r["delay_hours"]: r
            for r in STREAM_QUERIES["streaming_watermark_delay_sweep"](
                spark, d
            ).collect()
        }
    assert set(got) == {1, 2, 4}
    for r in got.values():
        assert (r["n_windows"], r["n_event_types"]) == (0, 0)
        assert r["n_events"] is None


# --- ROADMAP_r16 wave-1 early pre-builds -------------------------------------


def test_cox_stuart_monotone_series(spark):
    """Strictly increasing 10-day series: h = 5, all 5 pairs rise ->
    s_plus = 5, z = 5/sqrt(5), upward."""
    prices = [1.0 + 0.5 * i for i in range(10)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, _daily_orders(prices), d)
        r = REL_QUERIES["agg_cox_stuart_trend"](spark, d).collect()[0]
    assert (r["n_days"], r["n_pairs"], r["n_ties"]) == (10, 5, 0)
    assert (r["s_plus"], r["s_minus"]) == (5, 0)
    assert r["z_stat"] == pytest.approx(5.0 / 5.0**0.5)
    assert r["trend_direction"] == "upward"


def test_cox_stuart_empty_orders(spark):
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, [], d)
        r = REL_QUERIES["agg_cox_stuart_trend"](spark, d).collect()[0]
    assert (r["n_days"], r["n_pairs"]) == (0, 0)
    assert r["z_stat"] is None
    assert r["trend_direction"] == "insufficient"


def test_median_crossing_runs_drops_at_median(spark):
    """Cents 10,10,30,30,20: TYPE-1 median 20 (rank 3 of 5); the
    at-median day drops, leaving runs below(2) and above(2)."""
    prices = [0.10, 0.10, 0.30, 0.30, 0.20]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, _daily_orders(prices), d)
        got = {
            (r["side"], r["run_length_capped"]): r["n_runs"]
            for r in WIN_QUERIES["window_median_crossing_runs"](
                spark, d
            ).collect()
        }
    assert got == {("below", 2): 1, ("above", 2): 1}


def test_median_crossing_runs_empty(spark):
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, [], d)
        assert (
            WIN_QUERIES["window_median_crossing_runs"](spark, d).count()
            == 0
        )


def test_decile_ratio_ten_points(spark):
    """Cents 100..1000 on one stratum: TYPE-1 ranks p10 = 1, p25 = 2,
    p75 = 8, p90 = 9 -> ratios 900/100 = 9.0 and 800/200 = 4.0."""
    prices = [float(i) for i in range(1, 11)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, _daily_orders(prices), d)
        r = REL_QUERIES["agg_decile_ratio_spread"](spark, d).collect()[0]
    assert r["n"] == 10
    assert (r["p10"], r["p25"], r["p75"], r["p90"]) == (
        100, 200, 800, 900,
    )
    assert r["decile_ratio"] == pytest.approx(9.0)
    assert r["quartile_ratio"] == pytest.approx(4.0)


def test_decile_ratio_empty_orders(spark):
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, [], d)
        assert (
            REL_QUERIES["agg_decile_ratio_spread"](spark, d).count() == 0
        )


from large_csv_etl_spark.queries.temporal import QUERIES as TEMPQ15


def test_month_end_effect_february_leap(spark):
    """Feb 1996 (leap, 29 days): orders on the 1st (100 cents) and the
    28th/29th (200 + 300 cents in the last-3 window) -> last3_share
    500/600, baseline 3/29."""
    rows = [
        (1, 1, "O", 1.00, dt.datetime(1996, 2, 1), "3-MEDIUM"),
        (2, 2, "O", 2.00, dt.datetime(1996, 2, 28), "3-MEDIUM"),
        (3, 3, "O", 3.00, dt.datetime(1996, 2, 29), "3-MEDIUM"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        r = TEMPQ15["temporal_month_end_effect"](spark, d).collect()[0]
    assert str(r["month"]) == "1996-02-01"
    assert r["n_days_in_month"] == 29
    assert (r["total_cents"], r["last3_cents"]) == (600, 500)
    assert r["last3_share"] == pytest.approx(500.0 / 600.0)
    assert r["uniform_share"] == pytest.approx(3.0 / 29.0)
    assert r["excess_share"] == pytest.approx(500.0 / 600.0 - 3.0 / 29.0)


def test_month_end_effect_empty_orders(spark):
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, [], d)
        assert TEMPQ15["temporal_month_end_effect"](spark, d).count() == 0


def test_velocity_acceleration_with_dark_day(spark):
    """Counts 2,0,4 across a three-day span (day 2 has no events and
    must zero-fill): velocities NULL,-2,4; accelerations NULL,NULL,6;
    patterns warmup, warmup, accelerating."""
    t0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 2, "view", 1.0, "{}"),
        (3, t0 + dt.timedelta(days=2), 1, "view", 1.0, "{}"),
        (4, t0 + dt.timedelta(days=2, minutes=1), 2, "view", 1.0, "{}"),
        (5, t0 + dt.timedelta(days=2, minutes=2), 3, "view", 1.0, "{}"),
        (6, t0 + dt.timedelta(days=2, minutes=3), 4, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = sorted(
            EVENT_QUERIES["events_daily_velocity_acceleration"](
                spark, d
            ).collect(),
            key=lambda r: r["day"],
        )
    assert [r["n_events"] for r in out] == [2, 0, 4]
    assert [r["velocity"] for r in out] == [None, -2, 4]
    assert [r["acceleration"] for r in out] == [None, None, 6]
    assert [r["pattern"] for r in out] == [
        "warmup", "warmup", "accelerating",
    ]


def test_velocity_acceleration_empty_events(spark):
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, [], d)
        assert (
            EVENT_QUERIES["events_daily_velocity_acceleration"](
                spark, d
            ).count()
            == 0
        )
