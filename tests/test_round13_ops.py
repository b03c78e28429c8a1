"""Semantic checks for the round-13 operators (beyond the oracle diff the
mimic already runs): planted fixtures exercising each operator's defining
property."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

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
    """One order per day with the given price; day i is prices[i-1]."""
    rows = []
    for i, p in enumerate(prices, 1):
        day = dt.datetime(year, month, 1) + dt.timedelta(days=i - 1)
        rows.append((i, i, "O", p, day, "3-MEDIUM"))
    return rows


# --- windows family --------------------------------------------------------


def test_williams_r_mirror_of_pct_k(spark):
    """Strictly increasing series: on the first full frame the close IS
    the 14-day high, so %R = 0 and %K = 100; the two always sum to 100
    on non-flat full frames."""
    rows = _daily_orders([float(i) for i in range(1, 16)])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["day"]: r
            for r in WIN_QUERIES["window_williams_r"](spark, d).collect()
        }
    full = [r for r in out.values() if r["pct_r"] is not None]
    assert len(full) == 2  # days 14 and 15
    for r in full:
        assert abs(r["pct_r"]) < 1e-9
        assert abs(r["pct_k"] - 100.0) < 1e-9


def test_trix_zero_on_constant_series(spark):
    """Constant daily revenue: the triple-smoothed EMA equals the
    constant on every row (present-mass renormalization keeps warm-up
    exact), so TRIX = 0 everywhere after the first row."""
    rows = _daily_orders([5.0] * 6)
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = sorted(
            WIN_QUERIES["window_trix_indicator"](spark, d).collect(),
            key=lambda r: r["day"],
        )
    assert out[0]["trix"] is None
    for r in out:
        assert abs(r["t3_dollars"] - 5.0) < 1e-9
    for r in out[1:]:
        assert abs(r["trix"]) < 1e-9


def test_ulcer_zero_without_drawdown(spark):
    """Monotone nondecreasing revenue never trades below its running
    peak: every drawdown is 0 and the full-frame ulcer index is 0."""
    rows = _daily_orders([float(i) for i in range(1, 16)])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = sorted(
            WIN_QUERIES["window_ulcer_index"](spark, d).collect(),
            key=lambda r: r["day"],
        )
    assert all(r["dd_pct"] == 0.0 for r in out)
    full = [r for r in out if r["ulcer_14"] is not None]
    assert len(full) == 2
    assert all(r["ulcer_14"] == 0.0 for r in full)


def test_threshold_reversal_counts_drop(spark):
    """24 flat days then one 60%-down day: only that day clears the
    5% drop gate (40*100 <= 100*95); no rise reversal (the trailing
    low includes the crash day itself)."""
    rows = _daily_orders([1.0] * 24 + [0.4])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = WIN_QUERIES["window_threshold_reversal_count"](
            spark, d
        ).collect()
    assert len(out) == 1
    assert out[0]["n_days"] == 25
    assert out[0]["drop_reversals"] == 1
    assert out[0]["rise_reversals"] == 0


def test_volume_price_corr_perfect(spark):
    """Day i carries i orders of a fixed price: count and revenue are
    exactly proportional, so the first full 30-day frame reads r = 1."""
    rows = []
    key = 0
    for i in range(1, 31):
        day = dt.datetime(1995, 1, 1) + dt.timedelta(days=i - 1)
        for _ in range(i):
            key += 1
            rows.append((key, key, "O", 100.0, day, "3-MEDIUM"))
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = sorted(
            WIN_QUERIES["window_volume_price_corr"](spark, d).collect(),
            key=lambda r: r["day"],
        )
    assert out[-1]["n_orders"] == 30
    assert out[-1]["vol_price_corr"] == pytest.approx(1.0, abs=1e-9)
    assert all(r["vol_price_corr"] is None for r in out[:-1])


def test_donchian_breakout_runs_island(spark):
    """21 flat days then two successively higher closes: both break the
    prior 20-day high and form ONE run of length 2 with overshoot
    100 cents each step (200 over 100, 300 over 200)."""
    rows = _daily_orders([1.0] * 21 + [2.0, 3.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = WIN_QUERIES["window_donchian_breakout_runs"](
            spark, d
        ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["run_start"] == dt.date(1995, 1, 22)
    assert r["run_len"] == 2
    assert r["max_overshoot_cents"] == 100


# --- relational stats family ----------------------------------------------

from large_csv_etl_spark.queries.relational import QUERIES as REL_QUERIES


def _lineitem_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double",
    )
    df.coalesce(2).write.parquet(f"{d}/lineitem.parquet")


def test_hodges_lehmann_single_values(spark):
    """One distinct value per side collapses the panel to one pair:
    nbuck = 1 so the bucket join keeps it, and the weighted median IS
    the single difference (100 - 50 cents) with weight 2*3."""
    rows = [
        (1, 1, "F", 1.0, dt.datetime(1995, 1, 1), "3-M"),
        (2, 2, "F", 1.0, dt.datetime(1995, 1, 2), "3-M"),
        (3, 3, "O", 0.5, dt.datetime(1995, 1, 3), "3-M"),
        (4, 4, "O", 0.5, dt.datetime(1995, 1, 4), "3-M"),
        (5, 5, "O", 0.5, dt.datetime(1995, 1, 5), "3-M"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_hodges_lehmann_banded"](spark, d).collect()[0]
    assert out["n_f_vals"] == 1 and out["n_o_vals"] == 1
    assert out["n_pairs"] == 6
    assert out["hl_shift_cents"] == 50


def test_durbin_watson_alternating_residuals(spark):
    """Daily dollars 11,9,11,9: OLS slope -0.4, intercept 11, residuals
    (0.4,-1.2,1.2,-0.4) -> DW = 10.88/3.2 = 3.4 exactly on the 1e-2
    residual lattice."""
    rows = _daily_orders([11.0, 9.0, 11.0, 9.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_durbin_watson"](spark, d).collect()[0]
    assert out["n_days"] == 4
    assert out["slope"] == pytest.approx(-0.4, abs=1e-12)
    assert out["dw"] == pytest.approx(3.4, abs=1e-12)


def test_durbin_watson_perfect_trend_guard(spark):
    """A perfectly linear series has zero residuals: see = 0 and dw is
    NULL (the ANSI-totality guard), while the fit itself is exact."""
    rows = _daily_orders([10.0, 20.0, 30.0, 40.0])
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_durbin_watson"](spark, d).collect()[0]
    assert out["slope"] == pytest.approx(10.0, abs=1e-12)
    assert out["icept"] == pytest.approx(0.0, abs=1e-12)
    assert out["dw"] is None


def test_partial_correlation_identical_xy(spark):
    """y is an exact multiple of x: r_xy = 1; controlling for an
    independent z cannot reduce a perfect correlation, so r_xy.z = 1."""
    rows = [
        (float(i), float(i), 0.0, 0.08 * (i % 2)) for i in range(1, 9)
    ]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, rows, d)
        out = REL_QUERIES["agg_partial_correlation"](spark, d).collect()[0]
    assert out["r_xy"] == pytest.approx(1.0, abs=1e-12)
    assert out["r_xy_given_z"] == pytest.approx(1.0, abs=1e-9)


def test_partial_correlation_constant_control_guard(spark):
    """A constant control variable has zero variance: the pairwise
    correlations are undefined and the entry returns zero rows rather
    than dividing by zero."""
    rows = [(float(i), float(i), 0.0, 0.05) for i in range(1, 6)]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, rows, d)
        out = REL_QUERIES["agg_partial_correlation"](spark, d).collect()
    assert out == []


def test_grubbs_flags_outlier_month(spark):
    """Monthly dollars 100,100,400: mean 200, s = sqrt(30000), max
    deviation 200 -> G = 200/s = 2/sqrt(3); the packed key names March
    as the worst month."""
    rows = [
        (1, 1, "O", 100.0, dt.datetime(1995, 1, 15), "3-M"),
        (2, 2, "O", 100.0, dt.datetime(1995, 2, 15), "3-M"),
        (3, 3, "O", 400.0, dt.datetime(1995, 3, 15), "3-M"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = REL_QUERIES["agg_grubbs_screen"](spark, d).collect()[0]
    assert out["n_months"] == 3
    assert out["mean_dollars"] == pytest.approx(200.0, abs=1e-12)
    assert out["worst_month_ym"] == 199503
    assert out["g_stat"] == pytest.approx(2.0 / 3.0**0.5, rel=1e-12)


# --- events family ---------------------------------------------------------

from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES


def _events_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(2).write.parquet(f"{d}/events.parquet")


def test_burstiness_regular_cadence(spark):
    """Perfectly regular 60-second gaps: sigma = 0, mu = 60, so
    B = -1 and the user lands in bin floor(-10.0) = -10."""
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i, 0), 1, "click", 1.0, "{}")
        for i in range(5)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = EVENT_QUERIES["events_burstiness_index"](spark, d).collect()
    assert len(out) == 1
    assert out[0]["bin"] == -10
    assert out[0]["n_users"] == 1


def test_churn_flags_lifecycle(spark):
    """User 1 active daily (retained once both windows fill), user 2
    active only day 1 (churned mid-horizon), user 3 active days 1 and
    15 (resurrected at day 15: first seen at the 14-day horizon edge)."""
    rows = []
    eid = 0
    for day in range(1, 16):
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 1, day, 12, 0), 1, "view", 1.0, "{}")
        )
    eid += 1
    rows.append((eid, dt.datetime(2024, 1, 1, 13, 0), 2, "view", 1.0, "{}"))
    eid += 1
    rows.append((eid, dt.datetime(2024, 1, 1, 14, 0), 3, "view", 1.0, "{}"))
    eid += 1
    rows.append((eid, dt.datetime(2024, 1, 15, 14, 0), 3, "view", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["day"]: r
            for r in EVENT_QUERIES["events_churn_flags"](spark, d).collect()
        }
    d8 = out[dt.date(2024, 1, 8)]
    assert d8["n_retained"] == 1  # user 1 in both windows
    assert d8["n_churned"] == 2  # users 2 and 3: day 1 in (d-13..d-7], silent
    d15 = out[dt.date(2024, 1, 15)]
    assert d15["n_retained"] == 1
    assert d15["n_resurrected"] == 1  # user 3 returns, first day at horizon
    assert d15["n_churned"] == 0  # user 2 aged out of the band
    d1 = out[dt.date(2024, 1, 1)]
    assert d1["n_new"] == 3  # everyone first seen inside the horizon


def test_session_gap_distribution_buckets(spark):
    """Gaps of 30 s, 90 s and 2000 s land in minute buckets 0, 1 and 33,
    with only the first two inside the 30-min session threshold."""
    times = [0, 30, 120, 2120]
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1, 0, 0, 0)
            + dt.timedelta(seconds=t),
            1,
            "click",
            1.0,
            "{}",
        )
        for i, t in enumerate(times)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["bucket_min"]: r
            for r in EVENT_QUERIES["events_session_gap_distribution"](
                spark, d
            ).collect()
        }
    assert out[0]["n_gaps"] == 1 and out[0]["n_within_session"] == 1
    assert out[1]["n_gaps"] == 1 and out[1]["n_within_session"] == 1
    assert out[33]["n_gaps"] == 1 and out[33]["n_within_session"] == 0


def test_value_concentration_gini(spark):
    """Type 'flat' (all values equal) reads G = 0; type 'skew' with
    values {1, 3} reads the population Gini 0.25."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, "flat", 2.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 1), 1, "flat", 2.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 2), 2, "skew", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 0, 3), 2, "skew", 3.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r["event_type"]: r
            for r in EVENT_QUERIES["events_value_concentration_by_type"](
                spark, d
            ).collect()
        }
    assert out["flat"]["gini"] == pytest.approx(0.0, abs=1e-12)
    assert out["skew"]["gini"] == pytest.approx(0.25, abs=1e-12)


# --- text family -----------------------------------------------------------

import hashlib

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


def _ph60_mod(s: str, m: int) -> int:
    """Python twin of helpers.phash60(...) % m for planted fixtures."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m


def test_char_trigram_tvd_disjoint_sources(spark):
    """Two sources with disjoint char-trigram vocabularies split the
    corpus 50/50: each source's TVD vs the mix is exactly 0.5."""
    rows = [_doc(1, "aaaa", "sA"), _doc(2, "bbbb", "sB")]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            r["source"]: r
            for r in TEXT_QUERIES["text_char_trigram_source_tvd"](
                spark, d
            ).collect()
        }
    assert out["sA"]["n_trigrams"] == 2
    assert out["sA"]["tvd_vs_corpus"] == pytest.approx(0.5, abs=1e-9)
    assert out["sB"]["tvd_vs_corpus"] == pytest.approx(0.5, abs=1e-9)


def test_punctuation_profile_counts(spark):
    """Ten tokens gain two injected sentence terminals; the
    hash-selected suffix for the planted doc_id is accounted exactly."""
    doc_id = next(
        i for i in range(1, 50) if _ph60_mod(f"punct:{i}", 4) == 0
    )
    text = "a b c d e f g h i j"
    rows = [_doc(doc_id, text)]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = TEXT_QUERIES["text_punctuation_profile"](spark, d).collect()[0]
    # sentence machinery: '. ' after each complete 5-token group that is
    # followed by more text -> 1 period; suffix ' ok, fine, yes!' adds
    # 2 commas + 1 exclamation.
    assert out["n_period"] == 1
    assert out["n_excl"] == 1
    assert out["n_comma"] == 2
    assert out["n_quest"] == 0


def test_repeated_substring_mass_doubled_phrase(spark):
    """An 8-token phrase written twice yields 9 shingles of which the
    lead shingle repeats (positions 1 and 9): share = 2/9."""
    phrase = "a b c d e f g h"
    rows = [_doc(1, phrase + " " + phrase)]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = TEXT_QUERIES["text_repeated_substring_mass"](
            spark, d
        ).collect()[0]
    assert out["n_shingles"] == 9
    assert out["n_repeated"] == 2
    assert out["repeat_share"] == pytest.approx(2.0 / 9.0, abs=1e-12)


def test_lead_dup_cluster_histogram(spark):
    """Two docs sharing their first 16 tokens from different sources
    form a size-2 cluster with source spread 2; a third doc stands
    alone."""
    lead = " ".join(f"w{i}" for i in range(16))
    rows = [
        _doc(1, lead + " tail one", "sA"),
        _doc(2, lead + " other tail", "sB"),
        _doc(3, "completely different text entirely", "sA"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            r["cluster_size"]: r
            for r in TEXT_QUERIES["text_lead_dup_cluster"](
                spark, d
            ).collect()
        }
    assert out[2]["n_clusters"] == 1
    assert out[2]["max_source_spread"] == 2
    assert out[1]["n_clusters"] == 1


def test_numeric_claim_density_gate(spark):
    """A no-injection doc that is 3/4 numerals clears the 30% gate; a
    no-injection all-letters doc stays at zero."""
    ids = [i for i in range(1, 200) if _ph60_mod(f"num:{i}", 4) >= 2]
    rows = [
        _doc(ids[0], "1 2 3 x"),
        _doc(ids[1], "plain words only here"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            r["doc_id"]: r
            for r in TEXT_QUERIES["text_numeric_claim_density"](
                spark, d
            ).collect()
        }
    assert out[ids[0]]["numeral_density"] == pytest.approx(0.75, abs=1e-12)
    assert out[ids[0]]["is_table_like"] == 1
    assert out[ids[1]]["numeral_tokens"] == 0
    assert out[ids[1]]["is_table_like"] == 0


def test_vocab_jaccard_two_sources(spark):
    """Vocabularies {a,b,c} and {b,c,d}: intersection 2, union 4,
    jaccard 0.5."""
    rows = [_doc(1, "a b c", "sA"), _doc(2, "b c d", "sB")]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = TEXT_QUERIES["text_vocab_jaccard_matrix"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("sA", "sB")
    assert (r["n_a"], r["n_b"], r["n_inter"]) == (3, 3, 2)
    assert r["jaccard"] == pytest.approx(0.5, abs=1e-12)


# --- similarity / dedup families --------------------------------------------

from large_csv_etl_spark.queries.dedup import QUERIES as DEDUP_QUERIES
from large_csv_etl_spark.queries.similarity import QUERIES as SIM_QUERIES


def _emb_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(2).write.parquet(f"{d}/embeddings.parquet")


def test_rank_agreement_full_overlap(spark):
    """Four candidates and one panel query: both top-10s hold all four,
    so overlap = 4 and jaccard = 4/16."""
    qid = next(
        i for i in range(1, 400) if _ph60_mod(f"rankq:{i}", 50) == 0
    )
    rows = [(qid, [1.0, 0.0], 0)]
    cand_ids = [
        i
        for i in range(1, 400)
        if i != qid and _ph60_mod(f"rankq:{i}", 50) != 0
    ][:4]
    for j, cid in enumerate(cand_ids):
        rows.append((cid, [1.0, 0.1 * (j + 1)], 1))
    with tempfile.TemporaryDirectory() as d:
        _emb_dir(spark, rows, d)
        out = SIM_QUERIES["sim_cosine_euclidean_rank_agreement"](
            spark, d
        ).collect()
    assert len(out) == 1
    assert out[0]["query_vec_id"] == qid
    assert out[0]["n_overlap"] == 4
    assert out[0]["jaccard_top10"] == pytest.approx(0.25, abs=1e-12)


def test_kmeans_inertia_curve_monotone(spark):
    """Inertia is monotone non-increasing in k, and with k >= distinct
    points it reaches 0: four planted points, ks 2/4/8."""
    rows = [
        (0, [0.0, 0.0], 0),
        (1, [1.0, 0.0], 0),
        (2, [10.0, 10.0], 1),
        (3, [11.0, 10.0], 1),
    ]
    with tempfile.TemporaryDirectory() as d:
        _emb_dir(spark, rows, d)
        out = {
            r["k"]: r
            for r in SIM_QUERIES["sim_kmeans_inertia_curve"](
                spark, d
            ).collect()
        }
    assert set(out) == {2, 4, 8}
    assert all(r["n_vectors"] == 4 for r in out.values())
    assert out[2]["inertia"] >= out[4]["inertia"] >= out[8]["inertia"]
    assert out[4]["inertia"] == 0.0  # k=4 covers every distinct point


def test_norm_percentile_bands_order(spark):
    """Ten unit-spaced norms tile NTILE(10) one per band, each band's
    range degenerate at its own norm."""
    rows = [(i, [float(i), 0.0], i % 2) for i in range(1, 11)]
    with tempfile.TemporaryDirectory() as d:
        _emb_dir(spark, rows, d)
        out = SIM_QUERIES["sim_norm_percentile_bands"](spark, d).collect()
    assert len(out) == 10
    by_band = sorted(out, key=lambda r: r["band"])
    assert [r["n_vecs"] for r in by_band] == [1] * 10
    assert [r["min_norm6"] for r in by_band] == [
        i * 1000000 for i in range(1, 11)
    ]


def test_silhouette_separated_clusters(spark):
    """Two tight, far-apart label clusters: every panel vector sits
    nearly on its own centroid, so the mean silhouette approaches 1."""
    rows = []
    for i in range(40):
        lab = i % 2
        base = 0.0 if lab == 0 else 100.0
        rows.append((i, [base + 0.01 * (i // 2 % 2), 0.0], lab))
    with tempfile.TemporaryDirectory() as d:
        _emb_dir(spark, rows, d)
        out = SIM_QUERIES["sim_silhouette_sampled"](spark, d).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_panel"] >= 1
        if r["n_scored"] > 0:
            assert r["mean_silhouette"] > 0.99


def test_transitivity_audit_chain_violation(spark):
    """A~B and B~C strong but A and C share nothing: one triple, one
    violation (jaccard(A,C) = 0 < 0.1)."""
    # B bridges A and C: A shares its first half with B, C its second
    # half, and A/C are disjoint.
    part1 = " ".join(f"a{i}" for i in range(12))
    part2 = " ".join(f"c{i}" for i in range(12))
    rows = [
        _doc(1, part1),
        _doc(2, part1 + " " + part2),
        _doc(3, part2),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = DEDUP_QUERIES["dedup_transitivity_audit"](spark, d).collect()[0]
    assert out["n_strong_pairs"] == 2
    assert out["n_triples"] == 1
    assert out["n_violations"] == 1
    assert out["violation_share"] == pytest.approx(1.0, abs=1e-12)


# --- etl / quality families -------------------------------------------------

from large_csv_etl_spark.queries.etl import QUERIES as ETL_QUERIES
from large_csv_etl_spark.queries.quality import QUERIES as DQ_QUERIES


def test_dead_column_detector_verdicts(spark):
    """Planted 10-row orders: the literal column reads 'constant', the
    balanced priority column reads 'healthy', and the gappy column's
    null count equals the hash-derived injection exactly."""
    rows = []
    for i in range(1, 11):
        pri = "1-URGENT" if i % 2 == 0 else "3-MEDIUM"
        rows.append((i, i, "O", 10.0, dt.datetime(1995, 1, i), pri))
    expected_nulls = sum(
        1 for i in range(1, 11) if _ph60_mod(f"dead:{i}", 1000) < 50
    )
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["column_name"]: r
            for r in ETL_QUERIES["etl_dead_column_detector"](
                spark, d
            ).collect()
        }
    assert out["col_constant"]["verdict"] == "constant"
    assert out["col_healthy"]["verdict"] == "healthy"
    assert out["col_gappy"]["n_nulls"] == expected_nulls


def test_composite_key_collision_no_collisions(spark):
    """Three distinct composite keys cannot collide at any width; the
    birthday expectation at width 8 is 3 pairs / 2^32."""
    rows = [
        (k, k * 7, "O", 10.0, dt.datetime(1995, 1, k), "3-M")
        for k in (1, 2, 3)
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["width"]: r
            for r in ETL_QUERIES["etl_composite_key_collision"](
                spark, d
            ).collect()
        }
    assert set(out) == {8, 12, 16}
    for r in out.values():
        assert r["n_collisions"] == 0
    assert out[8]["expected_collisions"] == pytest.approx(
        3.0 / 4294967296.0, rel=1e-12
    )


def test_quarantine_rate_trend_fixture_truth(spark):
    """The committed feed's dirt is index-deterministic: month m has
    2m bad-amount rows, 6 blank keys, 4 negatives; every month-over-
    month jump ties at +2/200 so months 2-6 all carry the flag."""
    out = {
        r["month"].month: r
        for r in ETL_QUERIES["etl_quarantine_rate_trend"](
            spark, None
        ).collect()
    }
    assert len(out) == 6
    for m in range(1, 7):
        r = out[m]
        assert r["n_rows"] == 200
        assert r["n_bad_amount"] == 2 * m
        assert r["n_missing_key"] == 6
        assert r["n_negative"] == 4
        assert r["n_rejects"] == 2 * m + 10
    assert out[1]["largest_jump_flag"] == 0
    for m in range(2, 7):
        assert out[m]["largest_jump_flag"] == 1


def test_header_drift_audit_committed_fixtures(spark):
    """evolve_v1 -> evolve_v2: id and amount unchanged, category added
    at ordinal 3."""
    out = {
        r["column_name"]: r
        for r in ETL_QUERIES["etl_header_drift_audit"](
            spark, None
        ).collect()
    }
    assert out["id"]["change"] == "unchanged"
    assert out["amount"]["change"] == "unchanged"
    assert out["category"]["change"] == "added"
    assert out["category"]["ordinal_v2"] == 3
    assert out["category"]["ordinal_v1"] is None


def test_entropy_free_gate_boundary(spark):
    """99:1 status split -> impurity 0.0198 < 0.02 (flagged); the
    balanced priority column is far above the gate."""
    rows = []
    for i in range(1, 101):
        status = "O" if i > 1 else "F"
        pri = "1-URGENT" if i % 2 == 0 else "3-MEDIUM"
        rows.append((i, i, status, 10.0, dt.datetime(1995, 1, 1), pri))
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["column_name"]: r
            for r in DQ_QUERIES["dq_constant_column_entropy_free"](
                spark, d
            ).collect()
        }
    assert out["o_orderstatus"]["gini_impurity"] == pytest.approx(
        0.0198, abs=1e-12
    )
    assert out["o_orderstatus"]["is_near_constant"] == 1
    assert out["o_orderpriority"]["is_near_constant"] == 0
    assert out["synth_constant"]["gini_impurity"] == 0.0


def _lineitem_fk_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber long, l_shipdate timestamp"
    )
    df.coalesce(2).write.parquet(f"{d}/lineitem.parquet")


def test_orphan_trend_injection(spark):
    """Line items whose hash selects them for injection count as
    orphans; the rest resolve against orders."""
    month = 6  # injection band is h < 18 in June
    clean = [
        (k, n)
        for k in range(1, 50)
        for n in (1,)
        if _ph60_mod(f"orph:{k}:{n}", 1000) >= 3 * month
    ][:4]
    dirty = [
        (k, n)
        for k in range(1, 500)
        for n in (2,)
        if _ph60_mod(f"orph:{k}:{n}", 1000) < 3 * month
    ][:1]
    li = [
        (k, n, dt.datetime(1995, month, 15)) for k, n in clean + dirty
    ]
    orders = [
        (k, k, "O", 10.0, dt.datetime(1995, 1, 1), "3-M")
        for k in range(1, 500)
    ]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_fk_dir(spark, li, d)
        _orders_dir(spark, orders, d)
        out = DQ_QUERIES["dq_referential_orphan_trend"](spark, d).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 5
    assert out[0]["n_orphans"] == 1
    assert out[0]["orphan_rate"] == pytest.approx(0.2, abs=1e-9)


# --- sampling / temporal / graph / multimodal families ----------------------

from large_csv_etl_spark.queries.multimodal import QUERIES as MM_QUERIES
from large_csv_etl_spark.queries.sampling import QUERIES as SAMPLE_QUERIES
from large_csv_etl_spark.queries.temporal import QUERIES as TEMP_QUERIES


def _customer_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows, "c_custkey long, c_acctbal double, c_mktsegment string"
    )
    df.coalesce(2).write.parquet(f"{d}/customer.parquet")


def test_neyman_vs_proportional_degenerate_stratum(spark):
    """Stratum A has zero spread (weight 0), B carries all the Neyman
    budget; proportional splits 50/50. Both plans sum to exactly
    10,000 (largest-remainder)."""
    rows = []
    key = 0
    for i in range(100):
        key += 1
        rows.append((key, key, "O", 5.0, dt.datetime(1995, 1, 1), "A"))
    for i in range(100):
        key += 1
        price = 1.0 if i % 2 == 0 else 3.0
        rows.append((key, key, "O", price, dt.datetime(1995, 1, 1), "B"))
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            r["stratum"]: r
            for r in SAMPLE_QUERIES[
                "sample_stratified_neyman_vs_proportional"
            ](spark, d).collect()
        }
    assert out["A"]["neyman_n"] == 0
    assert out["B"]["neyman_n"] == 10000
    assert out["A"]["proportional_n"] == 5000
    assert out["B"]["proportional_n"] == 5000
    assert out["A"]["var_term_neyman"] is None  # zero-alloc guard
    assert out["A"]["var_term_proportional"] == pytest.approx(0.0)


def test_swor_panel_membership_checksum(spark):
    """600 customers, panel 500: membership is exactly the md5-lowest
    500 keys; per-segment counts and checksums reproduce in Python."""
    rows = [(k, 0.0, "SEG" + str(k % 3)) for k in range(1, 601)]
    picked = sorted(
        range(1, 601),
        key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k),
    )[:500]
    with tempfile.TemporaryDirectory() as d:
        _customer_dir(spark, rows, d)
        out = {
            r["segment"]: r
            for r in SAMPLE_QUERIES["sample_deterministic_swor_panel"](
                spark, d
            ).collect()
        }
    assert sum(r["n_selected"] for r in out.values()) == 500
    for s in range(3):
        seg = f"SEG{s}"
        members = [k for k in picked if k % 3 == s]
        assert out[seg]["n_selected"] == len(members)
        assert out[seg]["sample_key_checksum"] == sum(members)


def test_gap_islands_coverage_split(spark):
    """Days 1-5 then 50-52 (gap 45 > 30): two islands, covered 8 of a
    52-day span."""
    rows = [
        (i, i, "O", 1.0, dt.datetime(1995, 1, day), "3-M")
        for i, day in enumerate([1, 2, 3, 4, 5], 1)
    ]
    rows += [
        (10 + i, 10 + i, "O", 1.0, dt.datetime(1995, 2, day), "3-M")
        for i, day in enumerate([19, 20, 21], 1)
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = TEMP_QUERIES["temporal_gap_islands_coverage"](
            spark, d
        ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_islands"] == 2
    assert r["covered_days"] == 8
    assert r["span_days"] == 52
    assert r["coverage_share"] == pytest.approx(8.0 / 52.0, abs=1e-12)


def _li_parts_dir(spark, rows, d):
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.coalesce(2).write.parquet(f"{d}/lineitem.parquet")


def test_graph_strength_two_node_edge(spark):
    """Two customers both buy parts 10 and 20: one weight-2 edge, both
    endpoints read strength 2 / degree 1."""
    orders = [
        (1, 1, "O", 1.0, dt.datetime(1995, 1, 1), "3-M"),
        (2, 2, "O", 1.0, dt.datetime(1995, 1, 2), "3-M"),
    ]
    li = [(1, 10), (1, 20), (2, 10), (2, 20)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, orders, d)
        _li_parts_dir(spark, li, d)
        out = TEXT_QUERIES["graph_weighted_degree_strength"](
            spark, d
        ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["strength"] == 2
    assert r["n_parts"] == 2
    assert (r["min_degree"], r["max_degree"]) == (1, 1)


def test_aspect_bucket_census_three_shapes(spark):
    """Byte lengths 0 / 100 / 240 decode to 16x16 (square), 116x30
    (landscape) and 16x50 (portrait) under the stub dims."""
    rows = [
        _doc(1, ""),
        _doc(2, "x" * 100),
        _doc(3, "x" * 240),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            r["bucket"]: r
            for r in MM_QUERIES["multimodal_aspect_bucket_census"](
                spark, d
            ).collect()
        }
    assert out["square"]["n_docs"] == 1
    assert out["landscape"]["n_docs"] == 1
    assert out["portrait"]["n_docs"] == 1
    assert out["square"]["total_pad_pixels"] == 0  # 16x16 scales to 224x224


# --- streaming family -------------------------------------------------------

from large_csv_etl_spark.queries.streamq import QUERIES as STREAM_QUERIES


def test_append_mode_hourly_scope(spark):
    """One event per hour 0-9: the graded region stops strictly below
    trunc_hour(max) - 3h, so exactly hours 0-5 surface, each final."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (h, dt.datetime(2024, 1, 1, h, 30), 1, "view", 1.0, "{}")
        for h in range(10)
    ]
    with tempfile.TemporaryDirectory() as d:
        # single-file layout: the streaming reader's footer probe globs
        # for a FILE named events.parquet (the driver fixture layout)
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        )
        pq.write_table(tbl, f"{d}/events.parquet")
        out = sorted(
            STREAM_QUERIES["streaming_append_mode_hourly"](
                spark, d
            ).collect(),
            key=lambda r: r["hour_start"],
        )
    assert [r["hour_start"].hour for r in out] == list(range(6))
    assert all(r["n_events"] == 1 for r in out)
    assert all(r["total_value"] == 1.0 for r in out)


def test_fullouter_interval_join_all_three_row_kinds(spark):
    """Matched, unmatched-click and unmatched-purchase rows all emit
    inside the graded region; the tail events that anchor the
    watermark are excluded by the cutoff."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, dt.datetime(2024, 1, 1, 1, 0), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1, 30), 1, "purchase", 5.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 1, 0), 2, "click", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 1, 0), 3, "purchase", 7.0, "{}"),
        # tail anchors: push both watermarks a day ahead
        (5, dt.datetime(2024, 1, 2, 10, 0), 9, "click", 1.0, "{}"),
        (6, dt.datetime(2024, 1, 2, 12, 0), 9, "purchase", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        )
        pq.write_table(tbl, f"{d}/events.parquet")
        out = STREAM_QUERIES["streaming_fullouter_interval_join"](
            spark, d
        ).collect()
    kinds = {(r["click_id"], r["purchase_id"]) for r in out}
    assert kinds == {(1, 2), (3, None), (None, 4)}
    matched = next(r for r in out if r["click_id"] == 1)
    assert matched["purchase_value"] == 5.0


def test_zorder_pruning_audit_orderings(spark, sf_dir):
    """The audit's defining inequalities on the driver fixture: hash
    prunes nothing, the single-column sort prunes only its own probe,
    and Z-order prunes BOTH probes strictly better than hash."""
    out = {
        r["layout"]: r
        for r in ETL_QUERIES["layout_zorder_pruning_audit"](
            spark, sf_dir
        ).collect()
    }
    h, s, z = out["hash"], out["sort_custkey"], out["zorder"]
    # hash never beats a clustered layout on its clustered dimension
    assert s["files_scanned_custkey_probe"] < h["files_scanned_custkey_probe"]
    assert z["files_scanned_custkey_probe"] < h["files_scanned_custkey_probe"]
    # the single-column sort cannot prune the other dimension at all
    assert s["files_scanned_cents_probe"] == s["n_files"]
    # Z-order prunes BOTH probes below the full file count
    assert z["files_scanned_custkey_probe"] < z["n_files"]
    assert z["files_scanned_cents_probe"] < z["n_files"]
    assert z["files_scanned_cents_probe"] < s["files_scanned_cents_probe"]
