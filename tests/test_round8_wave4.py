"""Semantic checks for the round-8 wave-4 operators (beyond the oracle
diff the mimic already runs): planted fixtures exercising each operator's
defining property."""

from __future__ import annotations

import datetime as dt
import tempfile

from large_csv_etl_spark.queries.etl import QUERIES as ETL_QUERIES
from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES
from large_csv_etl_spark.queries.relational import QUERIES as REL_QUERIES
from large_csv_etl_spark.queries.sampling import QUERIES as SAMPLE_QUERIES
from large_csv_etl_spark.queries.similarity import QUERIES as SIM_QUERIES
from large_csv_etl_spark.queries.streamq import QUERIES as STREAM_QUERIES
from large_csv_etl_spark.queries.text import QUERIES as TEXT_QUERIES

from .conftest import SF_DIR


def _orders_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    df.coalesce(2).write.parquet(f"{d}/orders.parquet")


def _lineitem_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    df.coalesce(2).write.parquet(f"{d}/lineitem.parquet")


def _part_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    df.coalesce(1).write.parquet(f"{d}/part.parquet")


def _events_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(2).write.parquet(f"{d}/events.parquet")


def _events_file(spark, rows, d):
    """Single FILE named events.parquet (the shape the stream reader's
    pathGlobFilter expects), not a Spark-written directory."""
    import glob as _glob
    import shutil

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    stage = f"{d}/_stage_events"
    df.coalesce(1).write.parquet(stage)
    part = _glob.glob(f"{stage}/part-*.parquet")[0]
    shutil.copy(part, f"{d}/events.parquet")
    shutil.rmtree(stage)


def _docs_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(2).write.parquet(f"{d}/documents.parquet")


def _emb_dir(spark, rows, d):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(f"{d}/embeddings.parquet")


def _order(k, status, price):
    return (k, k, status, price, dt.datetime(2024, 1, 1), "1-URGENT")


def _li(ok, pk):
    return (
        ok, pk, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
        dt.datetime(2024, 1, 2),
    )


# --- Mann-Whitney / KS / Spearman ---------------------------------------


def test_mann_whitney_complete_separation(spark):
    """All F values below all O values: U_F = 0 (no F>O pair, no tie),
    U_O = n_f * n_o."""
    rows = [_order(i, "F", float(i)) for i in range(1, 4)]
    rows += [_order(i, "O", float(i)) for i in range(10, 13)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        r = REL_QUERIES["agg_mann_whitney_u"](spark, d).collect()[0]
    assert (r.n_f, r.n_o) == (3, 3)
    assert r.u_f_x2 == 0 and r.u_o_x2 == 18
    assert r.tie_term == 0 and r.u_stat == 0.0


def test_mann_whitney_ties_get_half_credit(spark):
    """One F and one O at the same value: the tied pair contributes 1/2
    to each U (doubled units: 1 each), and tie_term = t^3 - t = 6."""
    rows = [_order(1, "F", 5.0), _order(2, "O", 5.0)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        r = REL_QUERIES["agg_mann_whitney_u"](spark, d).collect()[0]
    assert r.u_f_x2 == 1 and r.u_o_x2 == 1
    assert r.tie_term == 6


def test_ks_disjoint_distributions_d_is_one(spark):
    rows = [_order(i, "F", float(i)) for i in range(1, 4)]
    rows += [_order(i, "O", float(i)) for i in range(10, 13)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        r = REL_QUERIES["agg_ks_two_sample"](spark, d).collect()[0]
    assert r.d_stat == 1.0 and r.d_num == 9


def test_ks_identical_distributions_d_is_zero(spark):
    rows = [_order(i, "F", float(i % 3)) for i in range(3)]
    rows += [_order(i + 10, "O", float(i % 3)) for i in range(3)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        r = REL_QUERIES["agg_ks_two_sample"](spark, d).collect()[0]
    assert r.d_stat == 0.0


def test_spearman_perfect_monotone(spark):
    """Quantity and price perfectly co-monotone per flag: rho = +1; a
    reversed flag gives rho = -1 even though the relation is nonlinear."""
    rows = [_li(i, 1) for i in range(4)]
    li = []
    for i, r in enumerate(rows):
        li.append(
            (i, 1, 1, 1, float(i + 1), float((i + 1) ** 3), 0.0, 0.0,
             "A", "O", dt.datetime(2024, 1, 2))
        )
        li.append(
            (i + 10, 1, 1, 1, float(i + 1), float(100 - i), 0.0, 0.0,
             "R", "O", dt.datetime(2024, 1, 2))
        )
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, li, d)
        out = {
            r.flag: r.rho_spearman
            for r in REL_QUERIES["agg_spearman_rho"](spark, d).collect()
        }
    # rho passes through sqrt(80)*sqrt(80), which is 1 ulp shy of exact
    # 80.0 — cross-engine equality is what the oracle grades; here we
    # assert the statistic itself to within an ulp.
    assert abs(out["A"] - 1.0) < 1e-12 and abs(out["R"] + 1.0) < 1e-12


# --- graph wave ----------------------------------------------------------


def test_modularity_two_perfect_communities(spark):
    """Two brand-aligned triangles, no inter-community edges: Q = 1/2
    (the textbook two-equal-communities value)."""
    li = [_li(1, p) for p in (1, 2, 3)] + [_li(2, p) for p in (4, 5, 6)]
    parts = [
        (p, f"p{p}", "B1" if p <= 3 else "B2", "t", 1, 1.0)
        for p in range(1, 7)
    ]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, li, d)
        _part_dir(spark, parts, d)
        r = TEXT_QUERIES["graph_modularity_brand"](spark, d).collect()[0]
    assert (r.n_edges, r.n_communities) == (6, 2)
    assert r.modularity == 0.5


def test_modularity_antialigned_partition_is_negative(spark):
    """Brands that CUT both triangles in half: every edge is
    inter-community, so Q < 0."""
    li = [_li(1, p) for p in (1, 2, 3)] + [_li(2, p) for p in (4, 5, 6)]
    parts = [
        (p, f"p{p}", "B1" if p % 2 == 0 else "B2", "t", 1, 1.0)
        for p in range(1, 7)
    ]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, li, d)
        _part_dir(spark, parts, d)
        r = TEXT_QUERIES["graph_modularity_brand"](spark, d).collect()[0]
    assert r.modularity < 0


def test_local_clustering_triangle_with_pendant(spark):
    """Triangle {1,2,3} plus pendant edge 3-4 (orderkeys divisible by 4
    so the mod-4 stratum keeps them): nodes 1,2 have coefficient 1
    (coef_fp 1e6), node 3 has 1/3 (333333 after floor division), node 4
    (degree 1) is excluded."""
    li = [_li(4, p) for p in (1, 2, 3)] + [_li(8, p) for p in (3, 4)]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, li, d)
        out = {
            r.node: (r.degree, r.n_triangles, r.coef_fp)
            for r in TEXT_QUERIES["graph_local_clustering"](
                spark, d
            ).collect()
        }
    assert out[1] == (2, 1, 1000000)
    assert out[2] == (2, 1, 1000000)
    assert out[3] == (3, 1, 333333)
    assert 4 not in out


def test_bfs_khop_path_graph(spark):
    """Path 1-2-3-4-5: the seed is the smallest max-degree node (2), so
    the frontiers are {2}, {1,3}, {4}, {5}."""
    li = []
    for k, (a, b) in enumerate([(1, 2), (2, 3), (3, 4), (4, 5)]):
        li += [_li(k, a), _li(k, b)]
    with tempfile.TemporaryDirectory() as d:
        _lineitem_dir(spark, li, d)
        out = {
            r.hop: r.n_new
            for r in TEXT_QUERIES["graph_bfs_khop"](spark, d).collect()
        }
    assert out == {0: 1, 1: 2, 2: 1, 3: 1}


# --- streaming upsert / backfill / pseudonymization ----------------------


def test_streaming_upsert_keeps_latest_event(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, t(0), 7, "click", 1.0, "{}"),
        (2, t(30), 7, "purchase", 2.0, "{}"),
        (3, t(10), 8, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_file(spark, rows, d)
        out = {
            r.user_id: (r.last_event_id, r.last_event_type)
            for r in STREAM_QUERIES["streaming_upsert_latest_event"](
                spark, d
            ).collect()
        }
    assert out == {7: (2, "purchase"), 8: (3, "view")}


def test_backfill_plan_coalesces_missing_hours(spark):
    """Type A present hours 0,1,2,5; type B present 0..5: A's missing
    hours 3-4 coalesce into one backfill job."""
    h = lambda x: dt.datetime(2024, 1, 1, x)
    rows = []
    eid = 0
    for x in (0, 1, 2, 5):
        eid += 1
        rows.append((eid, h(x), 1, "A", 1.0, "{}"))
    for x in range(6):
        eid += 1
        rows.append((eid, h(x), 2, "B", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        plan = ETL_QUERIES["etl_backfill_plan"](spark, d).collect()
    assert len(plan) == 1
    r = plan[0]
    assert r.event_type == "A" and r.n_hours == 2
    assert r.backfill_start == h(3) and r.backfill_end == h(4)


def test_pseudonymize_audit_invariants_on_fixture(spark):
    """On the real fixture: zero token collisions and join cardinality
    preserved under tokens."""
    r = ETL_QUERIES["etl_pseudonymize_audit"](spark, SF_DIR).collect()[0]
    assert r.n_keys == r.n_tokens
    assert r.n_joined_raw == r.n_joined_pseudo


# --- target encoding / lexicon router ------------------------------------


def test_target_encoding_loo_closed_form(spark):
    """Group A: 3 rows, 2 positives. LOO for a positive row = (2-1)/2 =
    0.5; for a negative row = 2/2 = 1.0 (on the 1e9 lattice)."""
    rows = [
        _order(1, "F", 1.0), _order(2, "F", 1.0), _order(3, "O", 1.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        out = {
            (r.grp, r.y): (r.n_rows, r.enc_loo_fp)
            for r in SAMPLE_QUERIES["sample_target_encoding_loo"](
                spark, d
            ).collect()
        }
    assert out[("1-URGENT", 1)] == (2, 500000000)
    assert out[("1-URGENT", 0)] == (1, 1000000000)


def test_lexicon_router_thresholds(spark):
    """A pure-lexicon doc routes; a lexicon-free doc does not; 1 of 4
    hit tokens (25%) sits exactly ON the >= threshold and routes."""
    docs = [
        (1, "key hash table", "en", "s1", 14),
        (2, "apple banana cherry pie", "en", "s1", 23),
        (3, "key apple banana cherry", "en", "s2", 23),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        out = {
            r.source: (r.n_docs, r.n_routed, r.total_hits)
            for r in TEXT_QUERIES["text_lexicon_router"](
                spark, d
            ).collect()
        }
    assert out["s1"] == (2, 1, 3)
    assert out["s2"] == (1, 1, 1)


# --- NDCG / survival ------------------------------------------------------


def test_ndcg_perfect_and_zero_retrieval(spark):
    """Query 0 (label 1): its only relevant vector is ranked first ->
    NDCG = 1. Query 1 (label 9) has one relevant vector ranked below an
    irrelevant one -> DCG uses the rank-2 discount, NDCG = w2/w1."""
    emb = [
        (0, [1.0, 0.0], 1),
        (1, [0.0, 1.0], 9),
        (100, [1.0, 0.0], 1),     # rank 1 for q0 (cos 1)
        (101, [0.9, 0.45], 2),    # irrelevant, high cos for q1? no: q1=[0,1]
        (102, [0.1, 1.0], 9),     # relevant to q1, cos ~0.995
        (103, [0.0, 1.0], 3),     # irrelevant, cos 1.0 for q1 -> rank 1
    ]
    with tempfile.TemporaryDirectory() as d:
        _emb_dir(spark, emb, d)
        out = {
            r.q_id: r for r in SIM_QUERIES["sim_ndcg_eval"](
                spark, d
            ).collect()
        }
    assert out[0].n_hits == 1 and out[0].dcg_fp == 1000000000
    assert out[0].idcg_fp == 1000000000 and out[0].ndcg_at_10 == 1.0
    # q1: relevant vec 102 ranked below irrelevant 103 -> rank-2 weight
    assert out[1].dcg_fp == 630929754
    assert out[1].idcg_fp == 1000000000
    assert out[1].ndcg_at_10 == 630929754 / 1000000000


def test_survival_risk_table_counts(spark):
    """Three users: one churned at duration 0 (last event 30 days before
    the horizon), two censored. The single risk row is at duration 0
    with all three at risk."""
    day = lambda x, hh=0: dt.datetime(2024, 2, 1 + x, hh)
    rows = [
        # user 1: single event, 30 days before horizon -> churned, dur 0
        (1, dt.datetime(2024, 1, 2), 1, "click", 1.0, "{}"),
        # user 2: active until 1 day before horizon -> censored, dur 10
        (2, day(0), 2, "click", 1.0, "{}"),
        (3, day(10), 2, "click", 1.0, "{}"),
        # user 3: defines the horizon -> censored, dur 5
        (4, day(6), 3, "click", 1.0, "{}"),
        (5, day(11), 3, "click", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        risk = EVENT_QUERIES["events_survival_risk_table"](
            spark, d
        ).collect()
    assert len(risk) == 1
    r = risk[0]
    assert r.duration_days == 0
    assert r.n_at_risk == 3 and r.d_events == 1
    assert r.hazard_fp == 333333333


# --- wave 5: sketches / compression / data vault --------------------------


def test_compression_ratio_separates_repetitive_from_noise(spark):
    """The defining property of the zlib signal: repeated tokens land in
    the low band, 16-symbol hex soup in the mid band, full-printable
    pseudo-random text in the high band."""
    import hashlib

    rep = "the quick brown fox " * 50
    noise = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(31)
    )[: len(rep)]
    chars = []
    i = 0
    while len(chars) < len(rep):
        d = hashlib.md5(f"seed{i}".encode()).digest()
        chars.extend(chr(33 + b % 94) for b in d)
        i += 1
    rand = "".join(chars[: len(rep)])
    docs = [
        (1, rep, "en", "rep", len(rep)),
        (2, noise, "en", "noise", len(noise)),
        (3, rand, "en", "rand", len(rand)),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        out = {
            r.source: r
            for r in TEXT_QUERIES["text_compression_ratio"](
                spark, d
            ).collect()
        }
    assert out["rep"].ratio_fp_sum < out["noise"].ratio_fp_sum / 5
    assert out["noise"].ratio_fp_sum < out["rand"].ratio_fp_sum
    assert out["rep"].n_low == 1
    assert out["noise"].n_mid == 1
    assert out["rand"].n_high == 1


def test_compression_ratio_is_run_deterministic(spark):
    """Two invocations produce identical digests (fixed zlib version,
    level pinned)."""
    a = TEXT_QUERIES["text_compression_ratio"](spark, SF_DIR).collect()
    b = TEXT_QUERIES["text_compression_ratio"](spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmv_intersection_exact_mode_when_sketch_not_full(spark):
    """Fewer distinct users than k: theta = 2^60 and the estimate
    equals the exact overlap (the sketch degenerates to the set)."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = []
    eid = 0
    for u in range(10):
        eid += 1
        rows.append((eid, t(u), u, "click", 1.0, "{}"))
    for u in range(5, 15):  # overlap with click = users 5..9
        eid += 1
        rows.append((eid, t(u), u, "view", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        from large_csv_etl_spark.queries.approx import (
            QUERIES as APPROX_QUERIES,
        )

        r = APPROX_QUERIES["approx_kmv_intersection"](spark, d).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.type_a, row.type_b) == ("click", "view")
    assert row.n_exact == 5 and row.n_common == 5
    assert row.theta == 1152921504606846976
    assert row.kmv_estimate == 5.0


def test_data_vault_link_count_equals_distinct_relationships(spark):
    """Hub cardinalities equal business-key distincts; the link holds
    one row per distinct (custkey, orderkey) pair."""
    from large_csv_etl_spark.io import load_table

    out = {
        r.entity: r.n_rows
        for r in ETL_QUERIES["etl_data_vault_keys"](
            spark, SF_DIR
        ).collect()
    }
    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    assert out["hub_customer"] == c.select("c_custkey").distinct().count()
    assert out["hub_order"] == o.select("o_orderkey").distinct().count()
    assert (
        out["link_customer_order"]
        == o.select("o_custkey", "o_orderkey").distinct().count()
    )


# --- wave 6: k-center coreset / position attribution ----------------------


def test_kcenter_planted_farthest_selection(spark):
    """Three tight points near the origin plus one far outlier: the
    outlier is picked in round 2, and coverage collapses after it."""
    emb = [
        (0, [0.0, 0.0], 1),
        (1, [0.1, 0.0], 1),
        (2, [0.0, 0.1], 1),
        (3, [100.0, 100.0], 2),
    ]
    with tempfile.TemporaryDirectory() as d:
        _emb_dir(spark, emb, d)
        rows = SAMPLE_QUERIES["sample_kcenter_coreset"](spark, d).collect()
    by_round = {r.round: r for r in rows}
    assert by_round[1].center_vec_id == 0  # smallest vec_id seeds
    assert by_round[2].center_vec_id == 3  # the outlier is farthest
    assert by_round[2].coverage_after < by_round[1].coverage_after


def test_kcenter_coverage_monotone_on_fixture(spark):
    rows = SAMPLE_QUERIES["sample_kcenter_coreset"](
        spark, SF_DIR
    ).collect()
    cov = [r.coverage_after for r in sorted(rows, key=lambda r: r.round)]
    assert len(cov) == 4
    assert all(a >= b for a, b in zip(cov, cov[1:]))
    # each selected center's distance equals the previous coverage radius
    by_round = {r.round: r for r in rows}
    for k in (2, 3, 4):
        assert by_round[k].sel_d2 == by_round[k - 1].coverage_after


def test_position_attribution_credit_conserved(spark):
    """Planted journeys with 1, 2, and 5 touches: U-shaped credit sums
    to exactly 1,000,000 ppm per journey, middles share 20% with the
    largest remainder going to the earliest middle."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: one click then purchase -> single touch, 100%
        (1, t(0), 1, "click", 1.0, "{}"),
        (2, t(30), 1, "purchase", 9.0, "{}"),
        # user 2: click, view, purchase -> 50/50
        (3, t(0), 2, "click", 1.0, "{}"),
        (4, t(10), 2, "view", 1.0, "{}"),
        (5, t(30), 2, "purchase", 9.0, "{}"),
        # user 3: 5 touches -> 40/x/x/x/40 with 200000 = 3*66666 + 2
        (6, t(0), 3, "click", 1.0, "{}"),
        (7, t(5), 3, "view", 1.0, "{}"),
        (8, t(10), 3, "view", 1.0, "{}"),
        (9, t(15), 3, "view", 1.0, "{}"),
        (10, t(20), 3, "click", 1.0, "{}"),
        (11, t(30), 3, "purchase", 9.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r.event_type: r
            for r in EVENT_QUERIES["events_attribution_position"](
                spark, d
            ).collect()
        }
    total = sum(r.credit_ppm for r in out.values())
    assert total == 3 * 1000000  # three journeys, credit conserved
    # user 3: clicks get 400000+400000; views get 66667+66667+66666
    assert out["click"].credit_ppm == 1000000 + 500000 + 800000
    assert out["view"].credit_ppm == 500000 + 66667 + 66667 + 66666


# --- wave 7: Welch / capture-recapture / greedy coverage -------------------


def test_welch_ttest_zero_when_identical(spark):
    """Identical F and O samples: mean_diff = 0 and t = 0."""
    rows = [_order(i, "F", float(100 + i)) for i in range(5)]
    rows += [_order(i + 10, "O", float(100 + i)) for i in range(5)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        r = REL_QUERIES["agg_welch_ttest"](spark, d).collect()[0]
    assert r.mean_diff_dollars == 0.0 and r.t_stat == 0.0
    assert (r.n1, r.n2) == (5, 5)


def test_welch_ttest_known_value(spark):
    """F = {1,2,3}, O = {7,8,9}: mean diff -6, pooled SE = sqrt(2/3),
    t = -6 / sqrt(2/3); equal variances make Welch dof = 4."""
    import math

    rows = [_order(i, "F", float(i)) for i in (1, 2, 3)]
    rows += [_order(i + 10, "O", float(i)) for i in (7, 8, 9)]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        r = REL_QUERIES["agg_welch_ttest"](spark, d).collect()[0]
    assert r.mean_diff_dollars == -6.0
    assert abs(r.t_stat - (-6.0 / math.sqrt(2.0 / 3.0))) < 1e-12
    assert abs(r.welch_dof - 4.0) < 1e-12


def test_capture_recapture_chapman_known_value(spark):
    """n1=4 clicks, n2=3 views, overlap m=2: Chapman = 5*4//3 - 1 = 5;
    true population planted as 5."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = []
    eid = 0
    for u in (1, 2, 3, 4):
        eid += 1
        rows.append((eid, t(u), u, "click", 1.0, "{}"))
    for u in (3, 4, 5):
        eid += 1
        rows.append((eid, t(u), u, "view", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        from large_csv_etl_spark.queries.relational import (
            QUERIES as REL_Q,
        )

        r = REL_Q["agg_capture_recapture"](spark, d).collect()[0]
    assert (r.n1, r.n2, r.m, r.n_true) == (4, 3, 2, 5)
    assert r.chapman_estimate == 5


def test_greedy_coverage_gains_non_increasing(spark):
    rows = SAMPLE_QUERIES["sample_greedy_coverage"](
        spark, SF_DIR
    ).collect()
    rows = sorted(rows, key=lambda r: r.round)
    gains = [r.gain for r in rows]
    assert len(gains) == 3
    assert all(a >= b for a, b in zip(gains, gains[1:]))  # submodular
    # cumulative coverage equals the running sum of marginal gains
    assert rows[0].covered_total == gains[0]
    assert rows[1].covered_total == gains[0] + gains[1]
    assert rows[2].covered_total == sum(gains)


def test_greedy_coverage_planted_complementary_docs(spark):
    """Doc 1 has 4 bigrams, doc 2 has 3 DISJOINT bigrams, doc 3 repeats
    doc 1: greedy picks 1 then 2; doc 3 contributes nothing and round 3
    must pick it with gain 0 (only doc left)."""
    docs = [
        (1, "a b c d e", "en", "s", 9),
        (2, "p q r s", "en", "s", 7),
        (3, "a b c d e", "en", "s", 9),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, docs, d)
        rows = sorted(
            SAMPLE_QUERIES["sample_greedy_coverage"](spark, d).collect(),
            key=lambda r: r.round,
        )
    assert [r.doc_id for r in rows] == [1, 2, 3]
    assert [r.gain for r in rows] == [4, 3, 0]
    assert rows[-1].covered_total == 7


# --- wave 8: SMA crossover / triplet mining --------------------------------


def test_sma_crossover_planted_flip(spark):
    """Flat revenue for 25 days, then a 5x jump: the fast window rises
    above the slow one — exactly one golden cross, no death cross."""
    rows = []
    for i in range(30):
        price = 100.0 if i < 25 else 500.0
        rows.append(
            (i, i, "F", price,
             dt.datetime(2024, 1, 1) + dt.timedelta(days=i), "1-URGENT")
        )
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        from large_csv_etl_spark.queries.windows import (
            QUERIES as WIN_QUERIES,
        )

        out = WIN_QUERIES["window_sma_crossover"](spark, d).collect()
    assert [r.crossover for r in out] == ["golden"]
    assert out[0].day == dt.datetime(2024, 1, 26)  # first jump day


def test_triplet_mining_planted_hard_cases(spark):
    """Anchor 0 (label 1): the hardest positive is its FARTHEST
    same-label vector, the hardest negative its NEAREST other-label
    vector, and the violated margin goes negative."""
    emb = [
        (0, [1.0, 0.0], 1),
        (100, [1.0, 0.05], 1),   # easy positive (cos ~1)
        (101, [0.0, 1.0], 1),    # hard positive (cos 0)
        (102, [0.95, 0.3], 2),   # hard negative (cos ~0.95)
        (103, [-1.0, 0.0], 2),   # easy negative (cos -1)
    ]
    with tempfile.TemporaryDirectory() as d:
        _emb_dir(spark, emb, d)
        rows = SIM_QUERIES["sim_triplet_mining"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.anchor_id == 0
    assert r.pos_id == 101 and r.pos_cos == 0.0
    assert r.neg_id == 102
    assert r.margin < 0  # active violation: impostor closer than positive


# --- wave 9: file-format sources / temporal audit --------------------------


def test_fixed_width_parse_edge_rows(spark):
    """Leading zeros, negative amount, zero amount, and padding all
    parse; amounts are exact integer cents (never float)."""
    out = {
        r.id: (r.amount_cents, r.status)
        for r in ETL_QUERIES["etl_fixed_width_parse"](
            spark, SF_DIR
        ).collect()
    }
    assert out[1] == (12345, "OK")
    assert out[7890] == (-25000, "REF")
    assert out[31] == (0, "OK")
    assert out[456] == (9999999, "HOLD")
    assert len(out) == 8


def test_trailer_file_acceptance(spark):
    """The committed batch reconciles: count and integer-cents total
    both match the trailer record."""
    r = ETL_QUERIES["etl_trailer_file_parse"](spark, SF_DIR).collect()[0]
    assert r.batch_id == "BATCH001"
    assert r.count_ok and r.total_ok
    assert r.data_cents == r.trailer_cents == 115097
    assert r.n_data_rows == r.trailer_count == 5


def test_temporal_order_audit_planted_violation(spark):
    """One lineitem shipping BEFORE its order date must be counted as a
    violation with a negative min lag."""
    orders = [
        (1, 1, "F", 10.0, dt.datetime(2024, 1, 10), "1-URGENT"),
        (2, 2, "O", 10.0, dt.datetime(2024, 1, 10), "1-URGENT"),
    ]
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
         dt.datetime(2024, 1, 15)),   # fine: +5 days
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
         dt.datetime(2024, 1, 8)),    # violation: -2 days
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, orders, d)
        _lineitem_dir(spark, li, d)
        from large_csv_etl_spark.queries.quality import (
            QUERIES as DQ_QUERIES,
        )

        out = {
            r.status: r
            for r in DQ_QUERIES["dq_temporal_order_audit"](
                spark, d
            ).collect()
        }
    assert out["F"].n_violations == 0 and out["F"].min_lag_days == 5
    assert out["O"].n_violations == 1 and out["O"].min_lag_days == -2


# --- wave 10: rich club / revenue decomposition -----------------------------


def test_rich_club_density_dominates_on_fixture(spark):
    """Hub co-purchase density should not be below the whole-graph
    density on the fixture, and both lattices are consistent."""
    from large_csv_etl_spark.queries.text import QUERIES as TQ

    r = TQ["graph_rich_club"](spark, SF_DIR).collect()[0]
    assert r.m_club <= 100 * 99 // 2
    assert r.club_density_fp >= r.graph_density_fp
    assert r.club_density_fp == (2000000 * r.m_club) // (100 * 99)


def test_revenue_decomposition_reconciles(spark):
    """The four effects must sum exactly to the total revenue delta —
    the defining accounting identity of the bridge."""
    r = REL_QUERIES["agg_revenue_decomposition"](
        spark, SF_DIR
    ).collect()[0]
    total = (
        r.volume_effect_cents
        + r.price_mix_effect_cents
        + (r.new_parts_cents or 0)
        + (r.discontinued_cents or 0)
    )
    assert total == r.delta_cents
    assert r.n_carryover_parts > 0


def test_revenue_decomposition_pure_volume_case(spark):
    """One part, price held fixed, quantity doubled across the split:
    the whole delta lands in the volume effect."""
    orders = [
        (1, 1, "F", 10.0, dt.datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, "F", 10.0, dt.datetime(2024, 12, 31), "1-URGENT"),
    ]
    li = [
        (1, 7, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O",
         dt.datetime(2024, 1, 2)),
        (2, 7, 1, 1, 4.0, 40.0, 0.0, 0.0, "N", "O",
         dt.datetime(2024, 12, 30)),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, orders, d)
        _lineitem_dir(spark, li, d)
        r = REL_QUERIES["agg_revenue_decomposition"](
            spark, d
        ).collect()[0]
    assert r.delta_cents == 2000
    assert r.volume_effect_cents == 2000
    assert r.price_mix_effect_cents == 0


# --- wave 11: CUPED / partition pruning -------------------------------------


def test_cuped_variance_reduction_bounds(spark):
    """rho^2 lies in [0, 1] and theta matches cov/var recomputed from
    the same per-user table."""
    r = EVENT_QUERIES["events_cuped_adjustment"](
        spark, SF_DIR
    ).collect()[0]
    assert 0.0 <= r.var_reduction <= 1.0
    assert r.var_post > 0
    assert r.n > 0


def test_cuped_perfect_covariate(spark):
    """post = 2 * pre exactly: theta = 2 and CUPED removes ALL the
    variance (rho^2 = 1)."""
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 31)
    rows = []
    eid = 0
    for u, spend in [(1, 10.0), (2, 20.0), (3, 40.0)]:
        eid += 1
        rows.append((eid, t0, u, "purchase", spend, "{}"))
        eid += 1
        rows.append((eid, t1, u, "purchase", 2 * spend, "{}"))
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        r = EVENT_QUERIES["events_cuped_adjustment"](spark, d).collect()[0]
    assert r.theta == 2.0
    assert r.var_reduction == 1.0


def test_hive_partition_pruning_in_plan(spark, tmp_path):
    """The partition filter must reach PartitionFilters (planning-time
    pruning), and only the matching directory is scanned."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "orders_by_status")
    orders.write.partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    back.count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1][:200]


# --- wave 12-13: JSONL disposition / checksum pack --------------------------


def test_jsonl_dirty_parse_dispositions(spark):
    """The committed fixture: 8 lines = 5 valid + 2 corrupt + 1 type
    error; one valid row misses the optional status; valid amounts sum
    to 114975 cents."""
    r = ETL_QUERIES["etl_jsonl_dirty_parse"](spark, SF_DIR).collect()[0]
    assert (r.n_lines, r.n_valid, r.n_corrupt, r.n_type_errors) == (
        8, 5, 2, 1,
    )
    assert r.n_missing_status == 1
    assert r.valid_cents == 114975


def test_luhn_matches_canonical_reference(spark):
    """The engine's Luhn agrees with the canonical
    double-from-the-right algorithm on every 10-digit account in the
    graded range."""
    from large_csv_etl_spark.io import load_table
    from pyspark.sql import functions as F

    def canonical_valid(s: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d = 2 * d
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    keys = [
        r.o_orderkey
        for r in load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey")
        .collect()
    ]
    expected_valid = sum(
        1 for k in keys if canonical_valid(f"{k:010d}")
    )
    from large_csv_etl_spark.queries.scalars import QUERIES as SC

    r = SC["scalar_checksum_functions"](spark, SF_DIR).collect()[0]
    assert r.n_accounts == len(keys)
    assert r.n_luhn_valid == expected_valid


# --- wave 17: odds ratio / rare levels ---------------------------------------


def test_odds_ratio_known_2x2(spark):
    """Planted 2x2: a=2, b=1, c=1, d=2 -> OR = 4; Haldane = (2.5*2.5)/
    (1.5*1.5)."""
    rows = [
        _order(1, "F", 1.0), _order(2, "F", 1.0),   # urgent, outcome
        _order(3, "O", 1.0),                          # urgent, no outcome
    ]
    # make rows 4-6 low priority
    low = [
        (4, 4, "F", 1.0, dt.datetime(2024, 1, 1), "5-LOW"),
        (5, 5, "O", 1.0, dt.datetime(2024, 1, 1), "5-LOW"),
        (6, 6, "O", 1.0, dt.datetime(2024, 1, 1), "5-LOW"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows + low, d)
        r = REL_QUERIES["agg_odds_ratio_2x2"](spark, d).collect()[0]
    assert (r.a, r.b, r.c, r.d) == (2, 1, 1, 2)
    assert r.odds_ratio == 4.0
    assert r.odds_ratio_haldane == (2.5 * 2.5) / (1.5 * 1.5)


def test_rare_level_audit_flags_sub_percent_level(spark):
    """One level with a single row among 200 (<1%) must be flagged with
    its row mass."""
    rows = [_order(i, "F", 1.0) for i in range(199)]
    rows.append((999, 999, "X", 1.0, dt.datetime(2024, 1, 1), "1-URGENT"))
    with tempfile.TemporaryDirectory() as d:
        _orders_dir(spark, rows, d)
        # lineitem needed by the union'd columns
        _lineitem_dir(spark, [_li(1, 1)], d)
        from large_csv_etl_spark.queries.quality import (
            QUERIES as DQ_QUERIES,
        )

        out = {
            r.col_name: r
            for r in DQ_QUERIES["dq_rare_level_audit"](
                spark, d
            ).collect()
        }
    st = out["o_orderstatus"]
    assert st.n_levels == 2
    assert st.n_rare_levels == 1 and st.n_rows_in_rare == 1
    assert st.min_level_count == 1


def test_repeat_purchase_latency_planted(spark):
    """Two buyers, one repeats after exactly 90 minutes: repeat rate
    500000 ppm and the latency extremes equal the planted gap."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=m)
    rows = [
        (1, t(0), 1, "purchase", 5.0, "{}"),
        (2, t(90), 1, "purchase", 5.0, "{}"),
        (3, t(10), 2, "purchase", 5.0, "{}"),
        (4, t(20), 2, "click", 5.0, "{}"),  # not a purchase
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        r = EVENT_QUERIES["events_repeat_purchase_latency"](
            spark, d
        ).collect()[0]
    assert (r.n_buyers, r.n_repeat_buyers) == (2, 1)
    assert r.repeat_rate_ppm == 500000
    assert r.min_latency_us == r.max_latency_us == 90 * 60 * 1000000
