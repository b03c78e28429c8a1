"""Semantics tests for the round-5 operators (portable-hash sketch twins
are covered in test_dedup_ann; here: feature hashing, sequence trigrams,
temperature mixture sampling)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES
from large_csv_etl_spark.queries.sampling import QUERIES as SAMPLING_QUERIES
from large_csv_etl_spark.queries.text import (
    FEATURE_HASH_BUCKETS,
    QUERIES as TEXT_QUERIES,
)

from .conftest import SF_DIR


def test_feature_hashing_conserves_token_mass(spark):
    """Every token lands in exactly one of the 64 buckets: per-doc sum of
    tf equals the doc's token count, buckets stay in range, and the same
    token always maps to the same bucket (hash determinism across docs)."""
    fh = TEXT_QUERIES["text_feature_hashing"](spark, SF_DIR)
    rows = fh.collect()
    assert all(0 <= r.bucket < FEATURE_HASH_BUCKETS for r in rows)

    per_doc = {
        r.doc_id: r.total
        for r in fh.groupBy("doc_id").agg(F.sum("tf").alias("total")).collect()
    }
    tok = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.trim("text") != "")
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"),
        )
        .collect()
    }
    assert per_doc == tok


def test_sequence_trigrams_on_manual_stream(spark):
    """Hand-checked trigram counts on a tiny two-user stream, including a
    timestamp tie broken by event_id."""
    t = datetime(2024, 1, 1)
    rows = [
        # user 1: a b a b  (ties on ts for events 2,3 -> event_id order)
        (1, t.replace(second=1), 10, "a", 0.0, None),
        (2, t.replace(second=2), 10, "b", 0.0, None),
        (3, t.replace(second=2), 10, "a", 0.0, None),
        (4, t.replace(second=4), 10, "b", 0.0, None),
        # user 2: a b a
        (5, t.replace(second=1), 20, "a", 0.0, None),
        (6, t.replace(second=2), 20, "b", 0.0, None),
        (7, t.replace(second=3), 20, "a", 0.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    got = {
        (r.t1, r.t2, r.t3): (r.n, r.u)
        for r in seq.filter(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("u"))
        .collect()
    }
    # user 1 trigrams: (a,b,a), (b,a,b); user 2: (a,b,a)
    assert got == {("a", "b", "a"): (2, 2), ("b", "a", "b"): (1, 1)}

    # registered query at the fixture SF: output cardinality is bounded by
    # |event_type|^3 and every trigram leg is non-null
    out = EVENT_QUERIES["events_sequence_trigrams"](spark, SF_DIR)
    n_types = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type")
        .distinct()
        .count()
    )
    rows2 = out.collect()
    assert 0 < len(rows2) <= n_types**3
    assert all(r.t1 and r.t2 and r.t3 for r in rows2)


def test_temperature_mixture_upsamples_small_sources(spark):
    """On a skewed corpus (one big source, one small), alpha=0.5 keeps a
    HIGHER fraction of the small source than of the big one, and the
    sampled set is deterministic across invocations."""
    import tempfile

    rows = [(i, f"text {i}", "en", "big", 10) for i in range(2000)]
    rows += [(10_000 + i, f"text {i}", "en", "small", 10) for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
        fn = SAMPLING_QUERIES["sample_temperature_mixture"]
        kept1 = {r.doc_id for r in fn(spark, d).collect()}
        kept2 = {r.doc_id for r in fn(spark, d).collect()}
    assert kept1 == kept2
    big_rate = len([x for x in kept1 if x < 10_000]) / 2000
    small_rate = len([x for x in kept1 if x >= 10_000]) / 100
    assert small_rate > big_rate * 2, (small_rate, big_rate)
    # overall budget ~50% of the corpus (256-bucket quantization slack)
    assert 0.35 <= len(kept1) / 2100 <= 0.65


def test_portable_lsh_buckets_spread_and_determinism(spark):
    """Portable LSH: buckets are 16-bit, the corpus spreads over many
    buckets (hyperplanes actually discriminate), assignment is
    deterministic, and near-identical vectors share a bucket."""
    from large_csv_etl_spark.queries.similarity import (
        QUERIES as SIM_QUERIES,
        _portable_plane_weights,
    )

    planes = _portable_plane_weights()
    assert len(planes) == 16 and all(len(p) == 64 for p in planes)
    assert all(abs(w) <= 1_000_000 for p in planes for w in p)

    out = SIM_QUERIES["sim_lsh_portable_buckets"](spark, SF_DIR)
    rows = {r.vec_id: (r.bucket, r.n_high_bits) for r in out.collect()}
    assert all(0 <= b < (1 << 16) for b, _ in rows.values())
    assert all(bin(b).count("1") == h for b, h in rows.values())
    n_buckets = len({b for b, _ in rows.values()})
    assert n_buckets >= len(rows) // 8, f"degenerate bucketing: {n_buckets}"

    rows2 = {
        r.vec_id: (r.bucket, r.n_high_bits)
        for r in SIM_QUERIES["sim_lsh_portable_buckets"](spark, SF_DIR).collect()
    }
    assert rows == rows2

    # a vector and a tiny perturbation of it land in the same bucket
    import numpy as np

    rng = np.random.default_rng(3)
    v = rng.standard_normal(64)
    v /= np.linalg.norm(v)
    w = v + 1e-4 * rng.standard_normal(64)
    emb = spark.createDataFrame(
        [(1, [float(x) for x in v], 0), (2, [float(x) for x in w], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        emb.coalesce(1).write.parquet(f"{d}/embeddings.parquet")
        pair = {
            r.vec_id: r.bucket
            for r in SIM_QUERIES["sim_lsh_portable_buckets"](spark, d).collect()
        }
    assert pair[1] == pair[2]


def test_dq_reconciliation_on_consistent_fixture(spark):
    """On a hand-built header/detail pair where totals really are
    sum(extendedprice * (1-disc) * (1+tax)), the reconciliation reports
    every order exact; breaking one total moves it to beyond-1pct; an
    order with no lineitems is counted separately."""
    import tempfile

    from large_csv_etl_spark.queries.quality import QUERIES as DQ_QUERIES

    li_rows = [
        # (l_orderkey, l_extendedprice, l_discount, l_tax)
        (1, 100.00, 0.10, 0.05),  # gross = 100*0.9*1.05 = 94.50
        (1, 50.00, 0.00, 0.00),   # gross = 50.00 -> order 1 total 144.50
        (2, 200.00, 0.05, 0.00),  # -> order 2 total 190.00
    ]
    orders_rows = [
        (1, 144.50),
        (2, 999.99),   # broken on purpose
        (3, 10.00),    # no lineitems
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            li_rows,
            "l_orderkey long, l_extendedprice double, l_discount double,"
            " l_tax double",
        ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
        spark.createDataFrame(
            orders_rows, "o_orderkey long, o_totalprice double"
        ).coalesce(1).write.parquet(f"{d}/orders.parquet")
        r = DQ_QUERIES["dq_orders_lineitem_reconciliation"](spark, d).collect()[0]
    assert r.n_orders == 3
    assert r.n_no_lineitems == 1
    assert r.n_exact == 1
    assert r.n_within_1pct == 1
    assert r.n_beyond_1pct == 1
    # delta is exactly (999.99 - 190.00) in 1e-6 currency units
    assert r.sum_abs_delta_fp == round((999.99 - 190.00) * 1_000_000)


def test_mad_anomaly_flags_planted_spike(spark):
    """A 10x traffic spike in one hour is flagged; surrounding normal
    hours are not — and the median baseline is not dragged by the spike
    (the failure mode of the mean/std z-score)."""
    import tempfile
    from datetime import datetime, timedelta

    from large_csv_etl_spark.queries.events import QUERIES as EQ

    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h in range(48):
        n = 1000 if h == 20 else 100 + (h % 3)  # mild jitter, one 10x spike
        for i in range(n):
            rows.append(
                (eid, base + timedelta(hours=h, seconds=i), i % 7, "view", 1.0, None)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(2).write.parquet(f"{d}/events.parquet")
        out = {r.hour_start.hour if r.hour_start.day == 1 else 100 + r.hour_start.hour: r
               for r in EQ["events_hourly_mad_anomaly"](spark, d).collect()}
    flagged = {k for k, r in out.items() if r.is_anomaly}
    assert flagged == {20}
    spike = out[20]
    assert 100 <= spike.med_n <= 103 and spike.n == 1000


def test_centroid_separation_identity_and_symmetry(spark):
    """Two labels with identical member vectors separate at exactly 0; a
    shifted third label is strictly positive; pair count is k*(k-1)/2."""
    import tempfile

    from large_csv_etl_spark.queries.similarity import QUERIES as SQ

    v = [0.5] * 64
    w = [0.5] * 32 + [-0.5] * 32
    rows = (
        [(i, v, 0) for i in range(5)]
        + [(100 + i, v, 1) for i in range(5)]
        + [(200 + i, w, 2) for i in range(5)]
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with tempfile.TemporaryDirectory() as d:
        emb.coalesce(1).write.parquet(f"{d}/embeddings.parquet")
        got = {
            (r.label_a, r.label_b): (r.l2sq_fp, r.n_dims)
            for r in SQ["embedding_centroid_separation"](spark, d).collect()
        }
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert got[(0, 1)][0] == 0
    # labels 0/2 differ by 1.0 in 32 dims -> 32 * (1e6)^2 in 1e-12 units
    assert got[(0, 2)][0] == 32 * 10**12 == got[(1, 2)][0]
    assert all(nd == 64 for _, nd in got.values())


def test_tfidf_top_terms_shape_and_ranks(spark):
    """<= 3 rows per doc, ranks are 1..k with no gaps, scores are
    non-increasing within a doc, and tfidf_fp = tf * (1e12 div df)
    recomputed independently."""
    from collections import defaultdict

    from large_csv_etl_spark.queries.text import QUERIES as TQ

    rows = TQ["text_tfidf_top_terms"](spark, SF_DIR).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert by_doc
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        scores = [r.tfidf_fp for r in rs]
        assert scores == sorted(scores, reverse=True)

    # independent recomputation of tf and df on the raw corpus
    toks = defaultdict(list)
    for row in (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.trim("text") != "")
        .collect()
    ):
        toks[row.doc_id] = row.text.strip().lower().split()
    df = defaultdict(set)
    for d, ts in toks.items():
        for t in set(ts):
            df[t].add(d)
    for r in rows:
        tf = toks[r.doc_id].count(r.token)
        assert r.tf == tf
        assert r.tfidf_fp == tf * (10**12 // len(df[r.token]))


def test_minhash_calibration_report_is_sane(spark):
    """Calibration buckets live in the estimator's domain (8..16 of 16),
    matched counts never exceed pair counts, and high-confidence buckets
    (est=16/16) have near-perfect average exact jaccard."""
    from large_csv_etl_spark.queries.dedup import QUERIES as DQ

    rows = DQ["dedup_minhash_calibration"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 8 <= r.est_16 <= 16
        assert 0 <= r.n_exact_matched <= r.n_pairs
        assert 0.0 <= r.avg_exact_jaccard <= 1.0
    full = {r.est_16: r for r in rows}
    if 16 in full:
        assert full[16].avg_exact_jaccard >= 0.8


def test_asof_ttl_staleness_semantics(spark):
    """An order 10 days before the event is a fresh match; one 40 days
    before is surfaced stale with the key withheld; no order at all
    leaves every output column null."""
    import tempfile
    from datetime import datetime, timedelta

    from large_csv_etl_spark.queries.temporal import QUERIES as TQ

    t0 = datetime(2024, 6, 1)
    ev_rows = [
        (1, t0, 10, "view", 1.0, None),
        (2, t0, 20, "view", 1.0, None),
        (3, t0, 30, "view", 1.0, None),
    ]
    ord_rows = [
        (100, 10, t0 - timedelta(days=10)),   # fresh for user 10
        (200, 20, t0 - timedelta(days=40)),   # stale for user 20
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            ev_rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.parquet(f"{d}/events.parquet")
        spark.createDataFrame(
            ord_rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
        ).coalesce(1).write.parquet(f"{d}/orders.parquet")
        out = {r.event_id: r for r in TQ["asof_join_with_ttl"](spark, d).collect()}
    assert out[1].fresh_orderkey == 100
    assert out[1].staleness_us == 10 * 86400 * 1_000_000
    assert out[1].is_stale is False
    assert out[2].fresh_orderkey is None
    assert out[2].staleness_us is None
    assert out[2].is_stale is True
    assert out[3].fresh_orderkey is None and out[3].is_stale is None


def test_curation_funnel_is_monotone_and_consistent(spark):
    """Stage counts shrink monotonically and the splits partition the
    dedup survivors exactly."""
    from large_csv_etl_spark.queries.quality import QUERIES as DQ

    rows = {r.stage: r.n_docs for r in
            DQ["curation_funnel_report"](spark, SF_DIR).collect()}
    assert set(rows) == {
        "raw", "non_empty", "quality_keep", "dedup_survivors",
        "split_train", "split_val", "split_test",
    }
    assert rows["raw"] >= rows["non_empty"] >= rows["quality_keep"]
    assert rows["quality_keep"] >= rows["dedup_survivors"] > 0
    assert (
        rows["split_train"] + rows["split_val"] + rows["split_test"]
        == rows["dedup_survivors"]
    )


def test_boilerplate_removal_cleans_planted_footer(spark):
    """Docs sharing an identical 64-token footer block get it removed
    (cleaned_fp = md5 of the unique head block); unique docs keep
    everything; a doc that is ALL boilerplate hashes the empty string."""
    import hashlib
    import tempfile

    from large_csv_etl_spark.queries.text import QUERIES as TQ

    footer = " ".join(f"f{i}" for i in range(64))
    heads = [" ".join(f"d{d}w{i}" for i in range(64)) for d in range(3)]
    rows = [(d, f"{heads[d]} {footer}", "en", "s", 0) for d in range(3)]
    rows.append((10, " ".join(f"u{i}" for i in range(80)), "en", "s", 0))
    rows.append((11, footer, "en", "s", 0))  # all boilerplate
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in TQ["text_boilerplate_removal"](spark, d).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    for doc in range(3):
        r = out[doc]
        assert (r.n_blocks, r.n_removed, r.n_tokens_kept) == (2, 1, 64)
        assert r.cleaned_fp == md5(heads[doc])
    # unique doc: nothing removed, cleaned = original token join
    u = out[10]
    assert u.n_removed == 0 and u.n_tokens_kept == 80
    # all-boilerplate doc hashes the empty string, not NULL
    assert out[11].n_removed == 1 and out[11].cleaned_fp == md5("")


def test_conversion_lag_on_manual_stream(spark):
    """Two of three signup users convert; lags are exact micros and the
    pre-signup purchase of the third user does not count."""
    import tempfile
    from datetime import datetime, timedelta

    from large_csv_etl_spark.queries.events import QUERIES as EQ

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "signup", 0.0, None),
        (2, t0 + timedelta(hours=2), 1, "purchase", 0.0, None),
        (3, t0, 2, "signup", 0.0, None),
        (4, t0 + timedelta(hours=4), 2, "purchase", 0.0, None),
        (5, t0 - timedelta(hours=1), 3, "purchase", 0.0, None),  # pre-signup
        (6, t0, 3, "signup", 0.0, None),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.parquet(f"{d}/events.parquet")
        r = EQ["events_conversion_lag"](spark, d).collect()[0]
    assert r.n_signup_users == 3 and r.n_converted == 2
    assert abs(r.conversion_rate - 2 / 3) < 1e-12
    assert r.median_lag_us == 3 * 3600 * 1_000_000  # midpoint of 2h and 4h


def test_ivf_portable_topk_scores_and_determinism(spark):
    """Returned qdot6 scores match an independent numpy recomputation on
    the 1e-6 quantized vectors, come ordered (score desc, vec_id), and
    the result is deterministic across invocations."""
    import numpy as np

    from large_csv_etl_spark.queries.similarity import QUERIES as SQ

    rows1 = [tuple(r) for r in SQ["sim_ivf_portable_topk"](spark, SF_DIR).collect()]
    rows2 = [tuple(r) for r in SQ["sim_ivf_portable_topk"](spark, SF_DIR).collect()]
    assert rows1 == rows2
    assert len(rows1) == 10
    scores = [(r[2], r[0]) for r in rows1]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))

    emb = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1e6).astype(
            np.int64
        )
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    q = emb[0]
    for vec_id, _label, qdot6 in rows1:
        assert qdot6 == int(np.dot(emb[vec_id], q))


def test_join_cardinality_audit_predicts_exact_join_size(spark):
    """The predicted inner-join row count equals the actual inner join's
    count at the fixture SF, and orphan accounting is consistent with
    the per-side totals."""
    from large_csv_etl_spark.queries.quality import QUERIES as DQ

    r = DQ["dq_join_cardinality_audit"](spark, SF_DIR).collect()[0]
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    actual = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert r.predicted_inner_rows == actual
    assert r.left_rows == orders.count()
    assert r.right_rows == lineitem.count()
    assert r.max_left_multiplicity >= 1 and r.max_right_multiplicity >= 1
    assert 0 <= r.left_orphan_rows <= r.left_rows
    assert 0 <= r.right_orphan_rows <= r.right_rows


def test_key_skew_profile_shares(spark):
    """Each profiled key's hottest-key share is consistent with an
    independent groupBy, and documents.source (few keys) is far more
    concentrated than lineitem.l_orderkey (many keys)."""
    from large_csv_etl_spark.queries.quality import QUERIES as DQ

    rows = {r.keyed_as: r for r in DQ["dq_key_skew_profile"](spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    top = (
        docs.groupBy("source").count().orderBy(F.col("count").desc()).first()
    )
    r = rows["documents.source"]
    assert r.max_key_rows == top["count"]
    assert abs(r.top_key_share - top["count"] / docs.count()) < 1e-12
    assert r.top_key_share > rows["lineitem.l_orderkey"].top_key_share


def test_portable_hash_primitive_cross_engine(spark):
    """The portable 60-bit hash is the foundation of every round-5 graded
    sketch: prove Spark's conv(substr(md5..)), DuckDB's hex cast, and
    Python's int(hexdigest[:15], 16) agree on a diverse corpus (ascii,
    unicode, quotes, whitespace, empty string, long strings), for both
    digest halves, and stay inside [0, 2^60)."""
    import hashlib

    import duckdb

    from large_csv_etl_spark.queries.helpers import phash60, sql_phash60

    corpus = [
        "",
        " ",
        "a",
        "hello world",
        "naïve café résumé",
        "日本語のテキスト",
        'quote"and\'quote',
        "tab\tand\nnewline",
        "x" * 10_000,
        "plane:7:63",
        "1234567890",
        "emoji 🙂 test",
    ]
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    got = {
        r.s: (r.lo, r.hi)
        for r in df.select(
            "s",
            phash60(F.col("s")).alias("lo"),
            phash60(F.col("s"), hi=True).alias("hi"),
        ).collect()
    }
    con = duckdb.connect()
    for s in corpus:
        lo_sql, hi_sql = (
            con.execute(
                f"SELECT {sql_phash60('?')}, {sql_phash60('?', hi=True)}",
                [s, s],
            ).fetchone()
        )
        lo_py = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        hi_py = int(hashlib.md5(s.encode()).hexdigest()[15:30], 16)
        assert got[s] == (lo_sql, hi_sql) == (lo_py, hi_py), s
        assert 0 <= lo_py < (1 << 60) and 0 <= hi_py < (1 << 60)


def test_source_token_drift_hand_computed(spark, tmp_path):
    """TVD against the corpus mix on a tiny two-source corpus, checked
    against the by-hand full-vocabulary sum (including the absent-token
    mass the decomposition folds into 1 - sum p_c)."""
    rows = [
        (1, "x x y", "en", "A", 5),
        (2, "x z", "en", "B", 3),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in TEXT_QUERIES["text_source_token_drift"](
            spark, str(tmp_path)
        ).collect()
    }
    # corpus: x=3/5, y=1/5, z=1/5
    # A (x:2/3, y:1/3): 0.5*(|2/3-0.6| + |1/3-0.2| + 0.2) = 0.2
    # B (x:1/2, z:1/2): 0.5*(|0.5-0.6| + |0.5-0.2| + 0.2) = 0.3
    assert out["A"].n_tokens == 3 and out["A"].n_distinct_tokens == 2
    assert out["B"].n_tokens == 2 and out["B"].n_distinct_tokens == 2
    assert abs(out["A"].tvd_vs_corpus - 0.2) < 1e-9
    assert abs(out["B"].tvd_vs_corpus - 0.3) < 1e-9


def test_source_token_drift_invariants(spark):
    """On the fixture corpus: TVD in [0, 1), and a source identical to
    the corpus would have TVD ~ 0 (single-source degenerate check)."""
    out = TEXT_QUERIES["text_source_token_drift"](spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 <= r.tvd_vs_corpus < 1.0
    one = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("source") == out[0].source)
    )
    assert one.count() > 0  # the grouping key is a real source value


def test_events_type_drift_hand_computed(spark, tmp_path):
    """Per-day TVD vs the overall type mix on a tiny two-day stream.
    Day 1 is missing type 'b' entirely, so this exercises the
    absent-category mass fold (the `scale - b_fp` term) — the one branch
    the oracle differential cannot catch, because both engines share the
    decomposition."""
    t1 = datetime(2024, 1, 1, 10)
    t2 = datetime(2024, 1, 2, 10)
    rows = [
        (1, t1, 1, "a", 0.0, None),
        (2, t1, 1, "a", 0.0, None),
        (3, t1, 1, "a", 0.0, None),
        (4, t2, 1, "a", 0.0, None),
        (5, t2, 1, "b", 0.0, None),
        (6, t2, 1, "b", 0.0, None),
        (7, t2, 1, "b", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.day_start.day: r
        for r in EVENT_QUERIES["events_type_drift_daily"](
            spark, str(tmp_path)
        ).collect()
    }
    # mix: a=4/7, b=3/7
    # day1 (a only): 0.5*(|1 - 4/7| + (1 - 4/7)) = 3/7  <- absent-type fold
    # day2 (1/4, 3/4): 0.5*(|1/4-4/7| + |3/4-3/7|) = 9/28
    assert out[1].n_day == 3 and out[2].n_day == 4
    assert abs(out[1].tvd_vs_mix - 3 / 7) < 1e-9
    assert abs(out[2].tvd_vs_mix - 9 / 28) < 1e-9


def test_incremental_minhash_equals_filtered_full_pairing(spark):
    """The probe-join optimization's correctness claim: delta bands
    probing the posting lists must yield EXACTLY the full pairing's
    delta-involving pairs, oriented new-side-delta. Any probe bug (a
    dropped bucket, a double-counted delta-delta pair, a wrong
    orientation) breaks this set equality."""
    from large_csv_etl_spark.queries.dedup import (
        QUERIES as DEDUP_QUERIES,
        _DELTA_SHARD,
    )
    from large_csv_etl_spark.queries.helpers import SHARD_PREFIX_LEN
    import hashlib

    def shard(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[:SHARD_PREFIX_LEN]

    full = DEDUP_QUERIES["dedup_minhash_portable"](spark, SF_DIR).collect()
    expected = set()
    for r in full:
        da, db = shard(r.doc_a) == _DELTA_SHARD, shard(r.doc_b) == _DELTA_SHARD
        if not (da or db):
            continue
        new, existing = (r.doc_b, r.doc_a) if db else (r.doc_a, r.doc_b)
        hist = 0 if shard(existing) == _DELTA_SHARD else 1
        expected.add((new, existing, r.est_jaccard, hist))

    got = {
        (r.new_doc_id, r.existing_doc_id, r.est_jaccard, r.existing_is_history)
        for r in DEDUP_QUERIES["dedup_incremental_minhash"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_source_token_drift_single_source_is_zero(spark, tmp_path):
    """A corpus with ONE source: its distribution IS the mix, so TVD must
    be ~0 (within the 1e-12 snap's vocab/4e12 rounding envelope)."""
    rows = [(i, f"tok{i % 5} common words here", "en", "only", 20) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = TEXT_QUERIES["text_source_token_drift"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert abs(out[0].tvd_vs_corpus) < 1e-6


def test_survivor_weighted_sampling_semantics(spark):
    """Weight-aware acceptance: threshold = min(256, 64*weight), every
    weight>=4 survivor is always kept, weight-1 survivors accept at ~1/4,
    and the decision is a pure function of doc_id (re-run identical)."""
    from large_csv_etl_spark.queries.sampling import QUERIES as SQ

    rows = SQ["sample_survivor_weighted"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.accept_threshold == min(256, 64 * r.weight)
        if r.weight >= 4:
            assert r.accepted == 1
    w1 = [r for r in rows if r.weight == 1]
    if len(w1) >= 40:
        rate = sum(r.accepted for r in w1) / len(w1)
        assert 0.1 < rate < 0.45, rate
    again = {
        (r.doc_id, r.accepted)
        for r in SQ["sample_survivor_weighted"](spark, SF_DIR).collect()
    }
    assert again == {(r.doc_id, r.accepted) for r in rows}
