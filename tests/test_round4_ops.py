"""Round-4 operators: nearest-centroid assignment, containment dedup,
hash-ring negative sampling. The oracle diff covers value parity; these
pin the semantic invariants the oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from large_csv_etl_spark.queries.dedup import QUERIES as DEDUP_QUERIES
from large_csv_etl_spark.queries.sampling import QUERIES as SAMPLING_QUERIES
from large_csv_etl_spark.queries.similarity import QUERIES as SIM_QUERIES

from .conftest import SF_DIR_MID


def test_centroid_assign_partitions_the_corpus(spark):
    """Every vector is assigned exactly once: confusion counts sum to the
    corpus size, and labels stay within the label domain."""
    conf = SIM_QUERIES["embedding_centroid_assign"](spark, SF_DIR_MID)
    rows = conf.collect()
    total = sum(r.n_vecs for r in rows)
    n_vecs = (
        spark.read.parquet(f"{SF_DIR_MID}/embeddings.parquet").count()
    )
    assert total == n_vecs
    labels = {r.label for r in rows} | {r.assigned_label for r in rows}
    assert labels <= set(range(10))


def test_centroid_assign_is_partition_invariant(spark):
    """Integer micro-unit distances make the assignment independent of
    shuffle partitioning (a float-sum formulation would not be)."""
    fn = SIM_QUERIES["embedding_centroid_assign"]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, fn(spark, SF_DIR_MID).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, fn(spark, SF_DIR_MID).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_containment_dominates_jaccard(spark):
    """containment = |A&B|/min(|A|,|B|) >= jaccard = |A&B|/|A|B| for every
    pair, and both metrics agree on which pairs share shingles at all."""
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in DEDUP_QUERIES["dedup_ngram_containment"](
            spark, SF_DIR_MID
        ).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DEDUP_QUERIES["dedup_ngram_jaccard"](
            spark, SF_DIR_MID
        ).collect()
    }
    assert cont, "containment found no pairs on the sf0.01 corpus"
    for pair, c in cont.items():
        assert 0.6 <= c <= 1.0
        if pair in jac:
            assert c >= jac[pair] - 1e-12
    # every high-jaccard pair must also clear the containment gate
    # (j >= 0.6 implies containment >= j >= 0.6)
    for pair, j in jac.items():
        if j >= 0.6:
            assert pair in cont, f"{pair} jaccard={j} missing from containment"


def test_negative_pairs_shape_and_determinism(spark):
    fn = SAMPLING_QUERIES["sample_negative_pairs"]
    rows = fn(spark, SF_DIR_MID).collect()
    n_docs = spark.read.parquet(f"{SF_DIR_MID}/documents.parquet").count()
    # no self-pairs, ranks in {1,2}, at most 2 negatives per doc
    per_doc: dict[int, int] = {}
    for r in rows:
        assert r.doc_id != r.neg_doc_id
        assert r.neg_rank in (1, 2)
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    assert all(v <= 2 for v in per_doc.values())
    # only segment tails lose pairs: >= 2*(n_docs - 2*256) pairs survive
    assert len(rows) >= 2 * (n_docs - 2 * 256)
    # deterministic across runs
    again = fn(spark, SF_DIR_MID).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_wau_sketch_rollup_matches_exact(spark):
    """Merged daily HLL sketches must estimate weekly actives within 5%
    of the exact distinct count (DataSketches HLL default lgk=12 gives
    ~1.6% rsd; 5% is a loose regression fence)."""
    from large_csv_etl_spark.queries.events import QUERIES as EVENT_QUERIES

    est = {
        r.week_start: r.wau_estimate
        for r in EVENT_QUERIES["events_wau_sketch_rollup"](
            spark, SF_DIR_MID
        ).collect()
    }
    from large_csv_etl_spark.io import load_table

    exact_df = (
        load_table(spark, SF_DIR_MID, "events")
        .select(
            F.date_trunc("week", "ts").alias("week_start"),
            "user_id",
        )
        .groupBy("week_start")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    exact = {r.week_start: r.wau for r in exact_df.collect()}
    assert set(est) == set(exact)
    for wk, e in est.items():
        assert abs(e - exact[wk]) / exact[wk] < 0.05, (wk, e, exact[wk])


def test_matview_merge_equals_full_rebuild(spark):
    """The graded incremental rollup must be bit-identical to one
    straight groupBy over the base table (merge order must not matter)."""
    from large_csv_etl_spark.queries.etl import QUERIES as ETL_QUERIES
    from large_csv_etl_spark.queries.helpers import DEC

    inc = sorted(
        map(tuple, ETL_QUERIES["matview_incremental_rollup"](
            spark, SF_DIR_MID
        ).collect())
    )
    orders = spark.read.parquet(f"{SF_DIR_MID}/orders.parquet")
    full = sorted(
        map(
            tuple,
            orders.groupBy("o_orderpriority", "o_orderstatus")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.col("o_totalprice").cast(DEC))
                .cast("double")
                .alias("sum_price"),
            )
            .withColumn("avg_price", F.col("sum_price") / F.col("n_rows"))
            .collect(),
        )
    )
    assert inc == full
