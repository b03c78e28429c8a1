"""Declarative job runner: spec -> one lazy plan -> sink."""

from __future__ import annotations


from large_csv_etl_spark.jobs import run_job


def test_curation_job_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    spec = {
        "source": {"table": "documents"},
        "steps": [
            {"op": "filter", "expr": "TRIM(text) <> ''"},
            {"op": "sample_hash", "key": "doc_id", "rate_hex": "80"},  # ~50%
            {"op": "dedupe_exact", "fingerprint": "md5(lower(trim(text)))",
             "order_col": "doc_id"},
            {"op": "with_column", "name": "n_chars2", "expr": "length(text)"},
            {"op": "select", "cols": ["doc_id", "source", "n_chars2"]},
        ],
        "sink": {"path": out, "partition_by": ["source"]},
    }
    df = run_job(spark, spec, sf_dir)
    back = spark.read.parquet(out)
    assert back.count() == df.count() > 0
    assert set(back.columns) == {"doc_id", "n_chars2", "source"}
    # deterministic: re-running selects the same rows
    df2 = run_job(spark, {**spec, "sink": None}, sf_dir)
    assert sorted(r.doc_id for r in df2.collect()) == sorted(
        r.doc_id for r in back.collect()
    )


def test_dedupe_exact_keeps_first_by_order(spark):
    from large_csv_etl_spark.jobs import _apply_step

    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "id long, payload string"
    )
    out = _apply_step(
        df,
        {"op": "dedupe_exact", "fingerprint": "md5(payload)", "order_col": "id"},
    )
    assert sorted((r.id, r.payload) for r in out.collect()) == [(1, "x"), (3, "y")]


def test_full_curation_pipeline_spec(spark, sf_dir, tmp_path):
    """The LLM-curation composition as ONE declarative spec: quality gate
    -> near-dup removal -> split assignment -> export sharding -> write.
    Asserts gate/semantics survive the composition, not just each step."""
    from pyspark.sql import functions as F

    from large_csv_etl_spark.queries.dedup import simhash_neardup_pairs

    out = str(tmp_path / "curated")
    spec = {
        "source": {"table": "documents"},
        "steps": [
            {"op": "quality_gate", "min_tokens": 5},
            {"op": "dedupe_neardup"},
            {"op": "split", "key": "doc_id"},
            {"op": "shard", "key": "doc_id"},
        ],
        "sink": {"path": out, "partition_by": ["split"]},
    }
    df = run_job(spark, spec, sf_dir)
    back = spark.read.parquet(out)
    assert back.count() == df.count() > 0
    assert {"split", "shard", "n_tokens"} <= set(back.columns)
    # gate respected
    assert back.filter(F.col("n_tokens") < 5).count() == 0
    # split values exhaustive, shard is one hex char
    assert set(r.split for r in back.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }
    assert all(
        len(r.shard) == 1 for r in back.select("shard").distinct().collect()
    )
    # no surviving near-dup pair among the kept documents
    kept = back.select("doc_id", "text")
    assert simhash_neardup_pairs(kept).count() == 0
    # deterministic: re-run selects identical survivors
    again = run_job(spark, {**spec, "sink": None}, sf_dir)
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in back.collect()
    )


def test_dedupe_prefix_and_novelty_gate_steps(spark):
    """The two round-6 steps: a truncated copy and an exact re-post both
    lose to their originals under dedupe_prefix; novelty_gate drops the
    re-post AND the truncated copy (every 8-gram already seen in the
    lower-id original) while originals and genuinely new docs survive.
    Short docs pass both gates untouched."""
    lead = " ".join(f"p{i}" for i in range(16))
    fresh = " ".join(f"q{i}" for i in range(16))
    rows = [
        (1, lead + " longer tail", "s"),
        (2, lead, "s"),                     # truncated copy of 1's lead
        (3, fresh, "s"),                    # novel content
        (4, fresh, "s"),                    # exact re-post of 3 -> novelty 0
        (5, "tiny doc", "s"),               # too short for either signal
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from large_csv_etl_spark.jobs import _apply_step

    # 4 is an EXACT copy of 3, so it shares 3's prefix too and loses here
    deduped = _apply_step(df, {"op": "dedupe_prefix"})
    assert sorted(r.doc_id for r in deduped.collect()) == [1, 3, 5]
    # 2's 8-grams are all inside 1 (novelty 0) and 4 is a re-post of 3
    gated = _apply_step(df, {"op": "novelty_gate", "min_novelty": 0.5})
    assert sorted(r.doc_id for r in gated.collect()) == [1, 3, 5]
    # composed: prefix dedup then novelty gate leaves the two originals
    both = _apply_step(deduped, {"op": "novelty_gate", "min_novelty": 0.5})
    assert sorted(r.doc_id for r in both.collect()) == [1, 3, 5]


def test_route_lexicon_step_matches_graded_router(spark, sf_dir):
    """The job step stamps exactly the routing decisions the graded
    text_lexicon_router counts (same lexicon, same threshold)."""
    from large_csv_etl_spark.jobs import run_job
    from large_csv_etl_spark.queries.text import QUERIES

    spec = {
        "source": {"table": "documents"},
        "steps": [
            {"op": "filter", "expr": "trim(text) <> ''"},
            {"op": "route_lexicon"},
        ],
    }
    from pyspark.sql import functions as F

    stamped = run_job(spark, spec, sf_dir)
    per_source = {
        r.source: r.n
        for r in stamped.filter("routed")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    graded = {
        r.source: r.n_routed
        for r in QUERIES["text_lexicon_router"](spark, sf_dir).collect()
    }
    assert per_source == {k: v for k, v in graded.items() if v > 0}


def test_compression_gate_step_drops_out_of_band(spark, tmp_path):
    """A repetitive doc (ratio far below min_fp) is dropped; a normal
    prose doc passes."""
    df = spark.createDataFrame(
        [
            (1, "spam spam spam " * 100),
            (2, "the quick brown fox jumps over the lazy dog and then "
                "wanders across the wide river valley at dusk"),
        ],
        "doc_id long, text string",
    )
    from large_csv_etl_spark.jobs import _apply_step

    kept = _apply_step(
        df, {"op": "compression_gate", "min_fp": 100000, "max_fp": 900000}
    ).collect()
    assert [r.doc_id for r in kept] == [2]
    assert 100000 <= kept[0].compression_fp <= 900000
