"""Skew-cap semantics under a pathological corpus: one text duplicated
past every posting-list cap. The documented trade-off is that the
near-dup operators DROP the over-hot candidate lists (bounding the
pair blow-up that would otherwise be O(copies^2)) while exact dedup —
the right tool for identical content — still reports the full group.
This pins that behavior so a cap regression (silently exploding pairs,
or exact dedup missing the group) fails loudly."""

from __future__ import annotations

import pytest

from large_csv_etl_spark.queries.dedup import (
    MAX_BUCKET,
    MAX_SHINGLE_DF,
    QUERIES as DEDUP_QUERIES,
)

N_COPIES = max(MAX_BUCKET, MAX_SHINGLE_DF) + 50  # past every cap
N_UNIQUE = 60


@pytest.fixture(scope="module")
def hot_corpus_dir(spark_module, tmp_path_factory):
    d = tmp_path_factory.mktemp("hot_corpus")
    hot = "the same boilerplate sentence repeated across many documents"
    rows = [(i, hot, "en", "hot", len(hot)) for i in range(N_COPIES)]
    rows += [
        (
            N_COPIES + i,
            f"unique document number {i} with its own distinct words {i * 7}",
            "en",
            "uniq",
            40,
        )
        for i in range(N_UNIQUE)
    ]
    df = spark_module.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def spark_module(request):
    # reuse the session fixture machinery at module scope
    return request.getfixturevalue("spark")


def test_exact_dedup_reports_the_hot_group(spark, hot_corpus_dir):
    groups = DEDUP_QUERIES["dedup_exact_groups"](spark, hot_corpus_dir).collect()
    assert len(groups) == 1
    assert groups[0].group_size == N_COPIES
    assert groups[0].canonical_doc_id == 0


def test_capped_neardups_bound_the_hot_cluster(spark, hot_corpus_dir):
    """Every near-dup operator must complete and emit at most the capped
    pair count — never the O(copies^2) explosion (~32k pairs here)."""
    explosion = N_COPIES * (N_COPIES - 1) // 2
    for name in (
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash_neardup",
    ):
        n_pairs = DEDUP_QUERIES[name](spark, hot_corpus_dir).count()
        # the caps drop the over-hot posting lists entirely, so the hot
        # cluster contributes nothing; unique docs share no shingles
        assert n_pairs < explosion // 10, (name, n_pairs)


def test_survivor_weights_still_conserve_mass(spark, hot_corpus_dir):
    rows = DEDUP_QUERIES["dedup_survivor_weights"](spark, hot_corpus_dir).collect()
    assert sum(r.weight for r in rows) == N_COPIES + N_UNIQUE
