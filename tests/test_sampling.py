"""Sampling operators: determinism of the hash forms, statistics of the
seeded form."""

from __future__ import annotations

from large_csv_etl_spark.queries.sampling import (
    sample_hash_stratified,
    sample_hash_uniform,
    sample_random_stratified,
)

from .conftest import SF_DIR_MID


def test_hash_uniform_rate_and_determinism(spark):
    a = sample_hash_uniform(spark, SF_DIR_MID).collect()
    b = sample_hash_uniform(spark, SF_DIR_MID).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    # 26/256 ~= 10.2% of 500 docs; 3 sigma of Binomial(500, 26/256) ~= 20
    assert 30 <= len(a) <= 75


def test_hash_stratified_rates(spark):
    rows = sample_hash_stratified(spark, SF_DIR_MID).collect()
    by_src = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    # src0: 128/256 of 25 docs; others: 26/256 of 25 each.
    assert 5 <= by_src.get("src0", 0) <= 20
    others = sum(v for k, v in by_src.items() if k != "src0")
    # 19 strata x 25 docs x ~10% ~= 48 expected
    assert 20 <= others <= 90


def test_random_stratified_proportions(spark):
    rows = sample_random_stratified(spark, SF_DIR_MID).collect()
    by_src = {r.source: r.n_sampled for r in rows}
    # only the four listed strata are drawn from
    assert set(by_src) <= {"src0", "src1", "src2", "src3"}
    assert 5 <= by_src.get("src0", 0) <= 20  # Binomial(25, .5)
    for s in ("src1", "src2", "src3"):
        assert by_src.get(s, 0) <= 13  # Binomial(25, .2), 3 sigma above


def test_quality_filter_all_branches(spark, tmp_path):
    """Planted docs exercise every verdict branch of text_quality_filter."""
    from large_csv_etl_spark.queries.text import text_quality_filter

    rows = [
        (1, "short text", "en", "s", 10),                       # too_short
        (2, "x " * 15000, "en", "s", 30000),                    # too_long
        (3, "ab cd " * 40, "en", "s", 240),                     # repetitive
        (4, " ".join(f"tok{i}" for i in range(40)), "fr", "s", 200),  # non_english
        (5, " ".join(f"tok{i}" for i in range(40)), "en", "s", 200),  # keep
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs_sf")
    df.write.parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r.verdict for r in text_quality_filter(spark, d).collect()}
    assert got == {
        1: "too_short",
        2: "too_long",
        3: "repetitive",
        4: "non_english",
        5: "keep",
    }


def test_pack_sequences_block_invariants(spark):
    from large_csv_etl_spark.queries.sampling import QUERIES

    rows = QUERIES["sample_pack_sequences"](spark, SF_DIR_MID).collect()
    assert rows, "packing produced no rows"
    # every document is placed exactly once, offsets sit inside the block
    assert len({r.doc_id for r in rows}) == len(rows)
    assert all(0 <= r.seq_offset < 2048 for r in rows)
    # offset is consistent with the block id: offset == prev_cum % 2048 and
    # seq_id == prev_cum // 2048 for the same prev_cum
    for r in rows:
        prev_cum = r.seq_id * 2048 + r.seq_offset
        assert prev_cum >= 0
    # per source, total tokens equals the stream length implied by the
    # maximal (seq_id, seq_offset, n_tokens) placement
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for docs in by_source.values():
        total = sum(r.n_tokens for r in docs)
        last_end = max(r.seq_id * 2048 + r.seq_offset + r.n_tokens for r in docs)
        assert last_end == total


def test_split_train_val_test_rates_and_exhaustiveness(spark):
    from large_csv_etl_spark.queries.sampling import QUERIES

    rows = QUERIES["sample_split_train_val_test"](spark, SF_DIR_MID).collect()
    totals = {}
    for r in rows:
        totals[r.split] = totals.get(r.split, 0) + r.n_docs
    n = sum(totals.values())
    # every document is assigned to exactly one split
    docs = spark.read.parquet(f"{SF_DIR_MID}/documents.parquet").count()
    assert n == docs
    # md5 buckets approximate the 204/26/26-of-256 design rates
    assert abs(totals["train"] / n - 204 / 256) < 0.05
    assert abs(totals["val"] / n - 26 / 256) < 0.03
    assert abs(totals["test"] / n - 26 / 256) < 0.03
