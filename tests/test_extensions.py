"""U1 chunk-map hook: arbitrary pandas plugin per Arrow batch, with the
reference's skip-bad-chunk fault isolation."""

from __future__ import annotations

import pandas as pd
import pytest

from large_csv_etl_spark.extensions import apply_chunk_transform
from large_csv_etl_spark.io import load_table

from .conftest import SF_DIR


def test_chunk_transform_applies_plugin(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    def shout(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        out["text"] = out["text"].str.upper()
        return out

    result = apply_chunk_transform(docs, shout, "doc_id long, text string")
    rows = result.collect()
    assert len(rows) == docs.count()
    assert all(r.text == r.text.upper() for r in rows)


def test_chunk_transform_none_drops_batch(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    result = apply_chunk_transform(docs, lambda pdf: None, "doc_id long")
    assert result.count() == 0


def test_chunk_transform_skips_bad_chunks(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")

    def explode_on_some(pdf: pd.DataFrame) -> pd.DataFrame:
        if (pdf["doc_id"] % 2 == 0).any():
            raise ValueError("boom")
        return pdf

    # E3 semantics: the failing batches vanish, the job survives
    survived = apply_chunk_transform(
        docs, explode_on_some, "doc_id long"
    ).count()
    assert survived < docs.count()

    # strict mode: the exception propagates and fails the job
    with pytest.raises(Exception, match="boom"):
        apply_chunk_transform(
            docs, explode_on_some, "doc_id long", skip_bad_chunks=False
        ).count()


def test_split_text_udtf(spark):
    from large_csv_etl_spark.extensions import split_text_udtf

    SplitChunks = split_text_udtf()
    spark.udtf.register("split_chunks", SplitChunks)
    rows = spark.sql(
        "SELECT * FROM split_chunks('a b c d e f g', 3, 2)"
    ).collect()
    got = [(r.chunk_start, r.chunk_text) for r in rows]
    assert got == [(0, "a b c"), (2, "c d e"), (4, "e f g"), (6, "g")]
