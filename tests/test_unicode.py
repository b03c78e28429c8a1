"""Unicode parity between the engine and its DuckDB oracles over
multibyte corpora (CJK, RTL, emoji, combining marks, odd whitespace) —
plus the ONE known divergence, pinned so it stays known.

Known divergence: LOWER of U+0130 (Turkish dotted capital I). The JVM
follows the Unicode spec and produces "i" + U+0307 combining dot (two
codepoints); DuckDB produces plain "i". Every lowercasing text operator
inherits this when a corpus contains U+0130 — the driver fixtures never
do, so all oracle grades are unaffected, but a deployment ingesting
Turkish text should normalize (NFKC or İ->I mapping) upstream of the
fingerprint/token operators. The divergence test below starts failing
the day the engines agree, at which point this note should be deleted.
"""

from __future__ import annotations

import duckdb
import pytest

from large_csv_etl_spark.queries.text import QUERIES as TEXT_QUERIES, ORACLES as TEXT_ORACLES

UNICODE_TEXTS = [
    "héllo wörld ünïcode test",
    "日本語 テキスト の 処理 と 分割",
    "emoji 😀 🎉 mixed with text 🚀",
    "combining á é marks",
    "中文 文本 处理 测试 样本",
    "العربية نص اختبار",
    "русский текст тест",
    "ß sharp ss test",
]


@pytest.fixture(scope="module")
def unicode_dir(spark_module, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("unicode_docs")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(UNICODE_TEXTS)), type=pa.int64()),
            "text": pa.array(UNICODE_TEXTS),
            "lang": pa.array(["xx"] * len(UNICODE_TEXTS)),
            "source": pa.array(["uni"] * len(UNICODE_TEXTS)),
            "n_chars": pa.array([len(t) for t in UNICODE_TEXTS], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def spark_module(request):
    return request.getfixturevalue("spark")


@pytest.mark.parametrize(
    "name",
    [
        "text_token_counts",
        "text_vocab_per_doc",
        "text_top_terms",
        "text_fingerprint",
        "text_bpe_pair_counts",
        "text_bigram_surprisal",
        "text_vocab_diversity",
        # round-6 text ops: same tokenize+md5 contract, pin it anyway
        "text_memorization_ngrams",
        "text_ngram_novelty",
        "text_readability_ari",
        "text_token_concentration",
    ],
)
def test_text_oracle_parity_on_multibyte_corpus(spark, unicode_dir, name):
    """Spark and DuckDB must agree on tokenization, length, hashing and
    casing over multibyte text (İ excluded — see module docstring)."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{unicode_dir}/documents.parquet'"
    )
    oracle = sorted(map(tuple, con.execute(TEXT_ORACLES[name]).fetchall()))
    got = sorted(map(tuple, TEXT_QUERIES[name](spark, unicode_dir).collect()))
    assert got == oracle


def test_dotted_capital_i_divergence_is_still_there(spark):
    """LOWER(U+0130): JVM -> 'i' + combining dot; DuckDB -> 'i'. If this
    assertion fails, the engines now agree — delete the divergence note."""
    from pyspark.sql import functions as F

    jvm = (
        spark.createDataFrame([("İ",)], "t string")
        .select(F.lower("t"))
        .collect()[0][0]
    )
    duck = duckdb.sql("SELECT LOWER('İ')").fetchone()[0]
    assert jvm == "i̇"
    assert duck == "i"
    assert jvm != duck
