"""Reference-parity transform core tests (SURVEY.md §2a F1-F5, P1-P6, A5,
A7, S6) — dirty-input fixtures per FIXTURES.md §1, invariants ported from
the reference's runtime validators (/root/reference/src/data_processor.py:
212-247, src/core/db_manager.py:314-353).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from large_csv_etl_spark.io import upsert_by_key, validate_data_integrity
from large_csv_etl_spark.schemas import OUTPUT_COLUMNS, TRANSACTIONS_RAW
from large_csv_etl_spark.transform import (
    processing_stats,
    transform,
    validate_final_data,
    validate_schema,
)

DIRTY_ROWS = [
    # (transaction_id, user_id, amount, timestamp, status)
    ("T1", "U1", "100.50", "2025-01-01T00:00:00", "Completed"),
    (None, "U2", "10.00", "2025-01-01T00:00:00", "PENDING"),          # F1 null id
    ("", "U3", "10.00", "2025-01-01T00:00:00", "PENDING"),            # F1 blank id
    ("T4", None, "10.00", "2025-01-01T00:00:00", "PENDING"),          # F1 null user
    ("T5", "U5", "not_a_number", "2025-01-01T00:00:00", "PENDING"),   # F2 malformed
    ("T6", "U6", "", "2025-01-01T00:00:00", "PENDING"),               # F2 empty amt
    ("T7", "U7", "-5.00", "2025-01-01T00:00:00", "PENDING"),          # F4 negative
    ("T8", "U8", "20.00", "2025-01-01T00:00:00", "cancelled"),        # F5
    ("T9", "U9", "20.00", "2025-01-01T00:00:00", "CANCELLED"),        # F5 case
    ("T10", "U10", "20.00", "2025-01-01T00:00:00", None),             # F3 null status
    ("T11", "U11", "2.675", "2025-01-01T00:00:00", "  PENDING  "),    # P1+P4 tie
    ("T12", "U12", "2.125", None, "Failed"),                          # P4 tie
    ("T13", "U13", "0.005", "2025-01-01T00:00:00", "refunded"),       # P4 tie to 0
]


@pytest.fixture(scope="module")
def dirty_df(spark):
    return spark.createDataFrame(DIRTY_ROWS, TRANSACTIONS_RAW)


@pytest.fixture(scope="module")
def out_df(spark, dirty_df):
    return transform(dirty_df)


def test_schema_validation_reports_missing(spark, dirty_df):
    assert validate_schema(dirty_df) == []
    assert validate_schema(dirty_df.drop("amount", "status")) == [
        "amount",
        "status",
    ]
    with pytest.raises(ValueError, match="missing required columns"):
        transform(dirty_df.drop("amount"))


def test_drop_rules_f1_f2_f4_f5(out_df):
    ids = {r.transaction_id for r in out_df.collect()}
    # survivors: T1, T10 (null status -> unknown), T11, T12, T13
    assert ids == {"T1", "T10", "T11", "T12", "T13"}


def test_null_status_becomes_unknown_f3(out_df):
    row = out_df.filter(F.col("transaction_id") == "T10").first()
    # documented deviation: the reference's fillna('unknown') is dead code
    # (astype(str) makes "nan"); we implement the intended semantics
    assert row.status == "unknown"


def test_status_lowercased_trimmed_p1(out_df):
    assert out_df.filter(F.col("transaction_id") == "T11").first().status == "pending"
    assert out_df.filter(F.col("transaction_id") == "T1").first().status == "completed"


def test_half_even_rounding_p4(out_df):
    got = {
        r.transaction_id: r.amount
        for r in out_df.filter(
            F.col("transaction_id").isin("T11", "T12", "T13")
        ).collect()
    }
    # P4 parity: the engine's scaled half-even round (bround(x*100,0)/100)
    # must agree with pandas/numpy round(2) on ties; a plain bround(x, 2)
    # rounds the shortest decimal repr and diverges on .XX50 literals.
    import numpy as np

    assert got["T11"] == float(np.round(2.675, 2))
    assert got["T12"] == float(np.round(2.125, 2)) == 2.12
    assert got["T13"] == float(np.round(0.005, 2)) == 0.0
    # the golden 500k differential run asserts this on all 314,214 rows


def test_output_schema_and_order_p5_p2(out_df):
    assert out_df.columns == OUTPUT_COLUMNS
    rows = out_df.collect()
    assert all(r.processed_at is not None for r in rows)
    # ids are strings post-P3
    assert all(isinstance(r.transaction_id, str) for r in rows)


def test_final_validation_invariants_a5(out_df):
    report = validate_final_data(out_df)
    assert report["is_valid"], report
    assert report["rows"] == 5


def test_integrity_validation_a6(out_df):
    report = validate_data_integrity(out_df)
    assert report["is_valid"], report


def test_processing_stats_a7(spark, dirty_df, out_df):
    stats = processing_stats(dirty_df, out_df)
    assert stats["original_rows"] == len(DIRTY_ROWS)
    assert stats["processed_rows"] == 5
    assert stats["rows_removed"] == len(DIRTY_ROWS) - 5


def test_upsert_last_write_wins_s6(spark):
    df = spark.createDataFrame(
        [
            ("T1", "U1", 10.0, "2025-01-01", "completed", "2025-06-01T00:00:00"),
            ("T1", "U1", 99.0, "2025-01-02", "completed", "2025-06-01T00:00:01"),
            ("T2", "U2", 5.0, "2025-01-01", "pending", "2025-06-01T00:00:00"),
        ],
        "transaction_id string, user_id string, amount double, "
        "timestamp string, status string, processed_at string",
    )
    # deterministic: keep the max of the ordering column per key
    kept = upsert_by_key(df, "transaction_id", order_col="timestamp").collect()
    by_id = {r.transaction_id: r.amount for r in kept}
    assert by_id == {"T1": 99.0, "T2": 5.0}
    # without an order column: exactly one arbitrary survivor per key
    assert upsert_by_key(df, "transaction_id").groupBy(
        "transaction_id"
    ).count().filter(F.col("count") > 1).count() == 0


def test_transform_is_chunk_invariant(spark, dirty_df):
    """transform(union(a,b)) == union(transform(a), transform(b)) — the
    reference's core correctness property (chunked processing must not
    change results)."""
    a = dirty_df.limit(6)
    b = dirty_df.subtract(a)
    whole = {
        (r.transaction_id, r.amount, r.status)
        for r in transform(dirty_df).collect()
    }
    parts = {
        (r.transaction_id, r.amount, r.status)
        for r in transform(a).unionAll(transform(b)).collect()
    }
    assert whole == parts


def test_observed_pipeline_matches_counted_stats(spark, tmp_path):
    """Observation-based A7 accounting (metrics piggybacked on the write
    action, zero extra scans) must agree with the two-count form."""
    from large_csv_etl_spark.io import CORRUPT_COL, read_transactions_csv
    from large_csv_etl_spark.transform import observed_pipeline, transform

    src = "tests/fixtures/dirty_transactions.csv"
    raw = read_transactions_csv(spark, src)
    good = raw.filter(raw[CORRUPT_COL].isNull()).drop(CORRUPT_COL)

    out, fetch = observed_pipeline(good)
    out.write.mode("overwrite").parquet(str(tmp_path / "t"))
    got = fetch()

    # cache before counting: column pruning on the corrupt-filtered scan
    # leaves only the corrupt column referenced, which Spark disallows
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the cached relation breaks the
    # raw-file lineage exactly as the error message prescribes
    good = good.cache()
    original = good.count()
    processed = transform(good).count()
    assert got == {
        "original_rows": original,
        "processed_rows": processed,
        "rows_removed": original - processed,
        "success": True,
    }
    assert processed == spark.read.parquet(str(tmp_path / "t")).count()


# pandas NA-sentinel parity fixture: every class of pandas STR_NA_VALUES
# placement (key column, amount, status, timestamp) plus the standard
# drop rules as controls. t10's status carries real padding (parser must
# not trim before token matching).
NA_TOKEN_CSV = """transaction_id,user_id,amount,timestamp,status
t1,u1,10.00,2024-01-01T00:00:00,Completed
NA,u2,20.00,2024-01-01T00:00:01,completed
t3,NULL,30.00,2024-01-01T00:00:02,completed
t4,u4,None,2024-01-01T00:00:03,completed
t5,u5,40.00,2024-01-01T00:00:04,None
t6,u6,50.00,2024-01-01T00:00:05,n/a
t7,u7,60.00,2024-01-01T00:00:06,NA
t8,u8,-5.00,2024-01-01T00:00:07,completed
t9,u9,70.00,2024-01-01T00:00:08,CANCELLED
t10,u10,80.5,2024-01-01T00:00:09, Pending
t11,<NA>,90.00,2024-01-01T00:00:10,completed
t12,u12,100.00,NaN,completed
"""


def test_na_token_ingestion_parity(spark, tmp_path):
    """Pinned against a captured reference run (transform_chunk via
    PYTHONPATH=/root/reference:/root/reference/src on this exact CSV,
    2026-08-14): survivors t1,t5,t6,t7,t10,t12; "NA"/"NULL"/"<NA>" key
    rows dropped by F1 *after* pandas nulls the token at ingest; "None"
    amount dropped by F2; "NaN" timestamp nulls. The reference's survivor
    statuses for the t5/t6/t7 token rows are the literal string "nan"
    (the dead-fillna quirk) — here they are "unknown" per the documented
    F3 deviation. That deviation is load-bearing: in the reference's own
    END-TO-END pipeline those "nan" strings round-trip through the
    combined CSV, pd.read_csv re-nulls them, and SQLite's NOT NULL
    rejects the batch — the whole chunk loads ZERO rows ("Failed to load
    chunk 0", reproduced on this fixture). "unknown" is the only
    loadable semantics."""
    from large_csv_etl_spark.io import CORRUPT_COL, read_transactions_csv

    p = tmp_path / "na.csv"
    p.write_text(NA_TOKEN_CSV)

    raw = read_transactions_csv(spark, str(p), na_tokens=True)
    out = transform(raw.filter(raw[CORRUPT_COL].isNull()).drop(CORRUPT_COL))
    rows = {r.transaction_id: r for r in out.collect()}
    assert set(rows) == {"t1", "t5", "t6", "t7", "t10", "t12"}
    assert rows["t1"].status == "completed" and rows["t1"].amount == 10.0
    for t in ("t5", "t6", "t7"):
        assert rows[t].status == "unknown"
    assert rows["t10"].status == "pending" and rows["t10"].amount == 80.5
    assert rows["t12"].timestamp is None

    # default scan: the tokens are ordinary string payloads — key rows
    # survive, token statuses survive lowercased (amount "None" still
    # drops because try_cast nulls any non-numeric)
    raw_def = read_transactions_csv(spark, str(p))
    out_def = transform(
        raw_def.filter(raw_def[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    )
    by_id = {r.transaction_id: r for r in out_def.collect()}
    assert set(by_id) == {
        "t1", "NA", "t3", "t5", "t6", "t7", "t10", "t11", "t12",
    }
    assert by_id["t5"].status == "none"
    assert by_id["t12"].timestamp == "NaN"
