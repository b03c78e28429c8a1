"""Driver-fixture contract: the columns and (normalized) types every
operator assumes. The driver regenerates /root/testdata between rounds
and has already changed physical types once (events.ts: TIMESTAMP(NANOS)
as int64 -> TIMESTAMP(MICROS)/NTZ in round 4); when that happens again,
THIS file should fail first with a message that says exactly what moved,
instead of a timestamp error deep inside some query plan."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from large_csv_etl_spark.io import load_table

from .conftest import SF_DIR

EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

# physical layouts the readers know how to normalize
KNOWN_TS_FORMS = {"timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]", "int64"}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_fixture_columns_unchanged(table):
    sch = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    assert list(sch.names) == EXPECTED_COLUMNS[table], (
        f"driver fixture drift: {table} columns changed — update readers, "
        f"oracles, and this contract together"
    )


def test_events_ts_physical_form_is_known():
    sch = pq.read_schema(f"{SF_DIR}/events.parquet")
    ts = str(sch.field("ts").type)
    assert ts in KNOWN_TS_FORMS, (
        f"events.ts physical type changed to {ts!r} — io.load_table and "
        "streaming.read_events_stream must learn this form (see round-4 "
        "NTZ migration in .claude/skills/verify/SKILL.md)"
    )


def test_load_table_normalizes_ts_to_a_timestamp(spark):
    dtype = dict(load_table(spark, SF_DIR, "events").dtypes)["ts"]
    assert dtype in ("timestamp", "timestamp_ntz"), dtype


def test_embedding_element_type_is_float(spark):
    dtype = dict(load_table(spark, SF_DIR, "embeddings").dtypes)["embedding"]
    assert dtype in ("array<float>", "array<double>"), dtype


ORDERING_CRITICAL = {
    # window/sort oracles rely on these never being NULL: Spark sorts
    # nulls FIRST by default where DuckDB sorts them LAST, so a null in
    # an ORDER BY column would silently diverge 40+ graded queries
    "orders": ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    "lineitem": ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    "events": ["event_id", "ts", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


@pytest.mark.parametrize("table", sorted(ORDERING_CRITICAL))
def test_ordering_columns_have_no_nulls(table):
    import duckdb

    cols = ORDERING_CRITICAL[table]
    checks = ", ".join(
        f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)" for c in cols
    )
    row = duckdb.sql(
        f"SELECT {checks} FROM '{SF_DIR}/{table}.parquet'"
    ).fetchone()
    assert all((v or 0) == 0 for v in row), (
        f"NULLs appeared in ordering-critical columns of {table}: "
        f"{dict(zip(cols, row))} — add explicit NULLS FIRST/LAST to every "
        "oracle ORDER BY touching them (engine defaults differ)"
    )
