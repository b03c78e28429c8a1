"""Oracle-differential tests: every queries() entry vs its oracle_sql()
twin, run on the same parquet via DuckDB — a local mimic of the driver's
CORRECTNESS gate (row count + column names + order-insensitive exact
values). Runs at sf0.001 for speed; the driver uses sf0.01.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod
from large_csv_etl_spark.schemas import TEST_TABLES

from .conftest import SF_DIR

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from drive_driver import arrow_canon, spark_canon  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(value):
    """Canonicalize a cell for exact comparison (mimics a value hash)."""
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # repr of the double — exact; any ulp difference shows up
        return repr(value)
    if isinstance(value, bool):
        return str(int(value))
    return str(value)


def _rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in df.columns]
    spark_rows = [tuple(r) for r in df.collect()]

    con = _duck_con(SF_DIR)
    rel = con.sql(ORACLES[name])
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    # Result TYPES must match too: the external driver hashes arrow-level
    # result types, so e.g. a bare integer SUM (DuckDB HUGEINT) vs Spark
    # BIGINT hash-fails even with identical values (bit rounds 1 AND 2).
    duck_types = {
        f.name.lower(): arrow_canon(f.type)
        for f in con.sql(ORACLES[name]).arrow().schema
    }
    spark_types = {
        f.name.lower(): spark_canon(f.dataType) for f in df.schema.fields
    }
    mismatched = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not mismatched, f"{name}: result-type mismatch {mismatched}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _rows_canon(spark_cols, spark_rows)
    d = _rows_canon(duck_cols, duck_rows)
    if s != d:
        diff = [(a, b) for a, b in zip(s, d) if a != b][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Non-SQL-expressible ops: must run and return a stable schema."""
    df = QUERIES[name](spark, SF_DIR)
    rows = df.collect()
    assert df.columns, name
    assert rows is not None


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_entry_contract(spark):
    """The driver smoke-check: entry(spark) runs and yields rows with a
    stable schema."""
    df = entry_mod.entry(spark)
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]
    assert df.count() >= 1
