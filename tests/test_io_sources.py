"""Sources/sinks beyond the core pipeline: JSON scan (with corrupt-record
capture), the S3 file profiler, and the S10 bucketed/sorted write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from large_csv_etl_spark.io import (
    CORRUPT_COL,
    load_table,
    profile_file,
    read_json,
    write_table_clustered,
)

from .conftest import SF_DIR


def test_read_json_with_schema_and_corrupt_capture(spark, tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"event_id": 1, "event_type": "click", "value": 1.5}\n'
        '{"event_id": 2, "event_type": "view", "value": 2.5}\n'
        "this is not json\n"
    )
    df = read_json(
        spark, str(p), "event_id long, event_type string, value double"
    )
    rows = df.collect()
    assert len(rows) == 3
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert {r.event_id for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0][CORRUPT_COL]


def test_read_json_infers_without_schema(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = read_json(spark, str(p))
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}


def test_profile_file_parquet(spark):
    info = profile_file(spark, f"{SF_DIR}/orders.parquet", sample_rows=100)
    assert info["size_bytes"] > 0
    assert "o_orderkey" in info["columns"]
    assert info["dtypes"]["o_totalprice"] == "double"
    assert info["sample_row_count"] == 100


def test_write_table_clustered_roundtrip(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    write_table_clustered(
        li, "lineitem_bucketed", ["l_orderkey"], ["l_orderkey", "l_shipdate"],
        n_buckets=8,
    )
    try:
        back = spark.table("lineitem_bucketed")
        assert back.count() == li.count()
        # bucket metadata is live: a groupBy on the bucket key plans no
        # exchange (the point of S10 write-side clustering)
        plan = (
            back.groupBy("l_orderkey").agg(F.sum("l_quantity"))._jdf
            .queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_bucketed_tables_join_without_shuffle(spark):
    """Two tables bucketed on the join key must sort-merge join with no
    Exchange on either side — the co-located join that replaces the
    reference's secondary indexes at scale."""
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_table_clustered(orders, "orders_b", ["o_orderkey"], n_buckets=8)
    write_table_clustered(li, "lineitem_b", ["l_orderkey"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path (a broadcast would bypass bucketing
        # entirely at this tiny SF — at scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("lineitem_b")
        b = spark.table("orders_b")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from large_csv_etl_spark.io import load_table, write_table_partitioned

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_part")
    write_table_partitioned(orders, out, ["o_orderstatus"])

    statuses = [r.o_orderstatus for r in orders.select("o_orderstatus").distinct().collect()]
    # one directory per partition value, one file per directory (repartition
    # by the partition column collapses the writing tasks)
    import pathlib

    dirs = {d.name for d in pathlib.Path(out).iterdir() if d.is_dir()}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}
    for d in pathlib.Path(out).iterdir():
        if d.is_dir():
            assert len(list(d.glob("*.parquet"))) == 1

    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == statuses[0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan[:800]
    expected = orders.filter(F.col("o_orderstatus") == statuses[0]).count()
    assert df.count() == expected


def test_compact_small_files(spark, sf_dir, tmp_path):
    from large_csv_etl_spark.io import compact_small_files, load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "li_small")
    # fragment: 32 shuffle partitions -> 32 tiny files
    li.repartition(32).write.parquet(out)
    import pathlib

    assert len(list(pathlib.Path(out).glob("*.parquet"))) == 32
    before = li.count()

    n_out = compact_small_files(spark, out, target_file_bytes=64 * 1024 * 1024)
    files = list(pathlib.Path(out).glob("*.parquet"))
    assert len(files) == n_out
    assert n_out < 32
    assert spark.read.parquet(out).count() == before

    # a stale __old backup from a crashed prior run must not swallow the
    # live table (shutil.move nests into an existing dir): re-compaction
    # clears it and leaves the table intact
    stale = pathlib.Path(f"{out}__old")
    stale.mkdir()
    (stale / "junk.txt").write_text("crashed run leftover")
    compact_small_files(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(out).count() == before
    assert not stale.exists()

    # a stale __old that is a regular FILE (or symlink) must be handled
    # too — rmtree on a file raises NotADirectoryError and used to abort
    # the compaction mid-swap (ADVICE r5)
    stale.write_text("crashed run left a file, not a dir")
    compact_small_files(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(out).count() == before
    assert not stale.exists()
    # and a dangling symlink at the backup path
    import os as _os

    _os.symlink(str(tmp_path / "nowhere"), str(stale))
    compact_small_files(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(out).count() == before
    assert not _os.path.lexists(stale)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from large_csv_etl_spark.io import read_orc, write_orc

    nation = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation.orc")
    write_orc(nation, p)
    back = read_orc(spark, p)
    assert back.schema == nation.schema
    assert back.count() == nation.count()
    # predicate reaches the ORC scan (filter pushdown)
    plan = back.filter(F.col("n_nationkey") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "n_nationkey" in plan


def test_read_text_lines(spark, tmp_path):
    from large_csv_etl_spark.io import read_text_lines

    p = tmp_path / "corpus.txt"
    p.write_text("alpha beta\ngamma\n\ndelta epsilon zeta\n")
    df = read_text_lines(spark, str(p))
    assert df.columns == ["value"]
    vals = sorted(r.value for r in df.collect())
    assert vals == ["", "alpha beta", "delta epsilon zeta", "gamma"]


def test_sql_front_door(spark, sf_dir):
    from large_csv_etl_spark.sql import run_sql

    df = run_sql(
        spark,
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1",
        sf_dir,
    )
    rows = {r.o_orderstatus: r.n for r in df.collect()}
    assert sum(rows.values()) == run_sql(spark, "SELECT COUNT(*) AS n FROM orders", sf_dir).first().n
    # joins across registered views work too
    j = run_sql(
        spark,
        "SELECT COUNT(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey",
        sf_dir,
    )
    assert j.first().n == 25


def test_ignore_corrupt_parquet_files(spark, sf_dir, tmp_path):
    """E3's never-abort intent for columnar inputs: a truncated/garbage
    part file in the directory must not kill the scan when
    ignoreCorruptFiles is on."""
    d = tmp_path / "tbl"
    load_table(spark, sf_dir, "nation").write.parquet(str(d))
    (d / "part-corrupt.parquet").write_bytes(b"PAR1 this is not a real file")
    before = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        assert spark.read.parquet(str(d)).count() == 25
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", before)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Files written before a column existed must read as NULL in the
    widened schema, and the pre-evolution fast-path read must still work."""
    from large_csv_etl_spark.io import read_parquet_evolved

    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    ).write.parquet(base)
    spark.createDataFrame(
        [(3, "c", 0.5)], "id bigint, name string, score double"
    ).write.mode("append").parquet(base)

    merged = read_parquet_evolved(spark, base)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[3] == 0.5 and rows[1] is None and rows[2] is None


def test_binary_file_source_feeds_multimodal_decode(spark, tmp_path):
    """binaryFile ingestion -> multimodal decode: files land as
    (path, content) rows; the stub decoder consumes the binary content
    column exactly as it consumes fixture payloads."""
    from large_csv_etl_spark.io import read_binary_dir
    from large_csv_etl_spark.multimodal import decode_payloads

    payloads = {f"clip_{i}.bin": bytes(range(i + 1)) * (i + 10) for i in range(5)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    (tmp_path / "ignore.txt").write_text("not media")

    df = read_binary_dir(spark, str(tmp_path), glob="*.bin")
    assert df.count() == 5
    got = {
        r.path.rsplit("/", 1)[-1]: r.length
        for r in df.select("path", "length").collect()
    }
    assert got == {k: len(v) for k, v in payloads.items()}

    decoded = decode_payloads(
        df.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    rows = decoded.collect()
    assert len(rows) == 5
    assert all(r.width >= 16 and r.height >= 16 for r in rows)


def test_quoted_newline_csv_needs_multiline(spark, tmp_path):
    """RFC-4180 quoted embedded newlines: the reference's pandas parser
    handles them; Spark's splittable default does NOT (one truncated clean
    row + one corrupt row). multiline=True restores parity at the cost of
    one-task-per-file reads — both behaviors pinned here so the trade-off
    stays visible."""
    from large_csv_etl_spark.io import CORRUPT_COL, read_transactions_csv

    p = tmp_path / "q.csv"
    p.write_text(
        "transaction_id,user_id,amount,timestamp,status\n"
        't1,u1,10.5,2024-01-01,"has\nnewline"\n'
        "t2,u2,20.0,2024-01-02,ok\n"
    )
    default = read_transactions_csv(spark, str(p)).collect()
    assert len(default) == 3  # split mid-record: truncated + corrupt + t2
    assert any(r[CORRUPT_COL] is not None for r in default)

    parity = read_transactions_csv(spark, str(p), multiline=True).collect()
    assert len(parity) == 2
    by_id = {r.transaction_id: r for r in parity}
    assert by_id["t1"].status == "has\nnewline"
    assert all(r[CORRUPT_COL] is None for r in parity)


def test_rfc4180_doubled_quote_and_literal_backslash(spark, tmp_path):
    """Doubled-quote escapes decode and backslashes stay literal — exact
    agreement with the reference's pandas parser."""
    import pandas as pd

    from large_csv_etl_spark.io import read_transactions_csv

    p = tmp_path / "quotes.csv"
    p.write_text(
        "transaction_id,user_id,amount,timestamp,status\n"
        't1,u1,10.5,2024-01-01,"say ""hi"" now"\n'
        't2,u2,20.0,2024-01-02,"back\\\\slash"\n'
    )
    pdf = pd.read_csv(str(p))
    got = {
        r.transaction_id: r.status
        for r in read_transactions_csv(spark, str(p)).collect()
    }
    assert got == dict(zip(pdf.transaction_id, pdf.status))
    assert got["t1"] == 'say "hi" now'
