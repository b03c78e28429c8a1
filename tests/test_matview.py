"""Incremental rollup maintenance must be bit-identical to a full rebuild,
in any merge order — the exactness claim that makes it safe to never
recompute from base."""

from __future__ import annotations

from pyspark.sql import functions as F

from large_csv_etl_spark.io import load_table
from large_csv_etl_spark.matview import (
    N_COL,
    build_rollup,
    finalize_rollup,
    merge_rollup,
)

KEYS = ["o_orderstatus", "o_orderpriority"]
SUMS = {"total_price": "o_totalprice"}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_full_rebuild(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 5 != 0)
    delta = orders.filter(F.col("o_orderkey") % 5 == 0)

    merged = merge_rollup(
        build_rollup(base, KEYS, SUMS), build_rollup(delta, KEYS, SUMS), KEYS
    )
    full = build_rollup(orders, KEYS, SUMS)
    assert _rows(merged) == _rows(full)


def test_merge_order_invariant(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    parts = [
        build_rollup(orders.filter(F.col("o_orderkey") % 3 == i), KEYS, SUMS)
        for i in range(3)
    ]
    a = merge_rollup(merge_rollup(parts[0], parts[1], KEYS), parts[2], KEYS)
    b = merge_rollup(merge_rollup(parts[2], parts[0], KEYS), parts[1], KEYS)
    assert _rows(a) == _rows(b)


def test_finalize_surfaces_double_and_avg(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    r = finalize_rollup(
        build_rollup(orders, KEYS, SUMS), {"avg_price": "total_price"}
    )
    dtypes = dict(r.dtypes)
    assert dtypes["total_price"] == "double"
    assert dtypes["avg_price"] == "double"
    row = r.filter(
        (F.col(KEYS[0]) == "O") & (F.col(KEYS[1]) == "1-URGENT")
    ).first()
    if row is not None:
        assert abs(row.avg_price - row.total_price / row[N_COL]) == 0.0


def test_streaming_foreachbatch_maintenance_equals_rebuild(spark, sf_dir, tmp_path):
    """Stream the base table in single-file micro-batches through
    foreachBatch merge; the maintained parquet store must be bit-identical
    to one full rebuild (associative decimal partials)."""
    from large_csv_etl_spark.matview import build_rollup, finalize_rollup
    from large_csv_etl_spark.streaming import matview_maintenance_stream

    src = str(tmp_path / "orders_stream")
    store = str(tmp_path / "rollup_store")
    ckpt = str(tmp_path / "ckpt")
    base = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base.repartition(3).write.parquet(src)  # 3 files -> 3 micro-batches

    keys = ["o_orderpriority", "o_orderstatus"]
    sums = {"sum_price": "o_totalprice"}
    matview_maintenance_stream(spark, src, store, ckpt, keys, sums)

    maintained = sorted(
        map(
            tuple,
            finalize_rollup(spark.read.parquet(store), {"avg_price": "sum_price"})
            .collect(),
        )
    )
    rebuilt = sorted(
        map(
            tuple,
            finalize_rollup(
                build_rollup(base, keys, sums), {"avg_price": "sum_price"}
            ).collect(),
        )
    )
    assert maintained == rebuilt


def test_foreachbatch_maintenance_is_exactly_once_on_rerun(spark, sf_dir, tmp_path):
    """Re-running the drained stream with the same checkpoint processes
    nothing (the file source remembers consumed files), so the store is
    unchanged — the exactly-once contract a maintenance job relies on
    when a scheduler retries it."""
    from large_csv_etl_spark.streaming import matview_maintenance_stream

    src = str(tmp_path / "orders_stream")
    store = str(tmp_path / "rollup_store")
    ckpt = str(tmp_path / "ckpt")
    base = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base.repartition(2).write.parquet(src)

    keys = ["o_orderstatus"]
    sums = {"sum_price": "o_totalprice"}
    matview_maintenance_stream(spark, src, store, ckpt, keys, sums)
    first = sorted(map(tuple, spark.read.parquet(store).collect()))

    matview_maintenance_stream(spark, src, store, ckpt, keys, sums)
    second = sorted(map(tuple, spark.read.parquet(store).collect()))
    assert first == second


def test_foreachbatch_merge_is_idempotent_under_batch_replay(
    spark, sf_dir, tmp_path
):
    """The crash window the checkpoint cannot cover: the process dies
    AFTER the store swap but BEFORE the streaming checkpoint commits, so
    the same micro-batch (same batch_id, same data) is delivered to
    foreachBatch again. The store-side _applied_batch_id marker must make
    the replayed merge a no-op — without it the delta double-counts."""
    import os

    from large_csv_etl_spark.streaming import merge_batch_into_store

    store = str(tmp_path / "rollup_store")
    base = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = ["o_orderstatus"]
    sums = {"sum_price": "o_totalprice"}

    merge_batch_into_store(spark, base.limit(40), 0, store, keys, sums)
    merge_batch_into_store(spark, base.limit(80), 1, store, keys, sums)
    after_b1 = sorted(map(tuple, spark.read.parquet(store).collect()))

    # replay batch 1 (post-swap crash): must not re-merge
    merge_batch_into_store(spark, base.limit(80), 1, store, keys, sums)
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == after_b1
    # a stale batch id (0) replayed out of order is equally a no-op
    merge_batch_into_store(spark, base.limit(40), 0, store, keys, sums)
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == after_b1
    # the store is published as a symlink and never absent mid-swap
    assert os.path.islink(store)
    # a NEW batch id still merges
    merge_batch_into_store(spark, base.limit(10), 2, store, keys, sums)
    assert sorted(map(tuple, spark.read.parquet(store).collect())) != after_b1


def test_merge_store_relative_path_with_subdir(spark, sf_dir, tmp_path):
    """The symlink target must be the sibling data dir's BASENAME: a
    relative store path with a directory component ('…/out/rollup') would
    otherwise produce a link whose embedded '…/out/…' target re-resolves
    against the link's own directory ('…/out/…/out/…') and dangles,
    breaking the very next store read. The relative path is built from
    the process cwd so Python file ops and the driver JVM resolve it to
    the same location."""
    import os

    from large_csv_etl_spark.streaming import merge_batch_into_store

    (tmp_path / "out").mkdir()
    store = os.path.relpath(tmp_path / "out" / "rollup")
    assert os.path.dirname(store)  # the premise: a directory component
    base = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = ["o_orderstatus"]
    sums = {"sum_price": "o_totalprice"}

    merge_batch_into_store(spark, base.limit(40), 0, store, keys, sums)
    assert os.path.islink(store) and os.path.exists(store)  # not dangling
    first = sorted(map(tuple, spark.read.parquet(store).collect()))
    merge_batch_into_store(spark, base.limit(80), 1, store, keys, sums)
    assert os.path.exists(store)
    assert sorted(map(tuple, spark.read.parquet(store).collect())) != first
    # the superseded batch-0 data dir was cleaned up, the live one kept
    assert not os.path.exists(f"{store}__data_b0")
    assert os.path.exists(f"{store}__data_b1")


def test_upsert_store_any_batch_split_converges(spark, sf_dir, tmp_path):
    """Last-write-wins upsert: ANY micro-batch split of the input must
    converge to the same store as one big batch — the reduction
    (keep the (ts, event_id)-max row per user) is associative and
    commutative over batches."""
    from large_csv_etl_spark.streaming import upsert_batch_into_store

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    keys, ords = ["user_id"], ["ts", "event_id"]

    one = str(tmp_path / "one")
    upsert_batch_into_store(spark, ev, 0, one, keys, ords)
    expected = sorted(map(tuple, spark.read.parquet(one).collect()))

    # split by event_id parity, applied in two batches (order B then A)
    split = str(tmp_path / "split")
    upsert_batch_into_store(
        spark, ev.filter("event_id % 2 = 1"), 0, split, keys, ords
    )
    upsert_batch_into_store(
        spark, ev.filter("event_id % 2 = 0"), 1, split, keys, ords
    )
    assert sorted(map(tuple, spark.read.parquet(split).collect())) == expected


def test_upsert_store_replay_is_noop(spark, sf_dir, tmp_path):
    """Same post-swap-crash replay window as the rollup store: a replayed
    or stale batch_id must not change the published upsert store."""
    import os

    from large_csv_etl_spark.streaming import upsert_batch_into_store

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    keys, ords = ["user_id"], ["ts", "event_id"]
    store = str(tmp_path / "store")

    upsert_batch_into_store(spark, ev.filter("event_id % 2 = 1"), 0, store, keys, ords)
    upsert_batch_into_store(spark, ev.filter("event_id % 2 = 0"), 1, store, keys, ords)
    after_b1 = sorted(map(tuple, spark.read.parquet(store).collect()))

    upsert_batch_into_store(spark, ev.filter("event_id % 2 = 0"), 1, store, keys, ords)
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == after_b1
    upsert_batch_into_store(spark, ev.filter("event_id % 2 = 1"), 0, store, keys, ords)
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == after_b1
    assert os.path.islink(store)
