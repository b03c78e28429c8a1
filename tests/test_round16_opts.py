"""Focused tests for the round-16 optimization internals:

- adaptive state-store partition sizing (streamq) — formula + conf
  scoping/restore around a registered streaming query;
- the vectorized Arrow cosine pass — bit-identity against the JVM
  left-to-right fold the oracles pin;
- the gated repartition before the perceptual-hash Python passes —
  hash determinism across partitionings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from large_csv_etl_spark.queries.streamq import _adaptive_state_partitions


def test_adaptive_state_partitions_formula(tmp_path, monkeypatch):
    from large_csv_etl_spark.queries import streamq

    # shrink the target so the test never writes hundreds of MB
    monkeypatch.setattr(streamq, "_STATE_TARGET_BYTES", 1024)
    # unlistable source -> 0 (leave session default untouched)
    assert _adaptive_state_partitions(str(tmp_path / "missing")) == 0
    # empty dir -> 0
    assert _adaptive_state_partitions(str(tmp_path)) == 0
    # small file -> 1 partition
    (tmp_path / "events.parquet").write_bytes(b"x" * 100)
    assert _adaptive_state_partitions(str(tmp_path)) == 1
    # non-matching files are ignored
    (tmp_path / "orders.parquet").write_bytes(b"x" * 100_000)
    assert _adaptive_state_partitions(str(tmp_path)) == 1
    # formula: ceil(bytes / target), capped at _STATE_PARTITIONS_CAP
    (tmp_path / "events.parquet").write_bytes(b"x" * 2500)
    assert _adaptive_state_partitions(str(tmp_path)) == 3
    monkeypatch.setattr(streamq, "_STATE_PARTITIONS_CAP", 2)
    assert _adaptive_state_partitions(str(tmp_path)) == 2


def test_streaming_query_restores_shuffle_partitions(spark, sf_dir):
    from large_csv_etl_spark.queries.streamq import QUERIES

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    out = QUERIES["streaming_hourly_tumbling"](spark, sf_dir)
    assert out.count() > 0
    assert spark.conf.get(key) == before


def test_cosine_scores_arrow_bit_identical_to_jvm_fold(spark):
    """The mapInArrow score pass must reproduce the _dot/(nrm*qnrm)
    expression bit-for-bit — the property the similarity oracles pin."""
    import random

    from large_csv_etl_spark.queries.similarity import (
        _cosine_scores_arrow,
        _dot,
        _norm,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(17)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    emb_n = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    ).localCheckpoint()
    qrows = (
        emb_n.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
        .collect()
    )
    got = {
        (r.q_id, r.vec_id): r.cos_sim
        for r in _cosine_scores_arrow(emb_n, qrows).collect()
    }
    q = emb_n.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        F.col("nrm") * F.col("qnrm")
    )
    want = {
        (r.q_id, r.vec_id): r.cos_sim
        for r in emb_n.crossJoin(F.broadcast(q))
        .select("q_id", "vec_id", cos.alias("cos_sim"))
        .collect()
    }
    assert set(got) == set(want)
    # bit-identity, not approximate equality
    mismatches = [k for k in want if got[k] != want[k]]
    assert mismatches == []


def test_perceptual_hash_invariant_under_repartition_gate(spark):
    """The gated repartition must not change any hash: same payloads,
    1-partition input vs gated input, identical (doc_id -> ahash)."""
    from large_csv_etl_spark.multimodal import (
        _parallelize_python_pass,
        ahash_payloads,
    )

    rows = [(i, bytes([32 + (i * 7 + j) % 90 for j in range(64)]))
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    one = df.coalesce(1)
    gated = _parallelize_python_pass(one)
    assert gated.rdd.getNumPartitions() >= one.rdd.getNumPartitions()
    h1 = {r.doc_id: r.ahash for r in ahash_payloads(one).collect()}
    h2 = {r.doc_id: r.ahash for r in ahash_payloads(gated).collect()}
    assert h1 == h2


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
