"""Similarity search over ``embeddings`` (driver mandate): brute-force
cosine top-k as the correctness baseline; random-hyperplane LSH bucketing
as the 100 TB path (candidate set shrinks by the bucket selectivity; probe
cost per query goes from |corpus| to |bucket|).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

QUERIES = {}
ORACLES = {}


def _q(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _dot(a, b):
    """Sequential-fold dot product in double (JVM higher-order functions).
    float32 -> float64 promotion is exact and both engines fold left-to-
    right over the same values, so the result is bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


@_q(
    "sim_cosine_topk",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             ROUND(CAST(list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]), q.qv) AS DOUBLE), 6)
               AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, label, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for a query vector (vec_id=0).

    TakeOrderedAndProject => per-partition heaps, only k rows to the
    driver. Scores rounded to 6dp so last-ulp float differences between
    engines can't flip the hash (ordering ties broken on vec_id).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", "label", F.round(cos, 6).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@_q(
    "sim_norms",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(SQRT(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def sim_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + dimensionality (sanity surface for the ANN
    stack; JVM fold, no UDF). Both engines fold the same float32->double
    promoted squares left-to-right; 6dp rounding absorbs any last-ulp
    reassociation."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(_norm(F.col("embedding")), 6).alias("l2_norm"),
    )


def _hyperplanes(dim: int = 64, n_planes: int = 8) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded) shared by plan + tests."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((n_planes, dim)).tolist()


@_q("sim_lsh_buckets")  # engine-specific hashing layout; rows-only check
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) LSH bucketing: 8 sign bits ->
    256 buckets. This is the scale path for ANN: bucket on the hash
    (one shuffle), then brute-force only within buckets. Returns bucket
    histogram (bucket id, member count) — the partition-balance view that
    matters operationally at 100 TB."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    bucket = None
    for i, p in enumerate(planes):
        proj = _dot(F.col("embedding"), F.array(*[F.lit(float(v)) for v in p]))
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        bucket = term if bucket is None else bucket + term
    return (
        emb.select("vec_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


@_q("sim_lsh_topk")  # approximate result set; rows-only check
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via LSH: probe only the query's bucket (plus Hamming-1
    neighbors for recall), brute-force within. Same answer shape as
    sim_cosine_topk; candidate set ~ |corpus| / 2^bits * (1 + bits)."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes()

    def bucket_of(col):
        b = None
        for i, p in enumerate(planes):
            proj = _dot(col, F.array(*[F.lit(float(v)) for v in p]))
            bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            term = F.shiftleft(bit, i)
            b = term if b is None else b + term
        return b

    with_bucket = emb.select("vec_id", "label", "embedding", bucket_of(F.col("embedding")).alias("bucket"))
    q = with_bucket.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    # query bucket + all Hamming-distance-1 buckets
    probe = q.select(
        "qv",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(len(planes))
                ],
            )
        ).alias("bucket"),
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    return (
        with_bucket.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe), "bucket")
        .select("vec_id", "label", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )
