"""Multimodal-column queries (§2b last row) — binary payload plumbing over
the documents fixture, including an ORACLED mapInPandas path: the stub
decoder derives dimensions deterministically from byte length, so DuckDB
can reproduce the whole Arrow-batched pipeline with pure SQL arithmetic —
proving the Python batch path computes exactly what it claims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..multimodal import attach_payload, decode_payloads, sample_frames

QUERIES = {}
ORACLES = {}


def _q(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_q(
    "multimodal_payload_stats",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           MD5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload accounting: byte length + content digest, computed on
    the BinaryType column JVM-side (DuckDB's string md5 hashes the same
    utf-8 bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_payload(docs)
    return payloads.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


@_q(
    "multimodal_decoded_dims",
    """
    SELECT doc_id,
           CAST(16 + (octet_length(encode(text)) % 240) AS INT) AS width,
           CAST(16 + ((octet_length(encode(text)) // 7) % 240) AS INT) AS height,
           3 AS n_channels
    FROM documents
    """,
)
def multimodal_decoded_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path, oracle-verified: the deterministic stub
    decoder's output must equal the closed-form SQL over byte lengths —
    i.e. the Arrow batch pipeline (schema, batching, row alignment) is
    exactly right, independent of which decoder runs inside it."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_payloads(attach_payload(docs), stub=True)
    return decoded.select(
        "doc_id", "width", "height", F.col("n_channels").cast("int").alias("n_channels")
    )


@_q(
    "multimodal_frame_index",
    """
    SELECT doc_id,
           GREATEST(CAST(CEIL(octet_length(encode(text)) / 64.0) AS BIGINT), 1)
             AS n_frames,
           octet_length(encode(text)) AS total_frame_bytes
    FROM documents WHERE octet_length(encode(text)) > 0
    """,
)
def multimodal_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride frame sampling (JVM-side substring explode): frame
    count and reassembled byte total per document — the keyframe-index
    pass that precedes any real decoder."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.encode(F.col("text"), "utf-8")) > 0
    )
    frames = sample_frames(attach_payload(docs))
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.octet_length("frame_bytes")).alias("total_frame_bytes"),
    )
