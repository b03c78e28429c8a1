"""Multimodal plumbing: typed binary/meta schema, the stubbed decoder
gate, and frame-sampling byte conservation. (The decode path's row-level
correctness is oracle-verified in test_oracle_diff via
multimodal_decoded_dims.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from large_csv_etl_spark.io import load_table
from large_csv_etl_spark.multimodal import (
    attach_payload,
    decode_payloads,
    sample_frames,
)

from .conftest import SF_DIR


def test_payload_schema_types(spark):
    p = attach_payload(load_table(spark, SF_DIR, "documents"))
    dtypes = dict(p.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<mime:string")


def test_real_decoder_is_gated_not_fake(spark):
    """stub=False must fail loudly (NotImplementedError via the import-try
    gate) — never silently fall back to fake dimensions."""
    p = attach_payload(load_table(spark, SF_DIR, "documents")).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|Pillow|stub"):
        decode_payloads(p, stub=False).collect()


def test_frame_sampling_conserves_bytes(spark):
    p = attach_payload(load_table(spark, SF_DIR, "documents"))
    frames = sample_frames(p, every_n_bytes=64)
    check = (
        frames.groupBy("doc_id")
        .agg(F.sum(F.octet_length("frame_bytes")).alias("reassembled"))
        .join(p.select("doc_id", F.col("meta.n_bytes").alias("orig")), "doc_id")
        .filter(F.col("reassembled") != F.col("orig"))
    )
    assert check.count() == 0
