"""Query surface: every operator family from SURVEY.md §2, one module each.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]`` and
``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL over the same parquet
views). ``all_queries()`` / ``all_oracles()`` merge them for the driver
contract in ``__spark_entry__.py``.

Determinism contract shared by every pair (see helpers.py): money/float
aggregates are computed via exact DECIMAL sums and surfaced as DOUBLE, so
Spark's partition-order-dependent float accumulation can never diverge from
the oracle.

Ordering contract: the grading driver verdicts only the FIRST 50 registry
entries, so ``all_queries()`` emits ``GRADED_PRIORITY`` (exactly 50 oracled
entries, every operator family represented — ETL core, temporal joins,
text/dedup/similarity/multimodal, events, plus representatives of the
families already proven green in rounds 1-2) first, then the remaining
oracled entries, then the rows-only ones.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    approx,
    quality,
    dedup,
    etl,
    events,
    multimodal,
    relational,
    sampling,
    scalars,
    setops,
    similarity,
    streamq,
    temporal,
    text,
    windows,
)

_MODULES = [
    etl,
    quality,
    temporal,
    relational,
    windows,
    setops,
    scalars,
    approx,
    events,
    sampling,
    streamq,
    text,
    dedup,
    similarity,
    multimodal,
]

# First 50 = the driver's grading window. Families the earlier rounds never
# got verdicts on (ETL transform core, temporal joins, the whole
# text/dedup/similarity/multimodal LLM suite) come first; families with 8
# green rows in CORRECTNESS_r02 (windows, scalars) keep 3 representatives
# each and rotate the rest past the window.
GRADED_PRIORITY = [
    # reference ETL core + upsert (first-ever driver verdict for F1-F5/P1-P5)
    "etl_transform_parity",
    "etl_upsert_last_write_wins",
    # temporal joins (new round 3)
    "asof_join_latest_order",
    "range_join_follower_events",
    # new aggregation shapes (round 3)
    "grouping_sets_status_priority",
    "agg_median_by_status",
    # text analysis (9)
    "text_token_counts",
    "text_vocab_per_doc",
    "text_top_terms",
    "text_quality_score",
    # data-quality expectation suite (new; lang_stats rotates out,
    # still oracled + mimic-verified)
    "dq_expectations_orders",
    "text_fingerprint",
    "text_langid_heuristic",
    "text_bpe_token_estimate",
    "text_repetition_ratio",
    # dedup (4 oracled)
    "dedup_exact_groups",
    "dedup_exact_survivors",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_embedding_neardup",
    # similarity (2 oracled)
    "sim_cosine_topk",
    "sim_norms",
    # multimodal (3)
    "multimodal_payload_stats",
    "multimodal_decoded_dims",
    "multimodal_frame_index",
    # event analytics (6 — includes the two round-2 hash-fail fixes)
    "events_hourly_tumbling",
    "events_json_props",
    "events_sessionization",
    "events_type_pivot",
    "events_daily_active_users",
    "events_sliding_window",
    # quantiles
    "quantiles_exact",
    # window representative (running frame; rank variants rotate out,
    # still oracled + mimic-verified)
    "window_running_spend",
    # streaming stateful dedup under forced duplicate delivery (new)
    "streaming_dedup_exact",
    # deterministic hash sampling (new round 3)
    "sample_hash_uniform",
    # scalar representatives (reference-parity rounding / arrays)
    "scalar_round_2dp",
    # training-sequence packing (new; array functions rotate out)
    "sample_pack_sequences",
    # Q17 correlated-subquery shape (new round 3)
    "q17_small_quantity_revenue",
    # set-op / sort representatives
    "setop_except_nations",
    "sort_limit_top_orders",
    # streaming path under the oracle gate (new round 3)
    "streaming_hourly_tumbling",
    # relational / TPC-H-shaped representatives (q1/q3 + validation_counts;
    # the other green-in-r02 TPC-H shapes rotate past the window — they
    # stay oracled and mimic-verified)
    "validation_counts",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_left_anti_semi",
    # round-3 new families, in place of rotated TPC-H reps: quantization,
    # time-series fill, int8 ANN, decontamination, mixture composition
    "embedding_quantize_int8",
    "events_daily_gap_fill",
    "sim_quantized_topk",
    "dedup_eval_decontamination",
    "sample_mixture_weighted",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    oracles = all_oracles()
    missing = [n for n in GRADED_PRIORITY if n not in out or n not in oracles]
    if missing:
        raise ValueError(f"GRADED_PRIORITY names missing or unoracled: {missing}")
    prio = set(GRADED_PRIORITY)
    return {
        **{k: out[k] for k in GRADED_PRIORITY},
        **{k: v for k, v in out.items() if k not in prio and k in oracles},
        **{k: v for k, v in out.items() if k not in oracles},
    }


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
