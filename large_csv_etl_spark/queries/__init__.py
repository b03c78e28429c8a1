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
entries, every operator family represented) first, then the remaining
oracled entries, then the rows-only ones. The window is rotated each round
toward never-graded entries — see the comment on GRADED_PRIORITY.
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

# First 50 = the driver's grading window. The window is rebuilt each
# round to maximize CUMULATIVE driver coverage: everything ever graded
# rotates OUT (still oracled + mimic-verified every round) except one
# flagship representative (etl_transform_parity — the reference-parity
# transform core) and one rep per family whose never-graded pool is
# empty. Every other slot is an oracled entry that has NEVER had a
# driver verdict. Never-graded entries that don't fit sit immediately
# after the window (the oracled-first sort below), first in line for the
# next rotation — compute the current deferral list with
# tools/drive_driver.py + CORRECTNESS_r*.json rather than trusting any
# hardcoded count here.
GRADED_PRIORITY = [
    # ---- round-7 window: the 27 oracled entries that have NEVER had a
    # driver verdict (the round-6 additions — grading them closes
    # cumulative driver coverage at 212/212), then 23 deliberate
    # RE-grades chosen per VERDICT r6 ask #2: the flagship
    # etl_transform_parity (every round), the other §2a core entries
    # (upsert, validation), one rep per ts-consumer family
    # (batch sessionization, tumbling, as-of, streaming sessionization),
    # the decimal-tie float class reps (embedding_dim_stats,
    # quantiles_exact), one rep per family never re-graded since r3
    # (rollup, cube, unpivot, fuzzy join, transitions), and the stalest
    # r1/r2 entries (text_lang_stats is the oldest verdict in the
    # registry; the remaining r2 TPC-H/relational entries fill the
    # window, oldest first per tools/gen_window.py).
    # -- never driver-graded (27) --
    "etl_scd2_merge",
    "dataset_card_report",
    "dq_join_estimate_calibration",
    "temporal_nearest_event_to_order",
    "skew_salted_join_rollup",
    "agg_skew_kurtosis_exact",
    "window_topk_with_ties",
    "setop_symmetric_diff_active_custkeys",
    "scalar_regexp_functions",
    "events_concurrency_profile",
    "events_watermark_late_audit",
    "events_ab_experiment_analysis",
    "sample_mixture_solver",
    "sample_kfold_assign",
    "sample_length_bucket_waste",
    "streaming_hourly_users",
    "text_memorization_ngrams",
    "text_ngram_novelty",
    "text_readability_ari",
    "text_token_concentration",
    "graph_token_communities",
    "dedup_prefix_truncation",
    "dedup_source_contamination_matrix",
    "dedup_cdc_chunk_potential",
    "embedding_pca_top_component",
    "embedding_kmeans_lloyd",
    "sim_matryoshka_overlap",
    # -- flagship + §2a core re-grades (3) --
    "etl_transform_parity",
    "etl_upsert_last_write_wins",
    "validation_counts",
    # -- one rep per ts-consumer family (4) --
    "events_sessionization",
    "events_hourly_tumbling",
    "asof_join_latest_order",
    "streaming_sessionization",
    # -- decimal-tie float class reps (2) --
    "embedding_dim_stats",
    "quantiles_exact",
    # -- families never re-graded since r3/r4 (5) --
    "rollup_order_priority",
    "cube_returnflag_linestatus",
    "unpivot_lineitem_metrics",
    "text_fuzzy_token_pairs",
    "events_type_transitions",
    # -- stalest verdicts in the registry (9: r1 + oldest r2) --
    "text_lang_stats",
    "agg_having",
    "count_distinct_exact",
    "distinct_order_dims",
    "join_outer_null_handling",
    "q10_returned_items",
    "q14_promo_revenue_ratio",
    "q18_large_volume_customers",
    # -- family rep: multimodal (pinned by test_registry — every family
    # must hold a window slot; also the stalest multimodal verdict, r3) --
    "multimodal_decoded_dims",
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
