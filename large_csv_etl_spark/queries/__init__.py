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
    # ---- the 32 oracled entries that had never had a driver verdict
    # as of the round-5 window build (rounds 1-4 cumulative; includes
    # graph_token_pagerank, newly promoted from rows-only to oracled via
    # integer fixed-point ranks). Grading all of them closes driver
    # coverage for every pre-round-5 oracled entry; the 17 oracled
    # entries ADDED during round 5 (portable-hash sketch twins, feature
    # hashing, trigrams, temperature mixture, reconciliation, MAD
    # anomaly, centroid separation, tf-idf, calibration, TTL as-of,
    # funnel, boilerplate removal, conversion lag, graded streaming
    # totals) sit immediately after the window — first in line for the
    # round-6 rotation.
    # TPC-H stragglers
    "q11_important_parts",
    "q12_priority_by_delay",
    "q13_customer_order_distribution",
    "q16_supplier_variety",
    "q20_dominant_supplier_share",
    "q21_sole_late_supplier",
    "q22_idle_rich_customers",
    # exact-moment / robust aggregates
    "agg_variance_exact",
    "agg_corr_exact",
    "agg_mode_by_group",
    "agg_ols_by_group",
    # relational analytics
    "basket_part_pairs",
    "customer_rfm_segments",
    "supplier_nation_hhi",
    "histogram_extendedprice",
    "unpivot_lineitem_metrics",
    # events
    "events_bot_cadence",
    "events_cumulative_users",
    "events_heatmap_hour_dow",
    "events_props_map_explode",
    # text
    "text_length_histogram",
    "text_rolling_fingerprint",
    "text_vocab_diversity",
    "graph_token_pagerank",
    # dedup / similarity
    "dedup_survivor_weights",
    "embedding_norm_outliers",
    "sim_filtered_topk",
    # multimodal
    "multimodal_audio_windows",
    # sampling / export / scalars
    "sample_hash_stratified",
    "sample_token_budget",
    "export_training_manifest",
    "scalar_hash_functions",
    # ---- one rep per family whose never-graded pool is empty (registry
    # invariant: every oracled module keeps a current-round verdict)
    "etl_transform_parity",  # flagship: the reference's F1-F5/P1-P5 core
    "dq_expectations_orders",
    "setop_intersect_nations",
    "asof_join_latest_order",
    "window_running_spend",
    "streaming_dedup_exact",
    # ---- re-grades, oldest driver verdict first (r2 then r3)
    "agg_global_count",
    "agg_status_counts",
    "agg_amount_stats",
    "q1_pricing_summary",
    "etl_upsert_last_write_wins",
    "validation_counts",
    "dedup_exact_groups",
    "dedup_eval_decontamination",
    "sim_cosine_topk",
    "events_sessionization",
    "text_top_terms",
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
