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
    # ---- round-8 window: 48 of the 54 round-7 additions have never had
    # a driver verdict and get one now (grading them pushes cumulative
    # driver coverage toward 262/264 oracled entries). The never-graded
    # pool (52, per tools/gen_window.py against CORRECTNESS_r1..r7) holds
    # 52 entries; four are deferred to round 9 (events_transition_latency
    # and events_type_daily_correlation from the 13-rep events block,
    # plus gen_window's own deferrals embedding_label_homophily and
    # sim_retrieval_eval from the 5-rep similarity block) to free slots
    # for the two families the pool leaves unrepresented — approx and
    # multimodal — which take their stalest-verdict reps instead
    # (agg_iqr_outliers r4, multimodal_frame_index r3) per
    # test_registry's one-rep-per-family contract.
    # -- never driver-graded (48) --
    "etl_cdc_apply",
    "etl_changeset_derive",
    "etl_csv_dialect_parity",
    "etl_schema_evolution_read",
    "etl_reject_reasons",
    "dq_benford_first_digit",
    "dq_k_anonymity_audit",
    "dq_warehouse_sanity_sweep",
    "dq_functional_dependency_audit",
    "temporal_business_hours_overlap",
    "temporal_ship_lag_sla",
    "agg_gini_concentration",
    "agg_share_of_parent",
    "join_not_in_null_semantics",
    "basket_association_rules",
    "agg_robust_location_panel",
    "agg_largest_remainder_percent",
    "window_max_drawdown",
    "setop_intersect_all_partkeys",
    "scalar_bitwise_functions",
    "events_debounce_bursts",
    "events_interarrival_histogram",
    "events_seasonal_naive_error",
    "events_markov_stationary",
    "events_user_feature_export",
    "events_rolling_wau",
    "events_hysteresis_alerts",
    "events_trending_decay",
    "events_user_behavior_divergence",
    "events_out_of_order_audit",
    "events_linear_attribution",
    "sample_neyman_allocation",
    "sample_poisson_bootstrap",
    "sample_curriculum_order",
    "sample_ipw_estimate",
    "streaming_segment_counts",
    "text_vocab_growth",
    "graph_triangle_count",
    "text_lang_confusion",
    "text_normalization_impact",
    "dedup_bloom_prefilter_calibration",
    "dedup_survivor_policy_compare",
    "dedup_cluster_size_histogram",
    "dedup_lsh_band_sweep",
    "dedup_normalization_gain",
    "sim_ann_recall_audit",
    "embedding_pq_audit",
    "embedding_pair_distance_histogram",
    # -- family reps for the two families absent from the never-graded
    # pool (pinned by test_registry; stalest verdicts: r4 / r3) --
    "agg_iqr_outliers",
    "multimodal_frame_index",
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
