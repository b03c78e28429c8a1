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
    # ---- round-6 window: the 9 oracled entries that have NEVER had a
    # driver verdict (round-5 mid-round additions, all mimic-green —
    # grading them closes cumulative driver coverage at 185/185), then
    # 41 deliberate RE-grades chosen as regression insurance against the
    # per-round testdata regeneration (VERDICT r5 ask #2): every
    # reference-parity §2a core entry, every events/streaming/temporal
    # consumer of the drift-prone ts fixture type, every float-heavy
    # entry in the decimal-cast-tie class that bit embedding_dim_stats
    # at sf0.1 in round 5, the TPC-H flagships, and one rep for each
    # remaining family (windows/setops/multimodal) so all 15 families
    # stay represented.
    # -- never driver-graded (9) --
    "dq_join_cardinality_audit",
    "dq_key_skew_profile",
    "sim_ivf_portable_topk",
    "dedup_minhash_calibration",
    "dedup_simhash_portable_neardup",
    "dedup_incremental_minhash",
    "sample_survivor_weighted",
    "events_type_drift_daily",
    "text_source_token_drift",
    # -- §2a reference-parity core re-grades (9) --
    "etl_transform_parity",
    "etl_upsert_last_write_wins",
    "validation_counts",
    "agg_global_count",
    "agg_status_counts",
    "agg_amount_stats",
    "scalar_round_2dp",
    "profile_orders_columns",
    "matview_incremental_rollup",
    # -- events ts-fixture consumers (10) --
    "events_sessionization",
    "events_hourly_tumbling",
    "events_sliding_window",
    "events_daily_gap_fill",
    "events_zscore_anomaly",
    "events_type_run_intervals",
    "events_cohort_retention",
    "events_daily_active_users",
    "events_json_props",
    "events_type_pivot",
    # -- streaming ts-fixture consumers (4) --
    "streaming_sessionization",
    "streaming_sliding_window",
    "streaming_dedup_exact",
    "streaming_hourly_tumbling",
    # -- temporal ts-fixture consumers (2) --
    "asof_join_latest_order",
    "range_join_follower_events",
    # -- float-heavy / decimal-tie class re-grades (10) --
    "embedding_dim_stats",
    "embedding_centroid_assign",
    "embedding_quantize_int8",
    "sim_cosine_topk",
    "agg_winsorized_mean",
    "agg_weighted_median",
    "agg_median_abs_deviation",
    "quantile_binning_decile",
    "quantiles_exact",
    "agg_median_by_status",
    # -- TPC-H flagships (3) --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    # -- family reps so every family has a round-6 verdict (3) --
    "window_running_spend",
    "setop_intersect_nations",
    "multimodal_resize_dims",
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
