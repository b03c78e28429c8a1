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
    # ---- round-9 window (VERDICT r8 asks #1 and #3): the never-graded
    # backlog is 100 entries — two full windows — so this rotation is
    # 49 never-graded + the flagship. Ordering policy, per the verdict:
    # (a) the four TWICE-deferred round-7 entries lead; (b) the flagship
    # `etl_transform_parity` is re-graded (its every-round re-grade was
    # skipped in r8 for the first time, and it is the only insurance if
    # the driver regenerates testdata before grading this window);
    # (c) whole families with ZERO external coverage come in as blocks
    # (graph metrics, nonparametric stats, portable sketches, file
    # formats, VAD) so the driver verdicts entire techniques at once;
    # (d) remaining slots clear the quality/temporal/setops/scalars/
    # streamq/dedup backlogs outright and take the graded-iterative
    # sampling/similarity entries. The 51 never-graded that don't fit
    # sort immediately after the window (oracled-first), first in line
    # for round 10. No new operators were added this round (verdict ask
    # #2: breadth moratorium until the backlog fits in one window).
    # -- twice-deferred round-7 additions (4) --
    "embedding_label_homophily",
    "events_transition_latency",
    "events_type_daily_correlation",
    "sim_retrieval_eval",
    # -- flagship re-grade (reference-parity transform core) --
    "etl_transform_parity",
    # -- graph-metrics block: whole family, zero external coverage (8) --
    "graph_kcore_peel",
    "graph_bfs_khop",
    "graph_hits_bipartite",
    "graph_modularity_brand",
    "graph_local_clustering",
    "graph_degree_assortativity",
    "graph_rich_club",
    "graph_common_neighbors",
    # -- nonparametric/inference stats block (6) --
    "agg_mann_whitney_u",
    "agg_ks_two_sample",
    "agg_spearman_rho",
    "agg_welch_ttest",
    "agg_proportion_ztest",
    "agg_odds_ratio_2x2",
    # -- portable-sketch block (4) --
    "approx_hll_portable_dau",
    "approx_countmin_portable",
    "approx_kmv_distinct",
    "approx_kmv_intersection",
    # -- file-format/source block (5) --
    "etl_fixed_width_parse",
    "etl_trailer_file_parse",
    "etl_jsonl_dirty_parse",
    "etl_orc_roundtrip_parity",
    "etl_hive_partition_pruning",
    # -- multimodal never-graded (2) --
    "multimodal_vad_segments",
    "multimodal_audio_fingerprint",
    # -- clears the quality backlog (5) --
    "dq_gini_impurity_profile",
    "dq_freshness_lag_audit",
    "dq_referential_cascade_audit",
    "dq_temporal_order_audit",
    "dq_rare_level_audit",
    # -- clears the temporal backlog (3) --
    "temporal_interval_overlap_join",
    "temporal_point_in_time_join",
    "temporal_allen_relations",
    # -- clears setops / scalars / streamq / dedup backlogs (5) --
    "setop_except_all_partkeys",
    "scalar_checksum_functions",
    "streaming_topk_per_window",
    "streaming_upsert_latest_event",
    "dedup_winnowing_overlap",
    # -- graded-iterative roster entries (#11 #12) + two-stage sims (4) --
    "sample_kcenter_coreset",
    "sample_greedy_coverage",
    "sim_rerank_two_stage",
    "sim_mmr_diversified_topk",
    # -- windows-family never-graded reps + full MERGE semantics (3) --
    "window_pareto_frontier",
    "window_decayed_average",
    "etl_merge_full_semantics",
]


def _tz_invariant(fn: Callable[[SparkSession, str], DataFrame]):
    """Make a registry entry's OUTPUT independent of the host timezone.

    Two OS-TZ leaks exist at the Python collect boundary and nowhere
    else (query semantics are already UTC-pinned at the reader call
    sites): (1) a vanilla session defaults ``spark.sql.session.timeZone``
    to the JVM zone, which shifts any DATE->TIMESTAMP / string parse
    inside a plan; (2) PySpark renders instant-TIMESTAMP columns through
    the OS zone in ``collect()``/``toPandas()`` regardless of session
    timezone, while the DuckDB oracle returns naive UTC wall times —
    measured under TZ=Asia/Kolkata, every graded output carrying an
    instant TIMESTAMP read +05:30 off its oracle. So: pin the session
    zone, and surface instant TIMESTAMP outputs as TIMESTAMP_NTZ (the
    cast happens under the UTC pin, so the wall time IS the UTC
    instant). On a UTC host both changes are value-identical no-ops,
    and the harness canonicalizes tz flavors of timestamp together
    (round-2 evidence), so types hash the same.
    """
    from functools import wraps

    from pyspark.sql import functions as F, types as T

    @wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = fn(spark, sf_dir)
        if any(
            type(f.dataType) is T.TimestampType for f in df.schema.fields
        ):
            df = df.select(
                *[
                    F.col(f.name).cast("timestamp_ntz").alias(f.name)
                    if type(f.dataType) is T.TimestampType
                    else F.col(f.name)
                    for f in df.schema.fields
                ]
            )
        return df

    return wrapped


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update({k: _tz_invariant(v) for k, v in m.QUERIES.items()})
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
