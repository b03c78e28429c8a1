"""The registry-boundary timezone contract (round 9, ADVICE r9 #3).

``queries._tz_invariant`` pins the session zone to UTC and re-projects
top-level instant TIMESTAMP outputs to TIMESTAMP_NTZ so collect() renders
the UTC wall time on any host. Round 10 adds the loud-failure guard for
the case the rewrite cannot reach: a NESTED instant timestamp (struct /
array / map) would silently leak the host timezone again — the wrapper
must reject it so the query author emits NTZ at the source instead
(VERDICT r9 ask #8's contract for all new operators).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from large_csv_etl_spark.queries import _tz_invariant


def _one_ts_df(spark):
    return spark.sql(
        "SELECT timestamp'2024-03-01 12:00:00' AS ts, 1 AS n"
    )


def test_top_level_timestamp_rewritten_to_ntz(spark):
    wrapped = _tz_invariant(lambda s, d: _one_ts_df(s))
    out = wrapped(spark, "unused")
    ts_field = next(f for f in out.schema.fields if f.name == "ts")
    assert type(ts_field.dataType) is T.TimestampNTZType
    # Under the UTC session pin the NTZ wall time IS the UTC instant.
    row = out.collect()[0]
    assert row.ts.isoformat() == "2024-03-01T12:00:00"
    assert row.n == 1


def test_session_timezone_pinned(spark):
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        _tz_invariant(lambda s, d: _one_ts_df(s))(spark, "unused")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


@pytest.mark.parametrize(
    "expr",
    [
        # un-flattened F.window-style struct
        "named_struct('start', timestamp'2024-03-01 00:00:00', 'n', 1)",
        # collect_list-of-timestamps shape
        "array(timestamp'2024-03-01 00:00:00')",
        # map value
        "map('k', timestamp'2024-03-01 00:00:00')",
        # doubly nested
        "array(named_struct('t', timestamp'2024-03-01 00:00:00'))",
    ],
    ids=["struct", "array", "map", "array_of_struct"],
)
def test_nested_instant_timestamp_fails_loudly(spark, expr):
    def q(s, d):
        return s.sql(f"SELECT {expr} AS c")

    with pytest.raises(TypeError, match="NESTED instant"):
        _tz_invariant(q)(spark, "unused")


def test_nested_ntz_passes(spark):
    """Only INSTANT timestamps leak through collect(); nested NTZ is the
    prescribed shape and must pass."""

    def q(s, d):
        return s.sql(
            "SELECT named_struct('t', timestamp_ntz'2024-03-01 00:00:00') AS c"
        )

    out = _tz_invariant(q)(spark, "unused")
    assert out.count() == 1


def test_no_registry_query_relies_on_nested_rewrite():
    """Static sweep: the guard means any registry entry returning nested
    instant timestamps fails at call time — the mimic and pytest batteries
    execute every entry, so this invariant is enforced dynamically; here we
    just pin that the wrapper is applied to EVERY entry (all_queries wraps
    unconditionally)."""
    from large_csv_etl_spark.queries import all_queries

    for name, fn in all_queries().items():
        # getattr: a missing wrapper must fail as a clean assert, not an
        # AttributeError; the sentinel pins the SPECIFIC wrapper rather
        # than accepting any functools.wraps shim (ADVICE r10 #4)
        assert getattr(fn, "__wrapped__", None) is not None, name
        assert getattr(fn, "_tz_invariant", False), name


# The 26 entries whose SOURCE schema carries a top-level instant
# TIMESTAMP (date_trunc / F.window outputs) — the set the wrapper
# actively rewrites, measured by tools/tz_census.py at round 10. The
# contract (VERDICT r9 ask #8): new queries emit TIMESTAMP_NTZ at the
# source, so this set may SHRINK but never grow.
TZ_WRAPPER_LOAD_BEARING = {
    "asof_join_latest_order",
    "etl_backfill_plan",
    "etl_fixed_width_parse",
    "events_cohort_retention",
    "events_concurrency_profile",
    "events_cumulative_users",
    "events_daily_active_users",
    "events_daily_gap_fill",
    "events_dau_approx",
    "events_hourly_mad_anomaly",
    "events_hourly_tumbling",
    "events_rolling_wau",
    "events_type_drift_daily",
    "events_wau_sketch_rollup",
    "events_zscore_anomaly",
    "scalar_date_functions",
    "streaming_click_attribution",
    "streaming_hourly_tumbling",
    "streaming_hourly_users",
    "streaming_segment_counts",
    "streaming_sessionization",
    "streaming_sliding_window",
    "streaming_topk_per_window",
    "streaming_upsert_latest_event",
    "window_month_over_month",
    "window_sma_crossover",
}


def test_tz_wrapper_load_bearing_set_never_grows(spark, sf_dir):
    """Census the UNWRAPPED registry builders: any entry outside the
    frozen set above that emits a top-level instant TIMESTAMP is a new
    query violating the emit-NTZ-at-source contract (the wrapper would
    silently carry it, so pin it here instead; nested leaks already
    fail loudly in the wrapper itself)."""
    from large_csv_etl_spark.queries import _MODULES

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    offenders_all = []
    for m in _MODULES:
        for name, fn in m.QUERIES.items():
            df = fn(spark, sf_dir)
            if any(
                type(f.dataType) is T.TimestampType for f in df.schema.fields
            ):
                offenders_all.append(name)
    measured = set(offenders_all)
    new_entries = sorted(measured - TZ_WRAPPER_LOAD_BEARING)
    fixed_entries = sorted(TZ_WRAPPER_LOAD_BEARING - measured)
    assert not new_entries, (
        f"new entries emit instant TIMESTAMP at the source: {new_entries}"
        " — emit TIMESTAMP_NTZ instead (VERDICT r9 ask #8), or flatten"
    )
    # equality, not subset (ADVICE r10 #3): an entry fixed at source must
    # leave the frozen census too, or the documented set silently drifts
    assert not fixed_entries, (
        f"entries no longer emit instant TIMESTAMP: {fixed_entries} — "
        "remove them from TZ_WRAPPER_LOAD_BEARING (the census shrank)"
    )
