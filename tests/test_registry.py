"""Registry invariants: the grading driver verdicts only the first 50
entries, so the window's size and family coverage are contract, not
accident — pin them."""

from __future__ import annotations

from large_csv_etl_spark.queries import (
    GRADED_PRIORITY,
    _MODULES,
    all_oracles,
    all_queries,
)


def test_graded_window_is_exactly_50_and_first():
    q = all_queries()
    assert len(GRADED_PRIORITY) == 50
    assert list(q)[:50] == GRADED_PRIORITY


def test_graded_window_entries_are_oracled():
    oracles = all_oracles()
    missing = [n for n in GRADED_PRIORITY if n not in oracles]
    assert not missing, missing


def test_every_family_represented_in_window():
    window = set(GRADED_PRIORITY)
    unrepresented = [
        m.__name__
        for m in _MODULES
        if set(m.QUERIES) & set(all_oracles()) and not (set(m.QUERIES) & window)
    ]
    assert not unrepresented, unrepresented


def test_oracled_entries_precede_rows_only():
    q = list(all_queries())
    oracles = all_oracles()
    first_rows_only = next(i for i, n in enumerate(q) if n not in oracles)
    assert all(n not in oracles for n in q[first_rows_only:]), (
        "rows-only entries must come last"
    )
