"""The bench output contract the driver depends on: ONE JSON line that
fits the driver's ~2000-char tail-capture window, never drops a failed
(-1.0) timing, and counts what it omits. Rounds 3-4 recorded
``"parsed": null`` from exactly this breaking — it stays pinned."""

from __future__ import annotations

import json

from bench import HEADLINE, MAX_LINE, _fit_payload


def test_fit_payload_fits_and_counts_omissions():
    timings = {f"query_with_a_long_name_{i:03d}": float(i) / 7 for i in range(120)}
    line = _fit_payload(123.456, timings, 0.1)
    assert len(line) <= MAX_LINE
    d = json.loads(line)  # parseable as-is
    assert d["value"] == 123.456 and d["unit"] == "sec" and d["sf"] == 0.1
    shown = d["queries"]
    assert d["queries_omitted"] == len(timings) - len(shown)
    # the omitted ones are exactly the cheapest timings
    cheapest_shown = min(shown.values())
    dropped = [v for k, v in timings.items() if k not in shown]
    assert dropped and max(dropped) <= cheapest_shown


def test_fit_payload_no_omission_when_small():
    timings = {"q1": 1.0, "q2": 2.0}
    d = json.loads(_fit_payload(3.0, timings, 0.01))
    assert d["queries"] == timings
    assert "queries_omitted" not in d


def test_fit_payload_never_drops_failures():
    # an adversarial dict where only dropping failures could fit: the
    # loop must keep every -1.0 entry and exhaust the droppable ones
    # instead, even if the line then exceeds the soft cap.
    timings = {f"failed_query_with_very_long_name_{i:04d}": -1.0 for i in range(100)}
    timings["ok"] = 1.0
    d = json.loads(_fit_payload(1.0, timings, 0.1))
    kept_failures = [k for k, v in d["queries"].items() if v == -1.0]
    assert len(kept_failures) == 100


def test_headline_names_exist_in_registry():
    from large_csv_etl_spark.queries import all_queries

    registry = all_queries()
    missing = [n for n in HEADLINE if n not in registry]
    assert not missing, f"HEADLINE names without a registry entry: {missing}"
    assert len(HEADLINE) == len(set(HEADLINE)), "duplicate HEADLINE names"
