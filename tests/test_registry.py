"""Registry invariants: the grading driver verdicts only the first 50
entries, so the window's size and family coverage are contract, not
accident — pin them."""

from __future__ import annotations

import glob
import json
import os

from large_csv_etl_spark.queries import (
    GRADED_PRIORITY,
    WINDOW_GRADED_AS_OF,
    _MODULES,
    all_oracles,
    all_queries,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _verdict_rounds() -> dict[int, str]:
    out = {}
    for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        out[int(f.split("_r")[-1].split(".")[0])] = f
    return out


def _graded_as_of_window() -> set[str]:
    """Entries holding a driver verdict AS OF the round the committed
    window was generated (ADVICE r9 #1: the window targets the backlog
    as it stood at rotation time; when the driver drops THIS round's
    verdicts — grading exactly the targeted entries — the window-
    composition tripwires must not flip red for the span between the
    grade drop and the next rotation)."""
    graded: set[str] = set()
    for rnd, f in _verdict_rounds().items():
        if rnd <= WINDOW_GRADED_AS_OF:
            graded.update(json.load(open(f)))
    return graded


def _standing_red_as_of_window() -> set[str]:
    """Entries whose LATEST verdict as of the window round carries a
    false match flag — mandatory fix-verification re-grades, pinned in
    the window alongside the flagship (round-15 policy after the r14
    `etl_idempotent_reingest_audit` hash-red)."""
    latest: dict[str, tuple[int, dict]] = {}
    for rnd, f in _verdict_rounds().items():
        if rnd > WINDOW_GRADED_AS_OF:
            continue
        for name, rec in json.load(open(f)).items():
            if rnd >= latest.get(name, (0, {}))[0]:
                latest[name] = (rnd, rec)
    return {
        n
        for n, (_, rec) in latest.items()
        if isinstance(rec, dict)
        and not all(
            rec.get(k, True)
            for k in ("rows_match", "schema_match", "hash_match")
        )
    }


def test_graded_window_is_exactly_50_and_first():
    q = all_queries()
    assert len(GRADED_PRIORITY) == 50
    assert list(q)[:50] == GRADED_PRIORITY


def test_graded_window_entries_are_oracled():
    oracles = all_oracles()
    missing = [n for n in GRADED_PRIORITY if n not in oracles]
    assert not missing, missing


def test_window_graded_as_of_is_fresh():
    """WINDOW_GRADED_AS_OF must be bumped at every rotation. During a
    round, the newest verdict file may be one round ahead of the
    committed window (the driver grades at the boundary, the rotation
    happens at the next session's start) — never more."""
    rounds = _verdict_rounds()
    assert rounds, "no CORRECTNESS_r*.json committed"
    newest = max(rounds)
    assert WINDOW_GRADED_AS_OF <= newest, (
        f"WINDOW_GRADED_AS_OF={WINDOW_GRADED_AS_OF} claims a round newer "
        f"than any committed verdict file (newest r{newest})"
    )
    assert newest - WINDOW_GRADED_AS_OF <= 1, (
        f"window generated as of r{WINDOW_GRADED_AS_OF} but verdicts "
        f"through r{newest} exist: rotation forgotten"
    )


def test_every_family_represented_in_window():
    """One rep per family — but the family rule yields to the backlog
    burn-down (gen_window.py policy #4 forces reps in by evicting
    RE-GRADES, so when never-graded entries fill every non-flagship
    slot there is nothing to evict): while the as-of backlog fills the
    window, only families that still HAVE never-graded entries (plus
    the flagship's) are required; once the backlog fits with room to
    spare, every oracled family is required again."""
    oracles = set(all_oracles())
    graded = _graded_as_of_window()
    backlog = {n for n in all_queries() if n in oracles and n not in graded}
    window = set(GRADED_PRIORITY)
    # evictable slots = window minus the policy-pinned re-grades: the
    # flagship AND any standing-red entry (an entry whose latest as-of
    # verdict carries a false match flag MUST re-grade in the very next
    # window — round 15: etl_idempotent_reingest_audit after the r14
    # hash-red). Deriving it keeps the relaxation correct if the window
    # size or pin policy ever changes (ADVICE r10 #5).
    red = _standing_red_as_of_window()
    pinned = ({"etl_transform_parity"} | red) & window
    free = len(GRADED_PRIORITY) - len(pinned) - len(backlog & window)
    if backlog - window or free <= 0:
        # backlog overflows the window: only backlog families required
        required = [
            m
            for m in _MODULES
            if set(m.QUERIES) & backlog or "etl_transform_parity" in m.QUERIES
        ]
    else:
        # gen_window policy #4 forces family reps by consuming the FREE
        # regular re-grade slots, stalest candidates first; when there
        # are fewer free slots than rep-less families the rule yields
        # for the overflow (round 15: 2 free slots, 3 rep-less
        # families -> approx defers one round). Require only as many
        # families as can actually fit.
        unrep_all = [
            m
            for m in _MODULES
            if set(m.QUERIES) & oracles and not (set(m.QUERIES) & window)
        ]
        assert len(unrep_all) <= max(
            0,
            len(
                [
                    m
                    for m in _MODULES
                    if set(m.QUERIES) & oracles
                    and not (set(m.QUERIES) & (backlog | pinned))
                ]
            )
            - free,
        ), [m.__name__ for m in unrep_all]
        return
    unrepresented = [
        m.__name__ for m in required if not (set(m.QUERIES) & window)
    ]
    assert not unrepresented, unrepresented


def test_flagship_is_regraded_every_round():
    """tools/gen_window.py policy: the flagship reference-parity entry
    is re-graded EVERY round (round 8 skipped it for the first time —
    flagged in VERDICT r8 — and it was harmless only because the driver
    happened not to regenerate testdata that round). Pin it so a window
    rotation can't silently drop the one entry that proves the §2a core
    against a fresh fixture generation."""
    assert "etl_transform_parity" in GRADED_PRIORITY


def test_window_is_mostly_never_graded():
    """The window exists to burn down the never-driver-graded backlog:
    while that backlog exceeds the window size, re-grades beyond the
    flagship waste slots (VERDICT r8 ask #1). Assert the window spends
    at least 40 of its 50 slots on entries with no driver verdict AS OF
    the rotation round (ADVICE r9 #1: measuring against ALL verdict
    files made this red for the whole span between the round's grade
    drop — which grades exactly these entries — and the next rotation);
    the constraint self-relaxes once the backlog is smaller than 40."""
    graded = _graded_as_of_window()
    oracles = all_oracles()
    backlog = [n for n in all_queries() if n in oracles and n not in graded]
    never_in_window = [n for n in GRADED_PRIORITY if n not in graded]
    expected = min(40, len(backlog))
    assert len(never_in_window) >= expected, (
        f"window spends only {len(never_in_window)} slots on the "
        f"{len(backlog)}-entry never-graded backlog (as of "
        f"r{WINDOW_GRADED_AS_OF})"
    )


def test_plans_md_audits_the_current_window():
    """PLANS.md is the executed-plan audit of the grading window; it
    went stale once when the window rotated mid-round (VERDICT r6 ask
    #3). Pin the sync: the set of queries PLANS.md reports must equal
    GRADED_PRIORITY, so any window rotation without a
    `python tools/gen_plans_md.py > PLANS.md` regeneration fails here
    instead of in the judge's audit."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md")) as fh:
        plan_queries = set(re.findall(r"^\| `([a-z0-9_]+)` \|", fh.read(), re.M))
    assert plan_queries == set(GRADED_PRIORITY), (
        f"PLANS.md stale: missing={sorted(set(GRADED_PRIORITY) - plan_queries)} "
        f"extra={sorted(plan_queries - set(GRADED_PRIORITY))}"
    )


def test_oracled_entries_precede_rows_only():
    q = list(all_queries())
    oracles = all_oracles()
    first_rows_only = next(i for i, n in enumerate(q) if n not in oracles)
    assert all(n not in oracles for n in q[first_rows_only:]), (
        "rows-only entries must come last"
    )
