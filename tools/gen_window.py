#!/usr/bin/env python
"""Propose the next round's GRADED_PRIORITY window.

The external driver verdicts only the first 50 registry entries, so each
round the window is rebuilt to maximize cumulative driver coverage:

1. the flagship `etl_transform_parity` (reference-parity core — re-graded
   EVERY round, reserved ahead of everything else: when the driver
   regenerates fixtures, the flagship verdict is the only proof the §2a
   core survived the regen; round 8 let a deep never-graded backlog push
   it out of the window and VERDICT r8 flagged the deviation);
2. every oracled entry that has NEVER received a driver verdict, newest
   families first (they are the round's additions);
3. remaining slots as regression re-grades, ordered by staleness (the
   round in which the entry last received a verdict, oldest first);
4. at least one representative per query-family module, forced in by
   evicting the least-stale re-grade — which means the rule self-relaxes
   when never-graded entries fill every non-flagship slot (nothing to
   evict); the registry tests encode the same relaxation.

Prints the proposed window as a Python list literal to paste into
`queries/__init__.py`, plus the matching `WINDOW_GRADED_AS_OF` constant
(the newest verdict round the proposal was computed against — the
registry tripwires measure the backlog as of that round so the NEXT
grade drop doesn't flip them red mid-round), plus a coverage summary.
Purely advisory — the committed list stays the source of truth.

Usage:  python tools/gen_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sys.path.insert(0, REPO)
    from large_csv_etl_spark.queries import _MODULES, all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    oracled = [n for n in queries if n in oracles]

    last_graded: dict[str, int] = {}
    last_verdict: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.split("_r")[-1].split(".")[0])
        for name, rec in json.load(open(f)).items():
            if rnd >= last_graded.get(name, 0):
                last_graded[name] = rnd
                last_verdict[name] = rec

    never = [n for n in oracled if n not in last_graded]
    flagship = ["etl_transform_parity"]
    # Standing-red entries (latest verdict has a false match flag) are
    # mandatory fix-verification re-grades: they slot right after the
    # never-graded backlog and are NOT evictable by family forcing
    # (round-15 policy — the r14 reingest red row must re-grade in the
    # very next window or the fix has no external verdict).
    red = sorted(
        n
        for n, rec in last_verdict.items()
        if n in oracled
        and n not in flagship
        and not all(
            rec.get(k, True)
            for k in ("rows_match", "schema_match", "hash_match")
        )
    )
    stale = sorted(
        (
            n
            for n in oracled
            if n in last_graded and n not in flagship and n not in red
        ),
        key=lambda n: (last_graded[n], n),
    )

    window: list[str] = []
    for n in flagship + never + red + stale:
        if n not in window:
            window.append(n)
        if len(window) == 50:
            break

    # force family representation
    fam_of = {}
    for m in _MODULES:
        fam = m.__name__.split(".")[-1]
        for n in m.QUERIES:
            fam_of[n] = fam
    covered = {fam_of[n] for n in window}
    missing = [
        m.__name__.split(".")[-1]
        for m in _MODULES
        if set(m.QUERIES) & set(oracles)
        and m.__name__.split(".")[-1] not in covered
    ]
    for fam in missing:
        candidate = next(
            (n for n in stale if fam_of[n] == fam and n not in window), None
        )
        if candidate is None:
            continue
        # evict the LEAST stale REGULAR re-grade that leaves its family
        # covered (never-graded, flagship, and standing-red slots are
        # pinned; when they fill the window the rule self-relaxes for
        # the families whose candidates no longer fit, stalest first)
        for victim in reversed(window):
            if victim in never or victim in flagship or victim in red:
                continue
            if sum(1 for w in window if fam_of[w] == fam_of[victim]) > 1:
                window.remove(victim)
                window.append(candidate)
                break

    n_never = sum(1 for n in window if n in never)
    print(f"# proposed window: {n_never} never-graded in window "
          f"({len(never)} in backlog), {len(window) - n_never} re-grades "
          f"(flagship first, then stalest)")
    print(f"WINDOW_GRADED_AS_OF = {max(last_graded.values(), default=0)}")
    print("GRADED_PRIORITY = [")
    for n in window:
        tag = "never graded" if n in never else f"last r{last_graded[n]}"
        print(f'    "{n}",  # {tag}')
    print("]")
    deferred = [n for n in never if n not in window]
    if deferred:
        print(f"# deferred never-graded ({len(deferred)}): {', '.join(deferred)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
