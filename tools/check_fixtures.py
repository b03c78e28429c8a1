#!/usr/bin/env python
"""Detect driver testdata regeneration by content hash, not mtime.

Every driver verdict is only valid against the fixture generation it was
graded on. The driver SOMETIMES regenerates /root/testdata between
rounds (it did at rounds 4-6; it did not at rounds 7-9), and the failure
mode is silent: queries keep passing pytest while every prior
CORRECTNESS_r*.json verdict silently refers to data that no longer
exists. The rounds-4/5 fixture-drift bugs were caught by hand-checking
mtimes; this makes the check mechanical and content-based.

Usage:
    python tools/check_fixtures.py            # compare vs committed manifest
    python tools/check_fixtures.py --update   # rewrite the manifest

Exit status: 0 = manifest matches (no regen since the manifest was
committed), 1 = drift detected (PRINT the diff, then re-run the full
mimic + sf0.1 sweep before trusting any prior verdict), 2 = no manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tools", "fixture_manifest.json")
TESTDATA = "/root/testdata"


def scan() -> dict[str, dict[str, object]]:
    out: dict[str, dict[str, object]] = {}
    for root, _dirs, files in sorted(os.walk(TESTDATA)):
        for f in sorted(files):
            p = os.path.join(root, f)
            rel = os.path.relpath(p, TESTDATA)
            h = hashlib.md5()
            with open(p, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            out[rel] = {"size": os.path.getsize(p), "md5": h.hexdigest()}
    return out


def main() -> int:
    current = scan()
    if "--update" in sys.argv:
        with open(MANIFEST, "w") as fh:
            json.dump(current, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"manifest updated: {len(current)} files")
        return 0
    if not os.path.exists(MANIFEST):
        print("no committed manifest — run with --update first")
        return 2
    recorded = json.load(open(MANIFEST))
    drift = []
    for rel in sorted(set(recorded) | set(current)):
        a, b = recorded.get(rel), current.get(rel)
        if a != b:
            drift.append(
                f"  {rel}: manifest={a and a['md5'][:12]} "
                f"current={b and b['md5'][:12]}"
            )
    if drift:
        print("FIXTURE DRIFT — the driver regenerated testdata since the")
        print("manifest was committed. Every prior CORRECTNESS verdict is")
        print("suspect: run the full mimic + sf0.1 sweep BEFORE new work,")
        print("then `python tools/check_fixtures.py --update` and commit.")
        print("\n".join(drift))
        return 1
    print(f"fixtures unchanged ({len(current)} files match the manifest)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
