#!/bin/bash
# Full round-verification battery, in the order the verify skill
# prescribes. Run from anywhere; takes ~40 min on local[32]:
#   bash /root/repo/tools/roundcheck.sh [logdir]
# Prints one summary line per stage; non-green stages leave their full
# log in $logdir for diagnosis.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${1:-/tmp/roundcheck_$(date +%H%M%S)}"
mkdir -p "$LOG"

# Stage 0: content-hash the driver fixtures. A regen invalidates every
# prior CORRECTNESS verdict — if this flags drift, the mimic+sweep below
# are MANDATORY before trusting anything, and the manifest needs
# `python tools/check_fixtures.py --update` + a commit afterwards.
if python "$REPO/tools/check_fixtures.py" >"$LOG/fixtures.log" 2>&1; then
  echo "fixtur : $(tail -1 "$LOG/fixtures.log")"
else
  echo "fixtur : DRIFT DETECTED — testdata regenerated; prior verdicts invalid (see $LOG/fixtures.log)"
fi

# Stage 0.5: the window-rotation tripwires MUST be green before anything
# else runs (VERDICT r9 ask #7): a stale window (rotation forgotten, or
# PLANS.md not regenerated) means the battery below audits the WRONG 50
# queries and the round's driver slots re-grade already-graded entries.
if ! (cd "$REPO" && python -m pytest tests/test_registry.py -q >"$LOG/registry.log" 2>&1); then
  echo "window : STALE ROTATION — registry tripwires red; rotate GRADED_PRIORITY"
  echo "         (tools/gen_window.py) and regen PLANS.md before this battery"
  echo "         means anything (see $LOG/registry.log)"
else
  echo "window : rotation tripwires green"
fi

cd "$REPO" && python -m pytest tests/ -q >"$LOG/pytest.log" 2>&1
echo "pytest : $(grep -E 'passed|failed|error' "$LOG/pytest.log" | tail -1)"

cd /tmp && python "$REPO/tools/drive_driver.py" >"$LOG/mimic.log" 2>&1
echo "mimic  : $(tail -1 "$LOG/mimic.log")"

# Full registry at sf0.1 INCLUDING rows-only entries (feasible since the
# mimic releases checkpoint blocks between queries — round 9; before
# that, block accumulation OOM'd the vanilla JVM mid-battery).
python "$REPO/tools/drive_driver.py" --sf-dir /root/testdata/sf0.1 \
  >"$LOG/sweep.log" 2>&1
echo "sweep  : $(tail -1 "$LOG/sweep.log")"

cd "$REPO" && python bench.py >"$LOG/bench.out" 2>"$LOG/bench.err"
echo "bench  : rc=$? $(tail -1 "$LOG/bench.out" | head -c 120)"

# PLANS.md must always audit the CURRENT grading window (VERDICT r6 #3:
# it went stale when the window rotated mid-round).
cd "$REPO" && python tools/gen_plans_md.py >"$LOG/PLANS.md.new" 2>"$LOG/plans.err" \
  && cp "$LOG/PLANS.md.new" "$REPO/PLANS.md"
echo "plans  : rc=$? $(head -3 "$REPO/PLANS.md" | tail -1 | head -c 120)"
echo "logs   : $LOG"
