#!/usr/bin/env bash
# Run the full ScalaTest suite and append a test-count line to
# PROGRESS.jsonl, so the end-of-round snapshot records suite health and
# a red suite can never ship silently (round-7 verdict ask #8).
#
# Appended shape (one JSON line, driver lines untouched):
#   {"ts": ..., "kind": "tests", "succeeded": N, "failed": N, ...}
set -uo pipefail
cd "$(dirname "$0")/.."
out=$(sbt -batch test 2>&1 | tail -40)
line=$(printf '%s\n' "$out" | grep -Eo 'Tests: succeeded [0-9]+, failed [0-9]+, canceled [0-9]+, ignored [0-9]+' | tail -1)
if [ -z "$line" ]; then
  echo "could not parse sbt test summary" >&2
  printf '%s\n' "$out" | tail -10 >&2
  exit 2
fi
succ=$(printf '%s' "$line" | grep -Eo 'succeeded [0-9]+' | grep -Eo '[0-9]+')
fail=$(printf '%s' "$line" | grep -Eo 'failed [0-9]+' | grep -Eo '[0-9]+')
canc=$(printf '%s' "$line" | grep -Eo 'canceled [0-9]+' | grep -Eo '[0-9]+')
ts=$(date +%s)
echo "{\"ts\": $ts, \"kind\": \"tests\", \"succeeded\": $succ, \"failed\": $fail, \"canceled\": $canc}" >> PROGRESS.jsonl
echo "recorded: succeeded=$succ failed=$fail canceled=$canc"
[ "$fail" = "0" ]
