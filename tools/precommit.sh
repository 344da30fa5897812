#!/usr/bin/env bash
# Snapshot gate: no commit without a compiling tree (main + test).
# Round 6's end-of-round snapshot landed a signature refactor with two
# stale call sites and zeroed the round's artifacts — this is the
# one-line guard that makes that impossible. Run before EVERY commit:
#
#   tools/precommit.sh && git commit ...
#
# Full-test variant (slower, ~3.5 min): tools/precommit.sh test
#
# Both variants also run graft.SmokeCheck — the seconds-scale
# environment-drift gate (testdata regens have changed the events.ts
# parquet encoding twice; round 11 shipped 10 broken queries because
# nothing in-session read the regenerated files). Skip with
# SKIP_SMOKE=1 when testdata is known-good and iterating fast.
set -euo pipefail
cd "$(dirname "$0")/.."
if [[ "${1:-}" == "test" ]]; then
  sbt -batch test
else
  sbt -batch Test/compile
fi
if [[ "${SKIP_SMOKE:-}" != "1" ]]; then
  sbt -batch "runMain graft.SmokeCheck"
fi
