#!/usr/bin/env bash
# Snapshot gate: no commit without a compiling tree (main + test).
# Round 6's end-of-round snapshot landed a signature refactor with two
# stale call sites and zeroed the round's artifacts — this is the
# one-line guard that makes that impossible. Run before EVERY commit:
#
#   tools/precommit.sh && git commit ...
#
# Full-test variant (slower, ~3.5 min): tools/precommit.sh test
set -euo pipefail
cd "$(dirname "$0")/.."
if [[ "${1:-}" == "test" ]]; then
  exec sbt -batch test
else
  exec sbt -batch Test/compile
fi
