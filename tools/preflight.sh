#!/usr/bin/env bash
# Preflight gate: refuse to commit a tree that does not compile.
#
# Motivation: rounds 5 and 7 both shipped end-of-round snapshot commits
# that had never been compiled, zeroing the driver's correctness/bench
# artifacts for the whole round (see VERDICT.md r7 "What's wrong" #1).
# This script is wired into .git/hooks/pre-commit so that outcome is
# mechanically impossible, not a matter of discipline.
#
# Usage:
#   tools/preflight.sh                 # compile gate (what the hook runs)
#   tools/preflight.sh q_foo q_bar     # + verify/compare just those keys
#   PREFLIGHT_SKIP=1 git commit ...    # escape hatch for doc-only commits
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt compile (Test/compile included) + doc-sync..."
sbt -batch ";compile;Test/compile;runMain graft.DocSync" \
    > /tmp/preflight_compile.log 2>&1 || {
  echo "[preflight] COMPILE or DOC-SYNC FAILED — commit refused. Log tail:"
  tail -30 /tmp/preflight_compile.log
  exit 1
}
echo "[preflight] compile + doc-sync OK"

if [ "$#" -gt 0 ]; then
  keys=$(IFS=,; echo "$*")
  out=/tmp/preflight_vout
  rm -rf "$out"
  echo "[preflight] Verify keys: $keys"
  SPARK_GRAFT_ONLY="$keys" sbt -batch \
    "runMain graft.Verify /root/testdata/sf0.01 $out" \
    > /tmp/preflight_verify.log 2>&1 || {
    echo "[preflight] VERIFY FAILED. Log tail:"
    tail -30 /tmp/preflight_verify.log
    exit 1
  }
  python3 tools/compare.py /root/testdata/sf0.01 "$out" "$@" || {
    echo "[preflight] ORACLE COMPARE FAILED — commit refused."
    exit 1
  }
  echo "[preflight] verify+compare OK for: $keys"
fi
