#!/bin/sh
# Round-close artifact commit (VERDICT r12 task #2: the BENCH_r*/
# CORRECTNESS_r*/LEAKCHECK artifacts were repeatedly left untracked at
# review time). Run with the round number once the driver has written
# the round's files:
#
#   sh tools/commit_round.sh 13
#
# Commits exactly the round artifacts, nothing else.
set -e
N="$1"
[ -n "$N" ] || { echo "usage: $0 <round-number>" >&2; exit 2; }
cd "$(dirname "$0")/.."
PADDED=$(printf '%02d' "$N")
git add -f \
  "BENCH_r${PADDED}.json" \
  "CORRECTNESS_r${PADDED}.json" \
  2>/dev/null || true
for f in LEAKCHECK.json COPYCHECK.json VERDICT.md ADVICE.md \
         bench_last.json BENCH_SF1.json BASELINE_QUERIES.json; do
  [ -e "$f" ] && git add "$f" 2>/dev/null || true
done
if git diff --cached --quiet; then
  echo "no round artifacts to commit"
else
  git commit -m "round ${N}: driver artifacts (bench/correctness/leakcheck)"
fi
