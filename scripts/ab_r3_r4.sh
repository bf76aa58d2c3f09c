#!/bin/bash
# A/B the round-3 vs round-4 side-pipeline bench regression (VERDICT r4,
# "Next round #1"): paired repeats, alternating code trees, one session.
# Usage: bash scripts/ab_r3_r4.sh [repeats]  -> /tmp/ab_r3_r4.jsonl
set -u
REPS=${1:-3}
OUT=/tmp/ab_r3_r4.jsonl
: > "$OUT"
for rep in $(seq 1 "$REPS"); do
  for tree in /tmp/repo_r3 /root/repo; do
    label=$([ "$tree" = /tmp/repo_r3 ] && echo r3 || echo r4)
    line=$(cd "$tree" && RAY_GRAFT_CPUS=32 GRAFT_BENCH_REPLICATE=10 \
      GRAFT_SF_DIR=/root/testdata/sf0.1 \
      python bench.py 2>/dev/null | tail -1)
    echo "{\"rep\": $rep, \"code\": \"$label\", \"result\": $line}" >> "$OUT"
    echo "done rep=$rep code=$label" >&2
  done
done
echo "A/B complete -> $OUT" >&2
