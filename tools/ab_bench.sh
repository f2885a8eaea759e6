#!/bin/bash
# Same-window interleaved A/B for the round-bound query family
# (VERDICT r4 item 3): the round-3 binary (worktree at /tmp/graft-r3,
# commit db99ae0~1) vs the current binary, 3 interleaved repetitions of
# SPARK_GRAFT_ONLY=q54,q82,q79,q59 at the given SF dir. Run in a QUIET
# window (no concurrent sbt/spark). Output: one labeled JSON line per
# run, appended to the file given as $2.
set -u
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/ab_bench.jsonl}
QUERIES=${3:-q54,q82,q79,q59}
for i in 1 2 3; do
  for side in r3 cur; do
    dir=$([ "$side" = r3 ] && echo /tmp/graft-r3 || echo /root/repo)
    line=$(cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
      SPARK_DRIVER_MEM=48g SPARK_GRAFT_ONLY="$QUERIES" \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"')
    echo "{\"side\":\"$side\",\"rep\":$i,$(echo "$line" | sed 's/^[^{]*{//')" >> "$OUT"
    echo "[ab] rep $i $side done"
  done
done
