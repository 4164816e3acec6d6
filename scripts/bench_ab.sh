#!/bin/bash
# Interleaved multi-jar bench A/B (the BENCH/BASELINE.md host-noise protocol):
# builds a jar per given git rev (worktree; "WT" = current working tree),
# then alternates full driver-config Bench legs across the jars with the
# arm order rotated every round (cancels host drift AND GC-debt order bias).
# One JSON line per leg -> BENCH/ab_runs.jsonl with {"arm":...} tags.
#
# Usage: scripts/bench_ab.sh [rounds] rev1 rev2 [rev3...]
set -e
cd "$(dirname "$0")/.."
ROUNDS=${1:-3}; shift
ARMS=("$@")
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
mkdir -p BENCH .ab
OUT=BENCH/ab_runs.jsonl

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

declare -A JARS
for REV in "${ARMS[@]}"; do
  if [ "$REV" = "WT" ]; then
    sbt -batch package >&2
    JARS[$REV]=$(ls "$PWD"/target/scala-2.13/vectorpipespark_*[!s].jar)
  else
    WT=.ab/$REV
    [ -d "$WT" ] || git worktree add "$WT" "$REV" >&2
    (cd "$WT" && sbt -batch package >&2)
    JARS[$REV]=$(ls "$PWD/$WT"/target/scala-2.13/vectorpipespark_*[!s].jar)
  fi
  echo "arm $REV -> ${JARS[$REV]}" >&2
done

leg() { # $1 = arm
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_REPLICATION=${SPARK_GRAFT_REPLICATION:-20} \
  SPARK_GRAFT_QUERY_RUNS=${SPARK_GRAFT_QUERY_RUNS:-2} \
  java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-48g} \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:${JARS[$1]}" graft.Bench 2>/dev/null \
    | grep -o '{"metric".*}' \
    | sed "s/^{/{\"arm\":\"$1\",\"round\":$2,/" >> "$OUT"
}

N=${#ARMS[@]}
for R in $(seq 1 "$ROUNDS"); do
  for I in $(seq 0 $((N-1))); do
    ARM=${ARMS[$(( (I + R - 1) % N ))]}   # rotate start arm each round
    echo "=== round $R leg $ARM (load: $(cut -d' ' -f1 /proc/loadavg))" >&2
    leg "$ARM" "$R"
  done
done
echo "done -> $OUT" >&2
