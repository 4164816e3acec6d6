#!/bin/bash
# Soak + resume drill (BENCH/BASELINE.md "resume drill"): tile a 67M-point
# corpus (sf0.1 x 10000) at z8 twice —
#   (A) uninterrupted reference run
#   (B) a run SIGKILLed mid-write, then re-run to completion (lineage resume)
# and require the two MVT trees to be byte-identical.
set -e
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
REP=${SPARK_GRAFT_REPLICATION:-10000}
KILL_AFTER=${SPARK_GRAFT_KILL_AFTER:-150}
BASE=${1:-/tmp/soak}
rm -rf "$BASE"; mkdir -p "$BASE"

echo "=== reference run (uninterrupted)" >&2
sbt -batch "runMain vps.tools.SoakTile $BASE/ref /root/testdata/sf0.1 $REP 16" 2>/dev/null | grep soak

echo "=== victim run (SIGKILL after ${KILL_AFTER}s)" >&2
set +e
timeout -s KILL "$KILL_AFTER" sbt -batch "runMain vps.tools.SoakTile $BASE/resume /root/testdata/sf0.1 $REP 16" >/dev/null 2>&1
echo "killed rc=$? (137 = SIGKILL)" >&2
set -e
COMMITTED=$(find "$BASE/resume/_lineage" -name 'part-*.json' 2>/dev/null | wc -l || echo 0)
echo "lineage partitions committed before kill: $COMMITTED" >&2

echo "=== resume run" >&2
sbt -batch "runMain vps.tools.SoakTile $BASE/resume /root/testdata/sf0.1 $REP 16" 2>/dev/null | grep soak

echo "=== compare trees" >&2
ref_sum=$(cd "$BASE/ref" && find 8 -name '*.mvt' -type f | sort | xargs md5sum | md5sum | cut -d' ' -f1)
res_sum=$(cd "$BASE/resume" && find 8 -name '*.mvt' -type f | sort | xargs md5sum | md5sum | cut -d' ' -f1)
ref_n=$(find "$BASE/ref/8" -name '*.mvt' | wc -l)
res_n=$(find "$BASE/resume/8" -name '*.mvt' | wc -l)
echo "ref:    $ref_n tiles, tree checksum $ref_sum"
echo "resume: $res_n tiles, tree checksum $res_sum"
if [ "$ref_sum" = "$res_sum" ] && [ "$ref_n" = "$res_n" ]; then
  echo "RESUME DRILL PASS (committed-before-kill=$COMMITTED)"
else
  echo "RESUME DRILL FAIL"; exit 1
fi
