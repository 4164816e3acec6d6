#!/bin/bash
# Scaling-efficiency protocol (BASELINE.md): same input, two parallelism levels.
# local[8] vs local[32] is the sandbox proxy for N vs 4N executors; shuffle
# partitions scale with cores inside Bench. Writes BENCH/scaling_<ts>.json lines.
set -e
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
REP=${SPARK_GRAFT_REPLICATION:-1000}
# a real 4N cluster has 4x the memory; give the JVM ample heap for both runs
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
mkdir -p BENCH
OUT=BENCH/scaling_runs.jsonl
# append (never truncate): every measured pair stays on the record, and the
# summary below reads only this invocation's two fresh lines
START_LINE=$(( $(wc -l < "$OUT" 2>/dev/null || echo 0) + 1 ))
CPU_PAIR=${SPARK_GRAFT_CPU_PAIR:-"4 16"}
for CPUS in $CPU_PAIR; do
  echo "=== cpus=$CPUS sf=$SF replication=$REP" >&2
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_REPLICATION=$REP \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*}' >> "$OUT"
done
python3 - "$OUT" "$START_LINE" <<'EOF'
import json, sys
runs = [json.loads(l) for l in open(sys.argv[1]).readlines()[int(sys.argv[2]) - 1:]]
by = {r["cpus"]: r for r in runs}
lo, hi = sorted(by)
a, b = by[lo]["headline"], by[hi]["headline"]
print(json.dumps({
  "cpus": [lo, hi],
  "tiles_per_sec_lo": a["tiles_per_sec"], "tiles_per_sec_hi": b["tiles_per_sec"],
  "tiles_efficiency": b["tiles_per_sec"]/a["tiles_per_sec"]/4,
  "pip_rows_per_sec_lo": a["pip_rows_per_sec"], "pip_rows_per_sec_hi": b["pip_rows_per_sec"],
  "pip_efficiency": b["pip_rows_per_sec"]/a["pip_rows_per_sec"]/4,
  "pip_cell_efficiency": b["pip_cell_rows_per_sec"]/a["pip_cell_rows_per_sec"]/4,
  "knn_efficiency": b["knn_vec_rows_per_sec"]/a["knn_vec_rows_per_sec"]/4,
  "queries_total_lo": by[lo]["value"], "queries_total_hi": by[hi]["value"],
}, indent=2))
EOF
