#!/bin/bash
# Scaling-efficiency protocol (BASELINE.md): same input, two parallelism levels.
# local[8] vs local[32] is the sandbox proxy for N vs 4N executors; shuffle
# partitions scale with cores inside Bench. Writes BENCH/scaling_<ts>.json lines.
set -e
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
REP=${SPARK_GRAFT_REPLICATION:-20}
mkdir -p BENCH
OUT=BENCH/scaling_runs.jsonl
: > "$OUT"
for CPUS in 8 32; do
  echo "=== cpus=$CPUS sf=$SF replication=$REP" >&2
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_REPLICATION=$REP \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*}' >> "$OUT"
done
python3 - "$OUT" <<'EOF'
import json, sys
runs = [json.loads(l) for l in open(sys.argv[1])]
by = {r["cpus"]: r for r in runs}
a, b = by[8]["headline"], by[32]["headline"]
print(json.dumps({
  "tiles_per_sec_8": a["tiles_per_sec"], "tiles_per_sec_32": b["tiles_per_sec"],
  "tiles_efficiency": b["tiles_per_sec"]/a["tiles_per_sec"]/4,
  "pip_rows_per_sec_8": a["pip_rows_per_sec"], "pip_rows_per_sec_32": b["pip_rows_per_sec"],
  "pip_efficiency": b["pip_rows_per_sec"]/a["pip_rows_per_sec"]/4,
  "pip_cell_efficiency": b["pip_cell_rows_per_sec"]/a["pip_cell_rows_per_sec"]/4,
  "knn_efficiency": b["knn_vec_rows_per_sec"]/a["knn_vec_rows_per_sec"]/4,
  "queries_total_8": by[8]["value"], "queries_total_32": by[32]["value"],
}, indent=2))
EOF
