#!/usr/bin/env bash
# Host-ceiling control for the curation ladder: how much of the
# 8->32-thread scaling loss is the PLAN (cross-executor shuffle,
# stage barriers) vs the HOST (one socket's memory system shared by
# what would be four nodes)?
#
# Protocol: one solo local[8] run of the composed ladder, then FOUR
# concurrent, fully independent local[8] JVMs running the same job on
# their own output (same input corpus; the page cache is shared and
# warm for both arms).  Zero shuffle crosses JVMs, zero coordination
# exists — any efficiency below 1.0 is pure hardware contention and
# bounds EVERY 32-thread arrangement of this ladder on this host:
#
#     aggregate efficiency = t_solo / t_concurrent
#
# Measured 2026-08-21 (BASELINE.md "round-5 ladder rework"): solo
# 76.8s, concurrent 137.1s -> 0.56.  A real 4-node cluster brings a
# memory system per node, so this term does not transfer; the
# single-job cluster arm (tools/curate_cluster_bench.sh) sits below
# this ceiling by the plan's own cross-executor costs.
#
# Usage: bash tools/curate_host_ceiling_probe.sh [input_parquet]
set -euo pipefail

IN="${1:-/tmp/sf10m/documents.parquet}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
python "$ROOT/tools/make_pyfiles.py" >/dev/null

run_one() {  # $1 = output dir suffix
  /opt/spark/bin/spark-submit --master 'local[8]' --driver-memory 12g \
    --py-files "$ROOT/dist/ocr_project_spark.zip" \
    --conf spark.sql.shuffle.partitions=16 \
    --conf spark.sql.files.maxPartitionBytes=8m \
    "$ROOT/ocr_project_spark/curate_job.py" \
    --input "$IN" --output "/tmp/curate_ceiling_$1" --run-id cc \
    --funnel observe --scrub-broadcast \
    --scrub-pii --exact-dedup --scrub-passages 8 \
    > "/tmp/curate_ceiling_$1.log" 2>&1
}

T0=$(date +%s.%N); run_one solo; T1=$(date +%s.%N)
SOLO=$(python -c "print(round($T1-$T0,1))")
echo "solo local[8]: ${SOLO}s"

T0=$(date +%s.%N)
for i in 1 2 3 4; do run_one "conc_$i" & done
# bare `wait` always returns 0: collect each job's status so a
# crashed JVM fails the probe instead of silently inflating the
# efficiency (three survivors would under-measure the 4x arm)
for pid in $(jobs -p); do wait "$pid"; done
T1=$(date +%s.%N)
CONC=$(python -c "print(round($T1-$T0,1))")
echo "4x concurrent local[8] (slowest wall): ${CONC}s"
python -c "print(f'aggregate efficiency (host ceiling): {$SOLO/$CONC:.2f}')"
