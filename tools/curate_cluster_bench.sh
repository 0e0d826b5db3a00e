#!/usr/bin/env bash
# North-rule literal artifact for the CURATION ladder: the packaged
# curate_job submitted via `spark-submit --py-files` to a standalone
# cluster at two cluster sizes (1 vs 4 executor JVMs, 8 cores each).
# Prior cluster protocols measured the extraction plan and individual
# data-table queries; this one measures the COMPOSED job a 10^12-doc
# curation run would actually submit:
#   scrub-pii -> exact-dedup -> passage-scrub(8-gram)
# with funnel.json + per-stage lineage written per run.  (clean-lines
# and gopher are omitted on THIS corpus only: the synthetic token-soup
# documents have no sentence punctuation and no English stopwords, so
# the C4/Gopher gates — correctly — drop 100% of them and the later
# stages would measure empty input.)
#
# Each arm runs COLD (spark-submit JVM startup + planning ~15-20 s),
# so each arm measures TWO corpus sizes (sf1 = 50k docs, sf10 = 500k)
# and the report quotes MARGINAL efficiency — (t_big - t_small)
# cancels the fixed floor, same decomposition as
# tools/data_cluster_bench.sh and the round-4 cold-submit bench.
#
# INPUT LAYOUT MATTERS: make_sf tiles each table into ONE parquet
# file; sf10's documents carries only 5 row groups, which caps scan
# parallelism at 5 tasks on BOTH arms no matter what
# maxPartitionBytes says (row groups are the atomic split unit) — and
# because curate_job persists each stage, that 5-way partitioning
# propagates through the ENTIRE ladder.  Measured cost of getting
# this wrong: the whole ladder reads ~0.3 efficiency and every stage
# looks serial.  This script therefore rewrites the inputs as
# multi-file directories (16 / 64 files) first — the layout a real
# 100 TB corpus has natively.
#
# Usage: bash tools/curate_cluster_bench.sh [sf_small sf_big]
set -euo pipefail

SF_SMALL_RAW="${1:-/tmp/sf1}"
SF_BIG_RAW="${2:-/tmp/sf10}"
SF_SMALL="${SF_SMALL_RAW}m"
SF_BIG="${SF_BIG_RAW}m"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export SPARK_LOG_DIR=/tmp/spark-logs SPARK_PID_DIR=/tmp/spark-pids
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR"

python "$ROOT/tools/make_pyfiles.py" >/dev/null

PYTHONPATH="$ROOT" python - "$SF_SMALL_RAW" "$SF_SMALL" "$SF_BIG_RAW" "$SF_BIG" <<'EOF'
import os, sys
sys.path.insert(0, os.environ["PYTHONPATH"])
from ocr_project_spark.session import get_spark
pairs = [(sys.argv[1], sys.argv[2], 16), (sys.argv[3], sys.argv[4], 64)]
todo = [(s, d, n) for s, d, n in pairs
        if not os.path.isdir(f"{d}/documents.parquet")]
if todo:
    spark = get_spark(app_name="relayout", master="local[16]",
                      shuffle_partitions=32)
    for src, dst, n in todo:
        (spark.read.parquet(f"{src}/documents.parquet").repartition(n)
         .write.mode("overwrite").parquet(f"{dst}/documents.parquet"))
    spark.stop()
EOF

/opt/spark/sbin/start-master.sh --host 127.0.0.1 --port 7077 --webui-port 8090
sleep 5
for i in 1 2 3 4; do
  SPARK_WORKER_DIR=/tmp/spark-work-$i SPARK_IDENT_STRING=w$i \
    /opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077 \
    --cores 8 --memory 13g --webui-port $((8100 + i))
done
sleep 8

# REPS x alternating arms, min-over-reps per arm: single cold-submit
# walls on this shared VM swing +/-50% (measured 45-238 s for the
# IDENTICAL 32-core command within one hour), so one run per arm is
# noise, not signal — same min-over-reps protocol as bench.py.
# The job runs the scale configuration: --funnel observe (one fused
# write action; per-stage counts ride df.observe) and
# --scrub-broadcast (this corpus's duplicate artifacts are ~5%, the
# sparse regime the flag documents).
REPS="${REPS:-3}"
declare -A WALL
for REP in $(seq "$REPS"); do
  for CORES in 8 32; do
    for SF in "$SF_SMALL" "$SF_BIG"; do
      TAG="$(basename "$SF")_$CORES"
      OUT=/tmp/curate_cluster_out_$TAG
      rm -rf "$OUT"
      T0=$(date +%s.%N)
      /opt/spark/bin/spark-submit \
        --master spark://127.0.0.1:7077 \
        --py-files "$ROOT/dist/ocr_project_spark.zip" \
        --conf spark.cores.max=$CORES \
        --conf spark.executor.cores=8 \
        --conf spark.executor.memory=12g \
        --conf spark.sql.shuffle.partitions=$((2 * CORES)) \
        --conf spark.sql.files.maxPartitionBytes=8m \
        "$ROOT/ocr_project_spark/curate_job.py" \
        --input "$SF/documents.parquet" --output "$OUT" --run-id "cc" \
        --funnel observe --scrub-broadcast \
        --scrub-pii --exact-dedup --scrub-passages 8 \
        > /tmp/curate_bench_$TAG.log 2>&1
      T1=$(date +%s.%N)
      W=$(python -c "print(round($T1-$T0,1))")
      PREV="${WALL[$TAG]:-}"
      if [ -z "$PREV" ] || python -c "exit(0 if $W < $PREV else 1)"; then
        WALL[$TAG]=$W
      fi
      echo "rep$REP ARM $TAG wall=${W}s (min so far ${WALL[$TAG]})"
      python -c "import json;f=json.load(open('$OUT/cc/funnel.json'));print(' funnel:', [(s['stage'],s['n_docs']) for s in f['funnel']])" || true
    done
  done
done

for i in 1 2 3 4; do SPARK_IDENT_STRING=w$i /opt/spark/sbin/stop-worker.sh; done
/opt/spark/sbin/stop-master.sh

SMALL_BASE="$(basename "$SF_SMALL")" BIG_BASE="$(basename "$SF_BIG")" \
python - "${WALL[$(basename "$SF_SMALL")_8]}" "${WALL[$(basename "$SF_BIG")_8]}" \
         "${WALL[$(basename "$SF_SMALL")_32]}" "${WALL[$(basename "$SF_BIG")_32]}" <<'EOF'
import sys
s_lo, b_lo, s_hi, b_hi = map(float, sys.argv[1:5])
m_lo, m_hi = b_lo - s_lo, b_hi - s_hi
print(f"curate ladder spark-submit (cold JVM per run):")
print(f"  1 exec: small {s_lo}s  big {b_lo}s   4 exec: small {s_hi}s  big {b_hi}s")
print(f"  total efficiency (big): {(1/b_hi)/(4/b_lo):.3f}")
print(f"  marginal efficiency:    {(1/m_hi)/(4/m_lo):.3f}   (floor cancelled)")
EOF
