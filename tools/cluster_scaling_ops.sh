#!/bin/bash
# Two-cluster-size scaling evidence for the CURATION ops (Gopher
# quality signals + benchmark n-gram decontamination) — the workload
# whose single-box thread-scaling legs measured 0.54-0.68 in round 3.
# Same real-executor treatment as cluster_scaling.sh's crawl round:
# standalone master, separate executor JVMs, spark-submit --py-files.
#
# Topology holds the JVM COUNT constant (2 executors) and scales the
# CORES 4x, because the crawl-round legs quantified the single-box
# artifact: extra executor JVMs on one machine fight over the same
# GC/JIT/Netty pools and page cache (8x2 ran 6x slower than 2x8 at
# equal cores), a cost real separate nodes do not pay. Holding JVMs
# fixed isolates the quantity the north rule actually asks about —
# does 4x the compute give ~4x the throughput.
#
#   N  leg: 1 worker x  4 cores -> 2 executors x 2 cores  (4 cores)
#   4N leg: 1 worker x 16 cores -> 2 executors x 8 cores (16 cores)
#
# Each leg is run as its own invocation (big-corpus legs run for
# minutes; one process per leg keeps every leg inside a bounded
# wall-clock window and lets legs be retried independently):
#
#   bash tools/cluster_scaling_ops.sh N   [sf_dir] [replicas] [crawl]
#   bash tools/cluster_scaling_ops.sh 4N  [sf_dir] [replicas] [crawl]
#   bash tools/cluster_scaling_ops.sh eff           # combine + print
#
# An optional 4th arg "crawl" submits the frontier-round job instead
# of the curation job (same 2-executor cores-4x topology — unlike
# cluster_scaling.sh's executor-count 4N leg, this isolates compute
# scaling from the single-box JVM artifacts) and keys efficiency on
# urls_per_sec.
#
# Leg JSON lines accumulate in $OUT; `eff` reads the last N and 4N
# lines and prints the efficiency record.
set -u
LEG=${1:?usage: cluster_scaling_ops.sh N|4N|eff [sf_dir] [replicas]}
SPARK_HOME=${SPARK_HOME:-/opt/spark}
REPO=$(cd "$(dirname "$0")/.." && pwd)
SF_DIR=${2:-/root/testdata/sf0.1}
REPLICAS=${3:-128}
MASTER_URL=spark://127.0.0.1:7077
export SPARK_LOCAL_IP=127.0.0.1
export SPARK_MASTER_HOST=127.0.0.1
export PYSPARK_PYTHON=$(which python)
export PYSPARK_DRIVER_PYTHON=$(which python)
export SPARK_WORKER_DIR=/tmp/c4as_workers
export SPARK_LOG_DIR=/tmp/c4as_spark_logs
MODE=${4:-ops}
# extra --conf pairs for one-off experiments, e.g.
#   EXTRA_SPARK_CONFS="--conf spark.sql.adaptive.coalescePartitions.enabled=false"
EXTRA_SPARK_CONFS=${EXTRA_SPARK_CONFS:-}
OUT=${CLUSTER_SCALING_OUT:-/tmp/cluster_scaling_ops_result.txt}

if [ "$LEG" = "eff" ]; then
  python - "$OUT" <<'EOF'
import json, sys
legs = {}
for line in open(sys.argv[1]):
    if line.strip():
        row = json.loads(line)
        legs[row["label"]] = row   # last occurrence of each label wins
a = legs.get("N_2exec_4cores"); b = legs.get("4N_2exec_16cores")
if a and b:
    key = "docs_per_sec" if "docs_per_sec" in a else "urls_per_sec"
    kind = "ops" if key == "docs_per_sec" else "crawl"
    eff = (b[key] / a[key]) / (b["total_cores"] / a["total_cores"])
    print(json.dumps({"metric": f"cluster_{kind}_scaling_efficiency_N_to_4N",
                      "value": round(eff, 3), "n_leg": a, "fourn_leg": b}))
EOF
  exit 0
fi

MODE_FLAG="--ops"
PARTS=32
# crawl mode: the round's heavy stage is pandas-UDF extraction at
# ~1 ms-core/row — 64 finer tasks smooth straggler quantization at 16
# cores (measured: see BENCH.md round-4 coalescing note)
if [ "$MODE" = "crawl" ]; then MODE_FLAG=""; PARTS=64; fi

PKG=/tmp/c4as_pkg.zip
rm -f "$PKG"
(cd "$REPO" && zip -qr "$PKG" crawl4ai_spark)

# Executor memory is 3g PER CORE on both legs (6g for 2-core, 24g for
# 8-core executors): a real 4N resize adds executors of the same
# core:memory shape, so memory per task is invariant. Holding the heap
# at 6g while quadrupling in-flight tasks per executor would hand the
# big leg a 4x-less-memory-per-task spill handicap no real cluster has.
submit() { # label total_cores exec_cores exec_mem shuffle_parts
  "$SPARK_HOME"/bin/spark-submit \
    --master "$MASTER_URL" \
    --conf spark.cores.max="$2" \
    --conf spark.executor.cores="$3" \
    --conf spark.executor.memory="$4" \
    --conf spark.driver.memory=8g \
    --conf "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=$3" \
    --conf spark.sql.shuffle.partitions="$5" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.coalescePartitions.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.autoBroadcastJoinThreshold=67108864 \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.ui.enabled=false \
    --conf spark.locality.wait=0s \
    $EXTRA_SPARK_CONFS \
    --py-files "$PKG" \
    "$REPO"/tools/cluster_scaling.py $MODE_FLAG "$SF_DIR" "$REPLICAS" "$1" \
    2>/dev/null | grep '^{'
}

cleanup() {
  "$SPARK_HOME"/sbin/stop-worker.sh >/dev/null 2>&1
  "$SPARK_HOME"/sbin/stop-master.sh >/dev/null 2>&1
  pkill -f org.apache.spark.deploy.worker.Worker 2>/dev/null
  pkill -f org.apache.spark.deploy.master.Master 2>/dev/null
}
trap cleanup EXIT

cleanup; sleep 4
"$SPARK_HOME"/sbin/start-master.sh -h 127.0.0.1 -p 7077 >/dev/null
sleep 4

if [ "$LEG" = "N" ]; then
  SPARK_WORKER_CORES=4 SPARK_WORKER_MEMORY=14g SPARK_WORKER_INSTANCES=1 \
    "$SPARK_HOME"/sbin/start-worker.sh "$MASTER_URL" >/dev/null
  sleep 4
  # shuffle partitions match the 4N leg (32): partitions are sized by
  # DATA, not cores — giving the small leg 4x-larger tasks would hand
  # it a spill handicap the big leg doesn't face, biasing efficiency
  submit "N_2exec_4cores" 4 2 6g "$PARTS" | tee -a "$OUT"
else
  SPARK_WORKER_CORES=16 SPARK_WORKER_MEMORY=14g SPARK_WORKER_INSTANCES=1 \
    "$SPARK_HOME"/sbin/start-worker.sh "$MASTER_URL" >/dev/null
  sleep 4
  submit "4N_2exec_16cores" 16 8 6g "$PARTS" | tee -a "$OUT"
fi
