#!/bin/bash
# Two-cluster-size scaling evidence: the SAME spark-submit job at N and
# 4N real executors on a standalone master (the north rule's exact
# submission shape: spark-submit --py-files on a multi-executor
# cluster). Separate executor JVMs, Netty shuffle between processes —
# a real executor resize, not local[k] thread scaling.
#
#   N  leg: 1 worker x 4 cores  -> 2 executors x 2 cores (4 cores)
#   4N leg: 4 workers x 4 cores -> 8 executors x 2 cores (16 cores)
#
# Usage: bash tools/cluster_scaling.sh [sf_dir] [replicas]
# Prints the two JSON leg lines plus the efficiency line.
set -u
SPARK_HOME=${SPARK_HOME:-/opt/spark}
REPO=$(cd "$(dirname "$0")/.." && pwd)
SF_DIR=${1:-/root/testdata/sf0.1}
REPLICAS=${2:-4}
MASTER_URL=spark://127.0.0.1:7077
export SPARK_LOCAL_IP=127.0.0.1
export SPARK_MASTER_HOST=127.0.0.1
export PYSPARK_PYTHON=$(which python)
export PYSPARK_DRIVER_PYTHON=$(which python)
export SPARK_WORKER_DIR=/tmp/c4as_workers
export SPARK_LOG_DIR=/tmp/c4as_spark_logs
OUT=${CLUSTER_SCALING_OUT:-/tmp/cluster_scaling_result.txt}

# package the library for --py-files
PKG=/tmp/c4as_pkg.zip
rm -f "$PKG"
(cd "$REPO" && zip -qr "$PKG" crawl4ai_spark)

submit() { # label total_cores shuffle_parts
  "$SPARK_HOME"/bin/spark-submit \
    --master "$MASTER_URL" \
    --conf spark.cores.max="$2" \
    --conf spark.executor.cores=2 \
    --conf spark.executor.memory=6g \
    --conf spark.driver.memory=8g \
    --conf "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=2" \
    --conf spark.sql.shuffle.partitions="$3" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.coalescePartitions.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.sql.autoBroadcastJoinThreshold=67108864 \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.ui.enabled=false \
    --conf spark.locality.wait=0s \
    --py-files "$PKG" \
    "$REPO"/tools/cluster_scaling.py "$SF_DIR" "$REPLICAS" "$1" \
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

: > "$OUT"
# ---- N leg: 1 worker x 4 cores = 2 executors -------------------------
SPARK_WORKER_CORES=4 SPARK_WORKER_MEMORY=14g SPARK_WORKER_INSTANCES=1 \
  "$SPARK_HOME"/sbin/start-worker.sh "$MASTER_URL" >/dev/null
sleep 4
submit "N_2exec_4cores" 4 8 | tee -a "$OUT"
"$SPARK_HOME"/sbin/stop-worker.sh >/dev/null 2>&1
pkill -f org.apache.spark.deploy.worker.Worker 2>/dev/null
sleep 3

# ---- 4N leg: 4 workers x 4 cores = 8 executors ------------------------
SPARK_WORKER_CORES=4 SPARK_WORKER_MEMORY=14g SPARK_WORKER_INSTANCES=4 \
  "$SPARK_HOME"/sbin/start-worker.sh "$MASTER_URL" >/dev/null
sleep 5
submit "4N_8exec_16cores" 16 16 | tee -a "$OUT"

python - "$OUT" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
if len(rows) == 2:
    a, b = rows
    eff = (b["urls_per_sec"] / a["urls_per_sec"]) / (b["total_cores"] / a["total_cores"])
    print(json.dumps({"metric": "cluster_scaling_efficiency_N_to_4N",
                      "value": round(eff, 3),
                      "n_leg": a, "fourn_leg": b}))
EOF
