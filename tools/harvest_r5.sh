#!/bin/bash
# Round-5 combined duty-cycled harvest: one shared idle/burst rhythm
# feeding BOTH ladders — the local[k] threads ladder (scaling_level_*.json,
# pv9+java fingerprint) and the local-cluster executors ladder
# (scaling_mx_level_*.json). Widest levels first after each idle gap (the
# hypervisor throttles by recent usage; wide levels need the freshest
# window), narrow levels every third burst only (they hold the denominator
# minima; oversampling them only makes the quotient harder).
#   IDLE=240 REPS=4 tools/harvest_r5.sh
set -u
cd "$(dirname "$0")"
JAR=../target/scala-2.13/earthwyrmspark_2.13-0.1.0.jar
[ -f "$JAR" ] || (cd .. && sbt -batch package > /dev/null)
REPS="${REPS:-4}"
# mx executors JIT-compile independently on 1 core each; the shared z12
# warmup rep doesn't cover the full-pyramid paths, so walls keep falling
# through rep ~5 — give mx JVMs more timed reps to reach steady state
REPS_MX="${REPS_MX:-8}"
GC_T="-XX:+UseParallelGC -Xmn24g -XX:-UseAdaptiveSizePolicy"
# mx driver: pinned to 4 cores (28-31); size its pools accordingly
GC_D="-XX:ActiveProcessorCount=4 -XX:+UseParallelGC -Xmn8g -XX:-UseAdaptiveSizePolicy"

threads_lvl() { # $1 core-list  $2 level
  taskset -c "$1" env SPARK_GRAFT_SCALING_LEVELS="$2" \
    SPARK_GRAFT_SCALING_ROUNDS=1 SPARK_GRAFT_SCALING_REPS="$REPS" \
    /opt/spark/bin/spark-submit --master "local[$2]" --driver-memory 32g \
    --conf spark.ui.enabled=false \
    --conf "spark.driver.extraJavaOptions=$GC_T" \
    --class graft.ScalingBench "$JAR" 2>&1 | grep -a '\[scaling\]' \
    || echo "threads level $2 rep failed ($?)"
}
mx_lvl() { # $1 level
  env SPARK_GRAFT_SCALING_MODE=executors SPARK_GRAFT_SCALING_LEVELS="$1" \
    SPARK_GRAFT_SCALING_ROUNDS=1 SPARK_GRAFT_SCALING_REPS="$REPS_MX" \
    SPARK_GRAFT_SCALING_EXEC_CORES=0-7 SPARK_GRAFT_SCALING_DRIVER_CORES=28-31 \
    /opt/spark/bin/spark-submit --master "local-cluster[$1,1,6144]" \
    --driver-memory 16g --conf spark.ui.enabled=false \
    --conf "spark.driver.extraJavaOptions=$GC_D" \
    --class graft.ScalingBench "$JAR" 2>&1 | grep -a '\[scaling\]' \
    || echo "mx level $1 rep failed ($?)"
}
tcores() { case $1 in 8) echo 0-7;; 4) echo 0-3;; 2) echo 0-1;; 1) echo 0;;
  *) echo "tcores(): unknown level '$1'" >&2; return 1;; esac; }

n=0
while true; do
  echo "=== idle $(date +%H:%M:%S) ==="
  sleep "${IDLE:-240}"
  echo "=== burst $n threads ($(date +%H:%M:%S)) ==="
  threads_lvl 0-7 8
  threads_lvl 0-3 4
  if [ $(( n % 3 )) -eq 2 ]; then threads_lvl 0-1 2; threads_lvl 0 1; fi
  echo "=== idle-mx $(date +%H:%M:%S) ==="
  sleep "${IDLE_MX:-180}"
  echo "=== burst $n mx ($(date +%H:%M:%S)) ==="
  mx_lvl 8
  mx_lvl 4
  if [ $(( n % 3 )) -eq 2 ]; then mx_lvl 2; mx_lvl 1; fi
  n=$(( n + 1 ))
done
