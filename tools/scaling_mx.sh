#!/bin/bash
# Multi-EXECUTOR scaling ladder (mode=executors): each level k runs k REAL
# executor JVMs of 1 core each via Spark's local-cluster[k,1,mem] master —
# the configuration the north rule names ("N and 4N executors"), vs the
# single-JVM local[k] stand-in of tools/scaling_burst.sh. ScalingBench pins
# each executor JVM to its OWN core (0..k-1) and the driver JVM to cores
# 28-31 (a real cluster's driver is a separate node), so no outer taskset
# here. Duty-cycled like scaling_burst.sh: idle first (the hypervisor
# throttles by recent usage), widest level first, narrow levels every
# third burst (they hold the denominator minima; min-merge only improves).
#   IDLE=240 REPS=3 WIDE="8 4" NARROW="2 1" tools/scaling_mx.sh
set -u
cd "$(dirname "$0")"
export SPARK_GRAFT_SCALING_MODE=executors
export SPARK_GRAFT_SCALING_REPS="${REPS:-3}"
export SPARK_GRAFT_SCALING_EXEC_CORES="${EXEC_CORES:-0-7}"
export SPARK_GRAFT_SCALING_DRIVER_CORES="${DRIVER_CORES:-28-31}"
JAR=../target/scala-2.13/earthwyrmspark_2.13-0.1.0.jar
[ -f "$JAR" ] || (cd .. && sbt -batch package > /dev/null)
# driver-JVM GC (executor GC is SPARK_GRAFT_SCALING_EXEC_GC, default in
# ScalingBench: ParallelGC, fixed 3g young gen per 6g executor heap)
GC="${GC:--XX:ActiveProcessorCount=4 -XX:+UseParallelGC -Xmn8g -XX:-UseAdaptiveSizePolicy}"
MEM="${MEM:-16g}"
runlvl() { # $1 level
  env SPARK_GRAFT_SCALING_LEVELS="$1" SPARK_GRAFT_SCALING_ROUNDS=1 \
    /opt/spark/bin/spark-submit --master "local-cluster[$1,1,6144]" \
    --driver-memory "$MEM" \
    --conf spark.ui.enabled=false \
    --conf "spark.driver.extraJavaOptions=$GC" \
    --class graft.ScalingBench "$JAR" 2>&1 | grep -a '\[scaling\]'
}
# one crashed / scaling-line-less rep must not kill the unattended loop
try_lvl() { runlvl "$1" || echo "level $1 rep failed ($?)"; }
n=0
while true; do
  echo "=== idle $(date +%H:%M:%S) ==="
  sleep "${IDLE:-240}"
  echo "=== burst $n ($(date +%H:%M:%S)) ==="
  for lvl in ${WIDE:-8 4}; do try_lvl "$lvl"; done
  if [ $(( n % 3 )) -eq 2 ]; then
    for lvl in ${NARROW:-2 1}; do try_lvl "$lvl"; done
  fi
  n=$(( n + 1 ))
done
