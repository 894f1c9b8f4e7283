#!/bin/bash
# Intra-JVM-sharing attribution for the 2->8 scaling residual: run TWO
# CONCURRENT taskset-pinned 4-core JVMs (cores 0-3 and 4-7) against the
# identical pyramid job/input, vs the single 8-core JVM level. Same 8
# physical cores either way; if the 2x4 aggregate beats 1x8, the residual
# is one local-mode JVM sharing runtime state (memory manager, code cache,
# allocator) across 8 concurrent tasks — which real multi-executor
# clusters (separate JVM per executor) do not do.
# Results: data/attribA.json / data/attribB.json (min-merged, fingerprinted).
set -e
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/earthwyrmspark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package > /dev/null
# ADVICE r3: both concurrent JVMs would run phase-0 and write
# mode(overwrite) to the same feature-table path if it is missing —
# require it materialized (run tools/scaling_taskset.sh, or any single
# sequential ScalingBench level, once first) and fail fast otherwise.
if [ ! -f /tmp/graft_scaling_features/_SUCCESS ]; then
  echo "attrib_2jvm: /tmp/graft_scaling_features not materialized;" \
       "run one sequential ScalingBench level first" >&2
  exit 1
fi
GC="${GC:--XX:+UseParallelGC -Xmn24g -XX:-UseAdaptiveSizePolicy}"
run() { # $1 core-list  $2 prefix
  taskset -c "$1" env SPARK_GRAFT_SCALING_LEVELS=4 \
    SPARK_GRAFT_SCALING_ROUNDS=1 SPARK_GRAFT_SCALING_PREFIX="$2" \
    /opt/spark/bin/spark-submit --master local[4] --driver-memory 32g \
    --conf spark.ui.enabled=false \
    --conf "spark.driver.extraJavaOptions=$GC" \
    --class graft.ScalingBench "$JAR"
}
ROUNDS=${ROUNDS:-2}
for r in $(seq 1 "$ROUNDS"); do
  echo "=== attrib round $r ($(date +%H:%M:%S)) ==="
  run 0-3 attribA > /tmp/attribA_$r.log 2>&1 &
  A=$!
  run 4-7 attribB > /tmp/attribB_$r.log 2>&1 &
  B=$!
  wait $A $B
  grep -a '\[scaling\]' /tmp/attribA_$r.log /tmp/attribB_$r.log || true
done
