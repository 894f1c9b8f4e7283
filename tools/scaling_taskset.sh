#!/bin/bash
# N vs 4N scaling evidence with honest resource isolation: each level runs
# in its own JVM pinned to exactly that many cores (taskset), so GC /
# shuffle / codegen threads cannot borrow the other cores the way plain
# local[k] does. Levels are interleaved (the host's load drifts by minutes,
# not seconds) and every run MIN-MERGES into data/scaling_level_<k>.json —
# fingerprinted by corpus/partitioning/plan version so a stale faster
# config can never win the min. Rerun any time; minima only improve.
# Requires the feature table materialized once (ScalingBench phase-0 does
# this if missing) and the jar packaged (sbt -batch package).
# pipefail (ADVICE r3): a crashed spark-submit must fail the round
# visibly, not vanish through the grep pipe; a successful level always
# prints [scaling] lines, so grep matching is part of success.
set -e -o pipefail
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/earthwyrmspark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package > /dev/null
# default GC: ParallelGC with a large FIXED young gen — tile payloads are
# short-lived; adaptive sizing was measured producing 7-30 s GC walls at
# width ≥4 (vs 0.2 s at width 1) on identical allocation. -Xmn24g cut the
# best L4 rep from 14.2 s to 11.0 s with gcSec 0.17.
GC="${GC:--XX:+UseParallelGC -Xmn24g -XX:-UseAdaptiveSizePolicy}"
MEM="${MEM:-32g}"
runlvl() { # $1 core-list  $2 level
  taskset -c "$1" env SPARK_GRAFT_SCALING_LEVELS="$2" \
    SPARK_GRAFT_SCALING_ROUNDS=1 \
    /opt/spark/bin/spark-submit --master "local[$2]" --driver-memory "$MEM" \
    --conf spark.ui.enabled=false \
    --conf "spark.driver.extraJavaOptions=$GC" \
    --class graft.ScalingBench "$JAR" 2>&1 | grep -a '\[scaling\]'
}
calib() { # $1 threads  $2 core-list
  taskset -c "$2" env SPARK_GRAFT_CALIB_THREADS="$1" \
    SPARK_GRAFT_CALIB_MODE="${CALIB_MODE:-alu}" \
    SPARK_GRAFT_CALIB_UNITS=$(( $1 * 128 )) \
    java -cp "$JAR:/opt/spark/jars/*" graft.CalibrateCpu 2>&1 |
    grep -a calib
}
ROUNDS=${ROUNDS:-3}
# Rotate the level order between rounds: with a fixed 8→4→2→1 order the
# widest level ALWAYS runs right after the previous round's sustained
# usage, and this hypervisor visibly throttles by recent usage — a fixed
# order systematically hands the wide levels the worst windows (observed:
# L8 warm cpuSec 2-3× its quiet value round after round while L4, minutes
# later in the same rounds, sat near its floor).
ORDERS=("8 4 2 1" "1 8 4 2" "2 1 8 4" "4 2 1 8")
for r in $(seq 1 "$ROUNDS"); do
  order=${ORDERS[$(( ( $(date +%s) / 60 + r ) % 4 ))]}
  echo "=== round $r ($(date +%H:%M:%S)) order: $order ==="
  for lvl in $order; do
    case $lvl in
      8) runlvl 0-7 8;; 4) runlvl 0-3 4;; 2) runlvl 0-1 2;; 1) runlvl 0 1;;
    esac
  done
  calib 2 0-1; calib 8 0-7
done
