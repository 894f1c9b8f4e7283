#!/bin/bash
# A/B the pv9 final-merge shuffle serializer (Kryo vs Java) at L8,
# taskset-pinned, alternating within the same window so hypervisor drift
# cannot masquerade as a serializer effect. Separate prefixes AND
# fingerprints (the serializer is in the fp) keep the records apart.
#   IDLE=180 ALTS=3 REPS=2 tools/ab_serializer.sh
set -o pipefail
cd "$(dirname "$0")"
JAR=../target/scala-2.13/earthwyrmspark_2.13-0.1.0.jar
GC="${GC:--XX:+UseParallelGC -Xmn24g -XX:-UseAdaptiveSizePolicy}"
MEM="${MEM:-32g}"
run8() { # $1 serializer-name  $2 prefix
  taskset -c 0-7 env SPARK_GRAFT_SCALING_LEVELS=8 \
    SPARK_GRAFT_SCALING_ROUNDS=1 \
    SPARK_GRAFT_SCALING_REPS="${REPS:-2}" \
    SPARK_GRAFT_SCALING_SERIALIZER="$1" \
    SPARK_GRAFT_SCALING_PREFIX="$2" \
    /opt/spark/bin/spark-submit --master "local[8]" --driver-memory "$MEM" \
    --conf spark.ui.enabled=false \
    --conf "spark.driver.extraJavaOptions=$GC" \
    --class graft.ScalingBench "$JAR" 2>&1 | grep -a '\[scaling\]\|"levels"' \
    || echo "[ab] $1 rep failed ($?)"
}
sleep "${IDLE:-180}"
for i in $(seq 1 "${ALTS:-3}"); do
  echo "=== alt $i kryo ($(date +%H:%M:%S)) ==="
  run8 kryo ab5k
  echo "=== alt $i java ($(date +%H:%M:%S)) ==="
  run8 java ab5j
done
echo "=== ab done ==="
cat ../data/ab5k_level_8.json 2>/dev/null; echo
cat ../data/ab5j_level_8.json 2>/dev/null; echo
