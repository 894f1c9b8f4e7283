#!/bin/bash
# N vs 4N scaling evidence with honest resource isolation: each level runs
# in its own JVM pinned to exactly that many cores (taskset), so GC /
# shuffle / codegen threads cannot borrow the other 30 cores the way plain
# local[k] does. Levels are interleaved to neutralize the VM's sustained-
# load throttling. Requires the feature table materialized once (the
# ScalingBench phase-0 does this if missing).
set -e
cd "$(dirname "$0")/.."
ROUNDS=${ROUNDS:-2}
for r in $(seq 1 "$ROUNDS"); do
  echo "=== round $r: 8 cores ==="
  taskset -c 0-7 env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SCALING_LEVELS=8 \
    SPARK_GRAFT_SCALING_ROUNDS=1 \
    sbt -batch "runMain graft.ScalingBench" 2>&1 |
    grep -aE '\[scaling\]|"level"'
  echo "=== round $r: 2 cores ==="
  taskset -c 0-1 env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SCALING_LEVELS=2 \
    SPARK_GRAFT_SCALING_ROUNDS=1 \
    sbt -batch "runMain graft.ScalingBench" 2>&1 |
    grep -aE '\[scaling\]|"level"'
done
