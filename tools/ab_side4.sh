#!/bin/bash
# 4-core-side-only A/B: run the pinned 4-core BenchChild K times over the
# shared prepared input and report each run's task/wall seconds (min task4
# is the noise-robust optimization metric; the 1-core side is only needed
# for the final ratio, not for A/B deltas).
# Usage: ab_side4.sh <tag> <reps> [extra -D flags...]
set -e
TAG=$1; REPS=$2; shift 2
EXTRA=("$@")
IN=/dev/shm/graft-bench/in/turns
WARM=/dev/shm/graft-bench/in/warm
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_JOBLOG=${SPARK_GRAFT_JOBLOG:-1}
for r in $(seq 1 $REPS); do
  log=/tmp/ab4_${TAG}_r${r}.log
  taskset -c 0-4 java $OPENS "${EXTRA[@]}" -Xmx20g \
    -XX:ActiveProcessorCount=5 \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.BenchChild "local[4]" 4 "$IN" "$WARM" 1 \
    >$log.out 2>$log
  run=$(grep -E '^RUN' $log.out | tail -1)
  tt=$(grep -E '^TASKTIME' $log | tail -1)
  echo "[$TAG r$r] $run | $tt"
done
