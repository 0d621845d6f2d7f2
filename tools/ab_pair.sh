#!/bin/bash
# One pinned 1-core/4-core BenchChild pair over the shared prepared input,
# with optional extra JVM -D flags — A/B harness for write-path tuning.
# Usage: ab_pair.sh <tag> [extra -D flags...]
set -e
TAG=$1; shift
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
for n in 1 4; do
  log=/tmp/ab_${TAG}_${n}.log
  taskset -c 0-$n java $OPENS "${EXTRA[@]}" -Xmx20g \
    -XX:ActiveProcessorCount=$((n + 1)) \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.BenchChild "local[$n]" $n "$IN" "$WARM" 1 \
    >$log.out 2>$log
  grep -E '^RUN' $log.out | sed "s/^/[$TAG n=$n] /"
  grep -E '^TASKTIME|^TASKGAP' $log | tail -2 | sed "s/^/[$TAG n=$n] /"
done
python3 - "$TAG" <<'PY'
import re, sys
tag = sys.argv[1]
w = {}
for n in (1, 4):
    out = open(f"/tmp/ab_{tag}_{n}.log.out").read()
    runs = re.findall(r"RUN \d+ ([0-9.]+) ([0-9.]+) ([0-9.]+)", out)
    tts = re.findall(r"TASKTIME ([0-9.]+) wall ([0-9.]+)", open(f"/tmp/ab_{tag}_{n}.log").read())
    w[n] = (float(runs[-1][0]), float(tts[-1][0]))
print(f"[{tag}] wall ratio {(w[1][0]/w[4][0])/4:.3f}  task infl {w[4][1]/w[1][1]:.3f}  t1 {w[1][0]:.1f} t4 {w[4][0]:.1f}  task1 {w[1][1]:.1f} task4 {w[4][1]:.1f}")
PY
