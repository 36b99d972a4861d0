#!/usr/bin/env bash
# 10x scale leg with FRESH-JVM-PER-QUERY isolation.
#
# Running every heavy query inside one long-lived JVM (the original
# ScaleBench loop) cross-contaminates timings: shuffle-heavy queries read
# up to 2.5x slower in-suite than isolated (setjoin_pairs sf1: 16.7 s
# in-suite vs 6.6 s alone), even with blocking cache teardown + GC between
# queries — leftover JIT state, heap fragmentation, and async shuffle-file
# cleanup all land on whoever runs next. A fresh JVM per query is the
# clean experiment; the synthesized sf1 corpus is built once and reused.
# Heap is pinned to 8g to match sbt's forked-run config: a 96g heap was
# measured 6x SLOWER on the shuffle-heavy queries (G1 with huge regions
# thrashes on the cached shingle arrays), so "more memory" is not neutral.
#
# Usage: tools/scale_leg.sh [out.json]   (run from the repo root, after
#        `sbt Test/compile`; uses the compiled classes directly)
set -u
OUT="${1:-SCALE_r08.json}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED
--add-opens=java.base/java.io=ALL-UNNAMED
--add-opens=java.base/java.net=ALL-UNNAMED
--add-opens=java.base/java.nio=ALL-UNNAMED
--add-opens=java.base/java.util=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED
--add-opens=java.base/sun.security.action=ALL-UNNAMED
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

NAMES=$(java $OPENS -cp "$CP" graft.ScaleBenchNames)
parts=()
for n in $NAMES; do
  echo "[scale-leg] $n ..." >&2
  line=$(SPARK_GRAFT_SCALE_ONLY="$n" SPARK_GRAFT_REPS="${SPARK_GRAFT_REPS:-2}" \
    java -Xmx8g $OPENS -cp "$CP" graft.ScaleBench 2>/dev/null | grep '"metric":"scale_exponents"')
  frag=$(echo "$line" | sed 's/.*"queries":{//; s/}}$//')
  if [ -z "$frag" ]; then
    echo "[scale-leg] FATAL: '$n' produced no result (crashed/OOM?) — aborting without writing $OUT" >&2
    exit 1
  fi
  echo "[scale-leg] $frag" >&2
  parts+=("$frag")
done
IFS=, ; joined="${parts[*]}" ; unset IFS
echo "{\"metric\":\"scale_exponents\",\"isolation\":\"fresh-jvm-per-query\",\"copies\":10,\"queries\":{$joined}}" > "$OUT"
echo "[scale-leg] wrote $OUT" >&2
