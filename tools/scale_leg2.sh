#!/usr/bin/env bash
# SECOND-DECADE scale leg: sf1 -> sf10 exponents for the heaviest query
# families, fresh JVM per query (same isolation rationale as
# tools/scale_leg.sh). One sub-linear decade (sf0.1 -> sf1) proves
# fixed-overhead amortization; the second decade is what distinguishes
# amortization from asymptotics — a query whose exponent RISES across
# decades is super-linear with its constants hidden, and would not
# survive 100x.
#
# Both corpora are synthesized FROM sf0.1 (copies=10 and copies=100), so
# they share the same construction: copy-local vocabularies (linear pair
# growth), doc_id strides that never collide (i * 1e7, i < 100).
#
# Usage: tools/scale_leg2.sh [out.json]  (run from the repo root after
#        `sbt Test/compile`; uses the compiled classes directly)
set -u
OUT="${1:-SCALE2_LOCAL.json}"
SF1="${SPARK_GRAFT_SF1:-/tmp/graft-sf1}"
SF10="${SPARK_GRAFT_SF10:-/tmp/graft-sf10}"
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

# The decade-2 targets: the worst decade-1 exponents plus the incremental
# A/B legs (fixed batch — the corpus-term isolation experiment).
NAMES="${SPARK_GRAFT_SCALE2_NAMES:-setjoin_pairs setjoin_pairs_bucketed dedup_minhash corpus_clean dedup_clusters_star dedup_incremental_fixed dedup_incremental_fixed_bucketed}"

echo "[scale-leg2] synthesizing corpora (skipped when present)..." >&2
SPARK_GRAFT_SYNTH_ONLY=1 java -Xmx8g $OPENS -cp "$CP" graft.ScaleBench /root/testdata/sf0.1 "$SF1" 10 >/dev/null 2>&1 \
  || { echo "[scale-leg2] FATAL: sf1 synthesis failed" >&2; exit 1; }
SPARK_GRAFT_SYNTH_ONLY=1 java -Xmx8g $OPENS -cp "$CP" graft.ScaleBench /root/testdata/sf0.1 "$SF10" 100 >/dev/null 2>&1 \
  || { echo "[scale-leg2] FATAL: sf10 synthesis failed" >&2; exit 1; }

parts=()
for n in $NAMES; do
  echo "[scale-leg2] $n ..." >&2
  line=$(SPARK_GRAFT_SCALE_ONLY="$n" SPARK_GRAFT_REPS="${SPARK_GRAFT_REPS:-2}" \
    java -Xmx8g $OPENS -cp "$CP" graft.ScaleBench "$SF1" "$SF10" 100 2>/dev/null | grep '"metric":"scale_exponents"')
  frag=$(echo "$line" | sed 's/.*"queries":{//; s/}}$//')
  if [ -z "$frag" ]; then
    echo "[scale-leg2] FATAL: '$n' produced no result (crashed/OOM?) — aborting without writing $OUT" >&2
    exit 1
  fi
  echo "[scale-leg2] $frag" >&2
  parts+=("$frag")
done
IFS=, ; joined="${parts[*]}" ; unset IFS
# t_sf01/t_sf1 are ScaleBench's positional field names; in this leg they
# hold (t_sf1, t_sf10) — the "decade":2 marker says so.
echo "{\"metric\":\"scale_exponents\",\"isolation\":\"fresh-jvm-per-query\",\"decade\":2,\"from\":\"sf1\",\"to\":\"sf10\",\"queries\":{$joined}}" > "$OUT"
echo "[scale-leg2] wrote $OUT" >&2
