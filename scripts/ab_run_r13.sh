#!/usr/bin/env bash
# Interleaved same-window A/B bench: r12 jar vs r13 jar (VERDICT r12 item 9 —
# pin the round baseline in ONE window so host drift can't pollute the PERF
# compare). Sessions alternate r12,r13,r12,r13; each runs the full Bench main
# (sf0.1, runs=2, min) and its bench_out.json is copied to abtest_r13/.
# Analyze with scripts/ab_analyze_r13.py.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-32}
OUT=abtest_r13
mkdir -p "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_one() { # arm jar session
  local arm=$1 jar=$2 s=$3
  local work; work=$(mktemp -d /tmp/ab_r13_run.XXXXXX)
  echo "[ab] $arm session $s ($jar)"
  (cd "$work" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
    java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:$jar" graft.Bench > bench_stdout.log 2>&1)
  cp "$work/bench_out.json" "$OUT/${arm}_s${s}.json"
  rm -rf "$work"
}
R12_JAR=${R12_JAR:-/tmp/ab_r13/r12.jar}
R13_JAR=${R13_JAR:-/tmp/ab_r13/r13.jar}
SESSIONS=${SESSIONS:-2}
for s in $(seq 1 "$SESSIONS"); do
  run_one r12 "$R12_JAR" "$s"
  run_one r13 "$R13_JAR" "$s"
done
echo "[ab] done -> $OUT/"
