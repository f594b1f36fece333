#!/usr/bin/env bash
# One-shot 8x oracle envelope (VERDICT r9 #6): regenerate the
# deterministic 8x-replicated corpus from sf0.01, run graft.Verify on
# it, and cross-check every declared query against the DuckDB oracle.
# Produces CORRECTNESS_SCALE8.txt in the repo root so the above-sf0.1
# envelope refreshes per round instead of rotting.
#
# Usage: devtools/scale8.sh [src_sf_dir] [work_dir]
#   src_sf_dir  default /root/testdata/sf0.01
#   work_dir    default /tmp/graft-scale8 (corpus + verify output)
# Expect ~10-12 min at local[8]. Exit 0 iff every query checks green.
set -euo pipefail
cd "$(dirname "$0")/.."

SRC="${1:-/root/testdata/sf0.01}"
WORK="${2:-/tmp/graft-scale8}"
CORPUS="$WORK/sf8x"
OUT="$WORK/verify_out"
mkdir -p "$WORK"
rm -rf "$CORPUS" "$OUT"

# 512m code cache: a multi-build Spark session JIT-compiles thousands of
# janino classes; the 240m default fills mid-run and silently disables the
# JIT, degrading later stages 3-6x (measured on the sf1 build sequence).
ADDOPENS="-XX:ReservedCodeCacheSize=512m --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

echo "== scalegen: $SRC -> $CORPUS (8x)"
python3 devtools/scalegen.py "$SRC" "$CORPUS" 8

echo "== Verify at 8x"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx12g -cp "$CP" graft.Verify "$CORPUS" "$OUT" 2>"$WORK/verify.log"

echo "== DuckDB oracle cross-check at 8x"
python3 devtools/check.py "$CORPUS" "$OUT" | tee CORRECTNESS_SCALE8.txt
grep -q ", 0 fail" CORRECTNESS_SCALE8.txt
