#!/usr/bin/env bash
# Pre-snapshot gate: run this before EVERY end-of-round commit.
# Round 2's whole output was voided by a compile error sbt reports in 5s —
# this script makes that impossible to repeat.
#
#   1. sbt test                  (compile + 96 specs)
#   2. Verify at sf0.01          (dump every SparkEntry query + oracle_sql.json)
#   3. tools/oracle_check.py     (local DuckDB stand-in for the driver gate)
#
# Exit 0 iff all three pass. Usage: tools/gate.sh [sfDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_gate}"

echo "== gate 1/3: sbt test =="
sbt -batch test

echo "== gate 2/3: Verify @ $SF_DIR =="
rm -rf "$OUT_DIR"
CP="target/scala-2.13/classes:$(ls -d /opt/spark/jars/* | tr '\n' ':')"
java -Xmx8g --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CP" graft.Verify "$SF_DIR" "$OUT_DIR"

echo "== gate 3/3: oracle check =="
python3 tools/oracle_check.py "$SF_DIR" "$OUT_DIR"

echo "== GATE GREEN =="
