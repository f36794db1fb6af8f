#!/usr/bin/env bash
# Hostile-environment gate: a 1000-executor cluster does not guarantee
# system locale or timezone, so results must be bit-identical under
# the nastiest common settings — Turkish locale (the classic
# case-mapping trap: I → ı, i → İ under locale-sensitive lower/upper)
# and a half-hour-offset timezone (Asia/Kolkata, which surfaces any
# path converting timestamps through the JVM default zone instead of
# the pinned UTC session zone).
#
# Runs the FULL 133-query Verify under those JVM flags — against the
# driver's sf0.01 corpus AND the multi-script unicode corpus (non-ASCII
# text is what actually drives the locale-sensitive string paths) —
# and hash-compares both against the unchanged DuckDB oracle.
set -euo pipefail
cd "$(dirname "$0")/.."

HOSTILE='set run/javaOptions ++= Seq("-Duser.language=tr","-Duser.country=TR","-Duser.timezone=Asia/Kolkata")'

echo "=== hostile env: sf0.01 corpus ==="
rm -rf /tmp/hostile_out
SPARK_GRAFT_CPUS=8 sbt -batch "$HOSTILE" \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/hostile_out" > /dev/null 2>&1
python3 tools/check.py /root/testdata/sf0.01 /tmp/hostile_out | tail -1

echo "=== hostile env: unicode corpus ==="
rm -rf /tmp/unicode_sf /tmp/hostile_uni
python3 tools/unicode_testdata.py /tmp/unicode_sf > /dev/null
SPARK_GRAFT_CPUS=8 sbt -batch "$HOSTILE" \
  "runMain graft.Verify /tmp/unicode_sf /tmp/hostile_uni" > /dev/null 2>&1
python3 tools/check.py /tmp/unicode_sf /tmp/hostile_uni | tail -1

echo "hostile-env gate: results are locale- and timezone-independent"
