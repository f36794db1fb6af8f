#!/usr/bin/env bash
# Unicode oracle-parity gate: the standing correctness gate runs on the
# driver's pure-ASCII corpus (max code point 121), which cannot catch
# engine divergences that only fire on multi-byte text — DuckDB's
# unicode-aware trim vs Spark's ASCII-space trim, Java's one-to-many
# lower('İ') vs utf8proc's, byte-vs-codepoint probes over UTF-8.
# This gate regenerates a deterministic multi-script documents table
# (tools/unicode_testdata.py: CJK, Cyrillic, Greek, Arabic/Hebrew RTL,
# combining marks, astral math letters, emoji ZWJ sequences, fullwidth
# forms, ideographic-space runs, case-fold hazards) and re-runs the
# FULL 133-query Verify + DuckDB hash-compare over it.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${UNICODE_SF_DIR:-/tmp/unicode_sf}
OUT_DIR=${UNICODE_OUT_DIR:-/tmp/unicode_out}

rm -rf "$SF_DIR" "$OUT_DIR"
python3 tools/unicode_testdata.py "$SF_DIR"
# sbt/Spark chatter to a log; the gate's stdout is the compare verdict
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch \
  "runMain graft.Verify $SF_DIR $OUT_DIR" > /tmp/unicode_gate_sbt.log 2>&1
python3 tools/check.py "$SF_DIR" "$OUT_DIR"
echo "unicode gate: all queries hash-match on the multi-script corpus"
