#!/usr/bin/env bash
# Regenerate the committed expected-output fixtures for the queries whose
# semantics are not SQL-expressible (q24 pipeline triples, q25 extraction,
# q30 media features). Run AFTER the semantic checks are green (golden
# parity, ExtractSpec, MediaSpec) — the fixture pins a verified output at
# the driver's Verify scale (sf0.01).
#
# Usage: tools/gen_fixtures.sh [verifyOutDir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/graft_verify_sf001}"
FIX=src/test/resources/fixtures
if [ ! -d "$OUT/q24_kg_triples" ]; then
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
fi
mkdir -p "$FIX"
for q in q24_kg_triples q25_extract_text q30_media_features; do
  src=$("ls" "$OUT/$q"/part-*.parquet | head -1)
  cp "$src" "$FIX/$q.parquet"
  echo "fixture: $FIX/$q.parquet ($(du -h "$FIX/$q.parquet" | cut -f1))"
done
