#!/bin/bash
# Quiet single-query oracle check: tools/qcheck.sh <names-csv> <sfdir>
# Runs Verify restricted to the named queries and prints only their rows.
set -e
names="$1"; sf="${2:-/root/testdata/sf0.01}"
out="/tmp/qcheck_$(echo "$names" | tr ',' '_' | cut -c1-60)"
SPARK_GRAFT_ONLY="$names" SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.Verify $sf $out" 2>&1 \
  | grep -E "^\[error\] [a-zA-Z/].*(rror|xception)|\[success\]" | head -5
python3 "$(dirname "$0")/check.py" "$sf" "$out" 2>/dev/null \
  | grep -v "missing spark result" | grep -E "^(ok|FAIL)" || true
