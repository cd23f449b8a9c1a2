#!/usr/bin/env bash
# End-of-round preflight: EVERY gate, not just the driver's.
#
# Round 6 shipped green driver artifacts (oracle sweep + bench) over a
# red pytest suite — the write-verb layer was broken but no registry
# query routes through it, so CORRECTNESS/BENCH stayed green
# (VERDICT r6 "What's wrong" #2). This script is the fence: run it
# before any end-of-round snapshot; it exits non-zero if ANY layer is
# red.
#
# Usage: bash tools/preflight.sh [sf_dir]   (default /root/testdata/sf0.01)
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
rc=0

echo "== 1/5 working tree clean (gates cover exactly the committed tree) =="
if [ -n "$(git status --porcelain)" ]; then
  echo "DIRTY working tree — commit BEFORE preflight so gates cover it:"
  git status --porcelain
  rc=1
fi

echo "== 2/5 pytest (full suite, sharded — tools/partest.py, 8 workers x local[4]) =="
# FULL per-file listing + summed totals stay in the artifact, and the
# collected count is stated independently so the three numbers are
# mutually auditable (VERDICT r11 #3: the committed artifact kept only
# the tail, so the prose test count couldn't be checked against it)
python tools/partest.py 2>&1 || rc=1
[ "${PIPESTATUS[0]}" -eq 0 ] || rc=1
echo "-- pytest --collect-only cross-check --"
python -m pytest tests/ --collect-only -q 2>/dev/null | tail -2

echo "== 3/5 oracle sweep ($SF) =="
python tools/check_oracle.py "$SF" 2>&1 | grep -E "^(OK|FAIL|[0-9]+/)" | tail -3
[ "${PIPESTATUS[0]}" -eq 0 ] || rc=1

echo "== 4/5 driver-sim entry (plain SparkSession, no factory confs) =="
python - <<'EOF' || rc=1
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
n = len(e.entry(spark).collect())
assert n >= 0
q = e.queries()
assert q["event_chain_heads"](spark, "/root/testdata/sf0.01").count() > 0
print(f"entry OK ({n} rows), {len(q)} queries registered")
EOF

echo "== 5/5 bench (sf0.1; rewrites BENCH_DETAIL.json — commit it as the round artifact) =="
python bench.py 2>/dev/null | tail -1
[ "${PIPESTATUS[0]}" -eq 0 ] || rc=1

echo
if [ "$rc" -eq 0 ]; then echo "PREFLIGHT GREEN"; else echo "PREFLIGHT RED"; fi
exit $rc
