#!/bin/bash
# Targeted correctness check: verify_some.sh q160_delta_agg[,q161_...] [sfdir]
# Runs graft.Verify on just those queries, filters oracle_sql.json to the
# subset, and runs the DuckDB compare.
set -e
QS="$1"
SF="${2:-/root/testdata/sf0.01}"
OUT=/tmp/verify_some
rm -rf "$OUT"
cd /root/repo
SPARK_GRAFT_ONLY="$QS" SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF $OUT" >/tmp/verify_some.log 2>&1 || { echo "VERIFY FAILED"; tail -30 /tmp/verify_some.log; exit 1; }
python3 - "$QS" <<'EOF'
import json, sys
keep = set(sys.argv[1].split(','))
p = "/tmp/verify_some/oracle_sql.json"
d = json.load(open(p))
json.dump({k: v for k, v in d.items() if k in keep}, open(p, "w"))
EOF
python3 tools/check_correctness.py "$OUT" "$SF"
