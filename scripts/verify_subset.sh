#!/usr/bin/env bash
# Dev helper: oracle-verify a comma-separated subset of queries at sf0.01.
# Usage: scripts/verify_subset.sh q60_bm25,q167_hybrid_rrf
set -euo pipefail
names="$1"
out=/tmp/verify_subset
rm -rf "$out"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $out $names" >/tmp/verify_subset.log 2>&1 || {
  tail -20 /tmp/verify_subset.log; exit 1; }
python3 - "$out" "$names" <<'EOF'
import json, sys
out, names = sys.argv[1], set(sys.argv[2].split(","))
p = f"{out}/oracle_sql.json"
d = json.load(open(p))
json.dump({k: v for k, v in d.items() if k in names}, open(p, "w"))
EOF
python3 scripts/check.py /root/testdata/sf0.01 "$out"
