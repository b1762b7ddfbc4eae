#!/usr/bin/env bash
# Round-close evidence ritual (round-4 verdict, weak #7: "nothing forces
# suite-green on the COMMITTED final tree"). Runs the unit suite, the
# 8-device multichip dryrun and a bench smoke against the CURRENT tree,
# and writes CLOSE_r<N>.json stamped with the commit hash they ran at.
# Usage: bash scripts/round_close.sh <round-number>
set -u
ROUND="${1:?round number}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
HEAD_HASH=$(git rev-parse HEAD)
DIRTY=$(git status --porcelain | wc -l)
OUT="$REPO/CLOSE_r$(printf '%02d' "$ROUND").json"

SUITE_LOG=$(mktemp)
python -m pytest tests/ -q >"$SUITE_LOG" 2>&1
SUITE_RC=$?
SUITE_TAIL=$(tail -2 "$SUITE_LOG" | tr '\n' ' ')

DRYRUN_LOG=$(mktemp)
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
  >"$DRYRUN_LOG" 2>&1
DRYRUN_RC=$?
DRYRUN_TAIL=$(tail -3 "$DRYRUN_LOG" | tr '\n' ' ')

BENCH_LOG=$(mktemp)
MYRIA3D_BENCH_SMOKE=1 python bench.py >"$BENCH_LOG" 2>&1
BENCH_RC=$?
BENCH_LINE=$(grep -o '{.*}' "$BENCH_LOG" | tail -1)

python - "$OUT" <<EOF
import json, sys, time
out = sys.argv[1]
rec = {
    "round": int("$ROUND"),
    "commit": "$HEAD_HASH",
    "dirty_files": int("$DIRTY"),
    "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "unit_suite": {"rc": int("$SUITE_RC"), "tail": """$SUITE_TAIL"""},
    "multichip_dryrun": {"rc": int("$DRYRUN_RC"), "tail": """$DRYRUN_TAIL"""},
    "bench_smoke": {"rc": int("$BENCH_RC"), "line": """$BENCH_LINE"""},
    "verdict": "PASS" if (int("$SUITE_RC") == 0 and int("$DRYRUN_RC") == 0
                          and int("$BENCH_RC") == 0) else "FAIL",
}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec, indent=1))
EOF
