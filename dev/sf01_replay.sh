#!/bin/bash
# sf0.1 staged-intermediate replay harness (round 15).
#
# Verifies queries at 10x the gate scale: the engine side runs plain
# gate-mode Verify at sf0.1 (q350's composed run persists the confirmed-pair
# parquet as a side effect), then the DuckDB oracle replays run with
# --staged-pairs so the cascade oracles read that parquet instead of the
# from-raw quadratic candidate join (>45 min per query at sf0.1 — the
# round-14 abort). Pair precision and ALL downstream logic are still
# re-derived from raw by DuckDB; only candidate recall is carried from the
# sf0.01 hard gate, where the identical derivation is proven exhaustively.
#
# Usage: dev/sf01_replay.sh [outDir] [nameFilterRegex]
#   no filter = the FULL registry, with a 180 s per-oracle cap so the few
#   remaining from-raw-quadratic oracles (no shared-fragment rewrite, e.g.
#   q189's paragraph level) register as oracle-bound SKIPs instead of
#   hanging the pass.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=/root/testdata/sf0.1
OUT=${1:-/tmp/verify_sf01}
FILTER=${2:-}

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SF $OUT $FILTER"

# DedupAuditRun.stagedPaths(sfDir): tmpdir/graft_dedup_audit_<md5-16>_<sfx>
PAIRS=$(python3 - "$SF" <<'EOF'
import hashlib, re, sys
key = sys.argv[1]
digest = hashlib.md5(key.encode()).hexdigest()[:16]
suffix = re.sub(r'[^A-Za-z0-9]', '_', key)[-24:]
print(f"/tmp/graft_dedup_audit_{digest}_{suffix}/neardup_pairs")
EOF
)
if [ ! -d "$PAIRS" ]; then
  echo "staged pair parquet missing at $PAIRS — the filter must include" \
       "q350_dedup_audit_run (its composed run persists it)" >&2
  exit 1
fi
python3 dev/check.py "$OUT" "$SF" --staged-pairs "$PAIRS" --timeout 180
