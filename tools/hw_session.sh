#!/bin/bash
# One-shot hardware verification queue for the gated kernels.
#
# Run this as soon as the axon relay is reachable (probe: TCP connect to
# 127.0.0.1:8083). It front-loads the cheap lowering/numerics smoke, then
# benches every gate combination so a short TPU window yields a complete
# decision table. After EVERY row the running winner is (re)written to
# <repo>/.bench_gates.json — bench.py applies that file as gate DEFAULTS
# (flip-after-green, automated: the driver's end-of-round bench picks up the
# verified winner even if no builder session is alive to edit the in-code
# defaults, and a mid-run relay loss still leaves the best row measured so
# far in the file).
#   1. bench.py rows                — all-off baseline + each gate + combos.
#                                     Rows run FIRST: in the r5 window a
#                                     pathological remote Mosaic compile sat
#                                     for 25+ min before any row had landed
#                                     (same failure shape as r4's window
#                                     dying with rows unmeasured)
#   2. tools/smoke_kernels.py       — lowering + numerics for the fused
#                                     postprocess kernel
#   3. tools/profile_stages.py      — updated per-stage breakdown at the
#                                     winning gate set (run manually after
#                                     inspecting the table; see BASELINE.md)
#
# Results land in $LOG (rows also in $ROWDIR/*.json); after the run, flip
# the in-code kernel defaults + update BASELINE.md rows from the table,
# delete losing variants, and commit .bench_gates.json.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_session.log}
ROWDIR=/tmp/hw_rows.$$
mkdir -p "$ROWDIR"

select_winner() { # rebuild .bench_gates.json from all rows measured so far
  ROWDIR="$ROWDIR" python - <<'EOF'
import json, os, glob

rowdir = os.environ["ROWDIR"]
rows = {}
for p in sorted(glob.glob(os.path.join(rowdir, "*.json"))):
    name = os.path.basename(p)[:-5]
    try:
        with open(p) as f:
            rec = json.loads(f.read().strip().splitlines()[-1])
    except (OSError, ValueError, IndexError):
        print(f"row {name}: no valid JSON (failed run) — excluded")
        continue
    if rec.get("retried"):
        print(f"row {name}: retried (gated run failed) — excluded")
        continue
    rows[name] = rec
    print(f"row {name}: {rec['value']} img/s gates={rec.get('gates', {})}")
if not rows:
    print("no successful rows — not writing .bench_gates.json")
    raise SystemExit(0)
best = max(rows, key=lambda n: rows[n]["value"])
rec = rows[best]
out = {
    "winner": best,
    "value": rec["value"],
    "gates": rec.get("gates", {}),
    "table": {n: {"value": r["value"], "gates": r.get("gates", {})}
              for n, r in rows.items()},
}
tmp = ".bench_gates.json.tmp"
with open(tmp, "w") as f:
    json.dump(out, f, indent=1)
os.replace(tmp, ".bench_gates.json")
print(f"WINNER so far: {best} at {rec['value']} img/s -> .bench_gates.json "
      f"(bench.py now defaults to gates={rec.get('gates', {})})")
EOF
}

# every row sets BENCH_IGNORE_GATES_FILE=1 so the decision file being
# updated mid-run can never contaminate the table, and BENCH_NO_RETRY=1 so
# the safe-mode retry cannot silently replace a failed gated run with a
# gates-off number (for the all-off baseline row both are no-ops anyway).
bench_row() { # <name> [ENV=val ...]
  local name=$1; shift
  echo "=== $(date -u +%FT%TZ) bench $name [$*]"
  env BENCH_IGNORE_GATES_FILE=1 BENCH_NO_RETRY=1 "$@" \
    timeout 3000 python bench.py > "$ROWDIR/$name.json" 2> "$ROWDIR/$name.err"
  local rc=$?
  cat "$ROWDIR/$name.json"
  tail -3 "$ROWDIR/$name.err" | sed 's/^/  [stderr] /'
  echo "bench-$name rc=$rc"
  select_winner
}

{
  echo "=== $(date -u +%FT%TZ) relay probe"
  python - <<'EOF' || { echo "relay unreachable — aborting (do not burn the timeouts)"; exit 1; }
import socket
s = socket.socket(); s.settimeout(5)
s.connect(("127.0.0.1", 8083)); print("relay :8083 reachable")
EOF
  # Every gated kernel now has an end-to-end verdict (r4+r5 decision tables
  # in BASELINE.md): STREAMED_ATTN / MSDA_PALLAS_REDUCE / SWIN_FUSED_BLOCK
  # were measured losers and are removed from the tree. Live gates:
  # MSDA_GATHER_SPLIT (winner=2), MSDA_LOC_PER_HEAD and MSDA_TABLE_PER_HEAD
  # (per-head scheduling overlap, r5 matrix 3). Re-run the rows to
  # re-adjudicate on new hardware or after touching the MSDA op.
  bench_row baseline
  bench_row locph_tbl MSDA_GATHER_SPLIT=2 MSDA_LOC_PER_HEAD=1 MSDA_TABLE_PER_HEAD=1
  bench_row pmajor MSDA_PMAJOR=1 MSDA_TABLE_PER_HEAD=1
  bench_row pmajor_notbl MSDA_PMAJOR=1 MSDA_TABLE_PER_HEAD=0

  echo "=== $(date -u +%FT%TZ) smoke_kernels"
  timeout 2400 python tools/smoke_kernels.py; echo "smoke rc=$?"

  echo "=== $(date -u +%FT%TZ) confirmation run at the decision-file defaults"
  timeout 3000 python bench.py; echo "bench-final rc=$?"
  echo "=== $(date -u +%FT%TZ) done"
} 2>&1 | tee "$LOG"
