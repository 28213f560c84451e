#!/bin/bash
# One-shot hardware verification queue for the round-3 gated kernels.
#
# Run this as soon as the axon relay is reachable (probe: TCP connect to
# 127.0.0.1:8083). It front-loads the cheap lowering/numerics smoke, then
# benches every gate combination so a short TPU window yields a complete
# decision table:
#   1. tools/smoke_kernels.py       — lowering + numerics for corner_reduce
#                                     (modes 1+2), streamed attention, fused
#                                     Swin block, fused postprocess
#   2. bench.py (default gates)     — headline incl. streamed cross-attn
#   3. bench.py MSDA_PALLAS_REDUCE=2 — row-major fused corner reduce
#   4. bench.py MSDA_PALLAS_REDUCE=1 — (Lq, P*4D) fused corner reduce
#   5. tools/profile_stages.py      — updated per-stage breakdown at the
#                                     winning gate set (run manually after
#                                     picking the winner; see BASELINE.md)
#
# Results land in $LOG; flip kernel defaults + update BASELINE.md rows from
# them, then re-run bench.py once more at the final defaults.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_session.log}
{
  echo "=== $(date -u +%FT%TZ) relay probe"
  python - <<'EOF' || { echo "relay unreachable — aborting (do not burn the timeouts)"; exit 1; }
import socket
s = socket.socket(); s.settimeout(5)
s.connect(("127.0.0.1", 8083)); print("relay :8083 reachable")
EOF
  echo "=== $(date -u +%FT%TZ) smoke_kernels"
  timeout 2400 python tools/smoke_kernels.py; echo "smoke rc=$?"
  # NOTE: every gate row sets BENCH_NO_RETRY=1 — bench.py's safe-mode retry
  # would otherwise silently replace a failed gated run with a gates-off
  # number and corrupt this decision table. Only the default row keeps the
  # retry (that row doubles as a rehearsal of the driver-run fallback).
  echo "=== $(date -u +%FT%TZ) bench (default gates — pure XLA after the r4 flip-after-green reset)"
  timeout 3000 python bench.py; echo "bench-default rc=$?"
  echo "=== $(date -u +%FT%TZ) bench STREAMED_ATTN=1 (streamed cross-attention)"
  BENCH_NO_RETRY=1 STREAMED_ATTN=1 timeout 3000 python bench.py; echo "bench-sattn rc=$?"
  echo "=== $(date -u +%FT%TZ) bench MSDA_PALLAS_REDUCE=2 (row-major)"
  BENCH_NO_RETRY=1 MSDA_PALLAS_REDUCE=2 timeout 3000 python bench.py; echo "bench-r2 rc=$?"
  echo "=== $(date -u +%FT%TZ) bench MSDA_PALLAS_REDUCE=1"
  BENCH_NO_RETRY=1 MSDA_PALLAS_REDUCE=1 timeout 3000 python bench.py; echo "bench-r1 rc=$?"
  echo "=== $(date -u +%FT%TZ) bench MSDA_PALLAS_REDUCE=3 (row-major, plain XLA)"
  BENCH_NO_RETRY=1 MSDA_PALLAS_REDUCE=3 timeout 3000 python bench.py; echo "bench-r3 rc=$?"
  echo "=== $(date -u +%FT%TZ) bench SWIN_FUSED_BLOCK=1 (fused Swin megakernel)"
  BENCH_NO_RETRY=1 SWIN_FUSED_BLOCK=1 timeout 3000 python bench.py; echo "bench-swin rc=$?"
  echo "=== $(date -u +%FT%TZ) bench MSDA_GATHER_SPLIT=2 (gather chunking)"
  BENCH_NO_RETRY=1 MSDA_GATHER_SPLIT=2 timeout 3000 python bench.py; echo "bench-gsplit rc=$?"
  # most-likely winner combination up front: if the window closes before a
  # manual combined re-run, this row is the headline candidate
  echo "=== $(date -u +%FT%TZ) bench STREAMED_ATTN=1 + MSDA_PALLAS_REDUCE=2 (combo)"
  BENCH_NO_RETRY=1 STREAMED_ATTN=1 MSDA_PALLAS_REDUCE=2 timeout 3000 python bench.py; echo "bench-combo rc=$?"
  echo "=== $(date -u +%FT%TZ) done"
} 2>&1 | tee "$LOG"
