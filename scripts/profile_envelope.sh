#!/bin/sh
# Per-stage decomposition of the FULL learned fused loop at the
# reference envelope (128^3 @ 5mm, 448x640, bricked, cap 256).
#
# Each config runs bench.py in a FRESH process (CLAUDE.md: relay
# dispatch overhead grows within a process) with one perception stage
# toggled; stage cost = config fps-delta vs base. Run in background:
#   nohup sh scripts/profile_envelope.sh > logs/profile_envelope.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
ENV_COMMON="BENCH_MODE=fusion_chunked BENCH_VOL=128 BENCH_VOXEL_SIZE=0.005 \
BENCH_IMG=448x640 BENCH_MAX_NODES=256 BENCH_MAX_POINTS=8192 BENCH_BRICK=8 \
BENCH_MAX_BRICKS=1024 BENCH_NODE_COVERAGE=0.05 BENCH_BUDGET_S=3000"

run_cfg() {
  name="$1"; shift
  echo "===== $name ====="
  echo "extra: $*"
  t0=$(date +%s)
  env $ENV_COMMON "$@" timeout 3100 python bench.py 2>&1 | tail -3
  echo "[wall $(( $(date +%s) - t0 )) s]"
}

run_cfg base
run_cfg motion BENCH_MOTION=1
run_cfg flow BENCH_FLOW=1
run_cfg lepard BENCH_LEPARD=1
run_cfg full BENCH_MOTION=1 BENCH_FLOW=1 BENCH_LEPARD=1
echo "===== done ====="
