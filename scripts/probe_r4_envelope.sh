#!/bin/sh
# Round-4 re-measure of the full-perception envelope after the
# device-parked-params fix (same configs as probe_quiet.sh).
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
run_cfg full_quiet BENCH_MOTION=1 BENCH_FLOW=1 BENCH_LEPARD=1
run_cfg lepard_quiet BENCH_LEPARD=1
run_cfg flow_quiet BENCH_FLOW=1
run_cfg full_cap512 BENCH_MOTION=1 BENCH_FLOW=1 BENCH_LEPARD=1 BENCH_MAX_NODES=512
echo "===== done ====="
