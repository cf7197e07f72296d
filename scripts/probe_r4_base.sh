#!/bin/sh
# Decompose the 28.3 ms/frame perception-free cap-256 envelope base:
# GN-iteration slope, node-cap slope, chunk-length (dispatch) slope,
# and integrate-resolution slope.
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
run_cfg base_gn1 BENCH_GN_ITERS=1
run_cfg base_cap128 BENCH_MAX_NODES=128
run_cfg base_chunk32 BENCH_CHUNK=32
run_cfg base_pts4096 BENCH_MAX_POINTS=4096
echo "===== done ====="
