#!/bin/sh
# Accuracy-validated headline: optimized full-perception envelope
# WITHOUT flow_ds2 (the matrix showed ds2 costs 2x ATE on arms), at
# gn2/gn3 (matrix: accuracy == default-6 iters on both regimes).
# Also the strided target subsample (matrix: BETTER than topk).
set -u
cd "$(dirname "$0")/.."
ENV_COMMON="BENCH_MODE=fusion_chunked BENCH_VOL=128 BENCH_VOXEL_SIZE=0.005 \
BENCH_IMG=448x640 BENCH_MAX_NODES=256 BENCH_MAX_POINTS=8192 BENCH_BRICK=8 \
BENCH_MAX_BRICKS=1024 BENCH_NODE_COVERAGE=0.05 BENCH_BUDGET_S=3000 \
BENCH_MOTION=1 BENCH_FLOW=1 BENCH_LEPARD=1 BENCH_FLOW_LIFT=sparse \
BENCH_FLOW_BF16=1 BENCH_MASK_DS=2 BENCH_LEPARD_SUBSAMPLE=strided"
run_cfg() {
  name="$1"; shift
  echo "===== $name ====="
  echo "extra: $*"
  t0=$(date +%s)
  env $ENV_COMMON "$@" timeout 3100 python bench.py 2>&1 | tail -3
  echo "[wall $(( $(date +%s) - t0 )) s]"
}
run_cfg full_opt_gn2 BENCH_GN_ITERS=2
run_cfg full_opt_gn3 BENCH_GN_ITERS=3
echo "===== done ====="
