#!/bin/bash
# Round-5 validation matrix (round-4 VERDICT item 4): real-MuJoCo
# cross-eval of every saved r4/r5 best policy.  CPU-only; writes one
# JSON line per (policy, mode) to logs/r5_matrix.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/crosseval/logs/r5_matrix.jsonl
: > $OUT
run() {  # run POLICY ENV
  for mode in "" "--stochastic"; do
    python benchmarks/parity/cross_eval_gym.py --policy "$1" --env "$2" \
      --episodes 20 $mode 2>/dev/null >> $OUT
  done
}
P=benchmarks/crosseval/policies
run $P/r4_walker_s123_best.pkl Walker2d-v4
run $P/r4_walker_s124_best.pkl Walker2d-v4
run $P/r4_walker_s125_best.pkl Walker2d-v4
run $P/r4_ant_s123_best.pkl Ant-v4
run $P/r4_ant_s124_best.pkl Ant-v4
run $P/r4_ant_s125_best.pkl Ant-v4
run $P/r4_hopper_trpo_best.pkl Hopper-v4
run $P/r4_hopper_trpo_linear_best.pkl Hopper-v4
run $P/r4_hopper_linear_best.pkl Hopper-v4
run $P/r4_hopper_elliptic_best.pkl Hopper-v4
run $P/r4_hopper_elliptic2_best.pkl Hopper-v4
echo "matrix done" >> $OUT
