#!/bin/bash
# Round-4 final batch: a second elliptic config chasing the 3000-class
# in-sim result, then the driver benchmark on a quiet chip.
set -x
cd "$(dirname "$0")/../.."
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs
R="bash tools/tpu_run.sh"

$R $L/r4_hopper_elliptic2.jsonl python tools/train_gym.py \
  --env Hopper-v3 --cone elliptic --iters 150 --step_size 0.05 \
  --save $P/r4_hopper_elliptic2.pkl

python bench.py > BENCH_local_r4.json 2>/dev/null
cat BENCH_local_r4.json
echo QUEUE9 DONE
