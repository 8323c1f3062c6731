#!/bin/bash
# Round-3 TPU queue #3: Humanoid NPG (VERDICT item 4) under both solver
# paths, saved for real-MuJoCo cross-eval.
set -x
cd /root/repo
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs

python tools/train_gym.py --env Humanoid-v3 --solver penalty --iters 200 \
  --step_size 0.05 --init_log_std -0.5 --save $P/humanoid_penalty.pkl \
  > $L/humanoid_penalty.jsonl 2>&1

python tools/train_gym.py --env Humanoid-v3 --solver pgs --iters 200 \
  --step_size 0.05 --init_log_std -0.5 --save $P/humanoid_newton.pkl \
  > $L/humanoid_newton.jsonl 2>&1

echo QUEUE3_DONE
