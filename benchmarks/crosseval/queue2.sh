#!/bin/bash
# Round-3 TPU queue #2: re-earn the locomotion headlines with saved
# best-iterate policies for cross-eval in real MuJoCo (VERDICT items 1/2/5).
set -x
cd /root/repo
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs

# Hopper newton at the config that peaked 3196 in queue1 (best now saved)
python tools/train_gym.py --env Hopper-v3 --solver pgs --iters 100 \
  --step_size 0.1 --save $P/hopper_newton.pkl \
  > $L/hopper_newton.jsonl 2>&1

# HalfCheetah newton: step 0.1 NaN'd at iter 2 in queue1 -> gentler config
python tools/train_gym.py --env HalfCheetah-v3 --solver pgs --iters 100 \
  --step_size 0.05 --init_log_std -0.5 --save $P/cheetah_newton2.pkl \
  > $L/cheetah_newton2.jsonl 2>&1

# Ant newton, long run at the docs config (1718 @ 150 iters previously)
python tools/train_gym.py --env Ant-v3 --solver pgs --iters 300 \
  --step_size 0.05 --init_log_std -0.5 --save $P/ant_newton.pkl \
  > $L/ant_newton.jsonl 2>&1

# Ant penalty, long run (queue1's 60 iters were still climbing)
python tools/train_gym.py --env Ant-v3 --solver penalty --iters 300 \
  --step_size 0.05 --init_log_std -0.5 --save $P/ant_penalty2.pkl \
  > $L/ant_penalty2.jsonl 2>&1

echo QUEUE2_DONE
