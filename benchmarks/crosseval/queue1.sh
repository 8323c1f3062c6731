#!/bin/bash
# Round-3 TPU queue #1: train + save the gym locomotion headline policies
# so each can be cross-evaluated inside real MuJoCo (VERDICT item 1), and
# take the first hopper-newton shot at 3000 (VERDICT item 2).
set -x
cd /root/repo
mkdir -p benchmarks/crosseval/policies benchmarks/crosseval/logs
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs

python tools/train_gym.py --env Hopper-v3 --solver pgs --iters 100 \
  --step_size 0.1 --save $P/hopper_newton_s10.pkl \
  > $L/hopper_newton_s10.jsonl 2>&1

python tools/train_gym.py --env Hopper-v3 --solver penalty --iters 50 \
  --step_size 0.05 --save $P/hopper_penalty.pkl \
  > $L/hopper_penalty.jsonl 2>&1

python tools/train_gym.py --env Walker2d-v3 --solver pgs --iters 100 \
  --step_size 0.1 --save $P/walker_newton.pkl \
  > $L/walker_newton.jsonl 2>&1

python tools/train_gym.py --env HalfCheetah-v3 --solver pgs --iters 40 \
  --step_size 0.1 --save $P/cheetah_newton.pkl \
  > $L/cheetah_newton.jsonl 2>&1

python tools/train_gym.py --env Ant-v3 --solver penalty --iters 60 \
  --step_size 0.1 --save $P/ant_penalty.pkl \
  > $L/ant_penalty.jsonl 2>&1

echo QUEUE1_DONE
