#!/bin/bash
# Round-4 queue, part 2: remaining runs via the stall-retry wrapper
# (tools/tpu_run.sh — consecutive axon clients sometimes wedge).
set -x
cd "$(dirname "$0")/../.."
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs
R="bash tools/tpu_run.sh"

$R $L/r4_hopper_s125.jsonl python tools/train_gym.py --env Hopper-v3 \
  --iters 100 --step_size 0.1 --seed 125 --save $P/r4_hopper_s125.pkl
$R $L/r4_hopper_elliptic.jsonl python tools/train_gym.py --env Hopper-v3 \
  --cone elliptic --iters 100 --step_size 0.1 \
  --save $P/r4_hopper_elliptic.pkl
for S in 123 124 125; do
  $R $L/r4_walker_s$S.jsonl python tools/train_gym.py --env Walker2d-v3 \
    --iters 100 --step_size 0.1 --seed $S --save $P/r4_walker_s$S.pkl
done
for S in 123 124 125; do
  $R $L/r4_ant_s$S.jsonl python tools/train_gym.py --env Ant-v3 \
    --iters 300 --step_size 0.05 --init_log_std -0.5 --seed $S \
    --save $P/r4_ant_s$S.pkl
done
$R $L/r4_hopper_trpo.jsonl python tools/train_gym.py --env Hopper-v3 \
  --iters 100 --algo trpo --step_size 0.1 --seed 123 \
  --save $P/r4_hopper_trpo.pkl
$R $L/r4_hopper_linear.jsonl python tools/train_gym.py --env Hopper-v3 \
  --iters 100 --policy linear --step_size 0.1 --seed 123 \
  --save $P/r4_hopper_linear.pkl
$R $L/r4_hopper_trpo_linear.jsonl python tools/train_gym.py \
  --env Hopper-v3 --iters 100 --algo trpo --policy linear \
  --step_size 0.1 --seed 123 --save $P/r4_hopper_trpo_linear.pkl
$R $L/r4_humanoid_big.jsonl python tools/train_gym.py --env Humanoid-v3 \
  --iters 300 --ntraj 4096 --horizon 1000 --step_size 0.05 \
  --init_log_std -0.5 --seed 123 --save $P/r4_humanoid_big.pkl

echo QUEUE8B DONE
