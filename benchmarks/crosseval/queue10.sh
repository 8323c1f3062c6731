#!/bin/bash
# Round-4 slim priority queue (tunnel degraded; strict value order):
# flagship DAPG-long, Ant KL-guard validation, NPG-vs-TRPO/linear arms,
# remaining seed bands, humanoid-big last (sacrificial).
set -x
cd "$(dirname "$0")/../.."
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs
R="bash tools/tpu_run.sh"

DONE_RE="stage....dapg" $R $L/r4_relocate_dapg_long.jsonl \
  python examples/dapg_relocate.py \
  --demos benchmarks/crosseval/relocate_demos_real.pkl \
  --dapg_iters 220 --ntraj 50 --lam_0 0.05 --bc_epochs 80 \
  --save $P/r4_relocate_dapg_long.pkl

$R $L/r4_ant_s123.jsonl python tools/train_gym.py --env Ant-v3 \
  --iters 300 --step_size 0.05 --init_log_std -0.5 --seed 123 \
  --save $P/r4_ant_s123.pkl
$R $L/r4_hopper_trpo.jsonl python tools/train_gym.py --env Hopper-v3 \
  --iters 100 --algo trpo --step_size 0.1 --seed 123 \
  --save $P/r4_hopper_trpo.pkl
$R $L/r4_hopper_linear.jsonl python tools/train_gym.py --env Hopper-v3 \
  --iters 100 --policy linear --step_size 0.1 --seed 123 \
  --save $P/r4_hopper_linear.pkl
$R $L/r4_hopper_trpo_linear.jsonl python tools/train_gym.py \
  --env Hopper-v3 --iters 100 --algo trpo --policy linear \
  --step_size 0.1 --seed 123 --save $P/r4_hopper_trpo_linear.pkl
$R $L/r4_walker_s124.jsonl python tools/train_gym.py --env Walker2d-v3 \
  --iters 100 --step_size 0.1 --seed 124 --save $P/r4_walker_s124.pkl
$R $L/r4_walker_s125.jsonl python tools/train_gym.py --env Walker2d-v3 \
  --iters 100 --step_size 0.1 --seed 125 --save $P/r4_walker_s125.pkl
$R $L/r4_ant_s124.jsonl python tools/train_gym.py --env Ant-v3 \
  --iters 300 --step_size 0.05 --init_log_std -0.5 --seed 124 \
  --save $P/r4_ant_s124.pkl
$R $L/r4_ant_s125.jsonl python tools/train_gym.py --env Ant-v3 \
  --iters 300 --step_size 0.05 --init_log_std -0.5 --seed 125 \
  --save $P/r4_ant_s125.pkl
$R $L/r4_hopper_elliptic2.jsonl python tools/train_gym.py \
  --env Hopper-v3 --cone elliptic --iters 150 --step_size 0.05 \
  --save $P/r4_hopper_elliptic2.pkl
$R $L/r4_humanoid_big.jsonl python tools/train_gym.py --env Humanoid-v3 \
  --iters 200 --ntraj 4096 --horizon 1000 --step_size 0.05 \
  --init_log_std -0.5 --seed 123 --save $P/r4_humanoid_big.pkl
echo QUEUE10 DONE
