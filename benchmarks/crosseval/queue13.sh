#!/bin/bash
# Round-5 queue, part 3 — Ant decay fix arms (round-4 VERDICT item 5).
# The r5 diagnosis: decay tracks ENTROPY COLLAPSE, not KL overshoot or
# baseline drift (r5_ant_diag: VF_error_after ~0.01 throughout; realized
# KL inside the guard; log_std reached -2.3 exactly where r4's collapse
# began).  Arms: the r4 collapsing config with an entropy floor, and the
# floor + longer horizon.
set -u
cd "$(dirname "$0")/../.."
LOGS=benchmarks/crosseval/logs
POLS=benchmarks/crosseval/policies
RUN="tools/tpu_run.sh"
export STALL_SECS=${STALL_SECS:-1500}

bash $RUN $LOGS/r5_ant_floor.jsonl \
  python tools/train_gym.py --env Ant-v3 --iters 300 --ntraj 100 \
    --horizon 1000 --step_size 0.05 --seed 123 --init_log_std -0.5 \
    --min_log_std -1.6 \
    --save $POLS/r5_ant_floor.pkl --resume

bash $RUN $LOGS/r5_ant_floor2.jsonl \
  python tools/train_gym.py --env Ant-v3 --iters 300 --ntraj 100 \
    --horizon 1000 --step_size 0.05 --seed 124 --init_log_std -0.5 \
    --min_log_std -1.6 \
    --save $POLS/r5_ant_floor2.pkl --resume

# BASELINE.json configs[2] completion: the HalfCheetah arms of the
# "Hopper/HalfCheetah NPG vs TRPO, linear-vs-NN sweep"
bash $RUN $LOGS/r5_cheetah_trpo.jsonl \
  python tools/train_gym.py --env HalfCheetah-v3 --iters 100 --ntraj 100 \
    --horizon 1000 --algo trpo --step_size 0.1 --seed 123 \
    --save $POLS/r5_cheetah_trpo.pkl --resume
bash $RUN $LOGS/r5_cheetah_linear.jsonl \
  python tools/train_gym.py --env HalfCheetah-v3 --iters 100 --ntraj 100 \
    --horizon 1000 --policy linear --step_size 0.1 --seed 123 \
    --save $POLS/r5_cheetah_linear.pkl --resume

echo "queue13 done"
