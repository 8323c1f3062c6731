#!/bin/bash
# Round-5 TPU queue, value-ordered (round-4 VERDICT next-round items
# 5/6/8).  Every job is resumable: train_gym --ckpt/--resume replays the
# logged rows after a tunnel stall, so tpu_run.sh's truncate-and-retry
# still yields a complete jsonl.  Run from the repo root:
#     nohup bash benchmarks/crosseval/queue11.sh > benchmarks/crosseval/logs/queue11.log 2>&1 &
set -u
cd "$(dirname "$0")/../.."
LOGS=benchmarks/crosseval/logs
POLS=benchmarks/crosseval/policies
RUN="tools/tpu_run.sh"
export STALL_SECS=${STALL_SECS:-1500}

# 1) Humanoid at large batch — VERDICT #6 ("stop deferring it").
#    1024 envs x 1000 horizon (4096 blew HBM on the humanoid rollout
#    buffers: UNAVAILABLE device fault on the first sampling step).
bash $RUN $LOGS/r5_humanoid_1024.jsonl \
  python tools/train_gym.py --env Humanoid-v3 --solver pgs --iters 150 \
    --ntraj 1024 --horizon 1000 --step_size 0.05 --init_log_std -0.5 \
    --seed 123 --save $POLS/r5_humanoid_1024.pkl --resume

# 2) Ant decay diagnosis — VERDICT #5: 300 iters with VF-error/log_std
#    instrumentation (now logged per-iter by train_gym).
bash $RUN $LOGS/r5_ant_diag.jsonl \
  python tools/train_gym.py --env Ant-v3 --iters 300 --ntraj 100 \
    --horizon 1000 --step_size 0.05 --seed 123 \
    --save $POLS/r5_ant_diag.pkl --resume

# 3) Hopper elliptic to the 3000 class — VERDICT #8: the step-0.05
#    config with kl_guard that round 4 queued but never ran.
bash $RUN $LOGS/r5_hopper_elliptic005.jsonl \
  python tools/train_gym.py --env Hopper-v3 --solver pgs --cone elliptic \
    --iters 150 --ntraj 100 --horizon 1000 --step_size 0.05 --seed 123 \
    --save $POLS/r5_hopper_elliptic005.pkl --resume

# 4) Ant entropy-floor arm — candidate fix for the decay (higher
#    init_log_std was the r4 suspect: -0.5 collapsed to -2.3).
bash $RUN $LOGS/r5_ant_ls0.jsonl \
  python tools/train_gym.py --env Ant-v3 --iters 300 --ntraj 100 \
    --horizon 1000 --step_size 0.05 --seed 123 --init_log_std 0.0 \
    --save $POLS/r5_ant_ls0.pkl --resume

echo "queue11 done"
